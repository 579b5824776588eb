package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PageRank: hand-verifiable structures, edge hygiene, mass bounds. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cycle: perfect symmetry keeps all ranks equal at 1/n") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 5).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r.size == 3)
    assert(r.values.toSet.size == 1, s"cycle ranks diverged: $r")
    assert(math.abs(r(1L) - 1.0 / 3) < 1e-6)
  }

  test("star: the sink outranks its spokes; dangling mass is dropped") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(1L) && r(1L) == r(3L))
    // node 2 has no out-edges: its mass vanishes; fixed-point
    // truncation only ever shaves, so the total stays <= 1
    assert(r.values.sum <= 1000000000L)
  }

  test("degenerate inputs: empty and self-loop-only graphs rank empty") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRank(empty, iterations = 3).collect().isEmpty)
    // self-loops drop, leaving zero REAL edges -> also empty, no 1/0
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    assert(Graph.pageRank(loops, iterations = 3).collect().isEmpty)
  }

  test("weighted PageRank: uniform weights reduce exactly to pageRank") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val plain = Graph.pageRank(edges, iterations = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weighted = Graph.weightedPageRank(edges, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == weighted)
  }

  test("weighted PageRank: weight skew moves rank; parallel edges sum") {
    // node 1 points at 2 (weight 9) and 3 (weight 1)
    val skew = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L),
      (3L, 1L, 1L)).toDF("src", "dst", "w")
    val r = Graph.weightedPageRank(skew, iterations = 3,
        weightCol = Some("w")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(3L), "the heavy edge's target must outrank")
    // nine parallel (1,2) edges == one edge of weight 9
    val parallel = (Seq.fill(9)((1L, 2L)) ++
      Seq((1L, 3L), (2L, 1L), (3L, 1L))).toDF("src", "dst")
    val viaMulti = Graph.weightedPageRank(parallel, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(viaMulti == r)
  }

  test("self-loops and duplicate edges are dropped before ranking") {
    val dirty = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val clean = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = Graph.pageRank(dirty, iterations = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = Graph.pageRank(clean, iterations = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == b)
  }

  test("HITS: a pure hub and a pure authority separate exactly") {
    // 1 -> {2, 3}: node 1 is the only hub, 2 and 3 are authorities
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.hits(edges, iterations = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    graft.std.Materialize.releaseAll()
    // auth: 2 and 3 split the mass evenly; 1 gets none.
    assert(r(1L)._1 == 0L && r(2L)._1 == 500000000L &&
      r(3L)._1 == 500000000L)
    // hub: all of it on node 1
    assert(r(1L)._2 == 1000000000L && r(2L)._2 == 0L && r(3L)._2 == 0L)
  }

  test("HITS: hand-computed two-iteration scores on a small DAG") {
    // edges: 1->3, 2->3, 2->4, 3->4
    // a1 = indeg: {3:2, 4:2}; h1(u) = sum a1 over out: {1:2, 2:4, 3:2}
    // a2(v) = sum h1 over in: {3: h1(1)+h1(2)=6, 4: h1(2)+h1(3)=6}
    // h2(u) = sum a2 over out: {1:6, 2:12, 3:6}; sa=12, sh=24
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.hits(edges, iterations = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    graft.std.Materialize.releaseAll()
    assert(r(3L)._1 == 500000000L && r(4L)._1 == 500000000L)
    assert(r(1L)._1 == 0L && r(2L)._1 == 0L)
    assert(r(1L)._2 == 250000000L && r(2L)._2 == 500000000L &&
      r(3L)._2 == 250000000L && r(4L)._2 == 0L)
  }

  test("HITS: empty and self-loop-only graphs score empty") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.hits(empty).collect().isEmpty)
    val loops = Seq((1L, 1L)).toDF("src", "dst")
    assert(Graph.hits(loops).collect().isEmpty)
    graft.std.Materialize.releaseAll()
  }

  test("HITS: the long-overflow guard refuses un-runnable configs") {
    // a 5000-degree star at 8 iterations: 16*log2(5000) > 62
    val big = (1L to 5000L).map(i => (0L, i)).toDF("src", "dst")
    val err = intercept[IllegalArgumentException] {
      Graph.hits(big, iterations = 8)
    }
    graft.std.Materialize.releaseAll()
    assert(err.getMessage.contains("overflow"))
  }

  test("HITS: guard boundary — last runnable iteration count runs, " +
      "first un-runnable raises the NAMED error (never an overflow)") {
    // degree-5000 star: 2·i·log2(5000) < 62 ⟺ i ≤ 2 — so i=2 is the
    // last config inside the envelope and i=3 the first outside it
    val big = (1L to 5000L).map(i => (0L, i)).toDF("src", "dst")
    val ok = Graph.hits(big, iterations = 2).collect()
    graft.std.Materialize.releaseAll()
    // inside the envelope the run must be finite and well-normalized:
    // every fixed-point score lands in [0, 1e9] (a silent long
    // wraparound would go negative)
    assert(ok.length == 5001)
    assert(ok.forall { r =>
      val a = r.getLong(r.fieldIndex("auth_e9"))
      val h = r.getLong(r.fieldIndex("hub_e9"))
      a >= 0L && a <= 1000000000L && h >= 0L && h <= 1000000000L
    })
    val err = intercept[IllegalArgumentException] {
      Graph.hits(big, iterations = 3)
    }
    graft.std.Materialize.releaseAll()
    assert(err.getMessage.contains("overflow") &&
      err.getMessage.contains("5000"),
      s"guard should name the degree and the word overflow: $err")
  }

  test("PPR: an EMPTY seed frame ranks every node exactly 0") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val noSeeds = Seq.empty[Long].toDF("node")
    val r = Graph.personalizedPageRank(edges, noSeeds, iterations = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    graft.std.Materialize.releaseAll()
    // the node universe is still reported (3 rows), all at rank 0 —
    // not an empty frame and not a division-by-zero on nSeed
    assert(r.length == 3 && r.forall(t => t._2 == 0L && t._3 == 0.0))
  }

  test("kHopReach: periodic visited re-pin changes no counts (deep walk)") {
    // a 10-chain walked 8 hops crosses two re-pin points at
    // repinEvery=2; results must be identical to a never-repinned run
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("seed")
    def runWith(every: Int) =
      Graph.kHopReach(chain, seeds, hops = 8, repinEvery = every)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val repinned = runWith(2)
    graft.std.Materialize.releaseAll()
    val plain = runWith(100)
    graft.std.Materialize.releaseAll()
    assert(repinned == plain)
    // chain semantics: seed 1 reaches exactly one new node per hop;
    // seed 5 runs off the end after hop 5
    assert(repinned.contains((1L, 8, 1L)) && repinned.contains((5L, 5, 1L))
      && repinned.contains((5L, 6, 0L)))
  }

  test("kHopReach: an empty seed frame reports no rows (not a crash)") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val reach = Graph.kHopReach(edges, Seq.empty[Long].toDF("seed"), 2)
      .collect()
    graft.std.Materialize.releaseAll()
    assert(reach.isEmpty)
  }

  test("PPR: rank flows outward from the seed; unreachable nodes get 0") {
    // 1 -> 2 -> 3, seed {1}: trust decays along the chain; 4 -> 1 is
    // upstream of the seed and unreachable FROM it -> exactly 0
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.personalizedPageRank(edges, seeds, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    graft.std.Materialize.releaseAll()
    // seed 1: base 150000000 (teleport only; 4's rank is 0 after iter 1)
    // 2: base 0 + 0.85 * rank(1); decays but nonzero; 3 downstream
    assert(r(4L) == 0L)
    assert(r(1L) == 150000000L)
    assert(r(2L) > r(3L) && r(3L) > 0L)
  }

  test("PPR: hand-computed two-node exchange in exact fixed point") {
    // 1 <-> 2, seed {1}. r0 = (1e9, 0).
    // i1: c(2) = 1e9; r = (150e6 + 0, 0 + 850e6) = (150000000, 850000000)
    // i2: r1 = 150e6 + 850e6*850//1000 = 150e6 + 722500000 = 872500000
    //     r2 = 0 + 150e6*850//1000 = 127500000
    // i3: r1 = 150e6 + 127500000*850//1000 = 150e6 + 108375000
    //     r2 = 872500000*850//1000 = 741625000
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.personalizedPageRank(edges, seeds, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    graft.std.Materialize.releaseAll()
    assert(r(1L) == 258375000L)
    assert(r(2L) == 741625000L)
  }

  test("PPR: seeds outside the graph are dropped; none in-graph -> all zero") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    // seed 9 is isolated (not in any edge): nSeed-in-graph = 0
    val r = Graph.personalizedPageRank(edges, Seq(9L).toDF("node"),
      iterations = 2).collect().map(x => x.getLong(0) -> x.getLong(1))
      .toMap
    graft.std.Materialize.releaseAll()
    assert(r == Map(1L -> 0L, 2L -> 0L))
    // and a mixed seed set only counts the in-graph member
    val r2 = Graph.personalizedPageRank(
      Seq((1L, 2L)).toDF("src", "dst"),
      Seq(9L, 1L).toDF("node"), iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    graft.std.Materialize.releaseAll()
    assert(r2(1L) == 150000000L && r2(2L) == 850000000L)
  }

  test("triangles: K4 — every node in 3 triangles, lcc exactly 1") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3)))).toMap
    graft.std.Materialize.releaseAll()
    assert(r.size == 4)
    r.values.foreach { case (deg, tri, lcc) =>
      assert(deg == 3L && tri == 3L && lcc == 1000000000L)
    }
  }

  test("triangles: a triangle with a pendant — broker vs community") {
    // 1-2-3 closed, 4 hangs off 1: node 1 has degree 3 but only the
    // one triangle -> lcc = 2*1/(3*2) = 1/3 (fixed-point truncated)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
      .toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3)))).toMap
    graft.std.Materialize.releaseAll()
    assert(r(1L) == ((3L, 1L, 333333333L)))
    assert(r(2L) == ((2L, 1L, 1000000000L)))
    assert(r(3L) == ((2L, 1L, 1000000000L)))
    assert(r(4L) == ((1L, 0L, 0L))) // degree < 2: lcc 0 by convention
  }

  test("triangles: direction, duplicates, and self-loops are ignored") {
    // same triangle written three ways + noise edges
    val dirty = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (3L, 1L)).toDF("src", "dst")
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val a = Graph.triangleStats(dirty).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val b = Graph.triangleStats(clean).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    graft.std.Materialize.releaseAll()
    assert(a == b)
  }

  test("triangles: triangle-free graphs count zero; empty stays empty") {
    // a path and a star: plenty of wedges, no closures
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.triangleStats(path).collect()
    assert(r.length == 4 && r.forall(x => x.getLong(2) == 0L))
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.triangleStats(empty).collect().isEmpty)
    graft.std.Materialize.releaseAll()
  }

  test("triangles: skew — a celebrity hub plus one closed pair") {
    // node 0 connects to 1..100; only (1,2) closes. Degree order
    // orients every hub edge INTO node 0, so the hub contributes no
    // wedges from its own adjacency — the O(m^1.5) guarantee the
    // scaladoc claims. Counts: exactly one triangle {0,1,2}.
    val hub = (1L to 100L).map(i => (0L, i)) :+ ((1L, 2L))
    val r = Graph.triangleStats(hub.toDF("src", "dst")).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    graft.std.Materialize.releaseAll()
    assert(r(0L) == 1L && r(1L) == 1L && r(2L) == 1L)
    assert((3L to 100L).forall(r(_) == 0L))
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int) = {
    val r = Graph.labelPropagation(edges.toDF("src", "dst"), iters)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    graft.std.Materialize.releaseAll()
    r
  }

  test("LPA: barbell — two triangles keep their own community") {
    // hand-simulated 3 synchronous iterations (see scaladoc contract):
    // {1,2,3} converge to label 1, {4,5,6} to label 3 via the bridge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val got = lpa(edges, 3)
    assert(got == Map(1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      4L -> (3L, 3L), 5L -> (3L, 3L), 6L -> (3L, 3L)))
  }

  test("LPA: vote ties resolve to the smallest label (one iteration)") {
    // path 1-2-3 after one sync round: 1 adopts 2, 2 ties {1,3} -> 1,
    // 3 adopts 2
    val got = lpa(Seq((1L, 2L), (2L, 3L)), 1)
    assert(got == Map(1L -> (2L, 2L), 2L -> (1L, 1L), 3L -> (2L, 2L)))
  }

  test("LPA: direction, duplicate edges, and self-loops are ignored") {
    val got = lpa(Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L)), 1)
    assert(got == Map(1L -> (2L, 1L), 2L -> (1L, 1L)))
  }

  test("components (x48 shape): reps are component minima, sizes exact") {
    // the graph-tier composition over the dedup clustering kernel:
    // chain {1,2,3} + pair {10,11}; reps are component minima
    import org.apache.spark.sql.functions.{col, count, lit}
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (11L, 10L))
      .toDF("id_a", "id_b")
    val nodes = edges.select(col("id_a").as("node_id"))
      .unionByName(edges.select(col("id_b").as("node_id"))).distinct()
    val labels = Dedup.connectedComponentsStars(nodes, edges,
      idCol = "node_id")
    val sizes = labels.groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("component_size"))
    val got = labels.join(sizes, Seq("cluster_rep"))
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2)))).toMap
    assert(got == Map(1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      10L -> (10L, 2L), 11L -> (10L, 2L)))
  }

  test("shortest paths: cheaper long path beats expensive direct edge") {
    // 1 -> 4 direct costs 10; 1 -> 2 -> 3 -> 4 costs 3. Within the
    // 4-relaxation budget the long-but-cheap route must win, and the
    // intermediate nodes carry their prefix costs.
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("seed")
    val got = Graph.shortestPaths(edges, seeds, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("shortest paths: relaxation budget bounds path length") {
    // chain 1->2->3->4 all cost 1: with only 2 relaxations node 4 is
    // unreached (its cheapest route needs 3 edges) — the documented
    // <=k-edge semantics, not an approximation bug.
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("seed")
    val got = Graph.shortestPaths(edges, seeds, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("shortest paths: multi-seed min, parallel-edge collapse, " +
    "isolated seed at zero") {
    // two seeds compete for node 3 (via 1 costs 5, via 2 costs 2);
    // parallel edges 1->3 collapse to the MIN weight; seed 9 touches
    // no edge but still reports distance 0; self-loops drop.
    val edges = Seq((1L, 3L, 7L), (1L, 3L, 5L), (2L, 3L, 2L),
      (3L, 3L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L, 2L, 9L).toDF("seed")
    val got = Graph.shortestPaths(edges, seeds, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 9L -> 0L))
  }

  test("degree distribution: star graph fits slope -1 exactly") {
    // hub 0 with 4 leaves: degrees {0:4, leaves:1} -> histogram
    // (1,4),(4,1); in log space the two points are reflections, so
    // the fit is slope -1, intercept ln(4), r² 1
    val edges = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val out = Graph.degreeDistribution(edges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 4L))
    assert(out(1L)._1 == 4L && out(4L)._1 == 1L)
    out.values.foreach { case (_, slope, intercept, r2) =>
      assert(slope == -1.0 && r2 == 1.0 &&
        math.abs(intercept - 1.386294) < 1e-9)
    }
  }

  test("degree distribution: uniform degrees have no fit (varX = 0)") {
    // a 4-cycle: every node degree 2 -> one histogram bucket, the
    // regression is undefined and the fit columns are null
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val out = Graph.degreeDistribution(edges).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 2L && out.head.getLong(1) == 4L)
    assert(out.head.isNullAt(2) && out.head.isNullAt(3) &&
      out.head.isNullAt(4))
  }

  test("degree distribution: parallel and reverse edges collapse") {
    // 1->2 stated three ways is ONE undirected edge: both nodes
    // degree 1
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = Graph.degreeDistribution(edges).collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L &&
      out.head.getLong(1) == 2L)
  }

  test("harmonic centrality: path graph terms are 1e9 div d") {
    // 1->2->3->4 seeded at 1: terms 1e9, 5e8, 1e9 div 3; the seed
    // itself never appears (self-distance 0 excluded)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.harmonicCentrality(edges, Seq(1L).toDF("seed"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(2L -> ((1L, 1000000000L)),
      3L -> ((1L, 500000000L)), 4L -> ((1L, 333333333L))))
  }

  test("harmonic centrality: sources sum; cycles don't resurrect self") {
    // 1->2 and 3->2: node 2 collects BOTH seeds (2e9, n_sources 2);
    // the 2->1 back-edge gives seed 1 a d=2 route to ITSELF, which
    // MIN-collapses to its own 0 and stays excluded — but seed 3
    // reaches 1 at d=2 through it
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.harmonicCentrality(edges,
        Seq(1L, 3L).toDF("seed"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(2L -> ((2L, 2000000000L)),
      1L -> ((1L, 500000000L))))
  }

  test("harmonic centrality: the hop horizon truncates far terms") {
    // 5-chain seeded at 1 with 3 iterations: node 5 (d=4) is beyond
    // the horizon and absent — the documented truncated estimator
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.harmonicCentrality(edges, Seq(1L).toDF("seed"),
        iterations = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 4L))
  }

  private def betweennessOf(edges: Seq[(Long, Long)], seeds: Seq[Long],
                            iterations: Int = 4) =
    Graph.betweennessCentrality(edges.toDF("src", "dst"),
        seeds.toDF("seed"), iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("betweenness: path graph — the middle brokers, endpoints don't") {
    // 1->2->3 seeded at 1: delta(3)=0, delta(2)=sigma2*(1e9+0)//sigma3
    // = 1e9 (node 2 sits on the one 1->3 shortest path); the source's
    // own delta (2e9) is excluded from the rollup
    val got = betweennessOf(Seq((1L, 2L), (2L, 3L)), Seq(1L))
    assert(got == Map(2L -> 1000000000L, 3L -> 0L), s"got $got")
  }

  test("betweenness: diamond splits dependency by path counts") {
    // 1->2, 1->3, 2->4, 3->4 seeded at 1: sigma(4)=2, so each middle
    // node carries HALF the dependency: 1*(1e9+0)//2 = 5e8
    val got = betweennessOf(
      Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), Seq(1L))
    assert(got == Map(2L -> 500000000L, 3L -> 500000000L, 4L -> 0L),
      s"got $got")
  }

  test("betweenness: dependencies cascade and seeds sum") {
    // 1->2->3->4 seeded at 1: delta(3) = 1e9 (one path through it to
    // 4), delta(2) = sigma2*(1e9 + delta(3))//sigma3 = 2e9 — Brandes'
    // cascade, NOT pair counting. Adding seed 2 contributes a further
    // 1e9 to node 3 (path 2->4) and 0 to node 4
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val one = betweennessOf(chain, Seq(1L))
    assert(one == Map(2L -> 2000000000L, 3L -> 1000000000L, 4L -> 0L),
      s"got $one")
    val two = betweennessOf(chain, Seq(1L, 2L))
    assert(two(3L) == 2000000000L && two(4L) == 0L &&
      two(2L) == 2000000000L, s"got $two")
  }

  private def reachOf(edges: Seq[(Long, Long, String)],
                      seeds: Seq[Long], iterations: Int = 4) = {
    import org.apache.spark.sql.functions.col
    val e = edges.toDF("src", "dst", "_d")
      .select(col("src"), col("dst"), col("_d").cast("date").as("etime"))
    Graph.temporalReach(e, seeds.toDF("seed"), iterations)
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString).toMap
  }

  test("temporal reach: a path backwards in time does not flow; " +
    "forward and equal-time paths do") {
    // 1->2 ships day 5, 2->3 ships day 3: the route EXISTS but
    // nothing could have flowed along it — node 3 must be absent
    val back = reachOf(Seq(
      (1L, 2L, "1995-01-05"), (2L, 3L, "1995-01-03")), Seq(1L))
    assert(back == Map(1L -> "1992-01-01", 2L -> "1995-01-05"),
      s"got $back")
    // forward ordering flows; equal times qualify (t >= arrive)
    val fwd = reachOf(Seq(
      (1L, 2L, "1995-01-03"), (2L, 3L, "1995-01-03")), Seq(1L))
    assert(fwd(3L) == "1995-01-03", s"got $fwd")
  }

  test("temporal reach: differential vs a driver-side relaxation " +
    "replay on seeded random timed edges") {
    // the frame recurrence replayed in plain Scala: per round, every
    // qualifying edge proposes its activation date, MIN per node —
    // ISO strings compare in date order, so the replay needs no
    // calendar arithmetic
    val rnd = new scala.util.Random(7L)
    val nodes = (1L to 20L).toVector
    val edges = (1 to 50).map { _ =>
      (nodes(rnd.nextInt(20)), nodes(rnd.nextInt(20)),
        f"1995-01-${rnd.nextInt(28) + 1}%02d")
    }.filter(e => e._1 != e._2).distinct
    val seeds = Seq(1L, 2L)
    val iters = 4
    var reach = seeds.map(_ -> "1992-01-01").toMap
    for (_ <- 1 to iters) {
      val cands = for {
        (v, w, t) <- edges
        av <- reach.get(v)
        if t >= av
      } yield (w, t)
      reach = (reach.toSeq ++ cands).groupBy(_._1)
        .map { case (n, ts) => n -> ts.map(_._2).min }
    }
    val got = reachOf(edges, seeds, iters)
    assert(got == reach,
      s"differential mismatch:\n got      $got\n expected $reach")
  }

  test("temporal reach: a later two-hop route can beat an early " +
    "direct edge; relaxation converges downward") {
    // direct 1->2 at day 10 vs 1->3 at day 2 then 3->2 at day 4:
    // the two-hop TEMPORAL route arrives day 4
    val got = reachOf(Seq(
      (1L, 2L, "1995-01-10"), (1L, 3L, "1995-01-02"),
      (3L, 2L, "1995-01-04")), Seq(1L))
    assert(got(2L) == "1995-01-04" && got(3L) == "1995-01-02",
      s"got $got")
  }

  test("pagerank convergence: a symmetric cycle is the fixed point " +
    "at round 1; a dangling star converges by round 3") {
    // 2-cycle: the uniform seed IS the stationary vector, so every
    // round moves nothing and mass stays a full 1e9
    val cyc = Graph.pageRankConvergence(
        Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(cyc == Map(1L -> ((0L, 0L, 1000000000L)),
      2L -> ((0L, 0L, 1000000000L)), 3L -> ((0L, 0L, 1000000000L))),
      s"cycle: $cyc")
    // 1->{2,3}: hand-traced — round 1 moves 0.5666…, round 2 the
    // echo of node 1's collapse, round 3 NOTHING (converged); mass
    // shrinks to 192.5e6 (the documented dangling shave: 2 and 3
    // have no out-edges)
    val star = Graph.pageRankConvergence(
        Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(star(1L) == ((566666667L, 283333333L, 433333332L)),
      s"star r1: $star")
    assert(star(2L) == ((240833332L, 120416666L, 192500000L)),
      s"star r2: $star")
    assert(star(3L) == ((0L, 0L, 192500000L)), s"star r3: $star")
  }

  test("assortativity: a star is perfectly disassortative, " +
    "uniform degrees read NULL") {
    // K1,4: every edge connects the max degree to the min degree, so
    // endpoint degrees are perfectly anti-correlated -> r = -1 exact
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val s = Graph.assortativity(star).collect()
    assert(s.length == 1 && s(0).getLong(0) == 8L &&
      s(0).getDouble(1) == -1.0, s"star: ${s.toSeq}")
    // 4-cycle: all degrees 2 -> zero variance -> NULL, never NaN
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val c = Graph.assortativity(cycle).collect()
    assert(c.length == 1 && c(0).isNullAt(1), s"cycle: ${c.toSeq}")
  }

  test("k-core: tail peels off, the triangle core survives with " +
    "its induced degrees") {
    // triangle {1,2,3} + tail 3-4: at k=2 the tail node (degree 1)
    // peels in round 1, node 3's degree drops 3 -> 2, and the
    // triangle stands as the 2-core with degrees (2,2,2)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.kCore(g, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $got")
    // at k=3 nothing survives
    assert(Graph.kCore(g, k = 3, rounds = 4).collect().isEmpty)
  }

  test("k-core: peeling cascades; the round bound truncates it") {
    // path 1-2-3-4-5 at k=2: endpoints peel, then THEIR neighbors
    // lose support, then the middle — full convergence needs 3
    // rounds and leaves nothing
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    assert(Graph.kCore(path, k = 2, rounds = 4).collect().isEmpty)
    // rounds=1 stops after the first peel: {2,3,4} remain with their
    // induced path degrees — the documented bounded-peel contract
    val one = Graph.kCore(path, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(2L -> 1L, 3L -> 2L, 4L -> 1L), s"got $one")
  }

  test("betweenness: differential vs a driver-side Brandes replay " +
    "on a seeded random digraph") {
    // the joins-and-windows implementation must equal a plain-Scala
    // replay of the exact recurrence — BFS levels, level-synchronous
    // sigma sums, backward delta with the same truncating division —
    // on a graph with diamonds, cycles, and unreachable pockets
    val rnd = new scala.util.Random(20260814L)
    val nodes = (1L to 25L).toVector
    val edges = (1 to 70).map { _ =>
      (nodes(rnd.nextInt(25)), nodes(rnd.nextInt(25)))
    }.filter(e => e._1 != e._2).distinct
    val seeds = Set(1L, 2L, 3L)
    val iters = 4
    // ---- reference replay ----
    val adj = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).toSet }
    val acc = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    val srcs = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for (s <- seeds) {
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Set(s)
      for (d <- 1 to iters) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        next.foreach(w => dist(w) = d)
        frontier = next
      }
      val sigma = scala.collection.mutable.Map(s -> 1L)
      for (l <- 1 to iters; w <- dist.collect {
          case (n, `l`) => n }) {
        sigma(w) = edges.collect {
          case (u, v) if v == w && dist.get(u).contains(l - 1) =>
            sigma(u)
        }.sum
      }
      val delta = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for (l <- (iters - 1) to 0 by -1; v <- dist.collect {
          case (n, `l`) => n }) {
        delta(v) = edges.collect {
          case (u, w) if u == v && dist.get(w).contains(l + 1) =>
            sigma(v) * (1000000000L + delta(w)) / sigma(w)
        }.sum
      }
      for ((v, _) <- dist if v != s) {
        acc(v) += delta(v); srcs(v) += 1L
      }
    }
    val expected = srcs.keys.map(v => v -> ((srcs(v), acc(v)))).toMap
    // ---- the operator ----
    val got = Graph.betweennessCentrality(edges.toDF("src", "dst"),
        seeds.toSeq.toDF("seed"), iters)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected,
      s"differential mismatch:\n got      $got\n expected $expected")
  }

  test("betweenness: the hop horizon truncates deep dependencies") {
    // 5-chain at iterations=2: only nodes within 2 hops exist, and
    // node 2's delta sees only the truncated subtree (1e9 + delta(3)
    // with delta(3) = 0 at the horizon)
    val got = betweennessOf(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L),
      iterations = 2)
    assert(got == Map(2L -> 1000000000L, 3L -> 0L), s"got $got")
  }

  private def modularityOf(edges: Seq[(Long, Long)],
                           labels: Seq[(Long, Long)]) =
    Graph.modularity(edges.toDF("src", "dst"),
        labels.toDF("node", "community"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap

  test("modularity: two triangles with a bridge, perfect split") {
    // m=7; each triangle: e_c=3, d_c=7 (bridge endpoint has degree 3)
    // q_in  = 3e9 div 7   = 428571428
    // q_deg = 49e9 div 196 = 250000000  -> term 178571428, Q sums both
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val lab = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L)
    val got = modularityOf(tri, lab)
    val term = (3L, 3L, 7L, 178571428L, 357142856L)
    assert(got == Map(1L -> term, 4L -> term), s"got $got")
  }

  test("modularity: the whole graph as one community scores exactly 0") {
    // e_c=m and d_c=2m: 1e9 - (4m^2*1e9 div 4m^2) = 0 — the classic
    // null-partition property, exact in fixed point
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val lab = Seq(1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 9L)
    val got = modularityOf(tri, lab)
    assert(got == Map(9L -> ((4L, 4L, 8L, 0L, 0L))), s"got $got")
  }

  test("modularity: singleton communities pay the pure degree penalty") {
    // path 1-2-3, m=2, 4m^2=16: e_c=0 everywhere, terms are
    // -(d^2*1e9 div 16): -62500000 for the endpoints, -250000000 for
    // the middle; Q = -375000000
    val got = modularityOf(Seq((1L, 2L), (2L, 3L)),
      Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(got == Map(
      1L -> ((1L, 0L, 1L, -62500000L, -375000000L)),
      2L -> ((1L, 0L, 2L, -250000000L, -375000000L)),
      3L -> ((1L, 0L, 1L, -62500000L, -375000000L))), s"got $got")
  }

  test("modularity: parallel and reversed edges collapse to one " +
    "undirected edge") {
    // (1,2), (2,1), (1,2) is ONE edge: m=1, degrees 1 — labels split
    // -> e_c=0, terms -(1e9 div 4) = -250000000
    val got = modularityOf(Seq((1L, 2L), (2L, 1L), (1L, 2L)),
      Seq(1L -> 1L, 2L -> 2L))
    assert(got == Map(
      1L -> ((1L, 0L, 1L, -250000000L, -500000000L)),
      2L -> ((1L, 0L, 1L, -250000000L, -500000000L))), s"got $got")
  }

  private def refineOf(edges: Seq[(Long, Long)],
                       labels: Seq[(Long, Long)]) =
    Graph.modularityRefine(edges.toDF("src", "dst"),
        labels.toDF("node", "community"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("refine: a misassigned node rejoins its triangle, and Q rises") {
    // two triangles + bridge, node 3 mislabeled into B: score(3->A) =
    // 2*7*2 - 3*4 = 16 beats stay = 2*7*1 - 3*(10-3) = -7; every
    // other node's best is its own community. One sweep restores the
    // perfect split
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val bad = Seq(1L -> 1L, 2L -> 1L, 3L -> 4L,
      4L -> 4L, 5L -> 4L, 6L -> 4L)
    val got = refineOf(tri, bad)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"got $got")
    def q(lab: Seq[(Long, Long)]) =
      Graph.modularity(tri.toDF("src", "dst"),
          lab.toDF("node", "community"))
        .select("modularity_e9").head().getLong(0)
    assert(q(bad) == 122448979L && q(got.toSeq) == 357142856L,
      "the sweep must raise Q: 122448979 -> 357142856")
  }

  test("refine: an optimal partition is a fixed point") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val good = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L)
    assert(refineOf(tri, good) == good.toMap)
  }

  test("modularity + refine: differential vs a driver-side replay " +
    "on a seeded random graph with a random partition") {
    // both operators must equal a plain-Scala replay of the exact
    // arithmetic — BigInt truncating division for the Q terms, the
    // exact 2m·k − k_v·d' comparator for the sweep — on a messy
    // graph (parallel/reversed edges, skewed random communities)
    val rnd = new scala.util.Random(20260815L)
    val nodes = (1L to 20L).toVector
    val edges = (1 to 60).map { _ =>
      (nodes(rnd.nextInt(20)), nodes(rnd.nextInt(20)))
    }.filter(e => e._1 != e._2)
    val labels = nodes.map(n => n -> (100L + (rnd.nextInt(4): Long)))
    val comm = labels.toMap
    // ---- reference replay ----
    val und = edges.map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val m = und.size.toLong
    val deg = (und.map(_._1) ++ und.map(_._2))
      .groupBy(identity).map { case (n, l) => n -> l.size.toLong }
    val cs = deg.keys.toSeq.groupBy(comm)
    val eC = und.groupBy(p => comm(p._1))
      .map { case (c, ps) => c -> ps.count(p => comm(p._2) == c).toLong }
      .withDefaultValue(0L)
    val dC = cs.map { case (c, ns) => c -> ns.map(deg).sum }
    def trunc(num: BigInt, den: BigInt): Long = (num / den).toLong
    val qTerm = cs.keys.map { c =>
      c -> (trunc(BigInt(eC(c)) * 1000000000L, m) -
        trunc(BigInt(dC(c)) * dC(c) * 1000000000L, BigInt(4) * m * m))
    }.toMap
    val qTot = qTerm.values.sum
    val expMod = cs.map { case (c, ns) =>
      c -> ((ns.size.toLong, eC(c), dC(c), qTerm(c), qTot)) }
    val gotMod = modularityOf(edges, labels)
    assert(gotMod == expMod,
      s"modularity mismatch:\n got      $gotMod\n expected $expMod")
    // ---- refine replay ----
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, ps) => n -> ps.map(_._2) }
    val newLab = deg.keys.map { v =>
      val own = comm(v)
      val kv = adj(v).groupBy(comm)
        .map { case (c, ns) => c -> ns.size.toLong }
        .withDefaultValue(0L)
      def score(c: Long): Long =
        2L * m * kv(c) - deg(v) *
          (dC(c) - (if (c == own) deg(v) else 0L))
      val cands = (kv.keys.toSet + own).toSeq
      val best = cands.minBy(c => (-score(c), c))
      v -> (if (score(best) > score(own)) best else own)
    }.toMap
    val sizes = newLab.values.groupBy(identity)
      .map { case (c, l) => c -> l.size.toLong }
    val expRef = newLab.map { case (v, c) => v -> ((c, sizes(c))) }
    val gotRef = Graph.modularityRefine(edges.toDF("src", "dst"),
        labels.toDF("node", "community"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotRef == expRef,
      s"refine mismatch:\n got      $gotRef\n expected $expRef")
  }

  private def trussOf(edges: Seq[(Long, Long)], k: Int,
                      rounds: Int = 2) =
    Graph.kTruss(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("ktruss: a pendant edge is peeled, the triangle survives") {
    // triangle 1-2-3 plus pendant 3-4 at k=3: the pendant has support
    // 0 and drops round 1; every triangle edge keeps support 1
    val got = trussOf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), 3)
    assert(got == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L),
      s"got $got")
  }

  test("ktruss: K4 is a 4-truss — every edge keeps support 2") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val got = trussOf(k4, 4)
    assert(got == k4.map(e => e -> 2L).toMap, s"got $got")
  }

  test("ktruss: cascade — two triangles sharing an edge dissolve " +
    "at k=4") {
    // outer edges have support 1 < 2 and drop round 1; the shared
    // edge (2,3) survives round 1 (support 2) but is alone in round
    // 2 (support 0) and drops — the peel CASCADES
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(trussOf(bowtie, 4).isEmpty)
  }

  test("ktruss: the round budget truncates the fixpoint honestly") {
    // same bowtie at rounds=1: the shared edge survives the single
    // round and reports its FINAL-graph support 0 — below k-2, the
    // documented bounded contract
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = trussOf(bowtie, 4, rounds = 1)
    assert(got == Map((2L, 3L) -> 0L), s"got $got")
  }

  test("refine: simultaneous moves are the documented contract — " +
    "adjacent singletons can swap") {
    // path 1-2-3 with singleton labels: node 2 moves to community 1
    // (tie with 3, smallest wins) while 1 and 3 simultaneously move
    // to community 2 — each decision optimal against the FROZEN
    // input, applied synchronously
    val got = refineOf(Seq((1L, 2L), (2L, 3L)),
      Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L), s"got $got")
  }

  // ---- x69: bounded strongly connected components ----

  private def sccOf(edges: Seq[(Long, Long)], hops: Int = 4)
      : Map[Long, (Long, Long)] =
    Graph.stronglyConnected(edges.toDF("src", "dst"), hops)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("scc: a cycle with a tail — the ring confirms, the tail is " +
    "reachable but not mutual and stays silent") {
    val got = sccOf(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(got == Map(1L -> ((1L, 3L)), 2L -> ((1L, 3L)),
      3L -> ((1L, 3L))), s"got $got")
  }

  test("scc: disjoint rings get their own ids; a pure DAG reports " +
    "only singleton roots") {
    val rings = sccOf(Seq((1L, 2L), (2L, 1L), (5L, 6L), (6L, 5L)))
    assert(rings == Map(1L -> ((1L, 2L)), 2L -> ((1L, 2L)),
      5L -> ((5L, 2L)), 6L -> ((5L, 2L))), s"got $rings")
    val dag = sccOf(Seq((1L, 2L), (2L, 3L)))
    assert(dag == Map(1L -> ((1L, 1L))),
      s"non-root DAG nodes are unresolved, not claimed: $dag")
  }

  test("scc: the hop horizon truncates honestly — a 6-ring confirms " +
    "only its root at hops=2 and the whole ring at hops=6") {
    val ring6 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 1L))
    val short = sccOf(ring6, hops = 2)
    assert(short == Map(1L -> ((1L, 1L))), s"got $short")
    val full = sccOf(ring6, hops = 6)
    assert(full.keySet == (1L to 6L).toSet &&
      full.values.forall(_ == ((1L, 6L))), s"got $full")
  }

  test("scc: a color root OUTSIDE the ring suppresses it — the " +
    "documented first-round contract") {
    // 0 -> 1 <-> 2: both ring members take color 0, whose root is
    // not in their SCC; round one reports only the singleton root
    val got = sccOf(Seq((0L, 1L), (1L, 2L), (2L, 1L)))
    assert(got == Map(0L -> ((0L, 1L))), s"got $got")
  }

  // ---- x71: iterative-peel SCC ----

  private def sccPeelOf(edges: Seq[(Long, Long)], hops: Int = 4,
                        peelRounds: Int = 3)
      : Map[Long, (Long, Long, Int)] =
    Graph.stronglyConnectedPeel(edges.toDF("src", "dst"), hops,
        peelRounds)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getInt(3)))).toMap

  test("scc peel: the ring the single round misses — external color " +
    "root peels away and the ring confirms in round 2") {
    // exactly the x69 suppression case above: round 1 confirms only
    // root 0, the peel removes it, round 2 recolors the ring to its
    // own min member and confirms it
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L))
    val got = sccPeelOf(edges)
    assert(got == Map(0L -> ((0L, 1L, 1)),
      1L -> ((1L, 2L, 2)), 2L -> ((1L, 2L, 2))), s"got $got")
  }

  test("scc peel: layered shadowing resolves one ring per round") {
    // 0 -> {1<->2} -> {5<->6}: round 1 confirms 0, round 2 ring A
    // (still shadowing ring B through 2 -> 5), round 3 ring B
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L),
      (2L, 5L), (5L, 6L), (6L, 5L))
    val got = sccPeelOf(edges)
    assert(got == Map(0L -> ((0L, 1L, 1)),
      1L -> ((1L, 2L, 2)), 2L -> ((1L, 2L, 2)),
      5L -> ((5L, 2L, 3)), 6L -> ((5L, 2L, 3))), s"got $got")
  }

  test("scc + peel soundness: on random digraphs every reported " +
    "membership is a TRUE SCC membership — the bounded contract's " +
    "no-false-positives half, replayed") {
    // the horizon trades completeness, never correctness: verify
    // against an exact plain-Scala transitive closure that every
    // reported (node, scc) group is mutually reachable in the TRUE
    // graph, and that groups sharing an id are exactly co-SCC
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val edges = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      // exact reachability closure
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var reach = edges.toSet
      var grew = true
      while (grew) {
        val next = reach ++ (for {
          (a, b) <- reach; (c, d) <- reach if b == c
        } yield (a, d))
        grew = next.size > reach.size
        reach = next
      }
      def coScc(u: Long, v: Long): Boolean =
        u == v || (reach((u, v)) && reach((v, u)))
      for (result <- Seq(
          sccOf(edges).map { case (k, (id, _)) => k -> id },
          sccPeelOf(edges).map { case (k, (id, _, _)) => k -> id })) {
        result.foreach { case (node, id) =>
          assert(coScc(node, id),
            s"trial $trial: reported ($node, $id) is not co-SCC")
        }
        // members reported under the same id must be pairwise co-SCC
        result.groupBy(_._2).values.foreach { grp =>
          val ms = grp.keys.toSeq
          for (a <- ms; b <- ms)
            assert(coScc(a, b), s"trial $trial: $a,$b share an id")
        }
      }
    }
  }

  test("scc peel: first round matches x69 exactly, and an exhausted " +
    "remainder exits early instead of running empty rounds") {
    // the x69 tail case fully confirms in round 1; rounds 2-3 would
    // run on an emptied graph and must not throw (the reduce over
    // per-round frames still has its round-1 entry)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val got = sccPeelOf(edges)
    val base = sccOf(edges)
    val round1 = got.collect {
      case (n, (id, sz, _)) if base.contains(n) => n -> ((id, sz))
    }
    assert(round1 == base, s"got $got vs $base")
    // the tail node 4 is no root's member in round 1 but becomes its
    // own singleton root once the ring peels
    assert(got(4L) == ((4L, 1L, 2)), s"got $got")
  }

  // ---- x70: directed triad census ----

  private def censusOf(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long, Long)] =
    Graph.triadCensus(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap

  test("triads: a pure cycle counts once per node and is no FFL; a " +
    "pure FFL assigns the three roles and is no cycle") {
    val cyc = censusOf(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(cyc == Map(1L -> ((1L, 0L, 0L, 0L)), 2L -> ((1L, 0L, 0L, 0L)),
      3L -> ((1L, 0L, 0L, 0L))), s"got $cyc")
    val ffl = censusOf(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(ffl == Map(1L -> ((0L, 1L, 0L, 0L)), 2L -> ((0L, 0L, 1L, 0L)),
      3L -> ((0L, 0L, 0L, 1L))), s"got $ffl")
  }

  test("triads: a chorded cycle is BOTH motifs — instances count " +
    "independently") {
    val got = censusOf(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)))
    assert(got == Map(1L -> ((1L, 1L, 0L, 0L)), 2L -> ((1L, 0L, 1L, 0L)),
      3L -> ((1L, 0L, 0L, 1L))), s"got $got")
  }

  test("triads: full reciprocal triangle — both cycle rotations and " +
    "every ordered FFL") {
    val arcs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 1L), (1L, 3L))
    val got = censusOf(arcs)
    // two distinct cycles (1→2→3→1 and 1→3→2→1); all 6 ordered
    // triples are FFLs, so each node plays each role twice
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_ == ((2L, 2L, 2L, 2L))), s"got $got")
  }

  test("triads: the middle role counts only closed wedges") {
    // b relays a1→b→c and a2→b→c, but only a1→c closes
    val got = censusOf(Seq((10L, 5L), (11L, 5L), (5L, 7L), (10L, 7L)))
    assert(got == Map(10L -> ((0L, 1L, 0L, 0L)),
      5L -> ((0L, 0L, 1L, 0L)), 7L -> ((0L, 0L, 0L, 1L))), s"got $got")
  }

  // ---- x66: deterministic random walks ----

  private def walksOf(edges: Seq[(Long, Long)], seeds: Seq[Long],
                      steps: Int, cap: Int = 64)
      : Map[(Long, Long), Long] =
    Graph.randomWalks(edges.toDF("src", "dst"),
        seeds.toDF("seed"), steps, cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("walks: cap=1 forces the smallest-id neighbor — a fully " +
    "hand-traceable path") {
    // pick = hash % 1 + 1 = 1 at every step, so the walk greedily
    // follows the smallest out-neighbor: 1 -> 2 -> 4 -> 8
    val edges = Seq((1L, 3L), (1L, 2L), (2L, 5L), (2L, 4L), (4L, 8L))
    val got = walksOf(edges, Seq(1L), steps = 3, cap = 1)
    assert(got == Map((1L, 0L) -> 1L, (1L, 1L) -> 2L,
      (1L, 2L) -> 4L, (1L, 3L) -> 8L), s"got $got")
  }

  test("walks: dead ends terminate, never pad or self-loop") {
    // 1 -> 2 and nothing out of 2: the walk has steps 0 and 1 only
    val got = walksOf(Seq((1L, 2L)), Seq(1L), steps = 4, cap = 1)
    assert(got == Map((1L, 0L) -> 1L, (1L, 1L) -> 2L), s"got $got")
  }

  test("walks: reproducible, and every step follows a real edge") {
    val rnd = new scala.util.Random(20260815L)
    val edges = Seq.fill(300)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val seeds = Seq(0L, 7L, 13L, 21L, 33L)
    val a = walksOf(edges, seeds, steps = 4)
    val b = walksOf(edges, seeds, steps = 4)
    assert(a == b, "hash-seeded walks must be byte-reproducible")
    val edgeSet = edges.toSet
    for (w <- seeds) {
      assert(a((w, 0L)) == w, "step 0 is the seed")
      var s = 1L
      while (a.contains((w, s))) {
        assert(edgeSet.contains((a((w, s - 1)), a((w, s)))),
          s"walk $w step $s does not follow an edge")
        s += 1
      }
    }
  }

  test("walks: differential vs a driver-side replay with the real " +
    "md5 lane — every pick, every dead end, both caps") {
    def h64(s: String): Long =
      graft.functions.Md5Lane.lane(s.getBytes("UTF-8"), 0, 7)
    val rnd = new scala.util.Random(20260815L)
    val edges = Seq.fill(400)(
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val seeds = Seq(0L, 3L, 9L, 17L, 29L)
    for (cap <- Seq(3, 64)) {
      val adj = edges.groupBy(_._1)
        .map { case (s, es) => s -> es.map(_._2).sorted.take(cap) }
      val expected = scala.collection.mutable.Map.empty[(Long, Long), Long]
      for (w <- seeds) {
        var node = w
        expected((w, 0L)) = w
        var s = 1
        var alive = true
        while (s <= 4 && alive) {
          adj.get(node).filter(_.nonEmpty) match {
            case Some(nbrs) =>
              node = nbrs((h64(s"$w|$s|$node") % nbrs.size).toInt)
              expected((w, s.toLong)) = node
            case None => alive = false
          }
          s += 1
        }
      }
      val got = walksOf(edges, seeds, steps = 4, cap = cap)
      assert(got == expected.toMap, s"cap=$cap: got $got\nexp $expected")
    }
  }

  test("walks: distinct seeds diverge (the hash keys on walk id)") {
    // a 4-regular-ish graph where every node has several choices: two
    // walks from different seeds on the same node set should not be
    // shifted copies of each other
    val edges = (0L until 20L).flatMap(i =>
      Seq(1L, 3L, 7L, 11L).map(d => (i, (i + d) % 20L)))
    val got = walksOf(edges, Seq(0L, 10L), steps = 4)
    val path0 = (0L to 4L).map(s => got((0L, s)))
    val path10 = (0L to 4L).map(s => got((10L, s)))
    assert(path0.head == 0L && path10.head == 10L)
    assert(path0.map(n => (n + 10L) % 20L) != path10,
      "walks from different seeds must use independent hash draws")
  }

  // ---- x72: skip-gram pairs over a walk corpus ----

  private def sgOf(walks: Seq[(Long, Long, Long)], window: Int = 2)
      : Map[(Long, Long), Long] =
    Graph.skipGramPairs(walks.toDF("walk_id", "step", "node_id"),
        window)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("skip-gram: window-2 pairs of a 3-node walk, both directions, " +
    "never a same-position self-pair") {
    val walk = Seq((0L, 0L, 10L), (0L, 1L, 11L), (0L, 2L, 12L))
    val got = sgOf(walk)
    assert(got == Map((10L, 11L) -> 1L, (10L, 12L) -> 1L,
      (11L, 10L) -> 1L, (11L, 12L) -> 1L,
      (12L, 10L) -> 1L, (12L, 11L) -> 1L), s"got $got")
    // window 1 drops the distance-2 pairs
    val w1 = sgOf(walk, window = 1)
    assert(w1 == Map((10L, 11L) -> 1L, (11L, 10L) -> 1L,
      (11L, 12L) -> 1L, (12L, 11L) -> 1L), s"got $w1")
  }

  test("skip-gram: a revisited node co-occurs with itself across " +
    "positions, and counts aggregate across walks") {
    // walk A = [5,6,5]: (5,6)x2, (6,5)x2, (5,5)x2 (positions 0<->2);
    // walk B = [5,6]: one more (5,6) and (6,5)
    val got = sgOf(Seq((0L, 0L, 5L), (0L, 1L, 6L), (0L, 2L, 5L),
      (1L, 0L, 5L), (1L, 1L, 6L)))
    assert(got == Map((5L, 6L) -> 3L, (6L, 5L) -> 3L,
      (5L, 5L) -> 2L), s"got $got")
  }

  test("skip-gram: end-to-end differential over REAL hash-seeded " +
    "walks — corpus generation and pair extraction replayed together") {
    def h64(s: String): Long =
      graft.functions.Md5Lane.lane(s.getBytes("UTF-8"), 0, 7)
    val rnd = new scala.util.Random(20260815L)
    val edges = Seq.fill(300)(
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).distinct
    val seeds = Seq(0L, 5L, 11L, 19L)
    val cap = 64
    // replay the walk generator (the x66 contract) ...
    val adj = edges.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).sorted.take(cap) }
    val walks = seeds.map { w =>
      var node = w
      val path = scala.collection.mutable.ArrayBuffer(w)
      var s = 1
      var alive = true
      while (s <= 4 && alive) {
        adj.get(node).filter(_.nonEmpty) match {
          case Some(nbrs) =>
            node = nbrs((h64(s"$w|$s|$node") % nbrs.size).toInt)
            path += node
          case None => alive = false
        }
        s += 1
      }
      path.toSeq
    }
    // ... then the window-2 pair extraction over the replayed corpus
    val expected = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for (p <- walks; i <- p.indices; j <- p.indices
         if i != j && math.abs(i - j) <= 2)
      expected((p(i), p(j))) += 1L
    val seedsDf = seeds.toDF("seed")
    val got = Graph.skipGramPairs(
        Graph.randomWalks(edges.toDF("src", "dst"), seedsDf, steps = 4,
          maxDegree = cap), window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == expected.toMap, s"got $got\nexp $expected")
  }

  test("skip-gram: pairs never cross walk boundaries") {
    val got = sgOf(Seq((0L, 0L, 1L), (0L, 1L, 2L),
      (7L, 0L, 3L), (7L, 1L, 4L)))
    assert(!got.contains((2L, 3L)) && !got.contains((1L, 3L)),
      s"walk 0 and walk 7 must not co-occur: $got")
    assert(got == Map((1L, 2L) -> 1L, (2L, 1L) -> 1L,
      (3L, 4L) -> 1L, (4L, 3L) -> 1L), s"got $got")
  }

  // ---- x67: link prediction ----

  private def lpOf(edges: Seq[(Long, Long)], minCommon: Int = 2,
                   cap: Int = 64, topN: Int = 100)
      : Map[(Long, Long), (Long, Double)] =
    Graph.linkPrediction(edges.toDF("src", "dst"), minCommon, cap,
        topN)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap

  private def aaTerm(deg: Long): BigDecimal = {
    val l = BigDecimal(math.log(deg.toDouble))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    BigDecimal(1.0 / l.toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
  }

  test("link prediction: K(2,2) — both diagonals score 2/ln(2), " +
    "linked pairs are excluded") {
    // 1,2 each connected to 3,4: the unlinked pairs are (1,2) with
    // witnesses {3,4} and (3,4) with witnesses {1,2}; every witness
    // has degree 2
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val got = lpOf(edges)
    val expected = (aaTerm(2L) * 2).toDouble
    assert(got.keySet == Set((1L, 2L), (3L, 4L)), s"got $got")
    assert(got((1L, 2L)) == ((2L, expected)), s"got $got")
    assert(got((3L, 4L)) == ((2L, expected)), s"got $got")
  }

  test("link prediction: minCommon filters single-witness pairs; " +
    "hub witnesses are damped below low-degree ones") {
    // path 1-2-3: (1,3) has ONE witness -> filtered at minCommon=2,
    // reported at minCommon=1 with the witness's true degree 2
    val path = Seq((1L, 2L), (2L, 3L))
    assert(lpOf(path).isEmpty)
    val one = lpOf(path, minCommon = 1)
    assert(one.keySet == Set((1L, 3L)))
    assert(one((1L, 3L)) == ((1L, aaTerm(2L).toDouble)))
    // two witness paths, one through a degree-2 node and one through
    // a degree-4 hub: the hub's term is strictly smaller
    val hubEdges = Seq((1L, 2L), (2L, 3L), // witness 2: degree 2
      (1L, 9L), (9L, 3L), (9L, 5L), (9L, 6L)) // witness 9: degree 4
    val two = lpOf(hubEdges, minCommon = 1)
    assert(two((1L, 3L))._1 == 2L)
    val exp = (aaTerm(2L) + aaTerm(4L)).toDouble
    assert(math.abs(two((1L, 3L))._2 - exp) < 1e-12, s"got $two")
    assert(aaTerm(4L) < aaTerm(2L))
  }

  test("link prediction: the degree cap bounds pair fan-out — " +
    "neighbors beyond the cap witness nothing") {
    // star: 9 connected to 1,2,3; cap=2 keeps witnesses {1,2} only,
    // so (1,3)/(2,3) are never candidates but (1,2) still is
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L))
    val got = lpOf(star, minCommon = 1, cap = 2)
    assert(got.keySet == Set((1L, 2L)), s"got $got")
    // degrees stay UNCAPPED: the witness's damping uses deg(9) = 3
    assert(got((1L, 2L)) == ((1L, aaTerm(3L).toDouble)), s"got $got")
  }

  test("link prediction: the cap-contract boundary — a hub at " +
    "exactly cap witnesses every pair, at cap+1 the id-highest " +
    "neighbor drops out") {
    // the r15 cap turn (32 -> 16) changed which pairs >cap hubs
    // witness; this pins the boundary so future tuning stays honest.
    // Expected sets come from replaying the contract: witnesses are
    // the cap id-LOWEST neighbors, degrees stay uncapped.
    val cap = 4
    def star(n: Int) = (1 to n).map(i => (9L, i.toLong))
    def expectedPairs(n: Int): Set[(Long, Long)] = {
      val witnessed = (1 to n).map(_.toLong).sorted.take(cap)
      (for { u <- witnessed; v <- witnessed if u < v } yield (u, v)).toSet
    }
    // exactly AT the cap: all C(4,2)=6 pairs, each damped by the
    // hub's true degree 4
    val at = lpOf(star(cap), minCommon = 1, cap = cap)
    assert(at.keySet == expectedPairs(cap), s"got $at")
    assert(at.values.forall(_ == ((1L, aaTerm(cap.toLong).toDouble))),
      s"got $at")
    // ONE past the cap: same 6 pairs (neighbor 5 witnesses nothing),
    // but the damping uses the UNCAPPED degree 5
    val past = lpOf(star(cap + 1), minCommon = 1, cap = cap)
    assert(past.keySet == expectedPairs(cap + 1), s"got $past")
    assert(past.keySet == expectedPairs(cap),
      "the witnessed-pair set must not grow past the cap")
    assert(past.values.forall(
      _ == ((1L, aaTerm((cap + 1).toLong).toDouble))), s"got $past")
  }

  test("link prediction: topN truncates on (score DESC, u, v)") {
    // two equal-score pairs (the K(2,2) diagonals): topN=1 keeps the
    // id-smaller pair
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val got = lpOf(edges, topN = 1)
    assert(got.keySet == Set((1L, 2L)), s"got $got")
  }

  // ---- x75: edge reciprocity ----

  private def recipOf(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long)] =
    Graph.reciprocity(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

  test("reciprocity: mutual pairs score 1e9, broadcast edges 0, a " +
    "mixed node the exact share") {
    // 1<->2 mutual; 1->3 and 1->4 broadcast; parallel duplicate of
    // 1->2 collapses before counting
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (1L, 2L))
    val got = recipOf(edges)
    assert(got == Map(
      1L -> ((3L, 1L, 333333333L)),
      2L -> ((1L, 1L, 1000000000L))), s"got $got")
    // a pure DAG is all-zero shares; a 2-ring is all-1e9
    assert(recipOf(Seq((1L, 2L), (2L, 3L))).values
      .forall(_._3 == 0L))
    assert(recipOf(Seq((5L, 6L), (6L, 5L))).values
      .forall(_._3 == 1000000000L))
  }

  // ---- x74: double-sweep diameter estimate ----

  private def diamOf(edges: Seq[(Long, Long)], hops: Int = 6)
      : Seq[(Long, Long, Long, Long, Long, Long, Long, Long)] =
    Graph.diameterEstimate(edges.toDF("src", "dst"), hops)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq

  test("diameter: exact on a path — both sweeps find the true " +
    "endpoints") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // start 1, farthest 5 at 4 hops; back-sweep from 5 reaches 1 at 4
    assert(diamOf(path) == Seq((1L, 5L, 4L, 5L, 1L, 4L, 5L, 4L)))
  }

  test("diameter: the horizon truncates honestly — a saturated ecc " +
    "(= hops) flags the bound as horizon-limited") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // hops=2: sweep 1 stops at node 3 (ecc 2 = hops, saturated);
    // sweep 2 from 3 sees the whole path but ties at dist 2 -> node 1
    assert(diamOf(path, hops = 2) ==
      Seq((1L, 3L, 2L, 3L, 1L, 2L, 5L, 2L)))
  }

  test("diameter: star ties break to the smaller id; empty graph " +
    "reports no row") {
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L))
    // from 1: {9:1, 2:2, 3:2} -> far node 2 (tie with 3), ecc 2;
    // back from 2: far node 1 (tie with 3), ecc 2
    assert(diamOf(star) == Seq((1L, 2L, 2L, 4L, 1L, 2L, 4L, 2L)))
    assert(diamOf(Seq.empty).isEmpty)
  }

  test("diameter: differential vs an exact BFS replay on random " +
    "digraphs — both sweeps' eccentricities and endpoints match") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 3) {
      val n = 10 + trial * 5
      val edges = Seq.fill(n * 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val und = (edges ++ edges.map(_.swap)).distinct
      val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      def bfs(s: Long, hops: Int): Map[Long, Long] = {
        var dist = Map(s -> 0L)
        var frontier = Seq(s)
        for (d <- 1 to hops) {
          frontier = frontier.flatMap(adj.getOrElse(_, Nil))
            .distinct.filterNot(dist.contains)
          dist ++= frontier.map(_ -> d.toLong)
        }
        dist
      }
      def far(dist: Map[Long, Long]): (Long, Long) = {
        val m = dist.values.max
        (dist.filter(_._2 == m).keys.min, m)
      }
      val hops = 4
      val start = und.map(_._1).min
      val d1 = bfs(start, hops)
      val (u, ecc1) = far(d1)
      val d2 = bfs(u, hops)
      val (v, ecc2) = far(d2)
      val got = diamOf(edges, hops)
      assert(got == Seq((start, u, ecc1, d1.size.toLong, v, ecc2,
        d2.size.toLong, math.max(ecc1, ecc2))),
        s"trial $trial: got $got expected " +
          s"($start,$u,$ecc1,${d1.size},$v,$ecc2,${d2.size})")
    }
  }

  // ---- x73: link-prediction holdout evaluation ----

  private def lphLane(u: Long, v: Long): Long =
    graft.functions.Md5Lane.lane(s"lph|$u|$v".getBytes("UTF-8"), 0, 7) % 10

  private def lpEvalOf(edges: Seq[(Long, Long)], holdoutMod: Int = 10)
      : Map[Int, (Long, Long, Long, Any)] =
    Graph.linkPredictionEval(edges.toDF("src", "dst"), holdoutMod)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) null else r.getLong(4))))
      .toMap

  test("linkpred eval: a held-out diagonal is recovered — hand-built " +
    "square whose one lane-0 edge is exactly the diagonal") {
    // search the md5 lane at spec time for ids that put ONLY the
    // diagonal (a, b) in the holdout; the remaining square trains the
    // predictor, which recovers (a, b) through its two witnesses
    val a = 1L
    val b = (2L to 500L).find(x => lphLane(a, x) == 0)
      .getOrElse(fail("no lane-0 partner found"))
    val ws = (2L to 500L).filter(w => w != b &&
      lphLane(math.min(a, w), math.max(a, w)) != 0 &&
      lphLane(math.min(w, b), math.max(w, b)) != 0)
    val (w1, w2) = (ws.head, ws(1))
    val edges = Seq((a, w1), (w1, b), (a, w2), (w2, b), (a, b))
    val got = lpEvalOf(edges)
    // one held edge, recovered at rank <= 2 (it ties with (w1, w2),
    // the other 2-witness unlinked pair): 1 hit at every k
    assert(got == Map(
      10 -> ((1L, 1L, 100000L, 1000000L)),
      50 -> ((1L, 1L, 20000L, 1000000L)),
      100 -> ((1L, 1L, 10000L, 1000000L))), s"got $got")
  }

  test("linkpred eval: the holdout is the md5 lane — n_held replays " +
    "exactly, hits are bounded and monotone in k") {
    val rnd = new scala.util.Random(20260815L)
    val edges = Seq.fill(300)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val canon = edges.map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val expHeld = canon.count(p => lphLane(p._1, p._2) == 0).toLong
    val got = lpEvalOf(edges)
    assert(got.keySet == Set(10, 50, 100), s"got $got")
    assert(got.values.forall(_._2 == expHeld),
      s"n_held must replay the lane: got $got exp $expHeld")
    val hitsByK = Seq(10, 50, 100).map(k => got(k)._1)
    assert(hitsByK.zip(hitsByK.tail).forall { case (x, y) => x <= y },
      s"hits must be monotone in k: $got")
    Seq(10, 50, 100).foreach { k =>
      val (h, held, p, r) = got(k)
      assert(h <= math.min(k.toLong, held), s"k=$k: $got")
      assert(p == h * 1000000L / k, s"precision arithmetic: $got")
      assert(r == h * 1000000L / held, s"recall arithmetic: $got")
    }
  }
}
