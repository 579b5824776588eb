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
}
