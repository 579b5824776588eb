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
}
