package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bounded BFS: hand-traced hop sets, cycle termination, dead ends. */
class KhopSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chain: each hop reaches exactly one new node, then dries up") {
    // 1 -> 2 -> 3 -> 4 -> 5, seed 1, hops 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r = Graph.kHopReach(edges, Seq(1L).toDF("seed"), hops = 3)
      .collect().map(x => x.getInt(1) -> x.getLong(2)).toMap
    assert(r == Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("cycle: the visited anti-join terminates re-expansion") {
    // 1 -> 2 -> 3 -> 1: hop1 {2}, hop2 {3}, hop3 {} (1 already visited)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.kHopReach(edges, Seq(1L).toDF("seed"), hops = 3)
      .collect().map(x => x.getInt(1) -> x.getLong(2)).toMap
    assert(r == Map(1 -> 1L, 2 -> 1L, 3 -> 0L))
  }

  test("diamond: converging paths count a node once, at its shortest hop") {
    // 1 -> {2,3} -> 4: hop1 {2,3}, hop2 {4}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.kHopReach(edges, Seq(1L).toDF("seed"), hops = 2)
      .collect().map(x => x.getInt(1) -> x.getLong(2)).toMap
    assert(r == Map(1 -> 2L, 2 -> 1L))
  }

  test("multi-seed batching: isolated seeds report zeros; direction respected") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val r = Graph.kHopReach(edges, Seq(1L, 2L, 99L).toDF("seed"), hops = 2)
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getLong(2))
      .toMap
    assert(r((1L, 1)) == 1L && r((1L, 2)) == 0L)
    // node 2 has only IN-edges: reaches nothing
    assert(r((2L, 1)) == 0L && r((2L, 2)) == 0L)
    assert(r((99L, 1)) == 0L && r((99L, 2)) == 0L)
    assert(r.size == 6)
  }
}
