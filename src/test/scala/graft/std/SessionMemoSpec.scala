package graft.std

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Lifecycle contract of the session-scoped memos (VERDICT r8 items 2
  * + ADVICE: release path, stopped-session sweep, concurrent-first-call
  * pin leak).
  */
class SessionMemoSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = SparkTestSession.spark

  /** Every checkpoint RDD id reachable in the frame's logical plan. */
  private def checkpointRddIds(df: DataFrame): Seq[Int] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[Int]
    df.queryExecution.logical.foreach {
      case lr: LogicalRDD => b += lr.rdd.id
      case _              => ()
    }
    b.toSeq
  }

  private def persisted(id: Int): Boolean =
    spark.sparkContext.getPersistentRDDs.contains(id)

  test("release drops a session's entries and unpersists its pins") {
    val memo = new SessionMemo()
    val s2 = spark.newSession()
    val f = memo.getOrBuild(s2, "a")(
      Materialize.pinUnregistered(s2.range(3).toDF("x")))
    val ids = checkpointRddIds(f)
    assert(ids.nonEmpty && ids.forall(persisted), "pin not materialized")
    assert(memo.entryCount(s2) == 1)
    memo.release(s2)
    assert(memo.entryCount(s2) == 0)
    assert(ids.forall(!persisted(_)), "release left checkpoint blocks")
  }

  test("release frees a projection sitting on top of the checkpoint " +
       "(the d5 cluster-memo shape)") {
    val memo = new SessionMemo()
    val s2 = spark.newSession()
    val f = memo.getOrBuild(s2, "proj")(
      Materialize.pinUnregistered(s2.range(3).toDF("x"))
        .select(org.apache.spark.sql.functions.col("x")))
    val ids = checkpointRddIds(f)
    assert(ids.nonEmpty && ids.forall(persisted))
    memo.release(s2)
    assert(ids.forall(!persisted(_)),
      "releasePin must traverse past the Project to the LogicalRDD")
  }

  test("concurrent first calls build twice but keep one pin " +
       "(loser released, both callers get the winner)") {
    val memo = new SessionMemo()
    val s2 = spark.newSession()
    val gate = new java.util.concurrent.CountDownLatch(2)
    val built = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    def build(): DataFrame = {
      gate.countDown()
      // hold until BOTH threads are inside the builder — forces the
      // getOrElseUpdate-style race the memo must not leak on
      assert(gate.await(20, java.util.concurrent.TimeUnit.SECONDS))
      val f = Materialize.pinUnregistered(s2.range(5).toDF("x"))
      built.add(f); f
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[DataFrame] {
          def call(): DataFrame = memo.getOrBuild(s2, "race")(build())
        })
      }
      val res = futs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(built.size == 2, "latch should have forced a double build")
      assert(res(0) eq res(1), "both callers must converge on the winner")
      assert(memo.entryCount(s2) == 1)
      val loser = built.toArray(Array.empty[DataFrame])
        .find(f => !(f eq res(0))).get
      assert(checkpointRddIds(loser).forall(!persisted(_)),
        "losing builder's pin leaked")
      assert(checkpointRddIds(res(0)).forall(persisted),
        "winner's pin must survive")
    } finally pool.shutdown()
    memo.release(s2)
  }

  test("entries of a stopped session are swept on the next access") {
    val dead =
      new java.util.concurrent.atomic.AtomicReference[SparkSession](null)
    // injectable predicate: the suite's one local SparkContext can't be
    // stopped mid-run, so "stopped" is simulated; the sweep path under
    // test is identical
    val memo = new SessionMemo(stopped = s => s eq dead.get())
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val f1 = memo.getOrBuild(s1, "k")(
      Materialize.pinUnregistered(s1.range(3).toDF("x")))
    val ids = checkpointRddIds(f1)
    assert(memo.entryCount(s1) == 1)
    dead.set(s1)
    memo.getOrBuild(s2, "k")(
      Materialize.pinUnregistered(s2.range(3).toDF("x")))
    assert(memo.entryCount(s1) == 0, "stopped session's key not swept")
    assert(memo.entryCount(s2) == 1)
    assert(ids.forall(!persisted(_)),
      "sweep should release blocks (belt-and-braces for fake-stopped)")
    memo.release(s2)
  }

  test("SessionMemo.releaseSession frees the real memo sites " +
       "(cleanedShared + contamination profile)") {
    val sfDir = "/root/testdata/sf0.001"
    val s = spark.newSession()
    val cleaned = graft.queries.Merged.cleanedShared(s, sfDir)
    val profile = graft.ext.ExtQueries.decontamination(s, sfDir)
    val ids = checkpointRddIds(cleaned) ++ checkpointRddIds(profile)
    assert(ids.nonEmpty && ids.forall(persisted))
    // second call returns the same memoized frame, no second pin
    assert(graft.queries.Merged.cleanedShared(s, sfDir) eq cleaned)
    Materialize.releaseAll() // per-query pins from the builds
    SessionMemo.releaseSession(s)
    assert(ids.forall(!persisted(_)),
      "releaseSession left memoized checkpoint blocks")
    // a later call rebuilds rather than returning the dead frame
    val rebuilt = graft.queries.Merged.cleanedShared(s, sfDir)
    assert(!(rebuilt eq cleaned))
    assert(rebuilt.count() > 0)
    Materialize.releaseAll()
    SessionMemo.releaseSession(s)
  }
}
