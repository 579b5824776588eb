package graft.std

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Materialize-once barrier for diamond-shaped plans.
  *
  * A lazily-composed pipeline whose intermediate frame feeds N downstream
  * consumers (a self-join's two sides, a verify join plus a signature
  * aggregate, ...) re-executes the whole upstream subtree once per
  * consumer unless Spark happens to reuse the exchange — and exchange
  * reuse is fragile under AQE re-planning and alias divergence. For an
  * expensive upstream (regex normalization + shingling over a corpus)
  * that turns an 11 s query into a ~100 s one when the reuse doesn't
  * fire. Pinning the frame makes the cost deterministic: compute once,
  * read N times.
  *
  * Two mechanisms, selected by the session conf
  * `spark.graft.materialize.mode`:
  *
  *  - `local` (default): `localCheckpoint(eager)` — executor-local
  *    blocks, lineage truncated. Fastest on a single-node runner, but a
  *    lost executor is unrecoverable, so it is the LOCAL mode.
  *  - `disk`: `persist(DISK_ONLY)` + a materializing action — lineage is
  *    kept, so on a multi-executor cluster a lost executor's partitions
  *    recompute from source instead of failing the job. This is the
  *    cluster-safe mode (a parquet intermediate would additionally
  *    survive driver restarts; DISK_ONLY keeps the same API surface).
  *
  * Call sites only rely on the materialize-once contract, not on the
  * mechanism — `MaterializeModeSpec` proves the dedup pipeline emits
  * identical rows under both.
  *
  * Every pin is REGISTERED, and the per-query drivers ([[graft.Bench]],
  * [[graft.Verify]]) call [[releaseAll]] after each query's action:
  * without that, eagerly-stored blocks accumulate across a 60-query
  * session, the storage pool squeezes execution memory, and late
  * queries nondeterministically spill (round-3 bench: two identical
  * pipelines at 6 s and 69 s — the slow one ran last).
  */
object Materialize {

  private val pins = scala.collection.mutable.ListBuffer.empty[() => Unit]

  private def register(release: () => Unit): Unit =
    synchronized { pins += release }

  /** Compute `df` once and return a frame whose reads never re-execute
    * the upstream plan. The pin is held until [[releaseAll]].
    */
  def once(df: DataFrame): DataFrame = {
    val mode =
      df.sparkSession.conf.get("spark.graft.materialize.mode", "local")
    mode match {
      case "disk" =>
        val p = df.persist(StorageLevel.DISK_ONLY)
        p.count() // scan every partition so the cache is fully built
        register(() => { p.unpersist(false); () })
        p
      case _ =>
        val cp = df.localCheckpoint(true)
        register(() => releaseCheckpoint(cp))
        cp
    }
  }

  /** Drop the executor blocks behind a frame returned by
    * `localCheckpoint` — `Dataset.unpersist` only covers CacheManager
    * entries, so the checkpoint RDD must be unpersisted directly. After
    * release the frame is unusable (lineage was truncated); only call
    * once every consumer has run its action.
    */
  def releaseCheckpoint(cp: DataFrame): Unit =
    cp.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(false); ()
      case _              => ()
    }

  /** Release every pin registered since the last call. The per-query
    * harness calls this between queries; anything that must outlive a
    * query (e.g. the d5/d6/d7 shared-clusters memo) materializes with a
    * bare `localCheckpoint` instead of [[once]].
    */
  def releaseAll(): Unit = synchronized {
    pins.foreach(p => try p() catch { case _: Throwable => () })
    pins.clear()
  }

  /** Run `f` and release ONLY the pins it registered — the long-running
    *-process form of [[releaseAll]]: a streaming `foreachBatch` that
    * pins per micro-batch must not hold those blocks into the next
    * batch, and must not drop pins owned by unrelated queries on the
    * same session. Release happens after `f` returns, so every action
    * inside `f` (the micro-batch's write) must complete inside it.
    * Scopes assume one pinning pipeline at a time per JVM (same as the
    * Bench/Verify releaseAll contract); concurrently-pinning queries
    * would interleave registrations.
    */
  def scoped[T](f: => T): T = {
    val before = synchronized { pins.length }
    try f
    finally {
      // clamp: releaseAll() inside/alongside the scope can shrink the
      // list below the baseline — release nothing rather than throw
      // from a finally (which would mask f's result / kill a stream)
      val mine = synchronized {
        val from = math.min(before, pins.length)
        val s = pins.drop(from).toList
        pins.remove(from, pins.length - from)
        s
      }
      mine.foreach(p => try p() catch { case _: Throwable => () })
    }
  }

  /** Currently-held pin count (test hook). */
  private[graft] def pinCount: Int = synchronized { pins.length }
}
