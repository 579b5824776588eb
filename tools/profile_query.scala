// Per-stage profiler for one declared query (guide §1.1 empirical loop,
// UI-less sandbox form): run the query with a stage-metrics listener and
// print every stage's wall time, task time, shuffle read/write bytes and
// record counts, plus the job descriptions — the "which stage is slow"
// readout the Spark UI would give.
//
//   SPARK_GRAFT_PROFILE_KEY=x58 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
//   /opt/spark/bin/spark-shell --master "local[32]" \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/profile_query.scala
{
  import org.apache.spark.scheduler._
  import scala.collection.mutable
  val key = sys.env.getOrElse("SPARK_GRAFT_PROFILE_KEY", "x20_pagerank")
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
  spark.conf.set("spark.sql.shuffle.partitions",
    sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
  spark.conf.set("spark.sql.session.timeZone", "UTC")
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  case class StageRow(id: Int, name: String, submitted: Long, completed: Long,
                      taskMs: Long, srBytes: Long, swBytes: Long,
                      srRows: Long, swRows: Long, tasks: Int)
  val stages = mutable.ArrayBuffer.empty[StageRow]
  val listener = new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      stages += StageRow(si.stageId, si.name.split("\n").head,
        si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
        m.executorRunTime,
        m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
        m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten,
        si.numTasks)
    }
  }
  val fn = graft.SparkEntry.queries(key)
  // warm rep: codegen + memo builds land here, not in the profiled rep
  (1 to reps).foreach { r =>
    stages.clear()
    if (r == reps) spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val el = (System.nanoTime() - t0) / 1e9
    graft.std.Materialize.releaseAll()
    println(f"[profile] $key rep $r: $el%.3f s")
  }
  spark.sparkContext.removeSparkListener(listener)
  Thread.sleep(500)
  val rows = stages.sortBy(-_.taskMs)
  println(f"[profile] ${rows.size} stages, total task-ms ${rows.map(_.taskMs).sum}, total wall-span per stage below")
  println("stageId  wall_ms task_ms tasks  shufR_MB shufW_MB  shufR_rows shufW_rows  name")
  rows.take(40).foreach { s =>
    println(f"${s.id}%7d ${s.completed - s.submitted}%8d ${s.taskMs}%7d ${s.tasks}%5d ${s.srBytes / 1e6}%9.2f ${s.swBytes / 1e6}%8.2f ${s.srRows}%11d ${s.swRows}%10d  ${s.name.take(60)}")
  }
}
sys.exit(0)
