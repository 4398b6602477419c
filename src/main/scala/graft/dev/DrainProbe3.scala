package graft.dev

/** Dev-only: attribute task time INSIDE a drain's SQL executions —
  * one level below [[DrainProbe2]] (per-execution task sums): dumps
  * per-NODE metrics (times, rows, spill) of the slowest executions
  * from the session's SQL status store, so the expensive operator of
  * a foreachBatch decision write is visible without the UI.
  *
  * Usage: runMain graft.dev.DrainProbe3 <sfDir> <curation|trimodal|drift> [topExec]
  */
object DrainProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("curation")
    val topExec = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    which match {
      case "curation" => graft.streaming.StreamingEmit.unifiedRun(spark, sfDir); ()
      case "trimodal" => graft.streaming.StreamingMmEmit.warmTrimodalStream(spark, sfDir)
      case "drift"    => graft.streaming.StreamingDrift.warmDriftStream(spark, sfDir)
      case other      => sys.error(s"unknown probe: $other (curation|trimodal|drift)")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
    println(f"[drain-probe3] $which wall ${wall}%7.2f s; slowest executions, per-node metrics:")
    org.apache.spark.sql.graftbridge.Bridge.sqlNodeMetricLines(spark, topExec)
      .foreach(l => println("[drain-probe3] " + l))
    spark.stop()
  }
}
