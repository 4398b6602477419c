package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries (args: name1[,name2,...] [sfDir]
  * [reps]) in ONE warmed session the same way Bench does, printing
  * per-rep wall seconds. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps  = if (args.length > 2) args(2).toInt else 1
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GraftSession, exactly like Bench — AQE's post-shuffle
    // coalescing changes iterative-loop timings materially, so a
    // plain session here would mis-rank optimization targets
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        println(s"  job ${js.jobId} stages=${js.stageIds.mkString(",")} " +
          Option(js.properties.getProperty("spark.job.description")).getOrElse("").take(120))
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
        val tm = si.taskMetrics
        println(f"  stage ${si.stageId}%3d ${ms.getOrElse(-1L)}%6d ms cpu=${tm.executorRunTime}%6d " +
          f"in=${tm.inputMetrics.recordsRead}%8d sr=${tm.shuffleReadMetrics.recordsRead}%8d " +
          f"sw=${tm.shuffleWriteMetrics.recordsWritten}%8d tasks=${si.numTasks}%3d  [${si.name.take(60)}]")
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.SparkEntry.entry(spark).count()
    (1 to reps).foreach { i =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"rep$i $name: ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
