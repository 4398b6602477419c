package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only: attribute stream-drain wall time. Wraps named phases
  * with a listener that counts jobs/stages/tasks and sums task wall —
  * if SUM(task time)/cores ≪ phase wall, the drain is bound by
  * per-job fixed overhead (scheduling, Catalyst, micro-batch
  * bookkeeping), not by execution — different fix space. */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
        ()
      }
    })
    def t(name: String)(f: => Unit): Unit = {
      val (j0, s0, k0, m0) = (jobs.get, stages.get, tasks.get, taskMs.get)
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a beat to drain
      Thread.sleep(300)
      println(f"[drain-probe] $name%-30s wall ${wall}%7.2f s  " +
        f"jobs ${jobs.get - j0}%4d  stages ${stages.get - s0}%4d  " +
        f"tasks ${tasks.get - k0}%6d  taskSum ${(taskMs.get - m0) / 1e3}%8.2f s")
    }
    t("session_warm") { spark.range(1000).selectExpr("sum(id)").collect() }
    t("dedup_incremental_rep1") {
      graft.SparkEntry.queries("stream_dedup_incremental")(spark, sfDir).count()
    }
    t("dedup_incremental_rep2") {
      graft.SparkEntry.queries("stream_dedup_incremental")(spark, sfDir).count()
    }
    t("dedup_spans_rep1") {
      graft.SparkEntry.queries("stream_dedup_spans")(spark, sfDir).count()
    }
    t("warm_drift_stream") {
      graft.streaming.StreamingDrift.warmDriftStream(spark, sfDir)
    }
    t("warm_curation_stream") {
      graft.streaming.StreamingEmit.unifiedRun(spark, sfDir); ()
    }
    t("warm_trimodal_stream") {
      graft.streaming.StreamingMmEmit.warmTrimodalStream(spark, sfDir)
    }
    spark.stop()
  }
}
