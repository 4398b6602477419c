package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import scala.collection.concurrent.TrieMap

/** Dev-only: attribute a stream drain's task time per SQL EXECUTION
  * callsite — DrainProbe showed the curation drain is execution-bound
  * (taskSum ~1000 s for a 5000-doc corpus); stage callsites inside a
  * foreachBatch all collapse to the stream-start site, so this maps
  * stage → job → SQL execution → the action's description instead. */
object DrainProbe2 {
  private val execDesc = TrieMap.empty[Long, String]
  private val stageToExec = TrieMap.empty[Int, Long]
  private val byExec = TrieMap.empty[Long, (Long, Long, Long)] // runMs, tasks, stages

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("curation")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          val d0 = Option(e.description).flatMap(_.linesIterator.find(_.trim.nonEmpty))
            .filterNot(_.startsWith("id = "))
          val d = d0.getOrElse(e.physicalPlanDescription.linesIterator
            .map(_.trim).filter(_.nonEmpty)
            .filterNot(l => l.startsWith("+-") || l.startsWith(":") || l.startsWith("=="))
            .take(5).mkString(" | ").take(400))
          execDesc.update(e.executionId, d); ()
        case _ => ()
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val execId = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .map(_.toLong).getOrElse(-1L)
        e.stageIds.foreach(sid => stageToExec.update(sid, execId))
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val run = if (si.taskMetrics != null) si.taskMetrics.executorRunTime else 0L
        val eid = stageToExec.getOrElse(si.stageId, -1L)
        val cur = byExec.getOrElse(eid, (0L, 0L, 0L))
        byExec.update(eid, (cur._1 + run, cur._2 + si.numTasks, cur._3 + 1))
        ()
      }
    })
    val t0 = System.nanoTime()
    which match {
      case "curation" => graft.streaming.StreamingEmit.unifiedRun(spark, sfDir); ()
      case "trimodal" => graft.streaming.StreamingMmEmit.warmTrimodalStream(spark, sfDir)
      case "drift"    => graft.streaming.StreamingDrift.warmDriftStream(spark, sfDir)
      case other      => sys.error(s"unknown probe: $other (curation|trimodal|drift)")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[drain-probe2] $which wall ${wall}%7.2f s; task time by SQL execution:")
    byExec.toSeq.sortBy(-_._2._1).take(40).foreach { case (eid, (ms, tasks, stages)) =>
      val desc = execDesc.getOrElse(eid, "<none>").take(300)
      println(f"[drain-probe2] ${ms / 1e3}%9.2f s  exec $eid%4d  stages $stages%4d  tasks $tasks%6d  $desc")
    }
    spark.stop()
  }
}
