package graft.dev

import java.io.{File, PrintWriter}

/** Dev tool: dump `.explain("formatted")` for named queries to files
  * (plans/rNN/<query>_<tag>.txt) — unlike [[graft.Explain]] this runs
  * on the full [[graft.GraftSession]] (native functions + strategy +
  * optimizer rule registered), so every declared query analyzes.
  *
  * Usage: runMain graft.dev.PlanDump <sfDir> <outDir> <tag> <q1> <q2> ...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val tag = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new File(outDir).mkdirs()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pw = new PrintWriter(s"$outDir/${n}_$tag.txt")
      try pw.println(plan) finally pw.close()
      println(s"[plan-dump] wrote $outDir/${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
