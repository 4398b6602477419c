package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev-only: print the formatted physical plan for named queries
  * (args: name1[,name2,...] [sfDir] [mode]) — the `.explain` loop the
  * plan-invariant pins are iterated against, without writing output. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.attach(spark)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString(mode)))
    }
    spark.stop()
  }
}
