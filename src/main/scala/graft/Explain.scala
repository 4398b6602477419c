package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries
  * so scan pruning / pushdown / join strategy / codegen spans can be
  * eyeballed (builder brief: iterate on `.explain` until the plan is
  * the one you'd want at 100 TB). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("fraud_daily_metrics", "tpch_pricing_summary",
        "tpch_revenue_by_nation", "fraud_recent_topk", "tpch_segment_revenue")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
