package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: time a single named query (args: name [sfDir] [reps]) the
  * same way Bench does, printing per-rep wall seconds. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps  = if (args.length > 2) args(2).toInt else 2
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }
    spark.stop()
  }
}
