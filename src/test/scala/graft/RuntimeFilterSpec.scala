package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Runtime row-level filtering (Spark's InjectRuntimeFilter): when a
  * shuffle join's build side carries a selective filter, the optimizer
  * plants a bloom-filter semi-join on the probe side so fact rows that
  * cannot match are dropped AT THE SCAN, before the shuffle. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the matching fraction. The gates are resized for local
  * parquet: the application-side minimum (10 GB default) drops to 0
  * and the creation-side maximum rises so the tiny dim qualifies —
  * production leaves both at defaults. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom runtime filter on the fact scan") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf).filter(col("p_size") <= 5),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized)
      // and the filtered plan still answers exactly like the plain join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf).filter(col("p_size") <= 5).hint("broadcast"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      assert(joined.except(expected).isEmpty && expected.except(joined).isEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
