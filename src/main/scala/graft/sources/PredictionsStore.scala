package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine-native predictions store: date-partitioned parquet.
  *
  * The reference keeps predictions in Postgres with btree indexes on
  * `event_time` / `prediction` (`scripts/db/init.sql:7-21`). The
  * columnar analog: partition by `day = to_date(ts)` so every
  * time-ranged analytics query (A1, A3, A5-A7) prunes partitions at
  * planning time, and parquet min/max row-group stats serve the rest.
  * Dynamic partition overwrite gives the idempotent
  * recompute-today's-partition upsert (A2) without row-level merge.
  */
object PredictionsStore {

  /** Append/overwrite scored events, partitioned by day. */
  def write(scored: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    scored.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    scored
      .withColumn("day", to_date(col("ts")))
      .write.mode(mode).partitionBy("day").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
