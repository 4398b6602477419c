package graft.sources

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Copy-on-write MERGE on a day-partitioned parquet store — the
  * lakehouse upsert (Delta/Iceberg MERGE INTO semantics) without a
  * table-format dependency: late-arriving rows merge into per-key
  * aggregates by REWRITING ONLY THE AFFECTED DAY PARTITIONS, leaving
  * every other partition's files physically untouched.
  *
  * Mechanics (the same discipline a 100 TB lakehouse job runs):
  *
  *  1. The base store is written `partitionBy(day)`.
  *  2. The update batch's distinct days select the partitions to
  *     touch — a partition-pruned read, never a full-store scan.
  *  3. Touched partitions FULL OUTER merge with the updates on the
  *     key (sum-merge of additive aggregates), and the writer runs
  *     in `partitionOverwriteMode=dynamic`, so commit replaces
  *     exactly the partitions present in the output frame.
  *
  * Cost scales with |update days| · |partition|, not |store| —
  * CowMergeSpec pins both the physical invariant (untouched
  * partitions keep byte-identical files) and the semantic one
  * (merged store ≡ one-shot aggregate over all rows, which is also
  * what the DuckDB oracle recomputes).
  */
object CowMerge {

  /** Per-(user, day) additive aggregates of an event slice. */
  private[graft] def dailyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("value_sum"))

  /** The late slice: every 7th event OF THE HORIZON DAY arrives
    * after the base load — the realistic shape (late data lands on
    * recent partitions), and the one that makes the physical
    * invariant meaningful: every earlier day's partition must come
    * through the merge byte-identical. Anchored to `max(ts)` via a
    * 1-row broadcast like every time predicate in the repo. */
  private[graft] def lateSlice(events: DataFrame): DataFrame =
    withLateFlag(events).filter(col("is_late")).drop("is_late", "hday")

  private[graft] def baseSlice(events: DataFrame): DataFrame =
    withLateFlag(events).filter(!col("is_late")).drop("is_late", "hday")

  private def withLateFlag(events: DataFrame): DataFrame = {
    val horizon = events.agg(max(to_date(col("ts"))).as("hday"))
    events.crossJoin(broadcast(horizon))
      .withColumn("is_late",
        col("event_id") % 7 === 0 && to_date(col("ts")) === col("hday"))
  }

  /** Step 1: the day-partitioned base store (everything on time). */
  def writeBase(s: SparkSession, dir: String, storePath: String): Unit =
    dailyAgg(withLateFlag(Tables.events(s, dir)).filter(!col("is_late")))
      .write.mode("overwrite").partitionBy("day").parquet(storePath)

  /** Steps 2-3: merge the late slice copy-on-write. */
  def mergeLate(s: SparkSession, dir: String, storePath: String): Unit = {
    val updates = dailyAgg(withLateFlag(Tables.events(s, dir)).filter(col("is_late")))
    // the days to touch — a small driver-side list, bounded by the
    // calendar, not by data volume
    val touchedDays = updates.select(col("day")).distinct()
      .collect().map(_.getDate(0).toString).sorted
    // 3. partition-pruned read of ONLY the touched days, full-outer
    //    sum-merge, dynamic-overwrite commit of exactly those days
    val base = s.read.parquet(storePath)
      .filter(col("day").isin(touchedDays.map(lit(_)): _*))
    val merged = base.as("b")
      .join(updates.as("u"), Seq("user_id", "day"), "full_outer")
      .select(
        col("user_id"), col("day"),
        (coalesce(col("b.n_events"), lit(0L)) +
          coalesce(col("u.n_events"), lit(0L))).as("n_events"),
        (coalesce(col("b.value_sum"), lit(0).cast(DecimalType(18, 2))) +
          coalesce(col("u.value_sum"), lit(0).cast(DecimalType(18, 2))))
          .cast(DecimalType(18, 2)).as("value_sum"))
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(storePath)
  }

  /** Build base store → merge the late slice copy-on-write → read
    * the merged store back. */
  def mergedStore(s: SparkSession, dir: String, storePath: String): DataFrame = {
    writeBase(s, dir, storePath)
    mergeLate(s, dir, storePath)
    s.read.parquet(storePath)
  }

  val cowMerge: Q = Q("store_cow_merge",
    """SELECT user_id, CAST(ts AS DATE) AS day,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM events GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    val store = Scratch.dir("graft-cow-").toString + "/daily"
    mergedStore(s, dir, store)
      .select(col("user_id"), col("day"),
        col("n_events"), col("value_sum").cast("double").as("value_sum"))
      .orderBy(col("user_id"), col("day"))
  }

  val all: Seq[Q] = Seq(cowMerge)
}
