package graft.streaming

import java.nio.file.Files

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join: the streaming twin of the batch
  * as-of attribution (`FraudAnalytics.clickAttribution`), bounded the
  * way a real-time attributor must be — each purchase matched to
  * clicks by the same user within the PRECEDING 30 MINUTES, then the
  * latest such click wins.
  *
  * Spark shape (the canonical stream-stream join recipe):
  *
  *   clicks    ──watermark 1h──┐
  *                             ├── inner join ON user_id +
  *   purchases ──watermark 1h──┘     ts-30min ≤ click_ts < ts
  *
  *  - Both sides carry event-time watermarks; with the interval
  *    condition Spark derives the state-retention bound per side
  *    (a click can only ever match purchases up to 30 minutes after
  *    it, so click state older than watermark+30min is evicted —
  *    bounded state at ANY input volume, the at-scale requirement).
  *  - INNER join pairs emit as soon as both rows arrive — output is
  *    not gated on watermark finalization, so a bounded AvailableNow
  *    backfill emits every pair, including the final hour's.
  *  - The one-winner cut (latest click per purchase) runs on the
  *    landed pairs: keyed `max_by` over (click_ts, click_id) — a
  *    deterministic total order. Keeping the argmax OUT of the
  *    streaming graph avoids chaining a stateful aggregate behind the
  *    join, whose append-mode finalization would hold back the last
  *    watermark-window of results on a bounded run.
  *
  * Purchases with no click in-window carry no attribution signal and
  * are dropped (inner join) — the batch as-of twin emits them with a
  * NULL click instead; both semantics are standard, and the oracle
  * pins this one exactly.
  */
object ClickAttribution {

  /** Clicks/purchases split of the raw event stream, joined on user
    * with the 30-minute interval bound. Unbounded streaming plan. */
  def joinedPairs(spark: SparkSession, dir: String): DataFrame = {
    val clicks = ScoringStream.eventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = ScoringStream.eventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "1 hour")
    purchases.join(clicks,
      col("click_user") === col("user_id") &&
        col("click_ts") < col("ts") &&
        col("click_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_id"), col("click_ts"))
  }

  /** Run the bounded backfill: land joined pairs, then the
    * latest-click-wins cut per purchase. */
  def runAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ckpt = Files.createTempDirectory("graft-attr-ckpt-").toString
    val out  = Files.createTempDirectory("graft-attr-out-").toString + "/pairs"
    // Captured up front so the read-back below can carry an explicit
    // schema: a bounded run that joins zero pairs writes no data
    // files, and a schema-less read would fail with unable-to-infer
    // instead of returning the correct empty frame.
    val pairsSchema = joinedPairs(spark, dir).schema
    // Join state lives per shuffle partition (one store pair per
    // partition per batch); a handful beats the session default for
    // the bounded backfill, same tuning as the daily-metrics stream.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData  = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // Inner-join output isn't watermark-gated; skip the trailing
    // no-data batch (it exists to finalize append-mode state only).
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val q = joinedPairs(spark, dir).writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
    }
    spark.read.schema(pairsSchema).parquet(out)
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(max_by(col("click_id"), struct(col("click_ts"), col("click_id")))
        .as("click_id"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- queries
  val attribution: Q = Q("stream_click_attribution",
    """WITH c AS (
      |  SELECT event_id AS click_id, user_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'
      |), p AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |), j AS (
      |  SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
      |  FROM p JOIN c ON c.user_id = p.user_id
      |    AND c.click_ts < p.ts
      |    AND c.click_ts >= p.ts - INTERVAL 30 MINUTE
      |)
      |SELECT event_id, user_id, ts,
      |  last(click_id ORDER BY click_ts, click_id) AS click_id
      |FROM j GROUP BY 1, 2, 3 ORDER BY event_id""".stripMargin) { (s, dir) =>
    runAttribution(s, dir)
  }

  val all: Seq[Q] = Seq(attribution)
}
