package graft

import java.sql.Timestamp

import graft.streaming.{JdbcMetricsSink, KafkaScoring}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** The whole reference pipeline end to end through the literal
  * transport pieces: producer payloads → Kafka sink shape → wire rows
  * → consumer parse/score (with the ingest skip counter) → daily
  * rollup → JDBC MERGE store → read back. One test, every seam — the
  * "a user of the reference switches engines" demonstration. */
class PipelineE2eSpec extends SparkSpec {
  import spark.implicits._

  test("producer → kafka wire → scored → daily rollup → jdbc store round-trip") {
    // -- producer side: transactions across two days, one malformed row
    val tx = Seq(
      ("t1", Timestamp.valueOf("2024-03-01 01:00:00"), 1500.0,
        Map("num_items" -> 1.0, "merchant_risk" -> 0.9, "hour" -> 1.0)),
      ("t2", Timestamp.valueOf("2024-03-01 13:00:00"), 20.0,
        Map("num_items" -> 2.0, "merchant_risk" -> 0.1, "hour" -> 13.0)),
      ("t3", Timestamp.valueOf("2024-03-02 02:30:00"), 3000.0,
        Map("num_items" -> 1.0, "merchant_risk" -> 0.8, "hour" -> 2.0)))
      .toDF("transaction_id", "event_time", "amount", "features")
    val wire = KafkaScoring.toKafkaSinkShape(tx)
      .withColumn("topic", lit("transactions")).withColumn("partition", lit(0))
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("timestamp", lit(Timestamp.valueOf("2024-03-02 03:00:00")))
      .withColumn("timestampType", lit(0))
    val garbage = Seq("not json at all", """{"transaction_id":null}""").toDF("v")
      .select(lit(null).cast("binary").as("key"), col("v").cast("binary").as("value"),
        lit("transactions").as("topic"), lit(0).as("partition"),
        lit(99L).as("offset"), lit(Timestamp.valueOf("2024-03-02 03:00:01")).as("timestamp"),
        lit(0).as("timestampType"))

    // -- consumer side: parse (skip counter in-plan) → score
    val obs = Observation("kafka_ingest")
    val scored = KafkaScoring.scoredParsed(
      KafkaScoring.parsedWithIngestMetrics(wire.unionByName(garbage), obs))
      .persist()
    assert(scored.count() == 3)
    assert(obs.get("n_ingested") == 5L, "observe must count raw wire rows")
    assert(obs.get("n_skipped") == 2L, "observe must count dropped payloads")

    // t1: logit = 0.002*1500 + 1.5*0.9 + 0.05*1 - 2.5 = 1.9 > 0 → fraud
    // t2: logit = 0.04 + 0.15 + 0 - 2.5 < 0 → legit
    val byId = scored.select("transaction_id", "prediction").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(byId == Map("t1" -> 1, "t2" -> 0, "t3" -> 1))

    // -- analytics side: daily rollup → JDBC MERGE → read back
    val daily = scored
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("num_predictions"),
        avg(col("prediction").cast("double")).as("fraud_rate"),
        avg(col("value")).as("avg_amount"),
        avg(col("proba")).as("avg_proba"))
    val url = JdbcMetricsSink.derbyUrl()
    JdbcMetricsSink.upsertDailyMetrics(daily, url)
    JdbcMetricsSink.upsertDailyMetrics(daily, url) // re-fire: must not change anything
    val store = spark.read.jdbc(url, JdbcMetricsSink.Table, new java.util.Properties)
      .orderBy("day").collect()
    scored.unpersist()
    assert(store.map(_.getAs[java.sql.Date]("day").toString).toSeq ==
      Seq("2024-03-01", "2024-03-02"))
    assert(store.map(_.getAs[Long]("num_predictions")).toSeq == Seq(2L, 1L))
    assert(math.abs(store(0).getAs[Double]("fraud_rate") - 0.5) < 1e-12)
    assert(math.abs(store(1).getAs[Double]("fraud_rate") - 1.0) < 1e-12)
  }
}
