package graft

import graft.streaming.KafkaScoring
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the literal Kafka plan path (S1/S2): the value path must bind
  * to any frame with the connector's wire schema, produce the same
  * scored columns as the batch pipeline, and the production
  * composition must wire `format("kafka")` — asserted through the
  * provider resolver, since the sandbox ships no connector jar or
  * broker. */
class KafkaSpec extends SparkSpec {
  import spark.implicits._

  private def wireFrame(values: Seq[String]) = {
    val rows = values.zipWithIndex.map { case (v, i) =>
      Row(null, v.getBytes("UTF-8"), "transactions", 0, i.toLong,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), KafkaScoring.KafkaWireSchema)
  }

  private def payload(id: String, eventTime: String, amount: Double,
                      risk: Double, hr: Int): String =
    s"""{"transaction_id":"$id","event_time":"$eventTime","amount":$amount,""" +
      s""""features":{"num_items":2.0,"merchant_risk":$risk,"hour":$hr.0}}"""

  test("kafka value path scores payloads with the batch closed form") {
    val wire = wireFrame(Seq(
      payload("t1", "2024-01-01T01:30:00", 500.0, 0.8, 1),  // night hour
      payload("t2", "2024-01-01T12:00:00", 2000.0, 0.1, 12)))
    val got = KafkaScoring.scoredTransactions(wire)
      .select("transaction_id", "proba", "prediction", "heuristic_proba")
      .collect().map(r => r.getString(0) -> r).toMap
    def expProba(amount: Double, risk: Double, night: Double) =
      1.0 / (1.0 + math.exp(-(0.002 * amount + 1.5 * risk + 0.05 * night - 2.5)))
    assert(math.abs(got("t1").getDouble(1) - expProba(500.0, 0.8, 1.0)) < 1e-12)
    assert(math.abs(got("t2").getDouble(1) - expProba(2000.0, 0.1, 0.0)) < 1e-12)
    assert(got("t2").getInt(2) == 1)          // logit = 4 + 0.15 - 2.5 > 0
    assert(got("t2").getDouble(3) == 1.0)     // heuristic: amount > 1000
  }

  test("malformed kafka payloads are skipped, not nulled through (P14)") {
    val wire = wireFrame(Seq(
      payload("ok", "2024-01-01T05:00:00", 10.0, 0.5, 5),
      """{"this is": not json""",
      """{"no_transaction_id":true}"""))
    val ids = KafkaScoring.scoredTransactions(wire)
      .select("transaction_id").as[String].collect()
    assert(ids.toSeq == Seq("ok"))
  }

  test("sink shape roundtrips through the value path (producer twin)") {
    val tx = Seq(("t9", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"),
      123.45, Map("num_items" -> 3.0, "merchant_risk" -> 0.4, "hour" -> 9.0)))
      .toDF("transaction_id", "event_time", "amount", "features")
    val sinkShape = KafkaScoring.toKafkaSinkShape(tx)
    assert(sinkShape.columns.toSeq == Seq("key", "value")) // writeStream.format("kafka") contract
    val wire = sinkShape
      .withColumn("topic", lit("transactions")).withColumn("partition", lit(0))
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("timestamp", lit(java.sql.Timestamp.valueOf("2024-01-01 09:00:01")))
      .withColumn("timestampType", lit(0))
    val back = KafkaScoring.parsedTransactions(wire).as[(String, java.sql.Timestamp, Double, Map[String, Double])].head()
    assert(back == (("t9", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 123.45,
      Map("num_items" -> 3.0, "merchant_risk" -> 0.4, "hour" -> 9.0))))
  }

  test("value path binds to a streaming source unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
    val wire = mem.toDF().toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val scored = KafkaScoring.scoredTransactions(wire)
    assert(scored.isStreaming)
    mem.addData((null, payload("s1", "2024-01-01T02:00:00", 800.0, 0.9, 2).getBytes("UTF-8"),
      "transactions", 0, 0L, java.sql.Timestamp.valueOf("2024-01-01 02:00:01"), 0))
    val q = scored.writeStream.format("memory").queryName("kafka_mem_scored")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("kafka_mem_scored").select("transaction_id", "prediction").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("s1"))
  }

  test("kafka value path is one shuffle-free codegen stage") {
    // The whole consumer path (parse → augment → score) must stay a
    // stateless map over source partitions: no Exchange anywhere, and
    // the projection inside WholeStageCodegen — at scale, throughput
    // is then bounded by Kafka partitions alone.
    val plan = KafkaScoring.scoredTransactions(wireFrame(Seq(
      payload("p1", "2024-01-01T00:00:00", 1.0, 0.1, 0))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // `*(n)` prefix marks codegen stages; the scoring projection
    // (logit/proba/prediction) must carry one.
    assert("""\*\(\d+\) Project .*logit""".r.findFirstIn(plan).isDefined, plan)
  }

  test("production composition wires format(\"kafka\") with subscribe options") {
    // No connector jar in the sandbox: load() must fail at PROVIDER
    // RESOLUTION, and the error must name the kafka source — proving
    // the composition reaches the real connector lookup (a typo'd or
    // missing format would surface differently).
    val err = intercept[Exception] {
      KafkaScoring.kafkaScoredStream(spark, "broker:9092", "transactions")
    }
    val msg = (err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")).toLowerCase
    assert(msg.contains("kafka"), s"expected kafka provider-resolution failure, got: $msg")
    val errPeek = intercept[Exception] {
      KafkaScoring.peekOne(spark, "broker:9092", "transactions")
    }
    val msgPeek = (errPeek.getMessage +
      Option(errPeek.getCause).map(_.getMessage).getOrElse("")).toLowerCase
    assert(msgPeek.contains("kafka"), s"expected kafka provider-resolution failure, got: $msgPeek")
  }
}
