package graft

import graft.sources.TransactionCodec
import graft.sources.TransactionCodec.Transaction
import org.apache.spark.sql.functions._

/** Typed ingest boundary: decode/encode roundtrip, validation skips,
  * tolerant map semantics (FIXTURES.md B1). */
class TransactionCodecSpec extends SparkSpec {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-01-05 10:30:00")

  test("decode keeps valid records, skips malformed/missing-required") {
    val payloads = Seq(
      """{"transaction_id":"t1","amount":12.5,"features":{"num_items":2.0},"event_time":"2024-01-05T10:30:00Z"}""",
      """{"amount":5.0,"features":{}}""",                       // missing id → skip
      """{"transaction_id":"t3","features":{}}""",              // missing amount → skip
      """not json at all""",                                    // malformed → skip
      """{"transaction_id":"t5","amount":1500.0}"""             // no features → empty map
    ).toDF("payload")
    val txs = TransactionCodec.decode(payloads).collect().sortBy(_.transaction_id)
    assert(txs.map(_.transaction_id).toSeq == Seq("t1", "t5"))
    assert(txs(1).features == Map.empty[String, Double])
  }

  test("encode/decode roundtrip is the identity on typed records") {
    val in = Seq(
      Transaction("a", 10.0, Map("num_items" -> 2.0, "merchant_risk" -> 0.3), ts),
      Transaction("b", 2000.0, Map.empty, ts))
    val back = TransactionCodec.decode(TransactionCodec.encode(in.toDS()))
      .collect().sortBy(_.transaction_id)
    assert(back.toSeq == in.sortBy(_.transaction_id))
  }

  test("scoring a typed set: amount merged, ordered projection, threshold") {
    val in = Seq(
      Transaction("low", 10.0, Map("merchant_risk" -> 0.3), ts),
      Transaction("high", 2000.0, Map("num_items" -> 3.0), ts)).toDS()
    val scored = TransactionCodec.scoreHeuristic(in)
      .select(col("transaction_id"), col("feature_vector"), col("proba"), col("prediction"))
      .collect().map(r => r.getString(0) -> r).toMap
    // FeatureOrder = amount, num_items, merchant_risk, hour
    assert(scored("low").getSeq[Double](1) == Seq(10.0, 0.0, 0.3, 0.0))
    assert(scored("high").getSeq[Double](1) == Seq(2000.0, 3.0, 0.0, 0.0))
    assert(scored("low").getDouble(2) == 0.05 && scored("low").getInt(3) == 0)
    assert(scored("high").getDouble(2) == 1.0 && scored("high").getInt(3) == 1)
  }
}
