package graft.sources

import graft.functions.Scoring
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed ingest boundary for the reference's transaction payload —
  * the pydantic model (`services/fraud_service/app/main.py:59-62`:
  * required `transaction_id`/`amount`, open `features` map) as a
  * case-class `Encoder` over PERMISSIVE JSON parsing.
  *
  * Validation semantics preserved: records with malformed JSON or
  * missing required fields are skipped (the reference's per-record
  * try/except, `main.py:224-235`); `features` stays an open map with
  * 0.0 default fill at projection time; `amount` is merged into the
  * map before scoring (`main.py:228`).
  */
object TransactionCodec {

  final case class Transaction(
      transaction_id: String,
      amount: Double,
      features: Map[String, Double],
      event_time: java.sql.Timestamp)

  val PayloadSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "transaction_id STRING, amount DOUBLE, " +
        "features MAP<STRING, DOUBLE>, event_time TIMESTAMP")

  /** Parse a `payload: STRING` column of JSON values into the typed
    * transaction stream, skipping invalid records. */
  def decode(payloads: DataFrame): Dataset[Transaction] = {
    import payloads.sparkSession.implicits._
    payloads
      .select(from_json(col("payload"), PayloadSchema).as("tx"))
      .filter(col("tx").isNotNull
        && col("tx.transaction_id").isNotNull
        && col("tx.amount").isNotNull)
      .select(
        col("tx.transaction_id").as("transaction_id"),
        col("tx.amount").as("amount"),
        coalesce(col("tx.features"), map()).as("features"),
        col("tx.event_time").as("event_time"))
      .as[Transaction]
  }

  /** The producer side: typed transactions back to JSON payloads
    * (byte-compatible with what [[decode]] accepts). */
  def encode(txs: Dataset[Transaction]): DataFrame =
    txs.select(to_json(struct(col("transaction_id"), col("amount"),
      col("features"), col("event_time"))).as("payload"))

  /** Score a typed transaction set with the closed-form model —
    * amount merged into the feature map first (P2), ordered tolerant
    * projection (P1), heuristic proba (P4), threshold (P3). */
  def scoreHeuristic(txs: Dataset[Transaction]): DataFrame = {
    val features = Scoring.withAmount(col("features"), col("amount"))
    txs.toDF()
      .withColumn("feature_vector", Scoring.featureVector(features))
      .withColumn("proba", Scoring.heuristicProba(col("amount")))
      .withColumn("prediction", Scoring.classify(col("proba")))
  }
}
