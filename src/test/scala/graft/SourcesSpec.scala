package graft

import java.sql.Timestamp

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader schema tolerance: the driver's testdata has shipped
  * `events.ts` under two physical types across generations
  * (TIMESTAMP(NANOS) read as int64 nanos; TIMESTAMP(MICROS) read as
  * TIMESTAMP_NTZ). A silent mismatch here wiped every events-based
  * query in one correctness round, so the normalization is pinned by
  * spec for all three inbound shapes. */
class SourcesSpec extends SparkSpec {

  test("normalizeTs converts int64 nanos to the exact µs timestamp") {
    import spark.implicits._
    // 2024-01-02T03:04:05.123456Z as epoch nanos
    val nanos = 1704164645123456000L
    val out = Tables.normalizeTs(Seq(nanos).toDF("ts")).as[Timestamp].head()
    assert(out.toInstant == java.time.Instant.parse("2024-01-02T03:04:05.123456Z"))
  }

  test("normalizeTs casts TIMESTAMP_NTZ preserving the wall clock (UTC session)") {
    import spark.implicits._
    val ntz = Seq("2024-06-07 08:09:10.654321").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(col("ts").cast(StringType)).as[String].head()
      == "2024-06-07 08:09:10.654321")
  }

  test("normalizeTs leaves an already-LTZ ts column untouched") {
    import spark.implicits._
    val ltz = Seq("2024-06-07 08:09:10").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"))
    assert(Tables.normalizeTs(ltz).schema("ts").dataType == TimestampType)
  }

  test("corpus loaders normalize drifted physical types to the declared schema") {
    import spark.implicits._
    // simulate a regenerated testdata drop where integer widths and
    // float precision drifted (the events.ts incident, other tables)
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-").toString
    Seq((1, "hello world", "en", "src1", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .selectExpr("cast(doc_id as int) doc_id", "text", "lang", "source",
        "cast(n_chars as int) n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((7, Array(0.25, -0.5), 3))
      .toDF("vec_id", "embedding", "label")
      .selectExpr("cast(vec_id as int) vec_id",
        "cast(embedding as array<double>) embedding", "cast(label as long) label")
      .write.parquet(s"$dir/embeddings.parquet")
    val docs = Tables.documents(spark, dir)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    assert(docs.as[(Long, String, String, String, Long)].head()
      == ((1L, "hello world", "en", "src1", 11L)))
    val emb = Tables.embeddings(spark, dir)
    assert(emb.schema("vec_id").dataType == LongType)
    assert(emb.schema("embedding").dataType == ArrayType(FloatType))
    assert(emb.schema("label").dataType == IntegerType)
    assert(emb.as[(Long, Array[Float], Int)].head()._2.toSeq == Seq(0.25f, -0.5f))
  }

  test("events loader normalizes drifted widths and re-serializes pre-parsed props") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-edrift-").toString
    Seq((1, "2024-03-04 05:06:07", 9, "click", 1.5f, 12.0))
      .toDF("event_id", "s", "user_id", "event_type", "value", "amount")
      .selectExpr("cast(event_id as int) event_id", "cast(s as timestamp_ntz) ts",
        "cast(user_id as int) user_id", "event_type", "cast(value as float) value",
        "named_struct('amount', amount) props")
      .write.parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("event_id").dataType == LongType)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("value").dataType == DoubleType)
    assert(ev.schema("props").dataType == StringType)
    val row = ev.head()
    assert(row.getAs[Long]("user_id") == 9L)
    assert(row.getAs[Double]("value") == 1.5)
    assert(row.getAs[String]("props") == """{"amount":12.0}""")
  }

  test("batch and streaming events loaders agree on ts for the shipped testdata") {
    val batch = Tables.events(spark, sf)
    assert(batch.schema("ts").dataType == TimestampType)
    val batchMinMax = batch.agg(min("ts"), max("ts")).head()
    // the streaming loader must see the same instants through its
    // user-supplied file schema (a mismatch silently reinterprets the
    // raw int64 and shifts every timestamp by 1000x)
    val streamSchema = graft.streaming.ScoringStream.eventsFileSchema(spark, sf)
    val viaStreamSchema = Tables.normalizeTs(
      spark.read.schema(streamSchema).parquet(s"$sf/events.parquet"))
    assert(viaStreamSchema.agg(min("ts"), max("ts")).head() == batchMinMax)
    // sanity: the generator's events live in a plausible year, not 1970
    assert(batchMinMax.getTimestamp(0).toInstant
      .isAfter(java.time.Instant.parse("2000-01-01T00:00:00Z")))
  }

  test("batch watermark skips only replays from the SAME stream identity") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-streamid-").toString
    val store = new graft.sources.FrameStore(root)
    val name = "idx"
    store.promote(name, store.register(spark, name,
      Seq.empty[(Long, String)].toDF("id", "v")))
    def rows(): Long = store.loadProduction(spark, name).get.count()
    val b0 = Seq((1L, "a")).toDF("id", "v")
    // first delivery from checkpoint A
    store.appendBatch(spark, name, b0, batchId = Some(0L), streamId = Some("ckptA"))
    assert(rows() == 1)
    // at-least-once replay of the SAME batch from the SAME checkpoint: skipped
    store.appendBatch(spark, name, b0, batchId = Some(0L), streamId = Some("ckptA"))
    assert(rows() == 1, "same-stream replay must be idempotent")
    // a FRESH checkpoint restarts batchIds at 0 against the existing
    // store — its early batches must append, not be watermark-skipped
    store.appendBatch(spark, name, Seq((2L, "b")).toDF("id", "v"),
      batchId = Some(0L), streamId = Some("ckptB"))
    assert(rows() == 2, "a new stream's batch 0 must not be skipped by A's watermark")
    // an identity-less legacy marker never satisfies an identity-bearing
    // probe: appending without a streamId then replaying WITH one re-runs
    // (the safe direction under at-least-once)
    store.appendBatch(spark, name, Seq((3L, "c")).toDF("id", "v"), batchId = Some(5L))
    store.appendBatch(spark, name, Seq((4L, "d")).toDF("id", "v"),
      batchId = Some(5L), streamId = Some("ckptB"))
    assert(rows() == 4, "identity-less marker must not satisfy an identity probe")
    // and the identity survives maintenance: compact, then replay from B
    store.compact(spark, name)
    store.appendBatch(spark, name, Seq((5L, "e")).toDF("id", "v"),
      batchId = Some(5L), streamId = Some("ckptB"))
    assert(rows() == 4, "post-compaction replay from the same stream must skip")
  }
}
