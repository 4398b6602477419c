package graft.streaming

import java.nio.file.Files

import graft.Q
import graft.queries.TextOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental dedup — the composition of the dedup family
  * with the streaming surface: each arriving micro-batch of documents
  * is deduped against a PERSISTED shingle index (the stream-static
  * join shape proven in `stream_enriched_events`), then appended to
  * the index so later batches dedup against it. This is the loop a
  * training-data pipeline actually runs: the reference scores each
  * arriving record against existing state
  * (`services/fraud_service/app/main.py:219-231`); here the "state"
  * is the corpus shingle index and the "score" is membership in a
  * near-dup pair.
  *
  * Per batch (all DataFrame plans, no driver-side pair loops):
  *  1. shingle the batch ([[TextOps.hashedShingleArrays]] — hashed
  *     8-byte shingles, no strings),
  *  2. inverted-index join of the batch's postings against the index
  *     scan + the batch itself (candidates bounded by the BATCH's
  *     posting lists — per-batch cost, never per-corpus),
  *  3. exact Jaccard recheck via the native sorted-intersect merge,
  *  4. append accepted pairs to the sink and the batch's shingle
  *     arrays to the index.
  *
  * Result set is provably identical to the batch
  * `text_dedup_incremental` (every pair touching a new doc counted
  * exactly once, orientation normalized to d1 < d2) no matter how the
  * new docs are sliced into micro-batches — pinned by StreamingSpec
  * batch-parity and by the shared DuckDB oracle.
  */
object StreamingDedup {

  /** Near-dup pairs of one batch vs (index ∪ batch), exact Jaccard
    * ≥ `threshold`, orientation-normalized. `idx` is the persisted
    * shingle index scan `(doc_id, hs, n)`. */
  def dedupBatchAgainstIndex(batch: DataFrame, idx: DataFrame,
                             threshold: Double = 0.5): DataFrame = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val batchHs = TextOps.hashedShingleArrays(batch)
    val combined = idx.select(col("doc_id"), col("hs"), col("n"))
      .unionByName(batchHs.select(col("doc_id"), col("hs"), col("n")))
    val a = combined.select(col("doc_id").as("da"), col("n").as("na"),
      explode(col("hs")).as("h"))
    val b = batchHs.select(col("doc_id").as("db"), col("n").as("nb"),
      explode(col("hs")).as("h"))
    // candidates: batch postings against the combined inverted index,
    // normalized so earlier-arrived (smaller-id) docs sit on d1; the
    // length bound J ≤ min/max prunes before the exact recheck
    val cands = a.join(b, Seq("h"))
      .filter(col("da") =!= col("db")
        && greatest(col("na"), col("nb")) <= least(col("na"), col("nb")) * 2)
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"))
      .distinct()
    val j = col("i").cast("double") / ((col("x.n") + col("y.n")) - col("i"))
    cands
      .join(combined.as("x"), col("d1") === col("x.doc_id"))
      .join(combined.as("y"), col("d2") === col("y.doc_id"))
      .withColumn("i", expr("graft_sorted_intersect(x.hs, y.hs)"))
      .filter(j >= threshold)
      .select(col("d1"), col("d2"), col("i").as("n_shared"),
        round(j, 6).as("jaccard"))
  }

  /** Run the full loop: seed the index with the corpus side (doc_id
    * below the 90% split), stream the new docs one FILE per
    * micro-batch, dedup + grow the index per batch, return the
    * accumulated pair list. `slices` controls how many files (and so
    * micro-batches) the new docs arrive in. */
  def runIncrementalDedupStream(spark: SparkSession, dir: String,
                                slices: Int = 3): DataFrame = {
    val tmp = Files.createTempDirectory("graft-stream-dedup-").toString
    val (inDir, indexDir, outDir, ckpt) =
      (s"$tmp/in", s"$tmp/index", s"$tmp/pairs", s"$tmp/ckpt")
    val docs = Tables.documents(spark, dir)
    val split = docs.agg(expr("max(doc_id) * 9 div 10")).head().getLong(0)
    // seed: the corpus side of the session shingle cache becomes the
    // persisted index artifact
    TextOps.hashedShingles(spark, dir).filter(col("doc_id") < split)
      .write.mode("overwrite").parquet(indexDir)
    // the new docs arrive as `slices` files → `slices` micro-batches
    docs.filter(col("doc_id") >= split).repartition(slices)
      .write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // everything inside the micro-batch binds to the STREAM'S
          // (cloned) session — the native functions must be registered
          // there, and the index scan must come from the same session
          // or expression resolution runs against the wrong registry
          val bs = batch.sparkSession
          graft.functions.GraftFunctions.register(bs)
          val idx = bs.read.parquet(indexDir)
          dedupBatchAgainstIndex(batch, idx)
            .write.mode("append").parquet(outDir)
          TextOps.hashedShingleArrays(batch)
            .write.mode("append").parquet(indexDir)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (Files.exists(java.nio.file.Paths.get(outDir)))
      spark.read.parquet(outDir).orderBy(col("d1"), col("d2"))
    else // no batch emitted a pair: empty frame with the pair schema
      dedupBatchAgainstIndex(docs.filter(lit(false)), spark.read.parquet(indexDir))
        .orderBy(col("d1"), col("d2"))
  }

  /** Streaming twin of `text_dedup_incremental` — same oracle: the
    * micro-batched loop must produce exactly the brute-force pair
    * list restricted to new docs. */
  val streamIncremental: Q = Q("stream_dedup_incremental",
    TextOps.dedupIncremental.oracle.get) { (s, dir) =>
    runIncrementalDedupStream(s, dir)
  }

  val all: Seq[Q] = Seq(streamIncremental)
}
