package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based near-dup detection — the 100 TB-scale paths that
  * replace the exact shingle self-join of [[TextOps.dedupNear]]:
  *
  *  - MinHash + LSH banding: k seeded xxhash64 min-hashes per doc →
  *    band keys → equi-join on (band, band-hash) generates candidate
  *    pairs; exact Jaccard re-check only on candidates. Cost is
  *    O(docs·shingles) + a hash-partitioned join on band keys —
  *    never O(docs²).
  *  - SimHash: 64-bit signature from token hashes; near-dups have
  *    small Hamming distance; chunk-equality banding (4×16 bit) makes
  *    candidate generation an equi-join (Hamming ≤ 3 ⇒ ≥1 chunk
  *    equal, pigeonhole).
  *
  * No DuckDB oracle (xxhash64 is Spark-specific); correctness is
  * pinned by ScalaTest: LSH candidates must recover every pair the
  * exact Jaccard query finds at the same threshold, on both the
  * driver corpus and synthetic planted duplicates.
  */
object MinHashDedup {

  val NumHashes  = 64
  val Bands      = 16
  val RowsPerBand = NumHashes / Bands // 4 → candidates at J ≳ (1/16)^(1/4) ≈ 0.5

  private def r6(c: Column): Column = round(c, 6)

  /** MinHash signature per doc: hash each shingle ONCE (xxhash64 over
    * the string bytes), then derive the k per-seed values by
    * re-hashing the 8-byte base hash with the seed — the standard
    * "one strong hash + k cheap mixes" construction. Hashing the full
    * string k times would multiply the dominant cost (string-byte
    * hashing) by k for no statistical gain. Computed per row with
    * HOFs over the shingle array — a pure map stage, no explode, no
    * shuffle. Input: (doc_id, sh: array<string>) from
    * [[TextOps.shingleArrays]]. */
  def signatures(shArr: DataFrame): DataFrame =
    shArr
      .withColumn("hs", expr("transform(sh, s -> xxhash64(s))"))
      .select(
        col("doc_id"),
        expr(s"transform(sequence(0, ${NumHashes - 1}), " +
          "j -> array_min(transform(hs, h -> xxhash64(j, h))))").as("sig"),
        size(col("sh")).cast("long").as("n_shingles"))

  /** Band keys: hash of each RowsPerBand-slice of the signature. */
  def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("n_shingles"),
      posexplode(array((0 until Bands).map { b =>
        xxhash64((b * RowsPerBand until (b + 1) * RowsPerBand)
          .map(i => col("sig").getItem(i)): _*)
      }: _*)).as(Seq("band", "band_hash")))

  /** Candidate pairs from LSH banding, with MinHash-estimated and
    * exact shingle Jaccard, filtered at `threshold` on the exact
    * value. */
  def nearDupPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // fanOut + eager materialization: the shingle/signature HOFs are
    // the CPU-heavy map stages; spread them across cores and pin them
    // in cache BEFORE the multi-branch candidate DAG references them.
    val shArr = TextOps.shingleArrays(graft.sources.Tables.fanOut(docs)).cache()
    val sigs  = signatures(shArr).cache()
    sigs.count()
    val bands = banded(sigs)

    // cands feeds three branches (candDocs, the signature join, the
    // left-semi on the exact recheck) — pin it to one evaluation.
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .persist()
    cands.count()

    // MinHash estimate: fraction of agreeing signature positions.
    val sigPair = cands
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("sig1"), col("n_shingles").as("n1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("sig2"), col("n_shingles").as("n2")), "d2")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig1"), col("sig2"), (x, y) => (x === y).cast("int")),
          lit(0), (acc, v) => acc + v).cast("double") / lit(NumHashes))

    // Exact re-check restricted to candidates: prune to candidate
    // docs FIRST (broadcast semi-join on the small candidate-id set)
    // and only then explode their shingles, so the inverted-index
    // pair join touches ~|candidates| docs, not the whole corpus —
    // this keeps the re-check O(dups) instead of O(corpus²) at scale.
    val candDocs = cands
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
    val shC = shArr.join(broadcast(candDocs), "doc_id")
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = shC.as("x")
      .join(shC.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .agg(count(lit(1)).as("i"))

    sigPair
      .join(inter, Seq("d1", "d2"), "left")
      .withColumn("i", coalesce(col("i"), lit(0L)))
      .withColumn("jaccard", col("i").cast("double") / ((col("n1") + col("n2")) - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), r6(col("est_jaccard")).as("est_jaccard"),
        r6(col("jaccard")).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** 64-bit SimHash from token xxhash64s: per bit, sign of Σ(±1).
    *
    * Computed entirely with array higher-order functions *per row* —
    * no explode, no shuffle: fold the token hashes into a 64-wide
    * bit-sum vector, then pack sign bits into one long. At any scale
    * this is a pure map stage over the document scan. */
  def simhashed(docs: DataFrame): DataFrame =
    docs
      .withColumn("hs", expr("transform(split(text, ' '), t -> xxhash64(t))"))
      .withColumn("bitsums", expr(
        """aggregate(hs,
          |  array_repeat(0L, 64),
          |  (acc, h) -> zip_with(acc, sequence(0, 63),
          |                (a, b) -> a + CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END))""".stripMargin))
      .withColumn("simhash", expr(
        """aggregate(zip_with(bitsums, sequence(0, 63),
          |            (s, b) -> CASE WHEN s > 0 THEN shiftleft(1L, b) ELSE 0L END),
          |  0L, (acc, v) -> acc | v)""".stripMargin))
      .select(col("doc_id"), col("simhash"))

  /** SimHash near-dup pairs: 4×16-bit chunk banding (pigeonhole:
    * Hamming ≤ 3 implies an equal chunk) then exact Hamming check. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashed(graft.sources.Tables.fanOut(docs)).cache()
    sigs.count()
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("chunk", "ck")))
    val hamming = {
      val x = col("h1").bitwiseXOR(col("h2"))
      bit_count(x)
    }
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.simhash").as("h1"), col("b.simhash").as("h2"))
      .distinct()
      .withColumn("hamming", hamming.cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }

  // ---------------------------------------------------------------- queries
  /** MinHash-LSH near-dups at the same threshold as the exact query —
    * rows-only in the driver, equivalence asserted in ScalaTest. */
  val minhashNearDups: Q = Q.noOracle("text_dedup_minhash_lsh") { (s, dir) =>
    nearDupPairs(Tables.documents(s, dir), 0.5)
  }

  /** Per-doc SimHash signatures + banded near-dup pairs. */
  val simhashDups: Q = Q.noOracle("text_dedup_simhash") { (s, dir) =>
    simhashPairs(Tables.documents(s, dir))
  }

  val all: Seq[Q] = Seq(minhashNearDups, simhashDups)
}
