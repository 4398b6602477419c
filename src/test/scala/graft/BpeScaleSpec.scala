package graft

import graft.queries.{Curation, TextOps}
import org.apache.spark.sql.functions._

/** The BPE trainer and the literal-folded encode PAST the toy vocab:
  * the 16-merge release run stays the DuckDB-oracle exactness anchor
  * (`text_bpe_train` / `text_bpe_encode` / the emission family), and
  * this suite certifies the SAME code path at 256 merges with the
  * device the repo uses for unoracle-able tiers — exact structural
  * pins instead of an unrolled 256-CTE oracle (the binding
  * constraint is the oracle strategy, not the trainer or the encode).
  *
  * The corpus vocabulary is too small to sustain 256 merges (the
  * trainer exhausts when every unit is a single symbol), so the
  * large run trains at word-BIGRAM granularity — the
  * SentencePiece-style unit a production tokenizer actually uses
  * (joiner `_` in place of the space so the double-space state
  * machine's separators stay unambiguous). Frequencies are corpus
  * bigram counts, so the run is deterministic and corpus-derived.
  */
class BpeScaleSpec extends SparkSpec {
  import spark.implicits._

  private val BigRounds = TextOps.ReleaseRounds

  /** The SHARED release artifacts `text_bpe_release256` ships — the
    * suite certifies exactly the memoized table the oracle-gated
    * certificate exposes, not a private retrain. */
  private lazy val bigramVocab = TextOps.bigramVocabStats(spark, sf)._1

  private lazy val merges256 = TextOps.bigramMerges(spark, sf)

  test("B1: 256-round train sustains 256 genuine merges (no early exhaustion)") {
    assert(bigramVocab.count() >= 256,
      s"bigram vocab ${bigramVocab.count()} too small to force 256 merges")
    assert(merges256.size == BigRounds)
    assert(merges256.map(_._1) == (1 to BigRounds),
      "merge rounds must be dense 1..256")
  }

  test("B2: merge-table prefix property — first 16 of the 256-round run equal a 16-round run") {
    val m16 = TextOps.learnBpeMergesSeq(spark, bigramVocab, 16,
      vocabRows = bigramVocab.count())
    assert(merges256.take(16) == m16,
      "the trainer must be round-prefix deterministic")
  }

  test("B3: parameterized trainer at the release rounds equals the oracle-checked anchor") {
    // the SAME path `bpeMerges` memoizes — run fresh on the corpus
    // vocab and compare against the oracle-gated merge table
    val (vocab, n) = Curation.vocabStats(spark, sf)
    val fresh = TextOps.learnBpeMergesSeq(spark,
      vocab.select(col("tok").as("word"), col("c").as("freq")),
      rounds = 16, vocabRows = n)
    assert(fresh == TextOps.bpeMerges(spark, sf))
  }

  test("B4: 256-merge literal-folded encode is lossless over the whole vocab") {
    val bad = bigramVocab.select(col("word"),
        concat_ws("", TextOps.bpeSegmentsWith(merges256, col("word"))).as("re"))
      .filter(col("word") =!= col("re")).count()
    assert(bad == 0, s"$bad units fail lossless reassembly at 256 merges")
  }

  test("B5: compression is monotone in merge rounds and strict by 256") {
    def mass(rounds: Int): Long = {
      val m = merges256.take(rounds)
      bigramVocab.select(
          (col("freq") * size(TextOps.bpeSegmentsWith(m, col("word")))).as("m"))
        .agg(sum(col("m"))).head().getLong(0)
    }
    val chars = bigramVocab.select(sum(col("freq") * length(col("word"))))
      .head().getLong(0)
    val (m16, m64, m256) = (mass(16), mass(64), mass(256))
    assert(chars >= m16 && m16 >= m64 && m64 >= m256,
      s"token mass must be non-increasing: chars=$chars m16=$m16 m64=$m64 m256=$m256")
    assert(m256 < m16, "256 merges must strictly out-compress 16")
  }

  test("B6: the 256-merge symbol table stays bounded and its id space dense") {
    val seg = bigramVocab.select(col("word"), col("freq"),
      TextOps.bpeSegmentsWith(merges256, col("word")).as("syms")).persist()
    val symtab = seg.select(explode(col("syms")).as("sym")).distinct()
    val alphabet = bigramVocab
      .select(explode(split(col("word"), "")).as("ch")).distinct().count()
    val nSyms = symtab.count()
    // bounded BY CONSTRUCTION: a symbol is a single char or one of the
    // ≤ rounds merged strings — the broadcast-gate argument of the
    // emission id table, now demonstrated at production merge counts
    assert(nSyms <= alphabet + BigRounds,
      s"$nSyms symbols exceeds |alphabet|=$alphabet + $BigRounds")
    // dense sorted-rank ids (the release id-assignment rule): ids are
    // exactly 0..K-1
    val ids = symtab.withColumn("id", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("sym"))) - 1).cast("long"))
    val r = ids.agg(min(col("id")), max(col("id")), count(lit(1))).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == r.getLong(2) - 1)
    // fertility on the larger vocab: every unit segments, no nulls,
    // and the frequency-weighted id mass conserves the B5 token mass
    val fert = seg.select(col("word"), col("freq"), size(col("syms")).as("n_sym"))
    assert(fert.filter(col("n_sym") < 1).count() == 0)
    val idMass = fert.agg(sum(col("freq") * col("n_sym"))).head().getLong(0)
    val m256 = bigramVocab.select(
        (col("freq") * size(TextOps.bpeSegmentsWith(merges256, col("word")))).as("m"))
      .agg(sum(col("m"))).head().getLong(0)
    assert(idMass == m256, "id-frequency mass must equal the encoded token mass")
    seg.unpersist()
    ()
  }
}
