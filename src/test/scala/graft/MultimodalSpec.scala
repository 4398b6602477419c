package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload schema, deterministic stubbed
  * decode via mapPartitions, metadata consistency. */
class MultimodalSpec extends SparkSpec {

  test("media table exposes binary payload + typed metadata") {
    val media = Multimodal.mediaTable(spark, sf)
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("format") == "string")
    assert(schema("width") == "int" && schema("height") == "int")
  }

  test("feature extraction is deterministic and consistent with payload") {
    val media = Multimodal.mediaTable(spark, sf)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    // n_bytes equals document n_chars (ascii corpus)
    val chars = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f1.forall(f => f.n_bytes.toLong == chars(f.doc_id)))
    assert(f1.forall(f => f.mean_intensity > 0 && f.n_frames >= 1))
  }

  test("partition count survives mapPartitions (no implicit shuffle)") {
    val media = Multimodal.mediaTable(spark, sf).repartition(3)
    val out = Multimodal.extractFeatures(media)
    assert(out.rdd.getNumPartitions == 3)
  }
}
