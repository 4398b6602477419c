package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only: count the quality-FLIP docs (heuristic vs learned gate
  * decisions differ) at each SF — the gated-emission certificate is
  * vacuous if no flips exist at a verified scale. */
object FlipProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[16]", 16)
    spark.sparkContext.setLogLevel("WARN")
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val model = graft.ml.QualityModel.closedForm(spark, dir)
      val dec = graft.queries.TextOps.curationDecisions(spark, dir)
      val learned = graft.queries.TextOps.curationLearnedDecisions(spark, dir, model)
      val flips = dec.select(col("doc_id"), col("source"), col("drop_reason").as("h"))
        .join(learned.select(col("doc_id"), col("drop_reason").as("l")), Seq("doc_id"))
        .filter(!(col("h") <=> col("l")))
        .cache()
      val n = flips.count()
      val nonQuality = flips.filter(
        !((col("h").isNull || col("h") === "low_quality")
          && (col("l").isNull || col("l") === "low_quality"))).count()
      val srcs = flips.select(col("source")).distinct().count()
      val allSrcs = dec.select(col("source")).distinct().count()
      println(s"FLIPS $dir n=$n non_quality=$nonQuality flip_sources=$srcs/$allSrcs")
      flips.groupBy(col("h"), col("l")).count().show(20, truncate = false)
      flips.unpersist()
    }
    spark.stop()
  }
}
