package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only: stage-profile text_pack_curriculum (16.3 s/rep in the
  * r20 baseline bench vs 0.285 s for text_pack_whole_docs on the same
  * kernel) — times the schedule resolve, the perDoc join, the greedy
  * pack, and the full query, so the regression localizes to a stage
  * before fixing. */
object PackCurricProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[pack-curric-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("session_warm") { spark.range(1000).selectExpr("sum(id)").collect() }
    t("composite_build") { graft.queries.Curation.compositeSchedule(spark, sfDir) }
    t("composite_resolve") { graft.queries.Curation.compositeSchedule(spark, sfDir) }
    val sched = graft.queries.Curation.compositeSchedule(spark, sfDir)
      .filter(col("phase") < 4)
      .select(col("ord"), col("doc_id"), col("quartile"))
    t("sched_count") { sched.count() }
    val perDoc = sched
      .join(graft.queries.Curation.lmScores(spark, sfDir)
        .select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .select(lit("curriculum").as("source"), col("ord").as("doc_id"),
        col("n_tokens"))
    t("perdoc_count") { perDoc.count() }
    t("pack_count") { graft.queries.TextOps.packWholeDocs(perDoc).count() }
    t("full_query_rep1") {
      graft.SparkEntry.queries("text_pack_curriculum")(spark, sfDir).count()
    }
    t("full_query_rep2") {
      graft.SparkEntry.queries("text_pack_curriculum")(spark, sfDir).count()
    }
    println("---- full query explain ----")
    graft.SparkEntry.queries("text_pack_curriculum")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
