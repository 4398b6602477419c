package graft.dev

/** Dev-only: phase-profile the cache_warm_curriculum world build at a
  * given sf dir — plain schedule vs composite schedule walls, so the
  * r19 verdict's "double rank" item can be attributed before fixing. */
object CurricProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[curric-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("session_warm") { spark.range(1000).selectExpr("sum(id)").collect() }
    t("token_counts") { graft.queries.TextOps.tokenCounts(spark, sfDir).count() }
    t("lm_scores_pass1") { graft.queries.Curation.lmScores(spark, sfDir).count() }
    t("lm_scores_pass2") { graft.queries.Curation.lmScores(spark, sfDir).count() }
    t("quality_scores") {
      graft.queries.TextOps.qualityScores(
        graft.sources.Tables.documents(spark, sfDir)).count()
    }
    t("plain_rank_only") {
      val sc = graft.queries.Curation.lmScores(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("avg_logp"))
      graft.queries.Curation.difficultyQuartiles(sc,
        scaled = org.apache.spark.sql.functions.col("avg_logp"),
        inBucketOrder = Seq(org.apache.spark.sql.functions.col("avg_logp").desc,
          org.apache.spark.sql.functions.col("doc_id")),
        bucketAscending = false,
        tieKey = org.apache.spark.sql.functions.col("doc_id")).count()
    }
    t("plain_schedule") { graft.queries.Curation.curriculumSchedule(spark, sfDir) }
    t("composite_schedule") { graft.queries.Curation.compositeSchedule(spark, sfDir) }
    spark.stop()
  }
}
