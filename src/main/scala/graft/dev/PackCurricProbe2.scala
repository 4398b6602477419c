package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only: fine-grained stage timing INSIDE the text_pack_curriculum
  * plan — reproduces packWholeDocs step by step to find the hot stage. */
object PackCurricProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p2] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("session_warm") { spark.range(1000).selectExpr("sum(id)").collect() }
    t("composite_build") { graft.queries.Curation.compositeSchedule(spark, sfDir) }
    val schedAll = graft.queries.Curation.compositeSchedule(spark, sfDir)
    println(s"[p2] sched partitions = ${schedAll.rdd.getNumPartitions}")
    val sched = schedAll.filter(col("phase") < 4)
      .select(col("ord"), col("doc_id"), col("quartile"))
    t("sched_count_1") { sched.count() }
    t("sched_count_2") { sched.count() }
    val lm = graft.queries.Curation.lmScores(spark, sfDir)
    println(s"[p2] lm partitions = ${lm.rdd.getNumPartitions}")
    t("lm_count") { lm.count() }
    val perDoc = sched
      .join(lm.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .select(lit("curriculum").as("source"), col("ord").as("doc_id"),
        col("n_tokens"))
    t("perdoc_count_1") { perDoc.count() }
    t("perdoc_count_2") { perDoc.count() }
    // ---- packWholeDocs internals, reproduced
    val budget = 512
    val blocks = perDoc
      .withColumn("blk", expr(s"doc_id div ${graft.queries.TextOps.PackBlockDocs}"))
      .groupBy(col("source"), col("blk"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_tokens")))).as("ds"))
      .withColumn("offs",
        expr(s"graft_greedy_pack(transform(ds, x -> x.n_tokens), $budget)"))
      .withColumn("nwin", expr(
        s"(element_at(offs, size(offs)) + greatest(element_at(ds, size(ds)).n_tokens, 1)" +
          s" + ${budget - 1}) div $budget"))
      .persist()
    t("blocks_count_1") { blocks.count() }
    t("blocks_count_2") { blocks.count() }
    val bwo = graft.queries.TextOps.sourcePrefixSum(
        blocks.select(col("source"), col("blk").as("doc_id"), col("nwin")),
        col("nwin"))
      .select(col("source"), col("doc_id").as("blk"), col("start_off").as("w_off"))
    t("bwo_count") { bwo.count() }
    val packed = blocks.join(bwo, Seq("source", "blk"))
      .select(col("source"), col("w_off"),
        posexplode(arrays_zip(col("ds"), col("offs"))).as(Seq("i", "z")))
      .select(col("source"),
        col("z.ds.doc_id").as("doc_id"),
        col("z.ds.n_tokens").as("n_tokens"),
        (col("w_off") + expr(s"z.offs div $budget")).as("seq_id"),
        expr(s"z.offs % $budget").as("offset_in_seq"),
        (col("z.ds.n_tokens") > budget).as("is_split"))
    t("packed_count") { packed.count() }
    val joined = packed
      .select(col("doc_id").as("ord"), col("n_tokens"), col("seq_id"),
        col("offset_in_seq"), col("is_split"))
      .join(sched, Seq("ord"))
      .select(col("ord"), col("doc_id"), col("quartile"), col("n_tokens"),
        col("seq_id"), col("offset_in_seq"), col("is_split"))
    t("joined_count") { joined.count() }
    t("ordered_count") { joined.orderBy(col("ord")).count() }
    t("full_query_rep") {
      graft.SparkEntry.queries("text_pack_curriculum")(spark, sfDir).count()
    }
    spark.stop()
  }
}
