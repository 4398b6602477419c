package graft.dev

import graft.GraftSession
import graft.queries.DedupGraph
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev-only: round count + per-phase timing of sim_dedup_semantic. */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[sem] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val emb = Tables.embeddings(spark, dir)
    val x = emb.select(col("label"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val y = emb.select(col("label").as("label_y"), col("vec_id").as("v2"), col("embedding").as("e2"))
    val pairs = x.join(y, col("label") === col("label_y") && col("v1") < col("v2"))
      .withColumn("cos_raw", expr("graft_cosine(e1, e2)"))
      .filter(col("cos_raw") >= 0.3)
      .select(col("v1").as("d1"), col("v2").as("d2"))
    println(s"[sem] edges = ${pairs.count()}")
    lap("pair join")
    val (cc, rounds) = DedupGraph.connectedComponentsWithRounds(pairs)
    println(s"[sem] nodes = ${cc.count()} rounds = $rounds")
    lap("cc")
    spark.stop()
  }
}
