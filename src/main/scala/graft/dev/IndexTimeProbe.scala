package graft.dev
import graft.GraftSession
import graft.queries.{AnnIndexStore, PqAnn}
import graft.sources.Tables
object IndexTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val emb = Tables.embeddings(spark, dir)
    var t0 = System.nanoTime()
    val idx = PqAnn.buildIndex(emb)
    val store = new AnnIndexStore(java.nio.file.Files.createTempDirectory("idxprobe_").toString)
    val v = store.register(spark, idx, "probe")
    store.promote("probe", v)
    println(f"[idx] build+write ${(System.nanoTime()-t0)/1e9}%.3f s")
    t0 = System.nanoTime()
    val re = store.loadProduction(spark, "probe").get
    println(f"[idx] load ${(System.nanoTime()-t0)/1e9}%.3f s")
    t0 = System.nanoTime()
    val n = PqAnn.queryIndex(emb, re).count()
    println(f"[idx] query-from-index ${(System.nanoTime()-t0)/1e9}%.3f s (rows=$n)")
    t0 = System.nanoTime()
    val n2 = PqAnn.annTopK(emb).count()
    println(f"[idx] build+query-fresh ${(System.nanoTime()-t0)/1e9}%.3f s (rows=$n2)")
    spark.stop()
  }
}
