package graft.dev

import graft.GraftSession
import graft.queries.{DedupGraph, TextOps}
import org.apache.spark.sql.functions._

/** Dev-only: per-round timing of the connected-components loop at a
  * given sf — how many rounds, what each costs, where the 30 s of
  * BENCH_r7's text_dedup_clusters went. */
object CcTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[cc] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val pairs = TextOps.nearDupPairs05(spark, dir)
    println(s"[cc] pairs = ${pairs.count()}")
    lap("pair cache build+count")
    val cc = DedupGraph.connectedComponents(pairs.select("d1", "d2"))
    println(s"[cc] clustered docs = ${cc.count()}")
    lap("connected components")
    val q = DedupGraph.dedupClusters.fn(spark, dir)
    println(s"[cc] full query rows = ${q.count()}")
    lap("full query (warm)")
    spark.stop()
  }
}
