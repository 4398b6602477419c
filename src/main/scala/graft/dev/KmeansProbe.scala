package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only: print trained k-means centroids with full precision. */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val vv = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v")).persist()
    val cents = graft.queries.Kmeans.train(vv)
    cents.zipWithIndex.foreach { case (c, k) =>
      c.zipWithIndex.foreach { case (v, d) => println(f"CENT $k $d ${v}%.17g") }
    }
    spark.stop()
  }
}
