package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for sizing intermediates. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.fanOut(graft.sources.Tables.documents(spark, sfDir))
    val shArr = TextOps.shingleArrays(docs).persist()
    val sh = shArr.select(col("doc_id"), explode(col("sh")).as("s")).persist()
    println(s"[probe] docs=${docs.count()} shArr=${shArr.count()} sh=${sh.count()}")
    val sizes = shArr.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val freq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    var t0 = System.nanoTime()
    println(s"[probe] distinct shingles=${freq.count()} in ${(System.nanoTime()-t0)/1e9}%.3f s")
    t0 = System.nanoTime()
    freq.count()
    println(f"[probe] freq again ${(System.nanoTime()-t0)/1e9}%.3f s")
    sh.explain(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val prefix = sh.join(freq, "s")
      .withColumn("rk", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("rk") <= floor(col("n") / 2) + 1)
      .select(col("doc_id"), col("s"))
      .persist()
    println(s"[probe] prefix rows=${prefix.count()}")
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .persist()
    println(s"[probe] cands=${cands.count()}")
    val candDocs = cands.select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
    println(s"[probe] candDocs=${candDocs.count()}")
    spark.stop()
  }
}
