package graft.dev

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: does localCheckpoint inherit (exploding) size estimates? */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst").persist()
    edges.count()
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v")).localCheckpoint()
    def jump(df: DataFrame): DataFrame = df.as("a")
      .join(df.select(col("v").as("pv"), col("lbl").as("plbl")).as("p"),
        col("a.lbl") === col("pv"), "left")
      .select(col("a.v").as("v"), coalesce(col("plbl"), col("a.lbl")).as("lbl"))
    for (r <- 0 until 6) {
      val prop = edges.join(labels, col("src") === col("v"))
        .select(col("dst").as("v"), col("lbl"))
      val stepped = labels.union(prop).groupBy("v").agg(min("lbl").as("lbl")).persist()
      val j1 = jump(stepped).localCheckpoint()
      val next = jump(j1).localCheckpoint()
      stepped.unpersist()
      labels = next
      val bits = labels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      println(s"[stats] round $r labels sizeInBytes bitLength = $bits")
    }
    spark.stop()
  }
}
