package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The [[graft.GraftExtensions]] injector — the path a spark-submit /
  * Thrift-server / notebook user takes via
  * `spark.sql.extensions=graft.GraftExtensions`, where the library
  * never builds the session. That string form is a STATIC conf that
  * only a fresh SparkContext reads (the test JVM shares one context),
  * so the suite drives the same injector through
  * `builder.withExtensions(new GraftExtensions)` on a second session:
  * functions, planner strategy, and the optimizer rule must all
  * arrive through injection alone (no GraftSession.attach). */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtensionsSession[A](body: SparkSession => A): A = {
    val shared = spark // force the lazy shared session BEFORE clearing,
    // or its first access inside the cleared window would capture s2
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      body(s2) // shares the JVM-wide SparkContext; never stop() it
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("injected functions resolve in SQL on a config-built session") {
    withExtensionsSession { s2 =>
      val r = s2.sql("SELECT graft_fingerprint64('abc') AS fp").head.getLong(0)
      assert(r == graft.functions.RollingHash.reference("abc"))
      assert(s2 ne spark)
    }
  }

  test("injected rule + strategy plan the row_number idiom as TopKPerKeyExec") {
    withExtensionsSession { s2 =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val topk = Tables.orders(s2, sf)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .drop("rn")
      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey ["), plan)
      assert(topk.count() > 0)
    }
  }
}
