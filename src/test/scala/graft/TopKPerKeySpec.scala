package graft

import graft.plans.TopKPerKey
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom top-k-per-key operator: physical plan shape, shuffle
  * distribution, and equivalence with the window-function form. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k).drop("rn")
  }

  test("matches window-function top-k exactly") {
    val custom = TopKPerKey(
      Tables.orders(spark, sf).select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    val window = windowTopK(3)
    assert(custom.count() == window.count())
    assert(custom.except(window).count() == 0 && window.except(custom).count() == 0)
  }

  test("plans TopKPerKeyExec with exactly one shuffle on the keys") {
    val custom = TopKPerKey(
      Tables.orders(spark, sf).select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      Seq("o_custkey"), Seq("o_totalprice" -> false), 2)
    // AQE wraps the plan; assert on the rendered tree
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey [o_custkey"), plan)
    val exchanges = plan.split("Exchange hashpartitioning\\(o_custkey").length - 1
    assert(exchanges == 1, plan)
    // no Sort below the operator — that's the point
    assert(!plan.contains("Sort ["), plan)
  }

  test("k larger than any group returns everything") {
    val df = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("key", "v")
    val out = TopKPerKey(df, Seq("key"), Seq("v" -> false), 100)
    assert(out.count() == 3)
  }

  test("duplicate order values respect the tiebreak column") {
    val df = Seq((1, 10.0, "a"), (1, 10.0, "b"), (1, 10.0, "c"), (2, 1.0, "z"))
      .toDF("key", "v", "tag")
    val out = TopKPerKey(df, Seq("key"), Seq("v" -> false, "tag" -> true), 2)
      .select("key", "tag").as[(Int, String)].collect().toSet
    assert(out == Set((1, "a"), (1, "b"), (2, "z")))
  }
}
