package graft

import graft.plans.{TopKPerKeyStrategy, WindowTopKRewrite}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule leg of the custom-operator stack: the filtered
  * row_number idiom is rewritten to TopKPerKeyExec (no per-partition
  * sort), guarded shapes are left alone, and the rewrite never changes
  * answers. The rule+strategy are attached to the shared session for
  * the duration of the suite and removed afterwards. */
class WindowTopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def attached[A](body: => A): A = {
    val prevStrategies = spark.experimental.extraStrategies
    val prevRules = spark.experimental.extraOptimizations
    spark.experimental.extraStrategies = prevStrategies :+ TopKPerKeyStrategy
    spark.experimental.extraOptimizations = prevRules :+ WindowTopKRewrite
    try body
    finally {
      spark.experimental.extraStrategies = prevStrategies
      spark.experimental.extraOptimizations = prevRules
    }
  }

  private def topkIdiom(k: Int): DataFrame = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .drop("rn")
  }

  test("rewrites the drop-rn idiom to TopKPerKeyExec with no sort and no window") {
    attached {
      val plan = topkIdiom(3).queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey ["), plan)
      assert(!plan.contains("Window ["), plan)
      assert(!plan.contains("Sort ["), plan)
    }
  }

  test("rewritten plan returns exactly the window-form rows") {
    val expected = topkIdiom(3).collect().toSet // rule not attached: window plan
    val got = attached(topkIdiom(3).collect().toSet)
    assert(got == expected)
  }

  test("rn = 1 (argmax idiom) rewrites with k = 1") {
    attached {
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      val latest = Tables.orders(spark, sf)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .drop("rn")
      assert(latest.queryExecution.executedPlan.toString.contains("TopKPerKey ["))
      val viaArgmax = Tables.orders(spark, sf)
        .groupBy($"o_custkey")
        .agg(max_by($"o_orderkey", struct($"o_orderdate", $"o_orderkey")).as("o_orderkey"))
        .select($"o_custkey", $"o_orderkey")
      assert(latest.select($"o_custkey", $"o_orderkey").except(viaArgmax).isEmpty)
    }
  }

  test("fires when the rank column is kept — operator emits row_number natively") {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    def kept: DataFrame = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
    val expected = kept.collect().toSet // rule not attached: window plan
    attached {
      val plan = kept.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey ["), plan)
      assert(!plan.contains("Window ["), plan)
      assert(kept.collect().toSet == expected)
    }
  }

  test("text_tfidf_topk's per-doc cut plans through TopKPerKey when attached") {
    // the graded-path query that keeps `rn` in its output: with the
    // engine attached its window+filter must become the heap operator
    val expected = graft.queries.TextOps.tfidfTopK.fn(spark, sf).collect().toSeq
    attached {
      val df = graft.queries.TextOps.tfidfTopK.fn(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey ["), plan)
      assert(!plan.contains("Window ["), plan)
      assert(df.collect().toSeq == expected) // ordered output equality
    }
  }

  test("drop-rn idiom plans rankOutput=None; kept-rn plans rankOutput=Some") {
    // the Project case must claim the Project(Filter(Window)) shape
    // before the bare-Filter case (top-down traversal) — otherwise
    // every rewrite pays the rank-emitting JoinedRow projection even
    // when the query drops `rn`
    attached {
      def topkNodes(df: DataFrame) = df.queryExecution.optimizedPlan.collect {
        case t: graft.plans.TopKPerKeyPlan => t
      }
      val dropped = topkNodes(topkIdiom(3))
      assert(dropped.nonEmpty, "drop-rn idiom did not rewrite")
      assert(dropped.forall(_.rankOutput.isEmpty),
        s"rank emitted for a projection that drops it: $dropped")
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      val kept = Tables.orders(spark, sf)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
      val keptNodes = topkNodes(kept)
      assert(keptNodes.nonEmpty && keptNodes.forall(_.rankOutput.isDefined), s"$keptNodes")
    }
  }

  test("does not fire for rank() — tie semantics differ") {
    attached {
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
      val ranked = Tables.orders(spark, sf)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .withColumn("rn", rank().over(w))
        .filter($"rn" <= 3)
        .drop("rn")
      assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKey ["))
    }
  }

  test("randomized equivalence with the window form (total order, varied k)") {
    // duplicate sort values exercised via a coarse double grid; the
    // unique id tiebreak keeps the order total so both plans must
    // return the identical set
    for (seed <- Seq(1, 7, 42); k <- Seq(1, 3, 8)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(500)(i => (rnd.nextInt(10).toLong, (rnd.nextInt(20) / 4.0), i.toLong))
      val df = spark.createDataFrame(rows).toDF("key", "v", "id")
      val w = Window.partitionBy($"key").orderBy($"v".desc, $"id")
      def idiom(d: DataFrame) = d.withColumn("rn", row_number().over(w))
        .filter($"rn" <= k).drop("rn")
      val expected = idiom(df).collect().toSet       // window plan
      val got = attached(idiom(df).collect().toSet)  // rewritten plan
      assert(got == expected, s"seed=$seed k=$k")
    }
  }

  test("does not fire past MaxK or when disabled by conf") {
    attached {
      val big = topkIdiom(WindowTopKRewrite.MaxK + 1)
      assert(!big.queryExecution.executedPlan.toString.contains("TopKPerKey ["))
      spark.conf.set("spark.graft.topkRewrite.enabled", "false")
      try {
        val off = topkIdiom(3)
        assert(!off.queryExecution.executedPlan.toString.contains("TopKPerKey ["))
      } finally spark.conf.unset("spark.graft.topkRewrite.enabled")
    }
  }
}
