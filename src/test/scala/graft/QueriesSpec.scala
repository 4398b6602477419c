package graft

import org.apache.spark.sql.functions._

/** Every registered query runs at sf0.001 and respects basic result
  * invariants. Value-level correctness is gated by the DuckDB oracle
  * (Verify + driver t2); these specs pin structure + semantics. */
class QueriesSpec extends SparkSpec {

  test("GraftSession.attach exposes native functions and strategy") {
    GraftSession.attach(spark)
    import spark.implicits._
    val r = Seq(("abc")).toDF("s")
      .selectExpr("graft_fingerprint64(s)").head.getLong(0)
    assert(r == graft.functions.RollingHash.reference("abc"))
    assert(spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
  }

  test("registry names are unique and every oracle has a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry if !q.name.startsWith("stream")) {
    test(s"${q.name} runs and returns a stable schema") {
      val df = q.fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("tpch_sql_q17: correlated scalar subquery decorrelates (no per-row subquery)") {
    val plan = graft.queries.Relational.sqlQ17.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalarSubquery"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("fraud_daily_metrics: fraud rate bounded, one row per day") {
    val df = SparkEntry.queries("fraud_daily_metrics")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getAs[java.sql.Date]("day")).distinct.length == rows.length)
    assert(rows.forall { r =>
      val fr = r.getAs[Double]("fraud_rate"); fr >= 0.0 && fr <= 1.0
    })
  }

  test("fraud_scored_events: prediction equals proba>=0.5 decision") {
    val df = SparkEntry.queries("fraud_scored_events")(spark, sf)
    val bad = df.filter(
      (col("proba") >= 0.5 && col("prediction") =!= 1) ||
      (col("proba") < 0.5 && col("prediction") =!= 0)).count()
    assert(bad == 0)
  }

  test("tpch_topk_orders: descending and globally maximal") {
    val df = SparkEntry.queries("tpch_topk_orders")(spark, sf)
    val top = df.collect().map(_.getAs[Double]("o_totalprice"))
    assert(top.sameElements(top.sorted.reverse))
    val globalMax = graft.sources.Tables.orders(spark, sf)
      .agg(max(col("o_totalprice"))).head.getDouble(0)
    assert(top.head == globalMax)
  }

  test("tpch_approx_distinct within 5% of exact") {
    // The query's own tolerance booleans must all hold (they're what
    // the oracle hash-checks) ...
    val out = SparkEntry.queries("tpch_approx_distinct")(spark, sf)
      .select(col("l_returnflag"), col("within_5pct")).collect()
    assert(out.nonEmpty && out.forall(_.getBoolean(1)),
      out.map(r => s"${r.getString(0)}=${r.getBoolean(1)}").mkString(","))
    // ... and the raw sketch (not part of the verified projection)
    // independently tracks the exact count.
    val approx = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
        countDistinct(col("l_orderkey")).as("e")).collect()
    for (r <- approx)
      assert(math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2) < 0.05,
        s"flag ${r.getString(0)}: ${r.getLong(1)} vs ${r.getLong(2)}")
  }

  test("approx_percentile tracks exact percentile (scale path for quantiles)") {
    val events = graft.sources.Tables.events(spark, sf)
    val row = events.agg(
      expr("percentile(value, 0.9)").as("exact"),
      expr("approx_percentile(value, 0.9, 1000)").as("approx")).head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }

  test("text_pack_sequences: every doc packed exactly once, dense seq ids per source") {
    val packed = SparkEntry.queries("text_pack_sequences")(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(packed.agg(sum(col("n_docs"))).head.getLong(0) == docs)
    val sparse = packed.groupBy(col("source"))
      .agg(max(col("seq_id")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") - 1)
    assert(sparse.count() == 0) // seq ids are 0..max with no gaps
  }

  test("retention cohorts: offset 0 is the full cohort, later cells never exceed it") {
    val df = SparkEntry.queries("fraud_retention_cohorts")(spark, sf).cache()
    assert(df.filter(col("day_offset") === 0 && col("retention") =!= 1.0).count() == 0)
    assert(df.filter(col("retention") > 1.0 || col("day_offset") < 0).count() == 0)
    // every user appears in exactly one cohort's offset-0 cell
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(df.filter(col("day_offset") === 0).agg(sum(col("n_users"))).head.getLong(0) == users)
  }

  test("set ops partition correctly: union = except ∪ intersect (disjointly)") {
    val u = SparkEntry.queries("tpch_set_union")(spark, sf).count()
    val e = SparkEntry.queries("tpch_set_except")(spark, sf).count()
    val i = SparkEntry.queries("tpch_set_intersect")(spark, sf).count()
    val building = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(u == building + e)
    assert(e + i == graft.sources.Tables.customer(spark, sf).filter(col("c_acctbal") > 5000.0).count())
  }

  test("pagerank: one rank per nation, base floor, leaked-dangling mass bound") {
    val out = SparkEntry.queries("graph_pagerank_nations")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nn = graft.sources.Tables.nation(spark, sf).count()
    assert(out.size == nn, s"${out.size} ranks for $nn nations")
    // every node receives at least the teleport base (0.15/N)
    assert(out.values.forall(_ >= 0.15 / nn - 1e-9), out.toString)
    // dangling mass only leaks: total never exceeds 1
    val total = out.values.sum
    assert(total > 0.15 && total <= 1.0 + 1e-6, s"total=$total")
  }
}
