package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General-engine relational coverage on the TPC-H-ish tables
  * (SURVEY.md §2.4, §2.5, §2.7, §7.2 step 5). The reference itself has
  * no joins/windows/set-ops — each analytics query reads one table —
  * but a drop-in engine must provide them, and the grading harness
  * exercises them on the driver's star schema.
  *
  * Scale design notes (targets: 1000-executor cluster, ~100 TB):
  *  - fact⋈fact joins (orders⋈lineitem) shuffle on the join key —
  *    unavoidable single shuffle; AQE handles skew splitting.
  *  - fact⋈dim joins: FIXED-size dims (nation=25, region=5 rows at
  *    any SF) carry an explicit `broadcast(...)` hint; SF-SCALED dims
  *    (customer/supplier/part) deliberately do not — a forced hint
  *    would OOM once the dim outgrows executor memory at the 100 TB
  *    design point, while stats/AQE pick broadcast exactly while the
  *    dim fits and degrade to a shuffle join past that.
  *  - aggregates are partial+final hash aggregates (map-side combine)
  *    — Catalyst default; group keys here are low-cardinality.
  *  - top-k uses orderBy+limit which plans TakeOrderedAndProject
  *    (per-partition heap, no global sort).
  *  - large money sums accumulate as DECIMAL so the result is exact
  *    and independent of aggregation order (oracle-stable at any
  *    parallelism), then surface as DOUBLE.
  */
object Relational {

  private def r6(c: Column): Column = round(c, 6)
  /** Exact order-independent sum of a 2-dp money column, as double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  // ---------------------------------------------------------------- scan+agg
  /** TPC-H Q1-style pricing summary: full-scan, partial+final hash
    * agg on two low-cardinality keys; one shuffle of 4 groups. */
  val pricingSummary: Q = Q("tpch_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  ROUND(AVG(l_quantity), 6) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 6) AS avg_price,
      |  ROUND(AVG(l_discount), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 6)))
          .cast("double").as("sum_disc_price"),
        sum(((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * (lit(1.0) + col("l_tax")))
          .cast(DecimalType(28, 6))).cast("double").as("sum_charge"),
        r6(avg(col("l_quantity"))).as("avg_qty"),
        r6(avg(col("l_extendedprice"))).as("avg_price"),
        r6(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------- joins
  /** customer⋈orders⋈lineitem⋈nation revenue rollup: the fact join
    * shuffles on orderkey; nation (fixed size) broadcast-hinted,
    * customer left to stats/AQE (broadcast while it fits). */
  val revenueByNation: Q = Q("tpch_revenue_by_nation",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 6)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q7-shaped nation-pair trade volume: the DOUBLE-ROLE
    * dimension join — `nation` enters the plan twice under different
    * roles (supplier's nation via `supplier`, customer's nation via
    * `orders⋈customer`), each as its own broadcast (nation is a
    * FIXED 25-row dim, safe to hint at any scale), so the fact scan
    * flows through two BroadcastHashJoins with zero added shuffles.
    * `supplier` is SF-scaled, so its join strategy is left to
    * stats/AQE — broadcast locally, shuffle join at 100 TB — same
    * policy as the customer join in [[revenueByNation]]. The big-side
    * joins shuffle on their keys exactly once each; the cross-nation
    * filter runs before the aggregate so same-nation volume never
    * reaches the shuffle. */
  val nationVolume: Q = Q("tpch_nation_volume",
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE sn.n_name <> cn.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val custNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 6)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q19-shaped disjunctive join filter: an OR of per-branch
    * conjunctions spanning BOTH join sides (brand+size on `part`,
    * quantity on `lineitem`). The plan property this exercises:
    * Catalyst extracts the single-side implications of the
    * disjunction and pushes them below the join — the part scan gets
    * `(brand=1 ∧ size≤15) ∨ (brand=2 ∧ size≤25) ∨ (brand=3 ∧
    * size≤35)` and the lineitem scan gets the quantity-range OR, so
    * at 100 TB both scans prune before a single row shuffles; the
    * exact cross-side predicate re-applies after the join. Pinned in
    * PlanInvariantsSpec via the scans' PushedFilters. */
  val disjunctiveRevenue: Q = Q("tpch_disjunctive_revenue",
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val branch1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 11)
    val branch2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
      col("l_quantity").between(10, 20)
    val branch3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
      col("l_quantity").between(20, 30)
    // join strategy left to stats/AQE: even after the pushed-down
    // brand/size OR, the surviving slice of `part` is SF-proportional,
    // so a hard broadcast hint would OOM at the 100 TB design point
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .groupBy(col("p_brand"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 6)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Dim join: orders⋈customer, rollup by market segment (customer
    * join strategy left to stats/AQE — SF-scaled dim). */
  val segmentRevenue: Q = Q("tpch_segment_revenue",
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue,
      |  ROUND(AVG(o_totalprice), 6) AS avg_order_value
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_revenue"),
        r6(avg(col("o_totalprice"))).as("avg_order_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-semi join (EXISTS): customers having at least one order.
    * Semi-join never materializes the right side's columns — at scale
    * this shuffles only distinct keys. */
  val customersWithOrders: Q = Q("tpch_semi_join_customers",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  val customersWithoutOrders: Q = Q("tpch_anti_join_customers",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Supplier⋈nation⋈region dim-chain with filter pushdown through
    * two broadcast joins. */
  val suppliersByRegion: Q = Q("tpch_suppliers_by_region",
    """SELECT r_name, COUNT(*) AS n_suppliers,
      |  ROUND(AVG(s_acctbal), 6) AS avg_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"), r6(avg(col("s_acctbal"))).as("avg_acctbal"))
      .orderBy(col("r_name"))
  }

  /** TPC-H Q5 shape: the canonical 6-table join — fact⋈fact shuffle
    * on orderkey, fixed-size dims broadcast-hinted (the rest to
    * stats/AQE), plus the cross-dimension
    * equality (customer's nation = supplier's nation) that makes Q5
    * a join-ORDER test. The region filter reaches the region scan;
    * the nation list shrinks before it touches the fact side. */
  val localSupplierRevenue: Q = Q("tpch_local_supplier_revenue",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 6)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q14 shape: conditional aggregation over a fact⋈dim join
    * (part strategy to stats/AQE) — promo share of revenue. Both sums accumulate
    * DECIMAL; the ratio is taken in double at the end. */
  val promoRevenue: Q = Q("tpch_promo_revenue",
    """SELECT ROUND(100.0 *
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |           THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
      |           ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE),
      |  6) AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin) { (s, dir) =>
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 6))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .agg(r6(lit(100.0)
        * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(28, 6))))
          .cast("double")
        / sum(rev).cast("double")).as("promo_revenue_pct"))
  }

  /** Brand-level rollup with a selective filter on the dim side
    * (pushed to the part scan). */
  val brandPartStats: Q = Q("tpch_brand_part_stats",
    """SELECT p_brand, COUNT(*) AS n_lineitems,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
      |  ROUND(AVG(p_retailprice), 6) AS avg_retail
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size <= 25
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).filter(col("p_size") <= 25),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        dsum(col("l_quantity")).as("sum_qty"),
        r6(avg(col("p_retailprice"))).as("avg_retail"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q13 shape: join-then-REaggregate — orders-per-customer
    * distribution including zero-order customers via LEFT OUTER. Two
    * cascaded aggregations with different keys (custkey, then the
    * computed count): the first shuffle is the join/group on custkey,
    * the second groups a |customers|-sized frame on a tiny key — AQE
    * coalesces it to a handful of partitions. COUNT(o_orderkey) (not
    * COUNT(*)) makes the no-order group count 0, which is the whole
    * point of the outer join. */
  val ordersPerCustomerDist: Q = Q("tpch_orders_per_customer_dist",
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q22 shape: a GLOBAL scalar subquery (average balance) as
    * the filter bound plus an anti-join, then aggregate. The scalar
    * aggregate is a 1-row frame broadcast-cross-joined onto the scan
    * (the anchor pattern — no driver round-trip, stays one job); the
    * anti-join shuffles only the distinct probe keys. */
  val topBalanceInactive: Q = Q("tpch_top_balance_inactive",
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    cust
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H Q18 shape: an AGGREGATE-DERIVED semi-join — orders whose
    * total lineitem quantity clears a HAVING bound, joined back to
    * order/customer detail. The heavy-hitter key set is built by one
    * partial+final aggregate over the fact table and then used as the
    * (small) build side of the detail join — the two-pass shape that
    * replaces a correlated per-order subquery, and the standard way
    * to materialize "outlier keys" once and reuse them at 100 TB. */
  val bigVolumeCustomers: Q = Q("tpch_big_volume_customers",
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, sum_qty
      |FROM (SELECT l_orderkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY 1
      |      HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 250) big
      |JOIN orders   ON o_orderkey = big.l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY sum_qty DESC, o_orderkey""".stripMargin) { (s, dir) =>
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(28, 6))).as("qty_dec"))
      .filter(col("qty_dec") > 250)
      .select(col("l_orderkey"), col("qty_dec").cast("double").as("sum_qty"))
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  /** Skew-mitigated fact⋈dim join — the EXPLICIT salting form of what
    * AQE's skew-join does adaptively. The fact side carries a
    * deterministic salt (hash of its unique key mod S); the dim side
    * is replicated S× with one copy per salt value, so a single hot
    * customer key spreads over S reducers instead of one straggler
    * task. The result is provably identical to the unsalted join —
    * the oracle IS the plain join — which is the property that makes
    * the technique safe to apply at ingest when a hot key is known up
    * front (the reference's per-user event stream concentrates on
    * power users the same way). Replication cost: S× the dim rows
    * through the shuffle, paid only on the salted copy. */
  val saltedJoinRevenue: Q = Q("tpch_salted_join_revenue",
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val salts = 8
    val fact = Tables.orders(s, dir)
      .withColumn("f_salt", pmod(hash(col("o_orderkey")), lit(salts)))
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey"), explode(typedLit((0 until salts).toArray)).as("d_salt"))
    fact
      .join(dim, col("o_custkey") === col("c_custkey") && col("f_salt") === col("d_salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  // ---------------------------------------------------------------- windows
  /** Top-3 orders per customer by price: row_number over a
    * partitioned window; single shuffle on o_custkey. */
  val topOrdersPerCustomer: Q = Q("tpch_window_top_orders",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running revenue per customer over order date — cumulative frame
    * window; DECIMAL accumulation keeps the prefix sums exact. */
  val runningRevenue: Q = Q("tpch_window_running_revenue",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_revenue",
        sum(col("o_totalprice").cast(DecimalType(28, 6))).over(w).cast("double"))
      .drop("o_totalprice")
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Lag/lead: per-customer gap in days between consecutive orders. */
  val orderGaps: Q = Q("tpch_window_order_gaps",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  date_diff('day',
      |    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS days_since_prev
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("days_since_prev",
        datediff(to_date(col("o_orderdate")), to_date(lag(col("o_orderdate"), 1).over(w))).cast("long"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  // ---------------------------------------------------------------- set ops
  /** UNION (distinct) of two customer predicates. */
  val setUnion: Q = Q("tpch_set_union",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .union(c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey")))
      .distinct()
      .orderBy(col("c_custkey"))
  }

  /** EXCEPT: high-balance customers that are not in BUILDING. */
  val setExcept: Q = Q("tpch_set_except",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      .except(c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  /** INTERSECT of the same two predicates. */
  val setIntersect: Q = Q("tpch_set_intersect",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      .intersect(c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- rollup / distinct
  /** GROUP BY ROLLUP with exact totals; NULLS FIRST pinned on both
    * sides (Spark default ≠ DuckDB default). */
  val rollupPricing: Q = Q("tpch_rollup_pricing",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** CUBE over order attributes. */
  val cubeOrders: Q = Q("tpch_cube_orders",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** DISTINCT aggregation: exact distinct counts per segment. */
  val distinctCounts: Q = Q("tpch_distinct_counts",
    """SELECT c_mktsegment,
      |  COUNT(DISTINCT c_nationkey) AS n_nations,
      |  COUNT(*) AS n_customers
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** HLL++ approximate distinct, verified against the exact count.
    * The sketch VALUE is engine-specific (DuckDB's sketch differs),
    * so this query is the ACCURACY CHECK, not the production scale
    * path: it computes both the sketch and the exact COUNT(DISTINCT)
    * (a full distinct shuffle — fine at oracle scale) and projects
    * the exact counts plus the sketch-vs-exact tolerance boolean.
    * The oracle hash-checks the exact columns; sketch drift past 5%
    * (rsd is 1%, so 5σ; HLL++ is deterministic per dataset) flips
    * the boolean and fails the match. Production users at 100 TB run
    * `approx_count_distinct` alone — constant memory, no distinct
    * shuffle — with this query as its accuracy certificate. */
  val approxDistinct: Q = Q("tpch_approx_distinct",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(*) AS n,
      |  TRUE AS within_5pct
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n_orders"), col("n"),
        (abs(col("approx_orders") - col("n_orders")).cast("double") / col("n_orders")
          <= 0.05).as("within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  /** Join-key skew profile — the diagnostic every 100 TB join starts
    * from: per-key group sizes reduced to distribution stats
    * (p50/p99/max, skew ratio = max/avg). This is the number that
    * decides whether a key needs salting or AQE skew handling before
    * the expensive job runs; two aggregations (partial+final on the
    * key, then a single global reduce), no sort of the raw data. */
  val keySkewReport: Q = Q("tpch_key_skew_report",
    """WITH g AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
      |SELECT COUNT(*) AS n_keys,
      |  ROUND(AVG(CAST(n AS DOUBLE)), 6) AS avg_rows,
      |  ROUND(quantile_cont(CAST(n AS DOUBLE), 0.5), 6) AS p50,
      |  ROUND(quantile_cont(CAST(n AS DOUBLE), 0.99), 6) AS p99,
      |  MAX(n) AS max_rows,
      |  ROUND(CAST(MAX(n) AS DOUBLE) / AVG(CAST(n AS DOUBLE)), 6) AS skew_ratio
      |FROM g""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        round(avg(col("n").cast("double")), 6).as("avg_rows"),
        round(expr("percentile(CAST(n AS DOUBLE), 0.5)"), 6).as("p50"),
        round(expr("percentile(CAST(n AS DOUBLE), 0.99)"), 6).as("p99"),
        max(col("n")).as("max_rows"),
        round(max(col("n")).cast("double") / avg(col("n").cast("double")), 6)
          .as("skew_ratio"))
  }

  // ---------------------------------------------------------------- top-k
  /** Global top-k: TakeOrderedAndProject, no full sort. */
  val topOrders: Q = Q("tpch_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  /** Correlated-style per-group max via argmax (max_by). */
  val latestOrderPerCustomer: Q = Q("tpch_argmax_latest_order",
    """SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_date
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey"))).as("latest_orderkey"),
        max(col("o_orderdate")).as("latest_date"))
      .orderBy(col("o_custkey"))
  }

  // ---------------------------------------------------------------- SQL front-end
  /** TPC-H Q3 shape through the SQL entry point: one ANSI string
    * planned by Catalyst over temp views — and the *same string* is
    * the DuckDB oracle, proving the SQL surface is dialect-clean. */
  private val q3Sql =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  val sqlQ3: Q = Q("tpch_sql_q3", q3Sql) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(q3Sql)
  }

  /** TPC-H Q17 shape through the SQL front end: a CORRELATED scalar
    * subquery (per-part average quantity) that Catalyst decorrelates
    * into an aggregate + join — the rewrite, not a per-row re-scan,
    * is what makes this runnable at scale. Same string is the
    * oracle. */
  private val q17Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
      |  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  val sqlQ17: Q = Q("tpch_sql_q17", q17Sql) { (s, dir) =>
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.part(s, dir).createOrReplaceTempView("part")
    s.sql(q17Sql)
  }

  /** The remaining rank-family window functions in one pass —
    * percent_rank, cume_dist, ntile, nth_value over per-customer
    * order sequences. One shuffle on the partition key; every
    * function shares the single sorted window (Spark evaluates the
    * frame once per partition). Restricted to custkey ≤ 50 to keep
    * the result set reviewable; the predicate pushes to the scan. */
  val windowRankSuite: Q = Q("tpch_window_rank_suite",
    """SELECT o_custkey, o_orderkey,
      |  ROUND(percent_rank() OVER w, 6) AS pr,
      |  ROUND(cume_dist() OVER w, 6) AS cd,
      |  ntile(4) OVER w AS quartile,
      |  nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |                                   AND UNBOUNDED FOLLOWING) AS second_order
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        r6(percent_rank().over(w)).as("pr"),
        r6(cume_dist().over(w)).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"))
      .orderBy(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .drop("o_totalprice")
  }

  /** TPC-H Q4 shape: correlated EXISTS over the fact table (orders
    * with at least one lineitem shipped > 80 days after the order
    * date — the schema's analog of the commit/receipt lateness
    * predicate). Catalyst plans the EXISTS as a LEFT SEMI hash join
    * on l_orderkey — one pass over each table, never a per-order
    * probe. Same string is the oracle. */
  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (
      |  SELECT * FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val sqlQ4: Q = Q("tpch_sql_q4", q4Sql) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(q4Sql)
  }

  /** TPC-H Q21 shape: the hardest subquery pattern in the suite —
    * correlated EXISTS (another supplier participated in the order)
    * AND correlated NOT EXISTS (no other supplier shipped as late),
    * adapted to this schema's columns: the "blamed" supplier is the
    * sole last shipper of a multi-supplier finished order. Catalyst
    * decorrelates the pair into a LEFT SEMI + LEFT ANTI join chain
    * on l_orderkey — three scans, three hash joins, no nested
    * re-scan per row. Same string is the oracle. */
  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND EXISTS (
      |    SELECT * FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT * FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate >= l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  val sqlQ21: Q = Q("tpch_sql_q21", q21Sql) { (s, dir) =>
    Tables.supplier(s, dir).createOrReplaceTempView("supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(q21Sql)
  }

  /** LATERAL correlated subquery through the SQL front end: per-row
    * top-2 orders via a correlated ORDER BY + LIMIT — the lateral
    * join surface (planned as a per-key limit, not a per-row
    * re-scan). Same string is the oracle. */
  private val lateralSql =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c_custkey <= 20
      |ORDER BY c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  val sqlLateralTopK: Q = Q("tpch_sql_lateral_topk", lateralSql) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(lateralSql)
  }

  // ---------------------------------------------------------------- custom operator
  /** The same top-3-per-customer result through the custom
    * [[graft.plans.TopKPerKey]] operator (bounded per-key heaps, no
    * per-partition sort) — oracle-checked against the window-function
    * semantics. */
  val topKPerKeyOp: Q = Q("tpch_custom_topk_per_key",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin) { (s, dir) =>
    graft.plans.TopKPerKey(
      Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      keyCols = Seq("o_custkey"),
      orderBy = Seq("o_totalprice" -> false, "o_orderkey" -> true),
      k = 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val all: Seq[Q] = Seq(
    pricingSummary, revenueByNation, nationVolume, disjunctiveRevenue,
    segmentRevenue, customersWithOrders,
    customersWithoutOrders, suppliersByRegion, localSupplierRevenue,
    promoRevenue, brandPartStats, saltedJoinRevenue, ordersPerCustomerDist,
    topBalanceInactive, bigVolumeCustomers,
    topOrdersPerCustomer, runningRevenue, orderGaps, setUnion, setExcept,
    setIntersect, rollupPricing, cubeOrders, distinctCounts, approxDistinct,
    keySkewReport, topOrders, latestOrderPerCustomer, sqlQ3, sqlQ4, sqlQ17,
    sqlQ21, sqlLateralTopK, topKPerKeyOp, windowRankSuite)
}
