package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over the nation trade graph — iterative graph analytics
  * beyond [[DedupGraph]]'s connected components (Brin & Page 1998;
  * damping 0.85, dangling mass dropped — the "leaked" variant, a
  * defined and replayable choice).
  *
  * Scale shape: the 100 TB work is the EDGE AGGREGATION — the
  * Q7-style 4-table join collapsing every lineitem into a
  * (supplier-nation → customer-nation, revenue) edge list bounded
  * by |nations|² regardless of corpus size (decimal revenue sums,
  * partial-agg before the shuffle). The iteration then runs on the
  * bounded graph driver-side, exactly the k-means-codebook /
  * BPE-merge contract: only |V|+|E| (≤ 25+625) values ever leave
  * the cluster. For graphs that stay large after aggregation the
  * engine's distributed-iteration path is [[DedupGraph
  * .connectedComponents]]' round structure (one join + aggregate
  * per round) — PageRank would ride the same shape.
  *
  * Exactness: every iteration is PURE DECIMAL arithmetic — edge
  * weights round once to scale 6 (the only double→decimal cast on
  * the iteration path; deep-scale casts of doubles are where the
  * engines diverge — the k-means midpoint lesson), rank vectors
  * live at scale 18, products/sums are exact, and each round
  * re-rounds half-up at scale 18 (DuckDB's decimal ROUND is
  * half-away-from-zero ≡ BigDecimal HALF_UP, probed). DuckDB
  * unrolls the rounds as CTEs and hash-matches every rank at
  * scale 6. */
object PageRank {

  val Damping = "0.85"
  val Rounds = 4

  private def oracleRound(r: Int): String =
    s"""s$r AS (SELECT e.dst AS k, CAST(ROUND(SUM(p.pr * e.w6), 18) AS DECIMAL(20,18)) AS s
       |       FROM ed e JOIN p${r - 1} p ON e.src = p.k GROUP BY 1),
       |p$r AS (SELECT n.k, CAST(ROUND(CAST(b.base AS DECIMAL(20,18))
       |           + CAST($Damping AS DECIMAL(8,6)) * COALESCE(s.s, CAST(0 AS DECIMAL(20,18))), 18)
       |         AS DECIMAL(20,18)) AS pr
       |       FROM p${r - 1} n LEFT JOIN s$r s ON n.k = s.k, b)""".stripMargin

  val pagerankNations: Q = Q("graph_pagerank_nations",
    s"""WITH e AS (
      |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
      |         SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS rev
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |outs AS (SELECT src, SUM(rev) AS orev FROM e GROUP BY 1),
      |ed AS (SELECT e.src, e.dst,
      |         CAST(ROUND(CAST(e.rev AS DOUBLE) / CAST(o.orev AS DOUBLE), 6) AS DECIMAL(8,6)) AS w6
      |       FROM e JOIN outs o USING (src)),
      |b AS (SELECT CAST(ROUND(CAST(0.15 AS DOUBLE) / (SELECT COUNT(*) FROM nation), 6) AS DECIMAL(8,6)) AS base),
      |p0 AS (SELECT n_nationkey AS k,
      |         CAST(CAST(ROUND(CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM nation), 6) AS DECIMAL(8,6)) AS DECIMAL(20,18)) AS pr
      |       FROM nation),
      |${(1 to Rounds).map(oracleRound).mkString(",\n")}
      |SELECT CAST(k AS BIGINT) AS n_nationkey, CAST(ROUND(pr, 6) AS DOUBLE) AS pagerank
      |FROM p$Rounds ORDER BY 1""".stripMargin) { (s, dir) =>
    pagerank(s, dir)
  }

  private[graft] def pagerank(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir); val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir); val su = Tables.supplier(s, dir)
    val e = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(28,6)")).as("rev"))
    val outs = e.groupBy(col("src")).agg(sum(col("rev")).as("orev"))
    val ed = e.join(outs, Seq("src"))
      .select(col("src"), col("dst"),
        round(col("rev").cast("double") / col("orev").cast("double"), 6)
          .cast("decimal(8,6)").as("w6"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), BigDecimal(r.getDecimal(2))))
    val keys = Tables.nation(s, dir).select(col("n_nationkey")).orderBy(col("n_nationkey"))
      .collect().map(_.getInt(0))
    val nn = keys.length
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def q6(x: Double): BigDecimal = BigDecimal(x).setScale(6, HALF_UP)
    val base = q6(0.15 / nn)
    var pr: Map[Int, BigDecimal] = keys.map(_ -> q6(1.0 / nn).setScale(18, HALF_UP)).toMap
    val d85 = BigDecimal(Damping)
    for (_ <- 1 to Rounds) {
      val sums = scala.collection.mutable.Map.empty[Int, BigDecimal]
      ed.foreach { case (src, dst, w6) =>
        sums(dst) = sums.getOrElse(dst, BigDecimal(0)) + pr(src) * w6
      }
      pr = keys.map { k =>
        val sk = sums.getOrElse(k, BigDecimal(0)).setScale(18, HALF_UP)
        k -> (base + d85 * sk).setScale(18, HALF_UP)
      }.toMap
    }
    import s.implicits._
    keys.toSeq.map(k => (k.toLong, pr(k).setScale(6, HALF_UP).toDouble))
      .toDF("n_nationkey", "pagerank")
      .orderBy(col("n_nationkey"))
  }

  val all: Seq[Q] = Seq(pagerankNations)
}
