package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Tables, ZOrder}

/** Z-order clustering: a selective predicate on EITHER interleaved
  * column prunes most row groups — the property single-key sorting
  * only gives one column. */
class ZOrderSpec extends SparkSpec {

  private def scanRows(q: org.apache.spark.sql.DataFrame): Long = {
    q.collect()
    val plan = q.queryExecution.executedPlan
    val scans = (plan +: plan.collect { case p => p }).flatMap {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case _ => Nil
    }
    assert(scans.nonEmpty, plan.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups for predicates on BOTH columns") {
    val path = Files.createTempDirectory("graft-zorder-").toString + "/events"
    val events = Tables.events(spark, sf)
      .withColumn("day_ord", datediff(to_date(col("ts")), lit("2024-01-01")))
    // each column gets ~log2(files)/2 bits of file-level pruning →
    // expected scan fraction ≈ 1/sqrt(files); 64 files ⇒ ~1/8 per
    // column, comfortably under the total/4 assertion
    ZOrder.writeClustered(events,
      col("user_id") % 65536, col("day_ord"), path, files = 64)
    val total = events.count()
    val stored = spark.read.parquet(path)

    // pick a real (user, day) so both predicates are non-empty
    val probe = events.select(col("user_id"), col("day_ord")).head
    val (u, d) = (probe.getLong(0), probe.getInt(1))

    val byUser = scanRows(stored.filter(col("user_id") === u))
    val byDay  = scanRows(stored.filter(col("day_ord") === d))
    assert(byUser < total / 4, s"user scan read $byUser of $total — no pruning")
    assert(byDay < total / 4, s"day scan read $byDay of $total — no pruning")

    // and the data is intact
    assert(stored.count() == total)
  }

  test("morton interleave is monotone in rectangle containment (sanity)") {
    // (a,b) and (a+1,b+1) z-values: the latter is strictly larger
    // when no carry crosses — spot-check the expression is a real
    // interleave, not a constant
    import spark.implicits._
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (0L, 5L), (5L, 0L))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
    val z = df.as[(Long, Long, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    assert(z((1L, 1L)) == 3L)   // ...0b11
    assert(z((2L, 2L)) == 12L)  // ...0b1100
    assert(z((3L, 3L)) == 15L)
    assert(z((0L, 5L)) == 34L)  // b bits at odd positions: 5=101 -> 100010
    assert(z((5L, 0L)) == 17L)  // a bits at even positions: 5=101 -> 010001
  }
}
