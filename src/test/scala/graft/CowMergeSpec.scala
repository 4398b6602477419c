package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import graft.sources.CowMerge

/** Copy-on-write MERGE: the semantic invariant (merged store ≡
  * one-shot aggregate) is oracle-checked by the driver; here we pin
  * the PHYSICAL one — only the partitions the update batch touches
  * are rewritten, every other day's files survive byte-identical. */
class CowMergeSpec extends SparkSpec {

  private def fileState(root: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(Paths.get(root))) { st =>
      st.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => (p.toString,
          (Files.size(p), Files.getLastModifiedTime(p).toMillis)))
        .toMap
    }
  }

  test("merge rewrites only the horizon-day partition; all others byte-identical") {
    val store = Files.createTempDirectory("graft-cow-spec-").toString + "/daily"
    CowMerge.writeBase(spark, sf, store)
    val before = fileState(store)
    CowMerge.mergeLate(spark, sf, store)
    val after = fileState(store)

    val horizon = graft.sources.Tables.events(spark, sf)
      .agg(max(to_date(col("ts")))).head.getDate(0).toString
    val (touchedBefore, untouchedBefore) = before.partition(_._1.contains(s"day=$horizon"))
    val (touchedAfter, untouchedAfter) = after.partition(_._1.contains(s"day=$horizon"))

    // every untouched partition's files: same paths, sizes, mtimes
    assert(untouchedAfter == untouchedBefore,
      s"untouched partitions changed: ${untouchedAfter.keySet.diff(untouchedBefore.keySet)}")
    // the horizon partition WAS rewritten (new files)
    assert(touchedBefore.nonEmpty && touchedAfter.nonEmpty)
    assert(touchedAfter.keySet.intersect(touchedBefore.keySet).isEmpty ||
      touchedAfter != touchedBefore,
      "horizon partition was not rewritten by the merge")
  }

  test("merged store equals the one-shot aggregate over all events") {
    val store = Files.createTempDirectory("graft-cow-spec2-").toString + "/daily"
    val merged = CowMerge.mergedStore(spark, sf, store)
      .select(col("user_id"), col("day"), col("n_events"),
        col("value_sum").cast("double").as("value_sum"))
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("value_sum"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }
}
