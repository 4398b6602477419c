package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{CowMerge, Tables}
import graft.streaming.StreamingCowMerge

/** The MVCC-generation exactly-once story of the streaming COW
  * merge: slicing invariance, replay idempotence, and incomplete
  * generations being invisible. */
class StreamingCowMergeSpec extends SparkSpec {

  private def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("user_id"), col("day"), col("n_events"),
        col("value_sum").cast("double"))
      .collect().map(_.toString).sorted.toSeq

  test("arrival slicing never changes the drained store (1 vs 4 slices)") {
    val a = snap(StreamingCowMerge.run(spark, sf, slices = 1))
    val b = snap(StreamingCowMerge.run(spark, sf, slices = 4))
    assert(a == b && a.nonEmpty)
  }

  test("replayed batch recomputes from pre-batch state: byte-identical store") {
    val store = Files.createTempDirectory("graft-scow-spec-").toString + "/daily"
    StreamingCowMerge.writeBase(spark, sf, store)
    val late = CowMerge.lateSlice(Tables.events(spark, sf)).cache()
    StreamingCowMerge.mergeBatch(late, batchId = 0, store)
    val first = snap(StreamingCowMerge.readStore(spark, store))
    // at-least-once delivery: the same batch arrives again
    StreamingCowMerge.mergeBatch(late, batchId = 0, store)
    val replayed = snap(StreamingCowMerge.readStore(spark, store))
    assert(replayed == first, "replay double-applied the batch")
    // and the store equals the one-shot aggregate (the oracle's claim)
    val direct = snap(
      CowMerge.dailyAgg(Tables.events(spark, sf)))
    assert(first == direct)
  }

  test("gc keeps the newest complete generation (reads unchanged) and in-flight writers") {
    val store = StreamingCowMerge.runStore(spark, sf, slices = 3)
    val before = snap(StreamingCowMerge.readStore(spark, store))
    // an in-flight newer generation (no marker yet) must survive gc
    val day = Tables.events(spark, sf)
      .agg(max(to_date(col("ts")))).head.getDate(0).toString
    val inflight = java.nio.file.Paths.get(store, s"day=$day", "gen-50")
    java.nio.file.Files.createDirectories(inflight)
    StreamingCowMerge.gc(store, keepLast = 1)
    assert(java.nio.file.Files.isDirectory(inflight), "gc reclaimed an in-flight writer")
    // superseded generations on the horizon day are gone
    val horizonGens = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(store, s"day=$day"))) { st =>
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("gen-")).toSet
      }
    }
    assert(horizonGens == Set("gen-2", "gen-50"), horizonGens.toString)
    assert(snap(StreamingCowMerge.readStore(spark, store)) == before)
  }

  test("a generation without its done marker is invisible to readers") {
    val store = Files.createTempDirectory("graft-scow-spec2-").toString + "/daily"
    StreamingCowMerge.writeBase(spark, sf, store)
    val before = snap(StreamingCowMerge.readStore(spark, store))
    // simulate a crash mid-commit: data written, marker never lands
    val day = Tables.events(spark, sf)
      .agg(max(to_date(col("ts")))).head.getDate(0).toString
    val gen = java.nio.file.Paths.get(store, s"day=$day", "gen-99")
    CowMerge.dailyAgg(Tables.events(spark, sf))
      .filter(to_date(col("day")) === day).limit(1).drop("day")
      .write.mode("overwrite").parquet(gen.toString)
    java.nio.file.Files.deleteIfExists(gen.resolve("_done"))
    val after = snap(StreamingCowMerge.readStore(spark, store))
    assert(after == before, "incomplete generation leaked into reads")
  }
}
