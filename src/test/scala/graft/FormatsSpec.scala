package graft

import java.nio.file.Files

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Source/sink format breadth (SURVEY §2.1): the engine's frames
  * round-trip through every columnar/text format in the Spark distro
  * — CSV, JSON, ORC — with values intact when read back under the
  * declared schema (schema-on-read, no inference lottery). Parquet is
  * exercised everywhere else; Kafka/JDBC have dedicated suites. */
class FormatsSpec extends SparkSpec {

  test("csv/json/orc roundtrips preserve the documents frame exactly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val want = docs.collect().map(_.toSeq).toSet
    for (fmt <- Seq("csv", "json", "orc")) {
      val dir = Files.createTempDirectory(s"graft-fmt-$fmt-").toString + "/t"
      docs.write.format(fmt).option("header", "true").save(dir)
      val got = spark.read.format(fmt).option("header", "true")
        .schema(docs.schema).load(dir)
        .collect().map(_.toSeq).toSet
      assert(got == want, s"format $fmt")
    }
  }

  test("csv roundtrip survives quoting-hostile values") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "plain words"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "newline\ninside"),
      (5L, "")).toDF("id", "s")
    val dir = Files.createTempDirectory("graft-fmt-quote-").toString + "/t"
    tricky.write.option("header", "true").csv(dir)
    val got = spark.read.option("header", "true").option("multiLine", "true")
      .schema(tricky.schema).csv(dir)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .toSet
    val want = tricky.collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .toSet
    assert(got == want)
  }
}
