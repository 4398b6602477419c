package graft

import org.apache.spark.sql.functions._
import graft.queries.Privacy

/** PII redaction: the planted signal is detected exactly, the
  * redacted text is clean, and the per-source report reconciles
  * with the per-doc scan. */
class PrivacySpec extends SparkSpec {

  private lazy val red = SparkEntry.queries("text_pii_redact")(spark, sf).cache()

  test("planted PII is detected exactly (one hit per planted field, none elsewhere)") {
    val bad = red.filter(
      (col("doc_id") % 3 === 0 && col("n_emails") =!= 1) ||
      (col("doc_id") % 3 =!= 0 && col("n_emails") =!= 0) ||
      (col("doc_id") % 5 === 0 && col("n_ips") =!= 1) ||
      (col("doc_id") % 5 =!= 0 && col("n_ips") =!= 0) ||
      (col("doc_id") % 7 === 0 && col("n_phones") =!= 1) ||
      (col("doc_id") % 7 =!= 0 && col("n_phones") =!= 0))
    assert(bad.count() == 0)
  }

  test("redacted text has zero residual PII matches") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val cleaned = docs.select(
      Privacy.redacted(Privacy.planted(col("text"), col("doc_id"))).as("r"))
    val residual = cleaned.agg(
      sum(regexp_count(col("r"), lit(Privacy.EmailRe))) +
      sum(regexp_count(col("r"), lit(Privacy.Ipv4Re))) +
      sum(regexp_count(col("r"), lit(Privacy.PhoneRe)))).head.getLong(0)
    assert(residual == 0)
  }

  test("bytes_removed is positive exactly when something was redacted") {
    val n = red.filter(
      ((col("n_emails") + col("n_ips") + col("n_phones") > 0) && col("bytes_removed") <= 0) ||
      ((col("n_emails") + col("n_ips") + col("n_phones") === 0) && col("bytes_removed") =!= 0))
      .count()
    assert(n == 0)
  }

  test("per-source report reconciles with the per-doc scan") {
    val report = SparkEntry.queries("text_pii_report")(spark, sf)
    val rollup = red.groupBy(col("source")).agg(
      sum(col("n_emails")).as("e"), sum(col("n_ips")).as("i"),
      sum(col("n_phones")).as("p"))
    val diff = report.as("r").join(rollup.as("u"), "source")
      .filter(col("r.n_emails") =!= col("u.e") ||
        col("r.n_ips") =!= col("u.i") || col("r.n_phones") =!= col("u.p"))
    assert(diff.count() == 0)
    assert(report.agg(sum(col("n_docs"))).head.getLong(0) ==
      graft.sources.Tables.documents(spark, sf).count())
  }
}
