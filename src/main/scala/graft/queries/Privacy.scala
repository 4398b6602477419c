package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over the `documents` table — the
  * privacy-scrub stage every production pre-training pipeline runs
  * before anything else sees the text (the C4/RefinedWeb/FineWeb
  * email-phone-IP scrubbers; cf. reference
  * `/root/reference/` which stores raw event payloads and relies on
  * the warehouse for policy — here the scrub is an engine operator).
  *
  * Scale shape: the whole operator is a per-row regex scan + rewrite
  * — a pure codegen map stage with NO shuffle and NO UDF; at 100 TB
  * it is one embarrassingly-parallel pass whose cost is linear in
  * bytes scanned, and the aggregate tail (per-source totals) is a
  * partial-aggregated groupBy over a low-cardinality key.
  *
  * The synthetic corpus contains no PII, so the query PLANTS
  * deterministic PII derived from `doc_id` (emails on every 3rd doc,
  * IPv4s on every 5th, E.164-ish phones on every 7th) before
  * scanning — the same planted-signal device as the ANN recall
  * certificates: both engine and DuckDB oracle replay the identical
  * plant, so detection counts, the redacted text hash, and the
  * byte-length delta are all hash-compared end to end.
  *
  * Regex subset chosen for Java-regex/RE2 parity: character classes,
  * bounded repetition, no lookaround, no backrefs — both engines
  * match greedy-leftmost identically on these patterns.
  */
object Privacy {

  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re  = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private[graft] val PhoneRe = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** The deterministic plant, as a column program (the SQL twin is
    * inlined in the oracle below — keep the two in lockstep). */
  private[graft] def planted(text: Column, docId: Column): Column =
    concat(
      text,
      when(docId % 3 === 0,
        concat(lit(" contact user"), docId, lit("@example.com now")))
        .otherwise(lit("")),
      when(docId % 5 === 0,
        concat(lit(" from 10."), docId % 250, lit(".0."), docId % 100))
        .otherwise(lit("")),
      when(docId % 7 === 0,
        concat(lit(" call +1-202-555-"),
          lpad((docId % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))

  /** Redaction = three chained regexp_replace passes (email → IP →
    * phone; the patterns are disjoint on the planted corpus, so
    * order only matters for the documented contract). */
  private[graft] def redacted(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  // single-line: interpolated into stripMargin'd oracles, so embedded
  // newlines would be margin-stripped a second time. Parameterized on
  // the base-text expression so the composed curation pipeline can
  // plant onto its scrubbed kept-text instead of the raw column.
  private[graft] def plantSqlOn(t: String): String =
    t +
      " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END" +
      " || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 250) || '.0.' || (doc_id % 100) ELSE '' END" +
      " || CASE WHEN doc_id % 7 = 0 THEN ' call +1-202-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"

  private val plantSql = plantSqlOn("text")

  /** The three chained redaction passes as DuckDB SQL over `t` —
    * kept in lockstep with [[redacted]]. Single-line (see above). */
  private[graft] def redactSqlOn(t: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($t," +
      s" '$EmailRe', '<EMAIL>', 'g')," +
      s" '$Ipv4Re', '<IP>', 'g')," +
      s" '$PhoneRe', '<PHONE>', 'g')"

  /** Total detected-PII count over `t` as DuckDB SQL — kept in
    * lockstep with the three `regexp_count` columns in
    * [[redactFrame]]. Single-line (see above). */
  private[graft] def piiCountSqlOn(t: String): String =
    s"(len(regexp_extract_all($t, '$EmailRe'))" +
      s" + len(regexp_extract_all($t, '$Ipv4Re'))" +
      s" + len(regexp_extract_all($t, '$PhoneRe')))"

  /** The per-doc scan+redact frame (unordered) — shared by the batch
    * query and the streaming twin. */
  private[graft] def redactFrame(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), col("source"),
        planted(col("text"), col("doc_id")).as("t"))
      .withColumn("red", redacted(col("t")))
      .select(
        col("doc_id"), col("source"),
        regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(Ipv4Re)).cast("long").as("n_ips"),
        regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phones"),
        md5(col("red")).as("redacted_md5"),
        (length(col("t")) - length(col("red"))).cast("long").as("bytes_removed"))

  val piiRedact: Q = Q("text_pii_redact",
    s"""WITH p AS (
       |  SELECT doc_id, source, ($plantSql) AS t FROM documents
       |), r AS (
       |  SELECT doc_id, source, t,
       |    regexp_replace(regexp_replace(regexp_replace(t,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |      '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g'),
       |      '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
       |  FROM p
       |)
       |SELECT doc_id, source,
       |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(t, '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       |  md5(red) AS redacted_md5,
       |  CAST(length(t) - length(red) AS BIGINT) AS bytes_removed
       |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    redactFrame(Tables.documents(s, dir)).orderBy(col("doc_id"))
  }

  /** Corpus-level privacy report: per-source PII density — the
    * audit roll-up a compliance pass publishes. One partial-agg
    * groupBy over the same single scan. */
  val piiReport: Q = Q("text_pii_report",
    s"""WITH p AS (
       |  SELECT doc_id, source, ($plantSql) AS t FROM documents
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
       |  CAST(SUM(len(regexp_extract_all(t, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}'))) AS BIGINT) AS n_ips,
       |  CAST(SUM(len(regexp_extract_all(t, '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}'))) AS BIGINT) AS n_phones,
       |  CAST(SUM(CASE WHEN len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) > 0
       |             OR len(regexp_extract_all(t, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) > 0
       |             OR len(regexp_extract_all(t, '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')) > 0
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
       |FROM p GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val ne = regexp_count(col("t"), lit(EmailRe))
    val ni = regexp_count(col("t"), lit(Ipv4Re))
    val np = regexp_count(col("t"), lit(PhoneRe))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        planted(col("text"), col("doc_id")).as("t"))
      .select(col("source"), ne.as("ne"), ni.as("ni"), np.as("np"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ne")).cast("long").as("n_emails"),
        sum(col("ni")).cast("long").as("n_ips"),
        sum(col("np")).cast("long").as("n_phones"),
        sum(when(col("ne") > 0 || col("ni") > 0 || col("np") > 0, 1)
          .otherwise(0)).cast("long").as("n_docs_with_pii"))
      .orderBy(col("source"))
  }

  val all: Seq[Q] = Seq(piiRedact, piiReport)
}
