package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle the driver
  * hash-compares against on the same parquet tables.
  *
  * Determinism contract (FIXTURES.md): no wall-clock (`NOW()`), time
  * predicates anchored to `max(ts)` of the input; float outputs
  * rounded identically on both sides; every result deterministically
  * ordered; exact-decimal accumulation for large sums so aggregation
  * order can't skew the last ulp.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
