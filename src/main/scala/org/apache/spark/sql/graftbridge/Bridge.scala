package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors: building a
  * DataFrame from a raw LogicalPlan. This is the standard pattern
  * Spark extension libraries use to attach custom logical operators
  * (the public API deliberately hides plan construction).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The leaf NAME a column refers to, when it is a plain (possibly
    * qualified) attribute reference or an alias — `col("doc_id")`,
    * `col("t.doc_id")` and `expr(...).as("doc_id")` all yield
    * `doc_id`; computed columns yield None. Used by name-keyed
    * contract guards that must not reject a qualified spelling of
    * the same key (the ColumnNode types are `private[sql]`). */
  def columnLeafName(c: org.apache.spark.sql.Column): Option[String] = c.node match {
    case ua: org.apache.spark.sql.internal.UnresolvedAttribute => Some(ua.nameParts.last)
    case al: org.apache.spark.sql.internal.Alias => Some(al.name.last)
    case _ => None
  }

  /** Block until every already-posted listener event has been
    * delivered — the deterministic alternative to sleep-polling the
    * async bus when a job-count listener must be read right after an
    * action returns (Spark's own test suites drain the same way). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
