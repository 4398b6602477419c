package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** Registration of graft's native Catalyst functions into a session's
  * FunctionRegistry, making them available to `expr(...)` / SQL like
  * any built-in:
  *
  *   graft_fingerprint64(str)      — codegen'd rolling-hash (scalar)
  *   graft_auc(label, score)      — histogram AUC (aggregate)
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("graft_fingerprint64"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_fingerprint64"),
      (children: Seq[Expression]) => RollingHash(children.head))
    registry.registerFunction(
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("graft_auc"),
      new ExpressionInfo(classOf[HistAuc].getName, "graft_auc"),
      (children: Seq[Expression]) => {
        val asDouble = children.map(c =>
          org.apache.spark.sql.catalyst.expressions.Cast(c, DoubleType))
        HistAuc(asDouble(0), asDouble(1)).toAggregateExpression()
      })
  }
}
