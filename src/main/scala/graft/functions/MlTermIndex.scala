package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The term → feature-index map of `org.apache.spark.ml.feature
  * .HashingTF` as a codegen'd scalar expression — Spark 3's
  * HashingTF hashes with the collision-fixed `hashUnsafeBytes2`
  * (hash-func version 2), which is NOT what SQL `hash()` computes
  * (version 1), so a closed-form scorer that wants bit-identical
  * indices to an MLlib-trained model must go through the same
  * function. Delegates to the PUBLIC `HashingTF.indexOf` (stable
  * since 3.0, exposed for explainability) so the mapping is
  * definitionally the trainer's own, not a re-implementation. */
case class MlTermIndex(child: Expression, numFeatures: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if numFeatures > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ml_term_index needs (string, n > 0), got ${other.catalogString}")
  }

  override def nullSafeEval(term: Any): Any =
    MlTermIndex.index(term.asInstanceOf[UTF8String], numFeatures)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = MlTermIndex.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $helper.index($a, $numFeatures);")
  }

  override protected def withNewChildInternal(newChild: Expression): MlTermIndex =
    copy(child = newChild)

  override def prettyName: String = "graft_ml_term_index"
}

object MlTermIndex {

  private val memo =
    scala.collection.concurrent.TrieMap.empty[Int, org.apache.spark.ml.feature.HashingTF]

  /** Static forwarder target for generated Java. */
  def index(term: UTF8String, numFeatures: Int): Int =
    memo.getOrElseUpdate(numFeatures,
      new org.apache.spark.ml.feature.HashingTF().setNumFeatures(numFeatures))
      .indexOf(term.toString)
}
