package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the number of positions at which two
  * `array<long>` columns agree — the MinHash similarity estimate
  * (agreeing signature positions / k estimates Jaccard).
  *
  * The HOF formulation
  * `aggregate(zip_with(s1, s2, (x,y) -> int(x=y)), 0, (a,v) -> a+v)`
  * allocates a zipped array per pair and evaluates two boxed lambdas
  * per element, and its presence pushes the whole candidate-pair
  * projection out of WholeStageCodegen; this is one counting loop
  * inside codegen. Bit-identical to the HOF form for EQUAL-LENGTH
  * inputs (the signature contract — every caller compares k-hash
  * signatures; pinned in FunctionsSpec). On unequal lengths the
  * semantics intentionally differ: this counts over the common
  * prefix (min length), where the HOF form null-pads and returns
  * NULL — a defined total function beats a silent NULL for a
  * similarity estimate. Evaluated once per CANDIDATE pair, which at
  * the 100 TB design point is the LSH pipeline's hot inner loop. */
case class PositionsEqual(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_positions_equal needs two array<bigint> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var c = 0L
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PositionsEqual =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_positions_equal"
}
