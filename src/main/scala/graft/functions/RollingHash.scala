package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit polynomial rolling hash over a
  * string's UTF-8 bytes — h = Σ bᵢ·31^(n−1−i) in wrapping 64-bit
  * arithmetic (the classic Rabin-Karp / Java-hashCode family, widened
  * to 64 bits).
  *
  * Document fingerprinting (SURVEY.md north-star text ops) wants a
  * cheap order-sensitive content hash; a Scala UDF would box every
  * row and fall out of WholeStageCodegen, so this implements
  * `doGenCode` emitting a tight primitive loop over the UTF8String
  * bytes — the expression stays inside the generated stage like any
  * built-in. Interpreted path (`nullSafeEval`) matches bit-for-bit.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling hash needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xFFL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}_acc = ${ev.value}_acc * 31L + ($bytes[$i] & 0xFFL);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint64"
}

/** Scala reference implementation (for tests). */
object RollingHash {
  def reference(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xFFL); i += 1 }
    h
  }
}
