package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native k-min-hash signature over a hashed-shingle `array<long>`:
  *
  *   sig[j] = min over h of xxhash64(j, h),  j ∈ [0, k)
  *
  * Bit-identical to the HOF formulation
  * `transform(sequence(0, k-1), j -> array_min(transform(hs, h ->
  * xxhash64(j, h))))` — Spark's `xxhash64(j, h)` chains
  * `XXH64.hashLong(h, XXH64.hashInt(j, 42))`, which this expression
  * calls directly. The HOF form allocates k intermediate arrays per
  * row and pays boxed-lambda evaluation for every one of the k·|hs|
  * hashes; this is one allocation-free nested loop (per-seed values
  * precomputed once per instance) inside WholeStageCodegen.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash needs (array<bigint>, k > 0), got ${child.dataType.catalogString}, k=$k")
  }

  /** xxhash64(j, <long>) seed per signature position: hashInt because
    * `sequence(0, k-1)` elements are ints in the HOF form. */
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(j => XXH64.hashInt(j, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) {
      // HOF parity: array_min over an empty array is null per position
      new GenericArrayData(Array.fill[Any](k)(null))
    } else {
      val out = new Array[Long](k)
      var j = 0
      while (j < k) {
        var m = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = XXH64.hashLong(arr.getLong(i), seeds(j))
          if (h < m) m = h
          i += 1
        }
        out(j) = m
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$k]);
         |} else {
         |  long[] $out = new long[$k];
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $m = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $h = $xxh.hashLong($a.getLong($i), $seedsRef[$j]);
         |      if ($h < $m) $m = $h;
         |    }
         |    $out[$j] = $m;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}
