package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sorted-distinct hashed word n-grams over a token
  * `array<string>`:
  *
  *   out = sort(distinct(xxhash64(hw[i], …, hw[i+width−1])))
  *   with hw[j] = xxhash64(token[j]),  i ∈ [0, |tokens|−width]
  *
  * Bit-identical to the HOF formulation every dedup pipeline used
  * to inline —
  * `sort_array(array_distinct(transform(sequence(0, size(hw)-width),
  * i -> xxhash64(hw[i], …))))` over
  * `hw = transform(w, x -> xxhash64(x))` — token hashes use Spark's
  * `XXH64.hashUTF8String(tok, 42)` and the n-gram combiner chains
  * `XXH64.hashLong` left-to-right from seed 42 exactly as the
  * variadic `xxhash64(a, b, c)` does. The HOF form is a
  * CodegenFallback chain: per-token boxed-lambda evaluation, one
  * intermediate array per `transform`, an O(n²-ish) generic
  * `array_distinct`, then `sort_array` on boxed elements — measured
  * at dozens of CPU-ms per small document, which made shingling the
  * dominant cost of the whole dedup family. This is one primitive
  * loop per row (stack `long[]`s, `Arrays.sort`, in-place dedup)
  * inside WholeStageCodegen.
  *
  * Fewer than `width` tokens yields the empty array (the HOF chain
  * needed a `size(w) >= width` pre-filter to avoid a descending
  * `sequence`; callers keep that filter for row-set parity).
  */
/** POSITIONAL variant of [[HashedNgrams]]: per-offset hashed
  * `width`-grams, `out[i] = xxhash64(hw[i], …, hw[i+width−1])`, no
  * distinct, no sort — the span-dedup family needs the offset of
  * every window (to expand covered positions), so the set form
  * doesn't apply. Same token/combiner hashing as [[HashedNgrams]];
  * `posexplode` over the result yields `(i, fp)` directly. */
case class HashedNgramsPos(child: Expression, width: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if width > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_ngrams_pos needs (array<string>, width > 0), got ${other.catalogString}, width=$width")
  }

  override def nullSafeEval(input: Any): Any =
    HashedNgrams.computePos(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HashedNgrams.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $helper.computePos($a, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramsPos =
    copy(child = newChild)

  override def prettyName: String = "graft_hashed_ngrams_pos"
}

case class HashedNgrams(child: Expression, width: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if width > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_ngrams needs (array<string>, width > 0), got ${other.catalogString}, width=$width")
  }

  override def nullSafeEval(input: Any): Any =
    HashedNgrams.compute(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HashedNgrams.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $helper.compute($a, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgrams =
    copy(child = newChild)

  override def prettyName: String = "graft_hashed_ngrams"
}

/** Native per-token xxhash64 over a token `array<string>` —
  * order-preserving, multiplicity-keeping: bit-identical to the HOF
  * `transform(w, t -> xxhash64(t))` (a CodegenFallback chain with a
  * boxed lambda per token) in one primitive loop. Feeds
  * [[SimHash64]], making the SimHash path fully native. */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_hashes needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TokenHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $helper.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_token_hashes"
}

object TokenHashes {

  /** Static forwarder target for generated Java. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val hw = new Array[Long](n)
    var i = 0
    while (i < n) {
      hw(i) = if (tokens.isNullAt(i)) 42L
        else XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
      i += 1
    }
    new GenericArrayData(hw)
  }
}

object HashedNgrams {

  /** Shared interpreted/codegen kernel — static forwarder makes this
    * callable as `graft.functions.HashedNgrams.compute(...)` from
    * generated Java. */
  def compute(tokens: ArrayData, width: Int): ArrayData = {
    val n = tokens.numElements()
    val m = n - width + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hw = new Array[Long](n)
    var i = 0
    while (i < n) {
      // xxhash64(null) folds to the seed, matching the HOF chain
      hw(i) = if (tokens.isNullAt(i)) 42L
        else XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
      i += 1
    }
    val g = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < width) { h = XXH64.hashLong(hw(i + j), h); j += 1 }
      g(i) = h
      i += 1
    }
    java.util.Arrays.sort(g)
    var k = 0
    i = 0
    while (i < m) {
      if (k == 0 || g(i) != g(k - 1)) { g(k) = g(i); k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(g, k))
  }

  /** Positional kernel for [[HashedNgramsPos]] — the same hashing
    * loop without the distinct/sort tail. */
  def computePos(tokens: ArrayData, width: Int): ArrayData = {
    val n = tokens.numElements()
    val m = n - width + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hw = new Array[Long](n)
    var i = 0
    while (i < n) {
      hw(i) = if (tokens.isNullAt(i)) 42L
        else XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
      i += 1
    }
    val g = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < width) { h = XXH64.hashLong(hw(i + j), h); j += 1 }
      g(i) = h
      i += 1
    }
    new GenericArrayData(g)
  }
}
