package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for MULTI-column file skipping — the
  * Delta OPTIMIZE ZORDER BY analog on plain parquet.
  *
  * Single-key sort-on-write ([[PredictionsStore]]) localizes one
  * column's min/max stats; interleaving the bits of two keys sorts
  * the data along a space-filling curve, so EVERY file and row group
  * covers a small rectangle in (a, b) space and a selective
  * predicate on EITHER column prunes most of them from the scan.
  *
  * The z-value is pure column arithmetic (16 shift/mask terms per
  * key, folded into one codegen'd expression) — no UDF; the write is
  * `repartitionByRange` on z (range exchange = the curve's contract:
  * each output file owns a contiguous z-range) + an in-partition
  * sort, exactly the layout job a 100 TB table would run per
  * partition. ZOrderSpec asserts the scan-level effect on both
  * columns.
  */
object ZOrder {

  /** Morton-interleave the low 16 bits of `a` and `b` (callers pass
    * compact ordinals — bucket ids, day numbers). Bit i of `a` lands
    * at 2i, bit i of `b` at 2i+1. */
  def zvalue(a: Column, b: Column): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(al.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(bl.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Write `df` z-clustered on (`a`, `b`) with small-enough row
    * groups that skipping is observable at test scale. */
  def writeClustered(df: DataFrame, a: Column, b: Column, path: String,
                     files: Int = 16, blockSizeBytes: Long = 2048L): Unit =
    df.withColumn("__z", zvalue(a, b))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockSizeBytes)
      .parquet(path)
}
