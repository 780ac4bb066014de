package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional clustering tool
  * for scan pruning at 100 TB: sorting files by the bit-interleaving of
  * two dimensions gives every file a TIGHT bounding box in BOTH
  * dimensions, so min/max file statistics prune scans filtered on
  * either one — where a single-column sort only prunes its own column.
  *
  * The interleave is pure 64-bit integer bit arithmetic (the classic
  * spread-bits ladder), built from stock shiftleft/AND/OR columns —
  * codegen'd, exactly reproducible in the DuckDB oracle, and usable as
  * a clustering key in any engine.
  */
object ZOrderLayout {

  /** Spread the low 31 bits of `c` to the even bit positions of a
    * 62-bit value (0babcd -> 0b0a0b0c0d). 31 bits per dimension keeps
    * the interleaved code out of the sign bit, and covers any epoch-day
    * / key domain a real table has — a narrower 16-bit ladder would
    * silently ALIAS keys above 65535 into unrelated cells (wrong
    * bounding boxes) with no error. */
  def spread31(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0x7FFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Morton code of two 31-bit dimensions (a in even bits,
    * b in odd bits). */
  def interleave31(a: Column, b: Column): Column =
    spread31(a).bitwiseOR(shiftleft(spread31(b), 1))

  /** Write `df` clustered by the z-value of (aCol, bCol): range-
    * partitioned into `files` output files, sorted by z within each —
    * the layout whose per-file min/max statistics are tight in both
    * dimensions (proven in ZOrderSpec against the naive layout). */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
                    dir: String, files: Int = 8): Unit =
    df.withColumn("__z", interleave31(col(aCol), col(bCol)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
