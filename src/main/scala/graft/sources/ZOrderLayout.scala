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

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (0babcd -> 0b0a0b0c0d). */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions (a in even bits,
    * b in odd bits). */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Write `df` clustered by the z-value of (aCol, bCol): range-
    * partitioned into `files` output files, sorted by z within each —
    * the layout whose per-file min/max statistics are tight in both
    * dimensions (proven in ZOrderSpec against the naive layout). */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
                    dir: String, files: Int = 8): Unit =
    df.withColumn("__z", interleave16(col(aCol), col(bCol)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
