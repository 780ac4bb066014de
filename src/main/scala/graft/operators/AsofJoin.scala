package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal backward) join: for each left row, attach the single
  * right row with the greatest right timestamp <= the left timestamp
  * within the same key group — the "latest quote before the trade"
  * operator that plain SQL equi-joins cannot express.
  *
  * Spark has no ASOF JOIN operator, and the naive encodings both die at
  * scale: an inequality theta-join degenerates to a per-key cross
  * product filtered after the fact (O(L*R) per key), and a
  * "max(right.ts) subquery then re-join" scans the right side twice and
  * shuffles it twice. This implementation uses the union + running
  * last-non-null window instead:
  *
  *   1. tag right rows 0 and left rows 1, union them by name;
  *   2. one window partitioned by key, ordered by (ts, tag), running
  *      frame [unbounded preceding, current row];
  *   3. every left row reads the latest preceding right payload with
  *      last(payload, ignoreNulls); right rows are then discarded.
  *
  * Cost: ONE shuffle of |L| + |R| rows on the join key and a per-key
  * sort — the same exchange a regular shuffle join would pay, with no
  * pair explosion, no second scan, and no driver state. Ties at equal
  * timestamp resolve right-before-left (tag 0 sorts first), i.e. a
  * right row at exactly the left timestamp IS visible — matching the
  * inclusive `l.ts >= r.ts` convention of DuckDB/pandas ASOF joins,
  * which is also what the oracle runs.
  *
  * Contract: the right side must be unique per (keys, tsCol) — dedup
  * first (see [[Relational.purchaseClickAsof]]); duplicate right
  * timestamps would make "the" latest row ambiguous on any engine.
  */
object AsofJoin {

  /** @param payloadCols right-side columns carried to the matched left
    *                    rows (null when no right row precedes the left
    *                    row — left-outer semantics).
    *
    * The payload travels as ONE struct column filled by ONE
    * last(ignoreNulls) window, then unpacked: per-column windows were
    * REJECTED (ADVICE r3) because a right row carrying a NULL in one
    * payload field would make that field fall back to an OLDER right
    * row while its siblings came from the newer one — a frankenrow
    * mixing two right rows. The struct wrapper is non-null for every
    * right row (even when all its fields are null), so the matched
    * right row stays atomic, and one window beats |payload| windows
    * over the same frame anyway.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val payloadType = right.select(payloadCols.map(col): _*).schema
    val lTagged = left.withColumn("__tag", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__tag"),
        struct(payloadCols.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(w))

    val outCols = left.columns.map(col).toSeq ++
      payloadCols.map(c => col("__f").getField(c).as(c))
    filled.filter(col("__tag") === 1).select(outCols: _*)
  }
}
