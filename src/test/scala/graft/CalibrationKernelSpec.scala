package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.IntersectCount.sorted_intersect_count

/** Pins the r14 calibration-kernel swap: the truth intersect count
  * computed by expressions.SortedIntersectCount over sorted-distinct
  * arrays must equal size(array_intersect(..)) over the same distinct
  * arrays — the exact expression q_minhash_calibration used before.
  * Adversarial inputs: duplicates (distinct'd away), empties, nulls
  * (array_intersect's null-equality semantics), disjoint and identical
  * arrays, plus a randomized sweep; both codegen and interpreted paths.
  */
class CalibrationKernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])]): Unit = {
    val d = rows.toDF("a", "b")
      .select(sort_array(array_distinct($"a")).as("sa"),
        sort_array(array_distinct($"b")).as("sb"),
        array_distinct($"a").as("da"), array_distinct($"b").as("db"))
      .select(sorted_intersect_count($"sa", $"sb").as("got"),
        size(array_intersect($"da", $"db")).cast("long").as("want"))
      .collect()
    d.zip(rows).foreach { case (r, in) =>
      assert(r.getLong(0) === r.getLong(1), s"input $in")
    }
  }

  private val L = (x: Long) => java.lang.Long.valueOf(x)
  private val cases: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
    (Seq(L(1), L(2), L(3)), Seq(L(2), L(3), L(4))),
    (Seq(L(5), L(5), L(1)), Seq(L(5), L(1), L(1))),          // dups collapse
    (Seq.empty, Seq(L(1))),                                   // empty side
    (Seq.empty, Seq.empty),
    (Seq(L(7)), Seq(L(7))),
    (Seq(L(-3), L(0), L(9)), Seq(L(9), L(-3))),               // negatives sort first
    (Seq(null, L(1), L(2)), Seq(L(2), L(3))),                 // null in one side only
    (Seq(null, L(1)), Seq(null, L(9))),                       // null in both: counts 1
    (Seq(null, null, L(4)), Seq(L(4), null)),                 // dup nulls distinct'd
    (Seq(L(Long.MinValue), L(Long.MaxValue)), Seq(L(Long.MaxValue), L(Long.MinValue))))

  test("sorted_intersect_count == size(array_intersect) on adversarial cases") {
    check(cases)
  }

  test("randomized sweep agrees with array_intersect") {
    val rnd = new scala.util.Random(421407)
    val rows = (1 to 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(
        if (rnd.nextInt(20) == 0) null else L(rnd.nextInt(30).toLong))
      (arr(), arr())
    }
    check(rows)
  }

  test("interpreted path agrees (wholestage codegen off)") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check(cases)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null input arrays yield null") {
    val d = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(sorted_intersect_count($"a", $"b").as("c")).collect()
    assert(d(0).isNullAt(0))
  }
}
