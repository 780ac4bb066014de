package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Dedup

/** Pins the r14 size-gated driver union-find in Dedup.dedupClusters:
  * below DriverCcMaxEdges the components are computed driver-side
  * (min-root union-find), above it the RDD label loop runs — both must
  * produce the IDENTICAL (doc_id, cluster_id, keep) set (the min-id
  * fixpoint is path-independent). driverMaxEdges = -1 forces the
  * distributed loop on the same inputs.
  */
class CcSmallPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def both(pairs: Seq[(Long, Long)]): Unit = {
    val df = pairs.toDF("doc_a", "doc_b")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "cluster_id", "keep")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val driver = rows(Dedup.dedupClusters(df))
    val dist   = rows(Dedup.dedupClusters(df, driverMaxEdges = -1L))
    assert(driver === dist, s"pairs $pairs")
  }

  test("driver union-find == RDD loop on hand-built graphs") {
    both(Seq((1L, 2L)))
    both(Seq((1L, 2L), (2L, 3L), (10L, 11L)))            // two components
    both(Seq((5L, 1L), (5L, 9L), (9L, 1L)))              // cycle + dup edges
    both(Seq((7L, 7L)))                                  // self-edge
    both((1L to 40L).map(i => (i, i + 1)))               // long path chain
    both(Seq((100L, 3L), (3L, 50L), (50L, 2L), (2L, 80L))) // min in middle
  }

  test("driver union-find == RDD loop on a randomized graph") {
    val rnd = new scala.util.Random(140914)
    val pairs = Seq.fill(400)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    both(pairs)
  }

  test("empty pair set yields an empty, correctly-typed frame") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.dedupClusters(empty)
    assert(out.columns.toSeq === Seq("doc_id", "cluster_id", "keep"))
    assert(out.count() === 0)
  }

  test("keep marks exactly the component minimum") {
    val out = Dedup.dedupClusters(
      Seq((4L, 9L), (9L, 2L), (30L, 31L)).toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set((2L, 2L, true), (4L, 2L, false), (9L, 2L, false),
      (30L, 30L, true), (31L, 30L, false)))
  }
}
