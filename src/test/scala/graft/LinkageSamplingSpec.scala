package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Linkage, Sampling}

/** Contracts for the round-5 linkage/sampling additions (value parity vs
  * DuckDB is the oracle gate; these pin the semantics):
  *  - deletion-neighborhood blocking is EXACT for ed<=1 at equal length
  *    (pair set == brute-force levenshtein cross join) and emits each
  *    pair exactly once,
  *  - hash-threshold sampling is deterministic, stratum-local, and hits
  *    the target rate,
  *  - half-sample replicate CI brackets are ordered and inside the
  *    stratum's value range. */
class LinkageSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  test("editDistancePairs == brute-force levenshtein join, each pair once") {
    val ents = (0 until 200)
      .map(i => (i.toLong, f"Entity#$i%09d", i % 7))
      .toDF("id", "name", "nation")
    val got = Linkage.editDistancePairs(ents, "id", "name", "nation")
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // one row per unordered pair, no duplicates from multi-position hits
    assert(got.length == got.distinct.length)
    val names = (0 until 200).map(i => f"Entity#$i%09d")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      i <- 0 until 200; j <- (i + 1) until 200
      if lev(names(i), names(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got.toSet == want)
    assert(want.nonEmpty)
  }

  test("editDistancePairs exact on MIXED-width keys (indel pairs included)") {
    // 9- and 10-digit suffixes, including truncation-equal groups that
    // blew up the fixed-width variant (x64 regression)
    val ids = (0 until 120).map(_.toLong) ++
      Seq(1300000001L, 2300000001L, 3300000001L, 100000001L, 1100000001L)
    val ents = ids.zipWithIndex
      .map { case (k, i) => (i.toLong, f"Entity#$k%09d", i % 5) }
      .toDF("id", "name", "nation")
    val got = Linkage.editDistancePairs(ents, "id", "name", "nation")
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length)
    val names = ids.map(k => f"Entity#$k%09d")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      i <- names.indices; j <- (i + 1) until names.length
      if lev(names(i), names(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got.toSet == want)
    // the cross-length insertion pair IS found
    val i18 = ids.indexOf(100000001L).toLong
    val i19 = ids.indexOf(1100000001L).toLong
    assert(want.contains((math.min(i18, i19), math.max(i18, i19))))
  }

  test("editDistancePairs verify column is honest (dist is real levenshtein)") {
    val ents = Seq((1L, "Entity#000000001", 0), (2L, "Entity#000000002", 1),
      (3L, "Entity#000000011", 0)).toDF("id", "name", "nation")
    val rows = Linkage.editDistancePairs(ents, "id", "name", "nation")
      .orderBy("id1", "id2").collect()
    // 1~2 (last digit), 1~3 (tens digit), 2~3 differ in 2 digits -> absent
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 3L)))
    assert(rows.forall(_.getLong(4) == 1L))
    assert(rows.head.getBoolean(5) == false || rows.head.getBoolean(5) == true)
  }

  test("banded (threshold=1) verify kernel == unthresholded levenshtein semantics") {
    // the r15 verify rewrite: levenshtein(a, b, 1) computes only the
    // |i-j|<=1 band and returns -1 past it — kept rows and dist values
    // must match the unthresholded filter exactly, including candidates
    // whose names differ in length by 2 (band exits immediately) and
    // multi-edit collisions that survive variant blocking
    val pairs = Seq(
      ("Ent#123", "Ent#123"),   // dist 0
      ("Ent#123", "Ent#124"),   // dist 1 substitution
      ("Ent#123", "Ent#1234"),  // dist 1 insertion
      ("Ent#123", "Ent#12345"), // dist 2 by length — banded early exit
      ("Ent#123", "Ent#456"),   // dist 3 same length
      ("", "X"), ("", "")).toDF("a", "b")
    val both = pairs.select(col("a"), col("b"),
      levenshtein(col("a"), col("b")).as("full"),
      levenshtein(col("a"), col("b"), 1).as("banded")).collect()
    both.foreach { r =>
      val (full, banded) = (r.getInt(2), r.getInt(3))
      assert((full <= 1) == (banded >= 0),
        s"banded keep-set diverges on (${r.getString(0)}, ${r.getString(1)})")
      if (full <= 1) assert(banded == full,
        s"banded dist diverges on (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("stratifiedSample: deterministic, stratum-local, near target rate") {
    val a = Sampling.stratifiedSample(docs).collect()
    val b = Sampling.stratifiedSample(docs).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val total = a.map(_.getAs[Long]("n_docs")).sum
    val sampled = a.map(_.getAs[Long]("sampled")).sum
    assert(total > 0)
    // target ~10%; small-fixture tolerance
    val rate = sampled.toDouble / total
    assert(rate > 0.02 && rate < 0.25, s"corpus rate $rate")
    a.foreach { r =>
      assert(r.getAs[Long]("sampled") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("samp_chars") >= 0L)
    }
    // membership recomputed independently for one stratum
    val src = a.head.getAs[String]("source")
    val wantKeep = docs.filter(col("source") === src)
      .select(col("doc_id")).collect()
      .count { r =>
        val id = r.getLong(0)
        ((id % Sampling.M) * Sampling.A + Sampling.B) % Sampling.M < Sampling.SampleCut
      }
    assert(a.head.getAs[Long]("sampled") == wantKeep.toLong)
  }

  test("consistentJoinSample: a sampled customer keeps ALL their orders") {
    val cust = spark.read.parquet(s"${TestSpark.Sf0001}/customer.parquet")
    val orders = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
    val rows = Sampling.consistentJoinSample(cust, orders).collect()
    assert(rows.nonEmpty)
    // consistency: the sampled-order mass per segment equals a direct
    // count of orders whose CUSTOMER passes the key-hash predicate —
    // i.e. key-hash sampling of orders == sampling via the customer side
    val direct = orders
      .join(cust.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .filter(graft.streaming.SampleStream.keep(col("o_custkey")))
      .groupBy(col("c_mktsegment")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("sampled_orders") ==
        direct.getOrElse(r.getString(0), 0L), r.getString(0))
      assert(r.getAs[Long]("sampled_customers") <= r.getAs[Long]("customers"))
      assert(r.getAs[Long]("sampled_orders") <= r.getAs[Long]("orders"))
    }
  }

  test("bootstrapCi: brackets ordered and inside the stratum value range") {
    val rows = Sampling.bootstrapCi(docs).collect()
    assert(rows.length > 0)
    val ranges = docs.groupBy(col("source"))
      .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = ranges(r.getAs[String]("source"))
      val (cl, ch) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(cl <= ch)
      assert(cl >= lo.toDouble && ch <= hi.toDouble)
      assert(r.getAs[Long]("replicates") == Sampling.Replicates.toLong)
    }
  }
}
