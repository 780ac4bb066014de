package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextAnalytics}

/** Round-11 apply-half operators beyond excision: quality-aware cluster
  * keeper selection and benchmark-decontamination removal. Oracle
  * parity is the value gate (q_cluster_keep_best, q_decontam_rollup);
  * these pin the CONTRACTS against independent in-memory references and
  * the plan shapes. */
class CurationApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private lazy val clusters =
    Dedup.dedupClusters(Dedup.jaccardPairs(docs, threshold = 0.3))

  private lazy val keepBest = Dedup.keepBestByQuality(docs, clusters)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getBoolean(4)))

  test("exactly one keeper per cluster, and it is the best-quality member") {
    val byCluster = keepBest.groupBy(_._2)
    for ((cid, members) <- byCluster) {
      val keepers = members.filter(_._5)
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      val best = members.map(_._4).max
      val expected = members.filter(_._4 == best).map(_._1).min
      assert(keepers.head._1 == expected,
        s"cluster $cid kept ${keepers.head._1}, expected $expected " +
          s"(best quality $best)")
      members.foreach(m => assert(m._3 == members.length.toLong,
        s"cluster $cid size mismatch on doc ${m._1}"))
    }
  }

  test("unclustered docs are single-member clusters keeping themselves") {
    val clustered = clusters.select("doc_id").as[Long].collect().toSet
    for ((id, cid, size, _, keep) <- keepBest if !clustered(id)) {
      assert(cid == id && size == 1L && keep, s"doc $id")
    }
    assert(keepBest.length == docs.count())
  }

  test("keeper policy shifts keepers off the min-id convention somewhere") {
    // on the fixture at least one multi-member cluster must have a
    // keeper that is NOT the min id — otherwise the query is
    // indistinguishable from dropClusterDuplicates and proves nothing
    val multi = keepBest.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture has no multi-member clusters")
    val shifted = multi.count { case (_, members) =>
      members.filter(_._5).head._1 != members.map(_._1).min
    }
    assert(shifted > 0,
      "every cluster kept its min id — quality ordering never engaged")
  }

  test("decontamination drops exactly the brute-force 8-gram hit set") {
    val corpus = docs.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source")))
    def grams(text: String): Set[String] = {
      val toks = text.split(" ", -1)
      if (toks.length < 8) Set.empty
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val benchGrams = corpus.filter(_._1 % 97 == 0).flatMap(c => grams(c._2)).toSet
    val train = corpus.filter(_._1 % 97 != 0)
    val expect = train.groupBy(_._3).map { case (src, rows) =>
      val dropped = rows.filter(r => grams(r._2).exists(benchGrams))
      src -> (rows.length.toLong, dropped.length.toLong,
        rows.map(_._2.split(" ", -1).length.toLong).sum,
        dropped.map(_._2.split(" ", -1).length.toLong).sum)
    }
    val got = SparkEntry.queries("q_decontam_rollup")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(2), r.getLong(4))).toMap
    assert(got.keySet == expect.keySet)
    for ((src, e) <- expect) assert(got(src) == e, s"source $src")
    // the removal must be real but not wholesale on this fixture
    val (totDocs, totDropped) = (expect.values.map(_._1).sum,
      expect.values.map(_._2).sum)
    assert(totDropped > 0, "no doc shared an 8-gram with the bench slice")
    assert(totDropped < totDocs / 2, "decontamination dropped most of the corpus")
  }

  test("plan shapes: bloom prefilter, no forced broadcast, shuffle-hash back-join") {
    val d = docs
    val plan = TextAnalytics.decontaminateReport(
        d.filter(col("doc_id") % 97 =!= 0),
        d.filter(col("doc_id") % 97 === 0))
      .queryExecution.executedPlan.toString
    // the bench slice is corpus-PROPORTIONAL here (doc_id % 97), so the
    // operator must not force a broadcast of its n-gram set — the
    // corpus streams map-side against the fixed-size bloom instead
    // (contaminationImpl's shape), and the exact join is hint-free
    assert(plan.contains("might_contain"),
      "corpus n-gram stream should probe the fixed-size bloom map-side")
    assert(plan.contains("ShuffledHashJoin"),
      "flagged-doc join must stay shuffle-hash (corpus-proportional worst case)")
    val kb = Dedup.keepBestByQuality(d, clusters)
      .queryExecution.executedPlan.toString
    assert(!kb.contains("CartesianProduct"))
  }
}
