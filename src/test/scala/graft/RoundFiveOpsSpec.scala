package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Ivf, Similarity, Sketches, TextAnalytics}
import graft.operators.Relational

/** Contracts for the round-5 additions (cross-engine value parity is the
  * oracle gate — q_silhouette, q_bpe_encode, q_hybrid_dedup,
  * q_props_extract; these pin the operator semantics):
  *  - the CentroidTopTwo kernel vs a driver-side brute force,
  *  - silhouette range/partition invariants,
  *  - BPE encode token-count algebra vs the fit,
  *  - hybrid verification as a pure refinement of the candidate set,
  *  - JSON props extraction totals. */
class RoundFiveOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private lazy val centroids = Ivf.trainCentroids(emb)

  test("centroid_top_two matches driver-side brute force on every vector (bitwise)") {
    val table = centroids.map { case (cid, c) =>
      (cid, c.toIndexedSeq: Seq[Double], math.sqrt(c.map(x => x * x).sum))
    }
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      Similarity.l2Norm(col("embedding")).as("nrm"))
    val got = base.withColumn("t",
        graft.expressions.CentroidTopTwo.centroid_top_two(col("v"), col("nrm"), table))
      .select(col("vec_id"), col("t.score"), col("t.cid"), col("t.second"),
        col("v"), col("nrm"))
      .collect()
    assert(got.length > 0)
    got.foreach { r =>
      val v = r.getSeq[Double](4).toArray
      val nrm = r.getDouble(5)
      val scores = table.map { case (cid, cv, cn) =>
        var s = 0.0
        var i = 0
        val n = math.min(v.length, cv.size)
        while (i < n) { s += v(i) * cv(i); i += 1 }
        (cid, s / (nrm * cn))
      }
      // SQL double order, score DESC then cid DESC — non-NaN fixture
      val sorted = scores.sortBy { case (cid, s) => (-s, -cid) }
      assert(r.getDouble(1) == sorted(0)._2, s"vec ${r.getLong(0)} best score")
      assert(r.getInt(2) == sorted(0)._1, s"vec ${r.getLong(0)} best cid")
      assert(r.getDouble(3) == sorted(1)._2, s"vec ${r.getLong(0)} second score")
    }
  }

  test("silhouette: cluster partition covers the corpus, s stays in [-1, 1]") {
    val sil = Ivf.silhouette(emb, centroids).cache()
    val n = emb.count()
    assert(sil.agg(sum($"vectors")).as[Long].head() == n)
    sil.select($"cid", $"vectors", $"mean_silhouette", $"min_silhouette", $"max_silhouette")
      .as[(Int, Long, Double, Double, Double)].collect().foreach {
        case (cid, vecs, mean, lo, hi) =>
          assert(vecs > 0)
          assert(lo >= -1.0 - 1e-9 && hi <= 1.0 + 1e-9, s"cid $cid range [$lo,$hi]")
          assert(lo <= hi, s"cid $cid min > max")
          // the 2^-30 floor pulls the mean down by < 1 ulp of the grid
          assert(mean >= lo - 1e-9 && mean <= hi + 1e-9, s"cid $cid mean $mean outside [$lo,$hi]")
      }
  }

  test("bpe encode: token algebra against the fitted merges") {
    val merges = TextAnalytics.fitBpeMerges(docs)
    assert(merges.nonEmpty)
    val enc = TextAnalytics.bpeEncode(docs, merges).cache()
    val rows = enc.select($"source", $"words", $"wsp_tokens", $"bpe_tokens", $"chars")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, words, wsp, bpe, chars) =>
      assert(words <= wsp, s"$src distinct words exceed occurrences")
      assert(bpe >= wsp, s"$src: every word must encode to >= 1 symbol")
      assert(bpe <= chars, s"$src: every symbol holds >= 1 char")
    }
    // zero merges degenerate: every char is its own symbol
    val raw = TextAnalytics.bpeEncode(docs, Seq.empty)
      .select($"source", $"bpe_tokens", $"chars").as[(String, Long, Long)].collect()
    raw.foreach { case (src, bpe, chars) =>
      assert(bpe == chars, s"$src: unmerged encode must be char-level")
    }
    // merges strictly help on this corpus
    val rawTotal = raw.map(_._2).sum
    val mergedTotal = rows.map(_._4).sum
    assert(mergedTotal < rawTotal, "fitted merges should compress the corpus")
    // corpus-total whitespace tokens match an independent count
    val wspTotal = rows.map(_._3).sum
    val direct = docs.select(size(split($"text", " ")).cast("long")).as[Long]
      .collect().sum
    assert(wspTotal == direct)
  }

  test("hybrid dedup verification refines the candidate set, never adds to it") {
    val cands = Sketches.minHashPairs(docs, threshold = 0.0)
    val hybrid = Similarity.hybridVerify(cands, emb).cache()
    val candPairs = cands.filter($"est_jaccard" >= 0.3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val hybridRows = hybrid
      .select($"doc_a", $"doc_b", $"cosine", $"confirmed")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(hybridRows.nonEmpty, "fixture should produce hybrid candidates")
    assert(hybridRows.map(r => (r._1, r._2)).toSet == candPairs,
      "hybrid must score exactly the thresholded candidate pairs")
    hybridRows.foreach { case (a, b, cos, confirmed) =>
      assert(confirmed == (cos >= 0.4), s"($a,$b) verdict/cosine mismatch")
    }
    // NOTE deliberately no "some pair confirms" assert: the fixture's
    // embeddings are independent of its text duplicates, so at sf0.001
    // the confirmed set may legitimately be empty — the operator
    // contract is the verdict column, gated by the oracle.
  }

  test("corpus report: one row whose volume and split columns add up") {
    val r = TextAnalytics.corpusReport(docs).collect()
    assert(r.length == 1)
    val row = r.head
    val nDocs = docs.count()
    assert(row.getAs[Long]("docs") == nDocs)
    assert(row.getAs[Long]("train_docs") + row.getAs[Long]("val_docs")
      + row.getAs[Long]("test_docs") == nDocs)
    assert(row.getAs[Long]("exact_dup_docs") >= 0)
    assert(row.getAs[Long]("tokens") <= row.getAs[Long]("chars"))
    val mq = row.getAs[Double]("mean_quality")
    assert(mq > 0.0 && mq <= 1.0)
    assert(row.getAs[Long]("sources") == 20L && row.getAs[Long]("langs") == 5L)
  }

  test("key skew: totals match and the top-N mass is a plausible share") {
    val ev = graft.sources.Snapshots.eventsRaw(spark, TestSpark.Sf0001)
    val sk = Relational.keySkew(ev).cache()
    val total = sk.agg(sum($"events")).as[Long].head()
    assert(total == ev.count())
    sk.select($"events", $"users", $"max_user_events", $"topn_events", $"topn_share")
      .as[(Long, Long, Long, Long, Double)].collect().foreach {
        case (events, users, mx, topn, share) =>
          assert(mx <= topn, "top-10 mass must include the hottest user")
          assert(topn <= events)
          assert(share > 0.0 && share <= 1.0)
          assert(users > 0 && mx >= (events + users - 1) / users,
            "max must be at least the ceiling of the mean")
      }
  }

  test("props extraction: JSON k parses on every event, totals add up") {
    val out = Relational.propsExtract(
      graft.sources.Snapshots.eventsRaw(spark, TestSpark.Sf0001)).cache()
    val total = out.agg(sum($"events")).as[Long].head()
    val raw = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet").count()
    assert(total == raw)
    out.select($"events", $"with_k", $"k_min", $"k_max", $"k_distinct")
      .as[(Long, Long, Long, Long, Long)].collect().foreach {
        case (n, withK, lo, hi, dist) =>
          assert(withK == n, "fixture props always carry k")
          assert(lo >= 0 && hi <= 99 && lo <= hi)
          assert(dist <= hi - lo + 1)
      }
  }
}
