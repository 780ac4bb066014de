package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Ivf, Similarity}

/** Semantic-dedup (SemDeDup) and centroid-drift invariants on sf0.001.
  * Cross-engine value parity is the oracle gate (q_semdedup,
  * q_centroid_drift); these tests pin the operator CONTRACTS:
  * group structure, the keeper rule, and drift-direction sanity. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")

  private lazy val centroids = Ivf.trainCentroids(emb)
  private lazy val verdicts = Ivf.semDedup(emb, centroids).cache()

  test("every duplicate group keeps exactly one member") {
    val perGroup = verdicts.groupBy($"group_id")
      .agg(count(lit(1)).as("n"), sum(when($"keep", 1).otherwise(0)).as("kept"))
      .as[(Long, Long, Long)].collect()
    assert(perGroup.nonEmpty, "fixture should contain semantic dup groups")
    perGroup.foreach { case (g, n, kept) =>
      assert(n >= 2, s"group $g has $n member(s) — singletons must not be emitted")
      assert(kept == 1L, s"group $g kept $kept members, want exactly 1")
    }
  }

  test("the keeper is the least-prototypical member (SemDeDup rule)") {
    val rows = verdicts.select($"group_id", $"vec_id", $"centroid_score", $"keep")
      .as[(Long, Long, Double, Boolean)].collect().groupBy(_._1)
    rows.foreach { case (g, members) =>
      val keeper = members.find(_._4).get
      val minScore = members.map(_._3).min
      assert(keeper._3 == minScore,
        s"group $g keeper score ${keeper._3} != min centroid score $minScore")
      // vec_id tie-break: no other member may share the min score with a lower id
      assert(!members.exists(m => !m._4 && m._3 == minScore && m._2 < keeper._2))
    }
  }

  test("groups never cross cluster boundaries") {
    val multi = verdicts.groupBy($"group_id")
      .agg(countDistinct($"cid").as("cids")).filter($"cids" > 1).count()
    assert(multi == 0L, "a semantic dup group spanned two k-means clusters")
  }

  test("centroid drift of an unchanged corpus is exactly 1.0 per label") {
    val self = Similarity.centroidDrift(emb, emb)
      .select($"n_v1", $"n_v2", $"centroid_cosine").as[(Long, Long, Double)].collect()
    assert(self.nonEmpty)
    self.foreach { case (n1, n2, cos) =>
      assert(n1 == n2); assert(cos == 1.0, s"self-drift cosine $cos != 1.0")
    }
  }

  test("prototypicality prune drops exactly floor(n/5) per cluster, top-ranked first") {
    val v = Ivf.prototypicalityPrune(emb, centroids)
    assert(v.count() == emb.count(), "one verdict row per vector")
    val perCluster = v.groupBy($"cid")
      .agg(count(lit(1)).as("n"),
        sum(when(!$"keep", 1L).otherwise(0L)).as("dropped"),
        max(when(!$"keep", $"proto_rank")).as("max_dropped_rank"))
      .as[(Int, Long, Long, Option[Long])].collect()
    perCluster.foreach { case (cid, n, dropped, maxDroppedRank) =>
      assert(dropped == n / 5, s"cluster $cid dropped $dropped of $n, want ${n / 5}")
      // dropped set is a prefix of the prototypicality ranking
      maxDroppedRank.foreach(r => assert(r == dropped,
        s"cluster $cid dropped ranks up to $r but only $dropped rows — not a prefix"))
    }
  }

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  test("gopher rule battery: clean corpus passes symbol/alpha, pass_all bounded") {
    val r = functions.TextAnalytics.gopherRules(docs).cache()
    val total = r.agg(sum($"docs")).as[Long].head()
    assert(total == docs.count())
    r.select($"docs", $"pass_alpha", $"pass_symbol", $"pass_all",
      $"pass_wordcount", $"pass_wordlen", $"pass_stopwords")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .foreach { case (d, alpha, sym, all, wc, mwl, stp) =>
        assert(alpha == d && sym == d, "clean fixture text is alphabetic and symbol-free")
        assert(all <= Seq(wc, mwl, stp).min, "combined gate can't beat any single rule")
      }
  }

  test("perturbing one label moves only that label's centroid") {
    val moved = emb.select($"vec_id",
      when($"label" === 3, reverse($"embedding")).otherwise($"embedding").as("embedding"),
      $"label")
    val drift = Similarity.centroidDrift(emb, moved)
      .select($"label", $"centroid_cosine").as[(Int, Double)].collect().toMap
    assert(drift(3) < 0.999, s"label 3 drift ${drift(3)} should be visible")
    drift.filter(_._1 != 3).foreach { case (l, c) =>
      assert(c == 1.0, s"untouched label $l drifted: $c")
    }
  }
}
