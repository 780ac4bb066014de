package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextAnalytics, WebCuration}

/** URL/domain curation family (r9 verdict item 6a) + tokenizer
  * fertility audit (6b). Cross-engine value parity is the oracle gate
  * (q_url_dedup, q_domain_rollup, q_bpe_fertility); these pin the
  * CONTRACTS: normalization canonicalizes every messy variant,
  * keep = min doc_id per canonical key, rollup consistency with the
  * per-doc verdicts, fertility/baseline arithmetic, and the plan
  * shapes (one window exchange; shuffle-hash, never a corpus
  * broadcast). */
class WebCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private lazy val verdicts = WebCuration.urlDedup(
      WebCuration.withSyntheticUrls(docs))
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getBoolean(4))).sortBy(_._1)

  test("normalization canonicalizes every messy variant to host+path") {
    verdicts.foreach { case (id, url, norm, _, _) =>
      assert(norm.matches("h\\d+\\.example\\.com/p/\\d+"),
        s"doc $id normalized to unexpected key $norm (from $url)")
      assert(!norm.contains("?") && !norm.contains("#") &&
        !norm.startsWith("www.") && !norm.endsWith("/") &&
        norm == norm.toLowerCase)
    }
    // idempotence: normalizing an already-normalized url is a no-op
    val renorm = WebCuration.urlDedup(
        WebCuration.withSyntheticUrls(docs)
          .withColumn("url", WebCuration.normalizeUrl(col("url"))))
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(renorm.toSeq == verdicts.map(v => (v._1, v._3)).toSeq)
  }

  test("dup cohorts: doc_id div 3 groups share one canonical URL") {
    val byNorm = verdicts.groupBy(_._3)
    verdicts.foreach { case (id, _, norm, urlDocs, keep) =>
      val cohort = verdicts.filter(v => v._1 / WebCuration.UrlCohort
        == id / WebCuration.UrlCohort)
      assert(cohort.forall(_._3 == norm),
        s"cohort of doc $id split across canonical keys")
      assert(urlDocs == byNorm(norm).length.toLong)
      assert(keep == (id == byNorm(norm).map(_._1).min),
        s"doc $id keep flag != min-doc_id rule")
    }
    // the messy variants genuinely collapse: fewer keys than docs
    assert(byNorm.size < verdicts.length)
    assert(byNorm.values.exists(_.length > 1), "no dup group at all")
  }

  test("domain rollup is consistent with per-doc verdicts and quality") {
    val roll = WebCuration.domainRollup(WebCuration.withSyntheticUrls(docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(roll.length == WebCuration.UrlHosts)
    val quality = TextAnalytics.qualityScores(docs)
      .select($"doc_id", $"n_tokens", $"quality_score")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    roll.foreach { case (domain, n, distinct, kept, dupRate, tokens, medq) =>
      val members = verdicts.filter(_._3.startsWith(domain + "/"))
      assert(n == members.length.toLong, s"$domain docs")
      assert(distinct == members.map(_._3).distinct.length.toLong)
      assert(kept == members.count(_._5).toLong)
      assert(dupRate == (n - kept).toDouble / n.toDouble)
      assert(tokens == members.map(m => quality(m._1)._1).sum)
      // median over members (exact percentile, linear interpolation)
      val qs = members.map(m => quality(m._1)._2).sorted
      val pos = (qs.length - 1) * 0.5
      val want = qs(pos.toInt) + (qs(math.ceil(pos).toInt) - qs(pos.toInt)) *
        (pos - pos.toInt)
      assert(medq == want, s"$domain median quality $medq != $want")
    }
  }

  test("plan shapes: one window exchange, JOIN-FREE rollup, no broadcast of the corpus") {
    val dedupPlan = WebCuration.urlDedup(WebCuration.withSyntheticUrls(docs))
      .queryExecution.executedPlan.toString
    // both verdict columns come from one window over url_norm
    assert("Window".r.findAllIn(dedupPlan).size >= 1)
    assert(!dedupPlan.contains("CartesianProduct"))
    val rollPlan = WebCuration.domainRollup(WebCuration.withSyntheticUrls(docs))
      .queryExecution.executedPlan.toString
    // r15: the quality columns are computed on the same row the URL
    // verdict reads, so the former qualityScores ⋈ urlDedup
    // shuffle-hash join (two corpus-mass doc_id exchanges) is GONE —
    // the rollup is one corpus scan, one url_norm window exchange, one
    // domain aggregation ("domain rollup is consistent" above pins the
    // values; the oracle gate pins them cross-engine)
    assert(!rollPlan.contains("Join"),
      "the rollup must stay join-free (row-local carry-through)")
    assert("Window".r.findAllIn(rollPlan).size == 1)
    assert(!rollPlan.contains("BroadcastExchange"))
    assert(!rollPlan.contains("CartesianProduct"))
  }

  test("fertility audit: per-source ratios against the language baseline") {
    val merges = TextAnalytics.fitBpeMerges(docs)
    val rows = TextAnalytics.bpeFertility(docs, merges)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))
    assert(rows.nonEmpty)
    // encode totals agree with bpeEncode (the shared bpeNsym expression)
    val enc = TextAnalytics.bpeEncode(docs, merges)
      .select($"source", $"wsp_tokens", $"bpe_tokens")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum == enc(src)._1, s"$src wsp mismatch vs bpeEncode")
      assert(rs.map(_._4).sum == enc(src)._2, s"$src bpe mismatch vs bpeEncode")
    }
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val langFert = rs.map(_._4).sum.toDouble / rs.map(_._3).sum.toDouble
      rs.foreach { r =>
        assert(r._6 == r._4.toDouble / r._3.toDouble, "fertility arithmetic")
        assert(r._8 == langFert, s"$lang baseline mismatch")
        assert(r._9 == r._6 / r._8, "ratio arithmetic")
        assert(r._6 >= 1.0, "a word encodes to at least one symbol")
      }
      // ratios center on 1 within each language (it is a RELATIVE audit)
      val mean = rs.map(_._9).sum / rs.length
      assert(mean > 0.9 && mean < 1.1, s"$lang ratio mean $mean off-center")
    }
  }
}
