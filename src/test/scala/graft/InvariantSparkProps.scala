package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.DataFrame
import graft.operators.{GroupAnalytics, TopicAnalytics}

/** Spark-level invariants over generated snapshot micro-fixtures
  * (SURVEY §5.3): lag non-negativity, waste-category bounds, governance
  * percentage range, new-message monotonicity. Case counts are small —
  * every case runs real Spark jobs. */
object InvariantSparkProps extends Properties("graft.spark") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val partRow: Gen[(String, Long, Long, Long)] = for {
    topic <- Gen.oneOf("ta", "tb", "tc")
    part <- Gen.choose(0L, 2L)
    low <- Gen.choose(0L, 50L)
    extra <- Gen.choose(0L, 100L)
  } yield (topic, part, low, low + extra) // high >= low always

  /** 3-scan watermark history with per-scan monotone non-decreasing highs. */
  private val wmGen: Gen[DataFrame] =
    Gen.nonEmptyListOf(partRow).map { rows =>
      val dedup = rows.distinctBy(r => (r._1, r._2))
      val all = dedup.flatMap { case (t, p, lo, hi) =>
        (1 to 3).map(s => ("c1", t, p, lo, hi + 7L * (s - 1), 1700000000L + 60L * s, s.toLong))
      }
      all.toDF("cluster", "topic", "partition_id", "low", "high", "scan_ts", "s")
    }

  private val goGen: Gen[DataFrame] =
    Gen.nonEmptyListOf(for {
      grp <- Gen.oneOf("g1", "g2")
      topic <- Gen.oneOf("ta", "tb", "tc")
      part <- Gen.choose(0L, 2L)
      committed <- Gen.choose(-1L, 120L)
    } yield (grp, topic, part, committed)).map { rows =>
      rows.distinctBy(r => (r._1, r._2, r._3))
        .map { case (g, t, p, c) => ("c1", g, t, p, c, 1700000180L, 3L) }
        .toDF("cluster", "grp", "topic", "partition_id", "committed", "scan_ts", "s")
    }

  private val gdDf =
    Seq(("c1", "g1", "STABLE", 2L, 1700000180L, 3L),
      ("c1", "g2", "EMPTY", 0L, 1700000180L, 3L))
      .toDF("cluster", "grp", "state", "member_count", "scan_ts", "s")

  property("lag rows: no nulls, bounded by high watermark, P12 guards hold") =
    forAll(wmGen, goGen) { (wm, go) =>
      val maxHigh = wm.agg(org.apache.spark.sql.functions.max($"high"))
        .collect()(0).getLong(0)
      val rows = GroupAnalytics.lagRows(wm, go).collect()
      // committed >= 0 after the guard, so lag <= high <= maxHigh;
      // committed <= 120 by generation, so lag >= -120
      rows.forall { r =>
        val lag = r.getAs[Long]("lag")
        !r.anyNull && lag <= maxHigh && lag >= -120L
      }
    }

  property("waste categories: counts bounded by total, percentage in [0,100]") =
    forAll(wmGen, goGen) { (wm, go) =>
      val topics = TopicAnalytics.topicsDf(wm, go, gdDf)
      val total = topics.count()
      val w = TopicAnalytics.wasteSummary(topics).collect()
      w.forall { r =>
        val c = r.getAs[Long]("topics_count")
        val p = r.getAs[Long]("cluster_percentage")
        c >= 0 && c <= total && p >= 0 && p <= 100
      }
    }

  property("topics_df: new_messages >= 0 under monotone highs; rate = new div elapsed") =
    forAll(wmGen, goGen) { (wm, go) =>
      val rows = TopicAnalytics.topicsDf(wm, go, gdDf).collect()
      rows.forall { r =>
        val nm = r.getAs[Long]("new_messages")
        val el = r.getAs[Long]("eval_elapsed_time")
        val mps = r.getAs[Long]("messages_per_seconds")
        nm >= 0 && el == 120L && mps == nm / el
      }
    }

  property("governance summary percentage in [0,100] or null") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta_x", "t_empty9", "Gamma"))) { names =>
      val df = names.distinct.toDF("name")
      val r = graft.operators.Governance.summary(df).collect()(0)
      val idx = r.fieldIndex("compliant_percentage")
      r.isNullAt(idx) || {
        val p = r.getDouble(idx); p >= 0.0 && p <= 100.0
      }
    }

  /** Random messy URLs: scheme/www/case variants around a clean
    * host+path core, with optional query string, fragment, and trailing
    * slash — the full space WebCuration.normalizeUrl claims to
    * canonicalize. */
  private val messyUrl: Gen[(String, String)] = for {
    host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(10).mkString)
    tld <- Gen.oneOf("com", "org", "net")
    seg <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(8).mkString.toLowerCase)
    scheme <- Gen.oneOf("http://", "https://", "HTTPS://", "HTTP://")
    www <- Gen.oneOf("", "www.")
    upper <- Gen.oneOf(true, false)
    query <- Gen.oneOf("", "?utm_source=x&id=7", "?a=b")
    frag <- Gen.oneOf("", "#top")
    slash <- Gen.oneOf("", "/")
  } yield {
    val core = s"$host.$tld/p/$seg"
    val h = if (upper) s"$host.$tld".toUpperCase else s"$host.$tld"
    (s"$scheme$www$h/p/$seg$query$frag$slash", core)
  }

  property("normalizeUrl canonicalizes every messy variant and is idempotent") =
    forAll(Gen.nonEmptyListOf(messyUrl)) { urls =>
      import org.apache.spark.sql.functions.col
      val df = urls.zipWithIndex
        .map { case ((u, want), i) => (i.toLong, u, want) }
        .toDF("doc_id", "url", "want")
      val got = df.select(col("doc_id"),
          graft.functions.WebCuration.normalizeUrl(col("url")).as("n1"),
          col("want"))
        .select(col("doc_id"),
          col("n1"),
          graft.functions.WebCuration.normalizeUrl(col("n1")).as("n2"),
          col("want"))
        .collect()
      got.forall(r => r.getString(1) == r.getString(3) &&
        r.getString(2) == r.getString(1))
    }

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)
}
