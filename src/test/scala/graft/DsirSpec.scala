package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics

/** DSIR importance resampling (Xie et al. 2023) on sf0.001.
  * Cross-engine value parity is the oracle gate (q_dsir_weights,
  * q_dsir_mixture); these tests pin the CONTRACTS: a bitwise driver-side
  * reproduction of the hashed-feature likelihood-ratio arithmetic, the
  * top-quartile selection rule, the target-language preference the
  * operator exists to produce, and weights/mixture consistency. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private lazy val weights = TextAnalytics.dsirWeights(docs)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    .sortBy(_._1)

  test("driver-side brute force reproduces weights bitwise") {
    val B = TextAnalytics.DsirBuckets
    val scale = TextAnalytics.DsirScale
    val rows = docs.select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    def feats(text: String): Seq[String] = {
      val t = text.split(" ", -1).toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val perDocBuckets = rows.map { case (id, lang, text) =>
      (id, lang, feats(text).map(f =>
        graft.expressions.PolyHash.hash(f.getBytes("UTF-8")) % B))
    }
    val nR = new Array[Long](B); val nT = new Array[Long](B)
    perDocBuckets.foreach { case (_, lang, bs) =>
      bs.foreach { b =>
        nR(b.toInt) += 1; if (lang == "en") nT(b.toInt) += 1
      }
    }
    val nrTot = nR.sum; val ntTot = nT.sum
    val g = Array.tabulate(B)(b => math.floor(
      scale.toDouble
        * ((nT(b) + 1).toDouble / (ntTot + B).toDouble)
        / ((nR(b) + 1).toDouble / (nrTot + B).toDouble)).toLong)
    val expect = perDocBuckets.map { case (id, _, bs) =>
      val gsum = bs.map(b => g(b.toInt)).sum
      (id, bs.size.toLong, gsum.toDouble / bs.size / scale.toDouble)
    }.sortBy(_._1)
    assert(weights.length == expect.length)
    weights.zip(expect).foreach { case ((id, n, w, _), (eid, en, ew)) =>
      assert(id == eid && n == en, s"doc $id feature count $n != $en")
      assert(w == ew, s"doc $id weight $w != brute-force $ew (bitwise)")
    }
  }

  test("selection is exactly the quantile_cont top quartile") {
    val ws = weights.map(_._3).sorted
    val pos = (ws.length - 1) * 0.75
    val lo = ws(pos.toInt)
    val hi = ws(math.ceil(pos).toInt)
    val thr = lo + (hi - lo) * (pos - pos.toInt)
    weights.foreach { case (id, _, w, sel) =>
      assert(sel == (w >= thr), s"doc $id selected=$sel but w=$w vs thr=$thr")
    }
    val frac = weights.count(_._4).toDouble / weights.length
    assert(frac >= 0.2 && frac <= 0.3, s"selected fraction $frac not ~25%")
  }

  test("the target language is preferentially selected (the DSIR point)") {
    val byLang = docs.select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val rate = weights.groupBy(r => byLang(r._1))
      .map { case (l, rs) => l -> rs.count(_._4).toDouble / rs.size }
    val others = rate.filter(_._1 != "en").values
    assert(others.nonEmpty)
    assert(rate("en") > 2 * others.max,
      s"en keep-rate ${rate("en")} should dominate ${rate.toSeq.sortBy(_._1)}")
  }

  test("mixture rollup is consistent with the per-doc weights") {
    val mix = TextAnalytics.dsirMixture(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val bySrc = docs.select($"doc_id", $"source").as[(Long, String)].collect().toMap
    assert(mix.map(_._2).sum == weights.length)
    assert(mix.map(_._3).sum == weights.count(_._4).toLong)
    mix.foreach { case (src, n, sel, rate, mw) =>
      val members = weights.filter(r => bySrc(r._1) == src)
      assert(n == members.length && sel == members.count(_._4))
      assert(rate == sel.toDouble / n.toDouble)
      assert(mw > 0.0, s"source $src mean weight $mw must be positive")
    }
  }

  test("the bucket weight table joins by broadcast (plan shape)") {
    // asserted on the UNtruncated scoring pipeline: dsirScored
    // checkpoints perDoc (r14 — the threshold branch re-ran the whole
    // feature explosion), which replaces this subtree with a LogicalRDD
    // scan in the public queries' plans
    val plan = TextAnalytics.dsirPerDoc(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the <=1024-row weight table must broadcast onto the feature stream")
    assert(!plan.contains("CartesianProduct"))
    // and the public query's final plan reads the checkpointed scores,
    // never a cartesian
    val outer = TextAnalytics.dsirWeights(docs)
      .queryExecution.executedPlan.toString
    assert(outer.contains("Scan ExistingRDD"))
    assert(!outer.contains("CartesianProduct"))
  }

  test("the AtScale dsir.buckets conf reaches the batch AND stream paths") {
    // r9 verdict item 5, the lshBits proof pattern: an isolated session
    // sets the conf; the SparkEntry query (batch path) and a fitDsir
    // model (the stream path's frozen scorer) must both build at the
    // configured grid — proven by equality with explicit-bucket calls
    // and by a genuine difference from the 1024 default.
    val s = {
      val ns = TestSpark.spark.newSession()
      TestSpark.spark.conf.getAll.foreach { case (k, v) =>
        if (ns.conf.isModifiable(k)) ns.conf.set(k, v)
      }
      ns
    }
    val dir = TestSpark.Sf0001
    val d = s.read.parquet(s"$dir/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_feats", "dsir_weight", "selected").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
    s.conf.set(graft.functions.AtScale.DsirBucketsKey, "8192")
    try {
      val viaEntry = canon(SparkEntry.queries("q_dsir_weights")(s, dir))
      val direct = canon(TextAnalytics.dsirWeights(d, buckets = 8192))
      assert(viaEntry == direct, "batch path ignored the buckets conf")
      assert(viaEntry.map(_._3) != canon(TextAnalytics.dsirWeights(d)).map(_._3),
        "8192-bucket weights should differ from the 1024 default grid")
      // stream path: fitDsir's default buckets read the same conf, so
      // the frozen model scores served rows on the configured grid —
      // bitwise the batch weights over the fit corpus (scoredDocs runs
      // identically on a batch frame)
      val m = TextAnalytics.fitDsir(d)
      assert(m.buckets == 8192, "fitDsir default did not read the conf")
      val served = canon(graft.streaming.DsirStream.scoredDocs(d, m))
      assert(served == direct, "served scores diverge from batch at 8192")
    } finally s.conf.unset(graft.functions.AtScale.DsirBucketsKey)
  }

  test("approx mode defaults the grid to the 2^13 operating point") {
    // r10 verdict item 5: with NO explicit buckets conf, at-scale mode
    // (quantiles.approx=true) must build at 8192 — batch AND the stream
    // path's frozen model — while parity mode stays at 1024. Both arms
    // of each comparison run in the SAME mode, so the only variable is
    // the defaulted grid (the approx percentile switch is shared).
    val s = {
      val ns = TestSpark.spark.newSession()
      TestSpark.spark.conf.getAll.foreach { case (k, v) =>
        if (ns.conf.isModifiable(k)) ns.conf.set(k, v)
      }
      ns
    }
    val dir = TestSpark.Sf0001
    val d = s.read.parquet(s"$dir/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_feats", "dsir_weight", "selected").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
    assert(graft.functions.AtScale.dsirBuckets(d) ==
      TextAnalytics.DsirBuckets, "parity mode must default to 1024")
    s.conf.set(graft.functions.AtScale.ApproxQuantilesKey, "true")
    try {
      assert(graft.functions.AtScale.dsirBuckets(d) ==
        TextAnalytics.DsirBucketsAtScale)
      val viaEntry = canon(SparkEntry.queries("q_dsir_weights")(s, dir))
      assert(viaEntry == canon(TextAnalytics.dsirWeights(d, buckets = 8192)),
        "approx-mode batch default is not the 8192 grid")
      val m = TextAnalytics.fitDsir(d)
      assert(m.buckets == 8192, "approx-mode fitDsir default is not 8192")
      // an explicit conf still wins over the mode default
      s.conf.set(graft.functions.AtScale.DsirBucketsKey, "1024")
      assert(graft.functions.AtScale.dsirBuckets(d) == 1024)
      s.conf.unset(graft.functions.AtScale.DsirBucketsKey)
    } finally s.conf.unset(graft.functions.AtScale.ApproxQuantilesKey)
  }
}
