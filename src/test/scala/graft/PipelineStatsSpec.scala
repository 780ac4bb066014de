package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TextAnalytics}

/** Hand-computed cases for the repetition, TF-IDF, and embedding-stats
  * operators (their corpus-level behavior is oracle-checked by the
  * driver; these pin the per-row arithmetic). */
class PipelineStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dupSpans finds the maximal cross-document duplicated run") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),         // shares tokens "a..h" with doc 2
      (2L, "x x a b c d e f g h y y"),
      (3L, "p q r s t"),                   // single unique 5-gram
      (4L, "m n o p2 q2 m n o p2 q2")      // WITHIN-doc repeat only: not dup
    ).toDF("doc_id", "text")
    val r = graft.functions.TextAnalytics.dupSpans(docs).orderBy($"doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // shared 8-token run = 4 consecutive duplicated 5-gram positions,
    // span length 4 + (5-1) = 8 tokens
    assert(r(0) === ((1L, 6L, 4L, 8L)))
    assert(r(1) === ((2L, 8L, 4L, 8L)))
    assert(r(2) === ((3L, 1L, 0L, 0L)))
    assert(r(3) === ((4L, 6L, 0L, 0L)))
  }

  test("dupSpans separates scattered phrases from one long passage") {
    // doc 5 and 6 share two DISJOINT 5-grams (not adjacent in doc 5):
    // max span stays 5 while dup_positions is 2
    val docs = Seq(
      (5L, "a b c d e z1 z2 f g h i j"),
      (6L, "a b c d e q1 q2 f g h i j")
    ).toDF("doc_id", "text")
    val r = graft.functions.TextAnalytics.dupSpans(docs).orderBy($"doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    assert(r(0) === ((5L, 2L, 5L)))
    assert(r(1) === ((6L, 2L, 5L)))
  }

  test("fuzzyContamination flags an edited copy, ignores unrelated docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (2L, "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    // bench 10 = doc 1 with one token swapped; bench 11 matches nothing
    val bench = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xq omicron pi rho sigma tau upsilon"),
      (11L, "completely different words that never appeared anywhere " +
        "in the corpus under any alignment whatsoever okay")
    ).toDF("bench_id", "text")
    val r = graft.functions.TextAnalytics
      .fuzzyContaminationAgainst(corpus, bench)
      .orderBy($"bench_id").collect()
    assert(r(0).getAs[Long]("matches") >= 1L)
    assert(r(0).getAs[Boolean]("flagged"))
    assert(r(0).getAs[Long]("min_dist") <= 2L) // "xi" -> "xq" is one char
    assert(!r(1).getAs[Boolean]("flagged"))
  }

  test("sourceBoilerplate finds the shared header, skips clean sources") {
    val header = "copyright acme corp all rights"
    val d = Seq(
      (1L, s"$header unique1 tail1 words1 here1", "s1"),
      (2L, s"$header unique2 tail2 words2 here2", "s1"),
      (3L, s"$header unique3 tail3 words3 here3", "s1"),
      (4L, s"$header unique4 tail4 words4 here4", "s1"),
      (5L, "totally original text body one aa", "s2"),
      (6L, "another fresh document body two bb", "s2"),
      (7L, "yet more unrepeated content three cc", "s2"),
      (8L, "final distinct words appear four dd", "s2")
    ).toDF("doc_id", "text", "source")
    val r = graft.functions.TextAnalytics.sourceBoilerplate(d)
      .orderBy($"source").collect()
    // header has 5 tokens -> 3 trigrams at df=4 (junction trigrams df=1)
    assert(r(0).getAs[Long]("boiler_ngrams") === 3L)
    assert(r(0).getAs[Long]("boiler_hits") === 12L)
    assert(r(1).getAs[Long]("boiler_ngrams") === 0L)
    assert(r(1).getAs[Double]("boiler_frac") === 0.0)
  }

  test("lengthDrift computes the exact two-sample KS statistic") {
    val v1 = Seq(("en", 1L), ("en", 2L), ("en", 3L), ("en", 4L))
      .toDF("lang", "n_chars")
    val v2 = Seq(("en", 1L), ("en", 2L), ("en", 5L), ("en", 6L))
      .toDF("lang", "n_chars")
    val r = graft.functions.TextAnalytics.lengthDrift(v1, v2).collect()
    assert(r.length === 1)
    // F1(4)=1.0 vs F2(4)=0.5 -> D = 0.5; numerator 8 over 4*4
    // (ks_num SURFACES as BIGINT — r5; the internal grid stays DECIMAL)
    assert(r(0).getAs[Long]("n1") === 4L && r(0).getAs[Long]("n2") === 4L)
    assert(r(0).getAs[Long]("ks_num") === 8L)
    assert(r(0).getAs[Double]("ks_stat") === 0.5)
  }

  test("qualityProbe learns the clean-vs-degraded boundary per source") {
    // stopword-rich docs: the degraded twins (40 '#@' junk tokens) dilute
    // the stopword-rate feature, so the learned linear boundary must keep
    // the clean side and drop the degraded side. Exact-integer parity is
    // hash-checked by the oracle at sf; this pins the LEARNING behavior.
    val d = (1 to 12).map(i => (i.toLong,
      "the a of and to in the a of and to in word" + i, "en",
      if (i % 2 == 0) "s_even" else "s_odd")).toDF("doc_id", "text", "lang", "source")
    val r = graft.functions.TextAnalytics.qualityProbe(d)
      .orderBy($"source").collect()
    assert(r.length === 2)
    r.foreach { x =>
      assert(x.getAs[Long]("docs") === 6L)
      assert(x.getAs[Long]("kept_clean") === 6L,
        s"probe failed to keep clean docs of ${x.getAs[String]("source")}")
      assert(x.getAs[Long]("kept_degraded") === 0L,
        s"probe failed to drop degraded docs of ${x.getAs[String]("source")}")
      assert(x.getAs[Double]("clean_rate") === 1.0)
      assert(x.getAs[Double]("degraded_rate") === 0.0)
    }
  }

  test("bpeMerges learns merges in frequency order with greedy re-merge") {
    // vocab: abc x3, abd x2. Pairs round 1: (a,b)=5, (b,c)=3, (b,d)=2 ->
    // merge (a,b). Round 2: (ab,c)=3, (ab,d)=2 -> (ab,c). Round 3:
    // (ab,d)=2. Then every word is one symbol -> early stop at 3 merges.
    val d = Seq(
      (1L, "abc abc abd", "en", "s"),
      (2L, "abc abd", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val r = graft.functions.TextAnalytics.bpeMerges(d)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(r.toSeq === Seq((1L, "a", "b", 5L), (2L, "ab", "c", 3L),
      (3L, "ab", "d", 2L)))
  }

  test("bpeMerges greedy left-to-right: 'a a a a' merges two pairs, 'a a a' one") {
    // aaaa: round 1 (a,a)=freq-weighted count 3 (positions 1-2,2-3,3-4)
    // ... merged greedily left-to-right into (aa, aa); aaa -> (aa, a)
    val d = Seq((1L, "aaaa aaa", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val r = graft.functions.TextAnalytics.bpeMerges(d, nMerges = 2)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
    // round 1: (a,a) count 3+2 = 5; after merge: aaaa -> 'aa aa', aaa -> 'aa a'
    // round 2 pairs: (aa,aa)=1, (aa,a)=1 -> tie-break right ASC picks (aa,a)
    assert(r.toSeq === Seq((1L, "a", "a", 5L), (2L, "aa", "a", 1L)))
  }

  test("languageIdConfusion rolls up label vs prediction with shares") {
    val d = Seq(
      (1L, "the cat of and the", "en"),
      (2L, "der die und das x", "en"), // en-labeled, de-marked
      (3L, "le la et les y", "fr")
    ).toDF("doc_id", "text", "lang")
    val r = graft.functions.TextAnalytics.languageIdConfusion(d)
      .orderBy($"lang", $"predicted_lang").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq === Seq(
      ("en", "de", 1L, 0.5), ("en", "en", 1L, 0.5), ("fr", "fr", 1L, 1.0)))
  }

  test("repetitionStats counts bigram repeats and the top-bigram share") {
    val docs = Seq(
      (1L, "a b a b c"), // bigrams: "a b","b a","a b","b c" -> 4 total, 3 distinct, top 2
      (2L, "x y z")      // bigrams: "x y","y z" -> all unique
    ).toDF("doc_id", "text")
    val r = TextAnalytics.repetitionStats(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_bigrams") === 4L)
    assert(r(0).getAs[Long]("distinct_bigrams") === 3L)
    assert(r(0).getAs[Double]("dup_bigram_frac") === 0.25)
    assert(r(0).getAs[Double]("top_bigram_frac") === 0.5)
    assert(!r(0).getAs[Boolean]("passes_repetition")) // top share 0.5 > 0.1
    assert(r(1).getAs[Long]("n_bigrams") === 2L)
    assert(r(1).getAs[Double]("dup_bigram_frac") === 0.0)
  }

  test("tfidfTerms ranks rare-in-corpus, frequent-in-lang tokens first") {
    // "zz" appears 3x in en but only in one doc of 4 -> tfidf 3*4/1 = 12
    // "the" appears everywhere (df 4) -> tf*4/4 = tf
    val docs = Seq(
      (1L, "en", "the zz zz zz"),
      (2L, "en", "the cat"),
      (3L, "de", "the hund"),
      (4L, "de", "the hund")
    ).toDF("doc_id", "lang", "text")
    val top = TextAnalytics.tfidfTerms(docs, k = 1).orderBy("lang").collect()
    assert(top(0).getAs[String]("lang") === "de")
    assert(top(0).getAs[String]("token") === "hund")
    assert(top(0).getAs[Double]("tfidf") === 2.0 * 4 / 2)
    assert(top(1).getAs[String]("lang") === "en")
    assert(top(1).getAs[String]("token") === "zz")
    assert(top(1).getAs[Double]("tfidf") === 12.0)
  }

  test("contamination counts test-split n-grams that occur in train") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),   // train
      (2L, "a b c d e f g h x y"),   // test: shares the one 8-gram "a b c d e f g h" with train
      (3L, "p q r s t u v w x y z")  // test: disjoint
    ).toDF("doc_id", "text")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "test"))
      .toDF("doc_id", "split")
    val r = TextAnalytics.contaminationWith(docs, splits, n = 8)
      .orderBy("doc_id").collect()
    // doc 2: 3 distinct 8-grams, the first one contaminated
    assert(r(0).getAs[Long]("doc_id") === 2L)
    assert(r(0).getAs[Long]("n_ngrams") === 3L)
    assert(r(0).getAs[Long]("contaminated") === 1L)
    assert(r(0).getAs[Boolean]("flagged")) // 1/3 > 0.2
    // doc 3: 4 distinct 8-grams, none in train
    assert(r(1).getAs[Long]("contaminated") === 0L)
    assert(!r(1).getAs[Boolean]("flagged"))
  }

  test("contaminationAgainst counts benchmark n-grams found in the corpus") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z y x w v u t s r q")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a b c d e f g h x y"), // shares "a b c d e f g h"
      (200L, "p p p p p p p p")      // disjoint
    ).toDF("bench_id", "text")
    val r = TextAnalytics.contaminationAgainst(corpus, bench, n = 8)
      .orderBy("bench_id").collect()
    assert(r(0).getAs[Long]("n_ngrams") === 3L)
    assert(r(0).getAs[Long]("contaminated") === 1L)
    assert(r(0).getAs[Boolean]("flagged"))
    assert(r(1).getAs[Long]("contaminated") === 0L)
    assert(!r(1).getAs[Boolean]("flagged"))
  }

  test("chunkDedup flags exact repeated chunks across documents") {
    // chunkTokens = 2: doc1 = ["a b","c d"], doc2 = ["a b","x y"],
    // doc3 = ["q r"] -> "a b" occurs twice -> one dup chunk in each of 1,2
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "q r")).toDF("doc_id", "text")
    val r = TextAnalytics.chunkDedup(docs, chunkTokens = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_chunks") === 2L)
    assert(r(0).getAs[Long]("dup_chunks") === 1L)
    assert(r(0).getAs[Double]("dup_chunk_frac") === 0.5)
    assert(r(1).getAs[Long]("dup_chunks") === 1L)
    assert(r(2).getAs[Long]("dup_chunks") === 0L)
    // a partial trailing chunk still counts as one chunk
    val partial = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalytics.chunkDedup(partial, chunkTokens = 2)
      .collect()(0).getAs[Long]("n_chunks") === 2L) // ["a b", "c"]
  }

  test("qualitySourceFilter keeps docs at/above the per-source quantile") {
    // per source, p25 of quality; with 2 docs the interpolated p25 sits
    // between them -> exactly the better doc survives
    val docs = Seq(
      (1L, "the the the the", "s1", 10L),     // all stopwords -> low quality
      (2L, "alpha beta gamma delta", "s1", 20L), // no stopwords -> high
      (3L, "x y z w", "s2", 30L)).toDF("doc_id", "text", "source", "n_chars")
    val r = TextAnalytics.qualitySourceFilter(docs, q = 0.25)
      .orderBy("source").collect()
    assert(r(0).getAs[Long]("total_docs") === 2L)
    assert(r(0).getAs[Long]("kept_docs") === 1L)
    assert(r(0).getAs[Long]("kept_chars") === 20L)
    assert(r(1).getAs[Long]("kept_docs") === 1L) // single doc == threshold
  }

  test("embeddingDedupClusters labels connected cosine components") {
    import graft.functions.Similarity
    // v1 ~ v2 (same direction), v3 orthogonal -> one 2-cluster
    val emb = Seq(
      (1L, Array.fill(64)(1f)),
      (2L, Array.fill(64)(2f)),
      (3L, Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.embeddingDedupClusters(emb).orderBy("vec_id").collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 2L))
    assert(r.forall(_.getAs[Long]("cluster_id") === 1L))
    assert(r(0).getAs[Boolean]("keep") && !r(1).getAs[Boolean]("keep"))
  }

  test("curationFunnel reports cumulative per-stage survival") {
    // T1 high quality (duplicated: d1+d2 -> exact dedup keeps d1);
    // T2 high quality but marked a non-canonical near-dup member;
    // T3 all stopwords -> fails the quality gate.
    val t1 = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, t1, 10L), (2L, t1, 10L),
      (3L, "omega psi chi phi upsilon tau", 20L),
      (4L, "the the the the", 5L)).toDF("doc_id", "text", "n_chars")
    val clusters = Seq((3L, 3L, false)).toDF("doc_id", "cluster_id", "keep")
    val r = TextAnalytics.curationFunnel(docs, clusters)
      .orderBy("stage").collect()
    assert(r.map(_.getAs[String]("stage_name")).toSeq ===
      Seq("raw", "quality", "exact_dedup", "near_dedup", "train_split"))
    assert(r(0).getAs[Long]("docs") === 4L)
    assert(r(0).getAs[Long]("tokens") === 6L + 6L + 6L + 4L)
    assert(r(0).getAs[Long]("chars") === 45L)
    assert(r(1).getAs[Long]("docs") === 3L) // d4 fails quality
    assert(r(2).getAs[Long]("docs") === 2L) // d2 is an exact dup of d1
    assert(r(3).getAs[Long]("docs") === 1L) // d3 dropped by its cluster
    assert(r(3).getAs[Long]("chars") === 10L)
    // stage 4 depends on T1's content-hash split — derive it the same way
    val t1Train = docs.filter($"doc_id" === 1L)
      .select(TextAnalytics.splitCol(col("text")) === "train")
      .head().getBoolean(0)
    assert(r(4).getAs[Long]("docs") === (if (t1Train) 1L else 0L))
  }

  test("temperatureMixture flattens toward uniform with exact-grid weights") {
    // en has 4 tokens, de has 1: raw 0.8/0.2; sqrt weights 2:1 -> 2/3, 1/3
    val docs = Seq(
      (1L, "a b c d", "en", 7L),
      (2L, "x", "de", 1L)).toDF("doc_id", "text", "lang", "n_chars")
    val r = TextAnalytics.temperatureMixture(docs).orderBy("lang").collect()
    val de = r(0); val en = r(1)
    assert(en.getAs[Double]("raw_frac") === 0.8)
    assert(math.abs(en.getAs[Double]("alpha_weight") - 2.0 / 3) < 1e-12)
    assert(math.abs(de.getAs[Double]("alpha_weight") - 1.0 / 3) < 1e-12)
    // upsampling pulls the rare language up, the dominant one down
    assert(de.getAs[Double]("upsample") > 1.0 && en.getAs[Double]("upsample") < 1.0)
  }

  test("shardReport assigns by content fingerprint with exact balance math") {
    // polyhash("a") = 97 -> shard 1; polyhash("b") = 98 -> shard 2
    val docs = Seq(
      (1L, "a", "en", 1L), (2L, "b", "en", 1L), (3L, "a", "en", 1L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = TextAnalytics.shardReport(docs).orderBy("shard").collect()
    assert(r.map(x => (x.getAs[Long]("shard"), x.getAs[Long]("docs"))).toSeq ===
      Seq((1L, 2L), (2L, 1L)))
    // identical content always lands in the same shard; loads are
    // tokens * S / total from exact BIGINTs
    assert(r(0).getAs[Double]("relative_load") === 2.0 * 16 / 3)
    assert(r(1).getAs[Double]("relative_load") === 1.0 * 16 / 3)
  }

  test("order-free operators are bit-identical under any partitioning") {
    // the claims these operators make (exact integer/DECIMAL sums,
    // integer-grid quantization, sequential-fold dots) all reduce to:
    // the same rows come out whatever the partitioning is — proven here
    // by 1-partition vs 7-partition equality on collected values
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toIndexedSeq).sortBy(_.mkString("|")).toSeq
    assert(rows(TextAnalytics.temperatureMixture(docs.repartition(1))) ===
      rows(TextAnalytics.temperatureMixture(docs.repartition(7))))
    assert(rows(TextAnalytics.shardReport(docs.repartition(1))) ===
      rows(TextAnalytics.shardReport(docs.repartition(7))))
    assert(graft.functions.Pca.topDirection(emb.repartition(1)).toSeq ===
      graft.functions.Pca.topDirection(emb.repartition(7)).toSeq)
    assert(rows(graft.functions.Pca.projectionByLabel(emb.repartition(1))) ===
      rows(graft.functions.Pca.projectionByLabel(emb.repartition(7))))
  }

  test("power iteration finds the dominant direction") {
    import graft.functions.Pca
    // corpus dominated by +/- e0 (sign-mixed so it is not the mean),
    // plus small e1 noise -> the top singular direction is e0
    val emb = Seq(
      (1L, Array.tabulate(64)(i => if (i == 0) 10f else 0f)),
      (2L, Array.tabulate(64)(i => if (i == 0) -9f else if (i == 1) 1f else 0f)),
      (3L, Array.tabulate(64)(i => if (i == 0) 8f else if (i == 1) -1f else 0f)))
      .toDF("vec_id", "embedding")
    val v = Pca.topDirection(emb)
    assert(math.abs(math.abs(v(0)) - 1.0) < 0.02, s"v0=${v(0)}")
    assert(math.abs(v(1)) < 0.2)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
  }

  test("deflated components are near-orthogonal unit vectors") {
    import graft.functions.Pca
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val Seq(v1, v2) = Pca.topDirections(emb, nComponents = 2)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(v1) - 1.0) < 1e-9)
    assert(math.abs(norm(v2) - 1.0) < 1e-9)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    // exact orthogonality is only reached at convergence; 3 iterations
    // on random data gets within a few degrees
    assert(math.abs(dot) < 0.1, s"v1·v2 = $dot")
  }

  test("corpus-assembly invariants hold on the fixture corpus") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val total = docs.count()

    // funnel: cumulative stages can only shrink, raw == corpus
    val clusters = functions.Dedup.dedupClusters(
      functions.Dedup.jaccardPairs(docs, threshold = 0.3))
    val funnel = TextAnalytics.curationFunnel(docs, clusters)
      .orderBy("stage").collect()
    assert(funnel(0).getAs[Long]("docs") === total)
    Seq("docs", "tokens", "chars").foreach { m =>
      val v = funnel.map(_.getAs[Long](m)).toSeq
      assert(v === v.sorted.reverse, s"$m not non-increasing: $v")
    }

    // shards: a partition of the corpus — counts must close and each
    // shard's load is exactly tokens * S / total
    val shards = TextAnalytics.shardReport(docs).collect()
    assert(shards.map(_.getAs[Long]("docs")).sum === total)
    val totTokens = shards.map(_.getAs[Long]("tokens")).sum
    shards.foreach { r =>
      assert(r.getAs[Double]("relative_load") ===
        r.getAs[Long]("tokens").toDouble * 16 / totTokens)
    }

    // temperature mixture: both weight vectors are distributions, and
    // re-weighting flattens — the dominant language is down-sampled
    val mix = TextAnalytics.temperatureMixture(docs).collect()
    assert(math.abs(mix.map(_.getAs[Double]("raw_frac")).sum - 1.0) < 1e-9)
    assert(math.abs(mix.map(_.getAs[Double]("alpha_weight")).sum - 1.0) < 1e-9)
    val top = mix.maxBy(_.getAs[Long]("tokens"))
    assert(top.getAs[Double]("upsample") < 1.0)

    // eval sample: size-exact per language with contiguous ranks and
    // ascending draws
    val sample = TextAnalytics.evalSample(docs, perLang = 5).collect()
      .groupBy(_.getAs[String]("lang"))
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    sample.foreach { case (lang, rows) =>
      assert(rows.length === math.min(5L, perLang(lang)))
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq ===
        (1L to rows.length).toSeq)
      val us = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("u")).toSeq
      assert(us === us.sorted)
    }
  }

  test("tokenNgrams is empty below n tokens") {
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(TextAnalytics.tokenNgrams(split(col("text"), " "), 8).as("ng"))
      .collect()(0).getSeq[String](0)
    assert(one.isEmpty)
  }

  test("stratifiedSample: rate 1.0 keeps everything, draws are content-keyed") {
    val docs = Seq(
      (1L, "en", "alpha beta", 10L), (2L, "en", "gamma delta", 11L),
      (3L, "xx", "epsilon zeta", 12L)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val s = TextAnalytics.stratifiedSample(docs).orderBy("doc_id").collect()
    assert(s.filter(_.getAs[String]("lang") == "en").forall(_.getAs[Boolean]("kept")))
    assert(s(2).getAs[Double]("rate") === TextAnalytics.MixDefaultRate)
    assert(s.forall { r => val u = r.getAs[Double]("u"); u >= 0.0 && u < 1.0 })
    // same content, same draw — re-run produces identical u
    val again = TextAnalytics.stratifiedSample(docs).orderBy("doc_id").collect()
    assert(s.map(_.getAs[Double]("u")).toSeq === again.map(_.getAs[Double]("u")).toSeq)
  }

  test("scale plan shapes: contamination prefilters via fixed-size bloom, " +
       "no broadcast input grows with the corpus") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    // With size-based broadcast off, any BroadcastExchange left in the
    // plan would have to come from a forced hint — assert there is none:
    // the only corpus-sized structure shipped to the train scan is the
    // constant-size bloom literal (codegen'd might_contain probe).
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(thresholdKey)
    val contPlan = try {
      spark.conf.set(thresholdKey, "-1")
      TextAnalytics.contamination(docs).queryExecution.executedPlan.toString
    } finally spark.conf.set(thresholdKey, prior)
    assert(contPlan.contains("might_contain")) // bloom prefilter on train side
    assert(!contPlan.contains("BroadcastExchange"))
    // The filter itself is fixed-size regardless of input cardinality:
    // the whole corpus's n-grams still serialize to <= numBits/8 + header.
    val bfFull = graft.functions.BloomPrefilter.build(
      docs.select(explode(TextAnalytics.tokenNgrams(
        TextAnalytics.tokens(col("text")), 8)).as("ngram")), "ngram")
    assert(bfFull.get.length <= graft.functions.BloomPrefilter.DefaultNumBits / 8 + 64)
    val repPlan = TextAnalytics.repetitionStats(docs)
      .queryExecution.executedPlan.toString
    assert(repPlan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    val mixPlan = TextAnalytics.mixtureSummary(docs)
      .queryExecution.executedPlan.toString
    assert(!mixPlan.contains("Exchange hashpartitioning(lang")
      || mixPlan.contains("HashAggregate")) // partial+final agg, single shuffle
  }

  test("scale plan shapes: chunk dedup and funnel are hint-free and " +
       "single-aggregation") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(thresholdKey)
    val (chunkPlan, funnelPlan) = try {
      spark.conf.set(thresholdKey, "-1")
      val clusters = Seq((1L, 1L, true)).toDF("doc_id", "cluster_id", "keep")
      (TextAnalytics.chunkDedup(docs).queryExecution.executedPlan.toString,
        TextAnalytics.curationFunnel(docs, clusters)
          .queryExecution.executedPlan.toString)
    } finally spark.conf.set(thresholdKey, prior)
    // no forced broadcast anywhere: at scale the chunk-frequency join
    // degrades to a shuffle join co-partitioned on the chunk key, and
    // the funnel's cluster join to a shuffle join on doc_id
    assert(!chunkPlan.contains("BroadcastExchange"))
    assert(!funnelPlan.contains("BroadcastExchange"))
    // the funnel aggregates the corpus ONCE: a single HashAggregate
    // pair (partial+final) over the flagged stream feeds the stack
    // unpivot — not one scan per stage
    assert(funnelPlan.contains("Generate stack"))
    assert("FileScan parquet".r.findAllIn(funnelPlan).size === 1)
  }

  test("describeStatsApprox tracks the exact form (sketch quantiles)") {
    import graft.sources.Snapshots
    import graft.operators.TopicAnalytics
    val d = TestSpark.Sf0001
    val topics = TopicAnalytics.topicsDf(Snapshots.watermarks(spark, d),
      Snapshots.groupOffsets(spark, d), Snapshots.groupsDim(spark, d))
    val exact = TopicAnalytics.describeStats(topics).orderBy("column").collect()
    val approx = TopicAnalytics.describeStatsApprox(topics).orderBy("column").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(a.getAs[Long]("cnt") === e.getAs[Long]("cnt"))
      assert(a.getAs[Double]("mean") === e.getAs[Double]("mean")) // moments exact
      assert(a.getAs[Double]("std") === e.getAs[Double]("std"))
      Seq("q25", "q50", "q75").foreach { q =>
        val (ev, av) = (e.getAs[Double](q), a.getAs[Double](q))
        // sketch returns a realized value within the column's range, close
        // to the interpolated exact quantile at this tiny cardinality
        assert(av >= e.getAs[Double]("min_v") && av <= e.getAs[Double]("max_v"))
        assert(math.abs(av - ev) <= (e.getAs[Double]("max_v") * 0.25).max(1.0),
          s"$q: approx $av vs exact $ev")
      }
    }
  }

  test("embeddingStats: order-free stats over norms, exact percentile") {
    val emb = Seq(
      (1L, Array(3f, 4f), 0),  // norm 5
      (2L, Array(6f, 8f), 0),  // norm 10
      (3L, Array(0f, 2f), 1)   // norm 2
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.embeddingStats(emb).orderBy("label").collect()
    assert(r(0).getAs[Long]("n_vecs") === 2L)
    assert(r(0).getAs[Double]("min_norm") === 5.0)
    assert(r(0).getAs[Double]("max_norm") === 10.0)
    assert(r(0).getAs[Double]("median_norm") === 7.5) // linear interpolation
    assert(r(1).getAs[Double]("median_norm") === 2.0)
  }

  test("perplexityBuckets assigns CCNet head/middle/tail per language") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val rows = TextAnalytics.perplexityBuckets(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3)))
    // consistency with the underlying rarity scores
    val rarity = TextAnalytics.bigramRarity(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.length == rarity.size)
    rows.foreach { case (id, _, br, _) => assert(br == rarity(id)) }
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      // cuts are per-language: every head rarity <= every tail rarity
      // WITHIN the language, and the fractions bracket 30/40/30 (exact
      // percentile semantics put boundary ties in the lower bucket)
      val byB = rs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      assert(Set("head", "middle", "tail").subsetOf(byB.keySet),
        s"$lang missing a bucket: ${byB.keySet}")
      assert(byB("head").max <= byB("middle").min ||
        byB("head").max <= byB("middle").max)
      assert(byB("middle").max <= byB("tail").min)
      val n = rs.length.toDouble
      val headFrac = byB("head").length / n
      assert(headFrac >= 0.2 && headFrac <= 0.4,
        s"$lang head fraction $headFrac not ~30%")
      // the head of one language may be the tail of another in ABSOLUTE
      // rarity — the per-language cut is the CCNet point
    }
    // per-language, not global: at least one language's head max exceeds
    // another language's middle min (absolute thresholds would forbid it)
    val headMax = rows.filter(_._4 == "head").groupBy(_._2)
      .view.mapValues(_.map(_._3).max).toMap
    val midMin = rows.filter(_._4 == "middle").groupBy(_._2)
      .view.mapValues(_.map(_._3).min).toMap
    assert(headMax.exists { case (l, h) =>
      midMin.exists { case (l2, m) => l2 != l && h > m } },
      "cuts look global, not per-language")
  }
}
