package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.functions.{Dedup, Ivf, Similarity, Sketches, TextAnalytics}

/** Degenerate inputs: empty corpus, sub-shingle docs, pairless graphs.
  * Every operator must return an empty (or well-defined) result with the
  * right schema — not throw. At 100 TB a partition, source, or day WILL
  * be empty. */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))

  private def emptyEmb: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))

  test("text operators return empty results on an empty corpus") {
    assert(TextAnalytics.docStats(emptyDocs).count() === 0)
    assert(TextAnalytics.repetitionStats(emptyDocs).count() === 0)
    assert(TextAnalytics.tfidfTerms(emptyDocs).count() === 0)
    assert(TextAnalytics.contamination(emptyDocs).count() === 0)
    assert(TextAnalytics.mixtureSummary(emptyDocs).count() === 0)
    assert(TextAnalytics.topTokensPerLang(emptyDocs).count() === 0)
    assert(TextAnalytics.languageId(emptyDocs).count() === 0)
    // ridge probe on nothing: A = I (ridge only), det > 0, no division by
    // zero anywhere, empty per-source report — not a throw
    assert(TextAnalytics.qualityProbe(emptyDocs).count() === 0)
  }

  test("sketch operators handle empty and sub-shingle corpora") {
    assert(Sketches.minHashPairs(emptyDocs).count() === 0)
    assert(Sketches.simHashPairs(emptyDocs).count() === 0)
    // docs shorter than one shingle: no signature, no pairs, no throw
    val short = Seq((1L, "abc"), (2L, "abc")).toDF("doc_id", "text")
    assert(Sketches.minHashSignatures(short).count() === 0)
    assert(Sketches.minHashPairs(short).count() === 0)
    // one doc above, one below the shingle width: no self-pairing
    val mixed = Seq((1L, "abc"), (2L, "abcdefghij")).toDF("doc_id", "text")
    assert(Sketches.minHashSignatures(mixed).count() === 1)
    assert(Sketches.minHashPairs(mixed).count() === 0)
  }

  test("round-10 families handle empty and degenerate inputs") {
    import org.apache.spark.sql.functions._
    import graft.functions.WebCuration
    import graft.streaming.AdmissionStream
    // URL curation on an empty corpus: empty verdicts + empty rollup
    val eu = WebCuration.withSyntheticUrls(emptyDocs)
    assert(WebCuration.urlDedup(eu).count() === 0)
    assert(WebCuration.domainRollup(eu).count() === 0)
    // fertility with an EMPTY merge list: every word encodes to its
    // character count (no merges applied), ratios still well-defined
    val two = Seq((1L, "ab cd", "en", "s1"), (2L, "ab", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val fert = TextAnalytics.bpeFertility(two, Seq.empty).collect()
    assert(fert.length === 2 && fert.forall(_.getDouble(5) > 0))
    assert(TextAnalytics.bpeFertility(emptyDocs, Seq.empty).count() === 0)
    // soft-dedup weights with an empty cluster assignment: every doc is
    // its own cluster at weight 1.0
    val emptyClusters = Dedup.dedupClusters(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType)))))
    val w = Dedup.softDedupWeights(two, emptyClusters).collect()
    assert(w.length === 2 &&
      w.forall(r => r.getLong(2) == 1L && r.getDouble(3) == 1.0 &&
        r.getLong(1) == r.getLong(0)))
    // admission gate with an EMPTY crawl and with an empty index: no
    // throw, and with no index every doc is admitted
    val docsDf = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val corpus = docsDf.filter(col("doc_id") <= 10)
    val ex = graft.operators.IncrementalDedup.exactIndex(corpus)
    val sigs = graft.operators.IncrementalDedup.sigIndex(corpus)
    val probe = AdmissionStream.probeTable(
      graft.operators.IncrementalDedup.bandRows(sigs), sigs)
    assert(AdmissionStream.gateBatch(emptyDocs, ex, probe).count() === 0)
    val noIdx = AdmissionStream.gateBatch(two,
      ex.limit(0), probe.limit(0)).collect()
    assert(noIdx.length === 2 && noIdx.forall(_.getString(2) == "admitted"))
  }

  test("dedup clustering of an empty pair set labels nothing") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dedupClusters(emptyPairs).count() === 0)
    // and the deduped corpus is then the corpus itself
    val docs = Seq((1L, "a", "en", "s", 1L), (2L, "b", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Dedup.dropClusterDuplicates(docs, Dedup.dedupClusters(emptyPairs))
      .count() === 2)
  }

  test("similarity operators return empty results on an empty embedding table") {
    assert(Similarity.knnExact(emptyEmb).count() === 0)
    assert(Similarity.knnLsh(emptyEmb).count() === 0)
    assert(Similarity.cosineNearDups(emptyEmb).count() === 0)
    assert(Similarity.embeddingStats(emptyEmb).count() === 0)
    assert(Similarity.quantizationReport(emptyEmb).count() === 0)
  }

  test("IVF training survives an empty table and a sub-k table") {
    // empty: no seeds, no centroids -> empty result, no throw
    assert(Ivf.knnIvf(emptyEmb).count() === 0)
    // fewer vectors than centroids: seeds = what exists
    val tiny = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0), (2L, Array(1f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = Ivf.knnIvf(tiny, k = 2, nQueries = 1, nCentroids = 16, nprobe = 4)
    assert(r.count() >= 1) // neighbors of query 0 among probed lists
  }

  test("as-of and range joins handle empty sides") {
    import graft.operators.{AsofJoin, RangeJoin}
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "lv")
    val emptyRight = Seq.empty[(Long, Long, String)].toDF("k", "t", "rv")
    // empty right: every left row survives with a null payload
    val out = AsofJoin.asofJoin(left, emptyRight, Seq("k"), "t", Seq("rv")).collect()
    assert(out.length === 1 && out.head.isNullAt(3))
    // empty left: no rows, no throw
    val emptyLeft = Seq.empty[(Long, Long, String)].toDF("k", "t", "lv")
    assert(AsofJoin.asofJoin(emptyLeft, emptyRight.withColumnRenamed("rv", "rv"),
      Seq("k"), "t", Seq("rv")).count() === 0)

    val points = Seq((5L, 1L)).toDF("pt", "v")
    val emptyIv = Seq.empty[(Long, Long, Long)].toDF("id", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, emptyIv, 8L).count() === 0)
    val iv = Seq((1L, 0L, 10L)).toDF("id", "lo", "hi")
    val emptyPts = Seq.empty[(Long, Long)].toDF("pt", "v")
    assert(RangeJoin.pointInInterval(emptyPts, iv, 8L).count() === 0)
  }

  test("sketch and quantile reports handle the empty corpus") {
    import graft.functions.CountSketch
    assert(CountSketch.cmsHeavyHitters(emptyDocs).count() === 0)
    assert(CountSketch.distinctSketch(emptyDocs).count() === 0)
    assert(CountSketch.hllDistinct(emptyDocs).count() === 0)
    assert(TextAnalytics.bigramRarity(emptyDocs).count() === 0)
    assert(TextAnalytics.histogramQuantile(emptyDocs).count() === 0)
    assert(TextAnalytics.qualityDeciles(emptyDocs).count() === 0)
    assert(TextAnalytics.dupNgramCoverage(emptyDocs).count() === 0)
    assert(Dedup.containmentPairs(emptyDocs).count() === 0)
  }

  test("sampling, linkage, PQ, and event matrices handle empty inputs") {
    import graft.operators.{Linkage, Relational, Sampling}
    import graft.functions.Pq
    assert(Sampling.stratifiedSample(emptyDocs).count() === 0)
    assert(Sampling.bootstrapCi(emptyDocs).count() === 0)
    val emptyEnts = Seq.empty[(Long, String, Int)].toDF("id", "name", "nation")
    assert(Linkage.editDistancePairs(emptyEnts, "id", "name", "nation").count() === 0)
    // names shorter than the key span: substring clamps, no throw
    val shortNames = Seq((1L, "ab", 0), (2L, "ab", 1)).toDF("id", "name", "nation")
    Linkage.editDistancePairs(shortNames, "id", "name", "nation").count()
    // empty embeddings: empty codebook -> empty result with the right schema
    assert(Pq.trainCodebook(emptyEmb).isEmpty)
    assert(Pq.knnPq(emptyEmb).count() === 0)
    // nonempty codebook, empty corpus: no queries -> empty, no throw
    val cb = Seq((0, Array.fill(8)(0.5)))
    assert(Pq.knnPqWith(emptyEmb, cb).count() === 0)
    val emptyEv = Seq.empty[(Long, Long, String, Long)]
      .toDF("event_id", "user_id", "event_type", "epoch_s")
    assert(Relational.retentionCohorts(emptyEv).count() === 0)
    assert(Relational.eventTransitions(emptyEv).count() === 0)
  }
}
