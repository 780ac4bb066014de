package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Sketches, Similarity}

/** Recall/accuracy tests for the sketch-based near-dup and ANN operators
  * against their exact counterparts on sf0.001. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
  private def emb  = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")

  test("minhash LSH recovers the high-jaccard pairs") {
    val exact = Dedup.jaccardPairs(docs, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val lsh = Sketches.minHashPairs(docs, threshold = 0.35)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall $recall < 0.8 (${exact.size} true pairs)")
  }

  test("minhash est_jaccard approximates true jaccard") {
    val exact = Dedup.jaccardPairs(docs, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    val est = Sketches.minHashPairs(docs, threshold = 0.2)
      .select($"doc_a", $"doc_b", $"est_jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    val common = exact.keySet.intersect(est.keySet)
    assert(common.nonEmpty)
    val maxErr = common.map(k => math.abs(exact(k) - est(k))).max
    assert(maxErr <= 0.35, s"worst |est - true| = $maxErr") // 64 perms => se ~ 1/8
  }

  test("row-local kernels equal the compositional explode+aggregate forms") {
    val sample = docs.limit(50).cache()
    // MinHashSig vs: distinct shingles -> polyhash -> min per permutation
    val viaKernel = Sketches.minHashSignatures(sample)
      .as[(Long, Seq[Long])].collect().toMap
    val hashes = Dedup.charShingles(sample)
      .select($"doc_id", graft.expressions.PolyHash.polyhash($"shingle").as("h"))
      .as[(Long, Long)].collect().groupBy(_._1)
    viaKernel.foreach { case (id, sig) =>
      val hs = hashes(id).map(_._2)
      val expected = (0 until Sketches.NumHashes).map(i => hs.map(Sketches.univ(_, i)).min)
      assert(sig === expected, s"minhash signature mismatch for doc $id")
    }
    // SimHashSig vs: explode tokens -> tokenHash -> majority vote
    val kernelSh = Sketches.simHashes(sample).as[(Long, Long)].collect().toMap
    val tokenHashes = sample
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .select($"doc_id", Sketches.tokenHash($"token").as("h"))
      .as[(Long, Long)].collect().groupBy(_._1)
    // independent driver-side re-derivation of the XOR-rotate mixing
    // (the %/*/+ form, NOT the kernel's shift-mask form)
    def rot60(x: Long, r: Int): Long =
      (x % (1L << (60 - r))) * (1L << r) + x / (1L << (60 - r))
    def mix(ch: Long): Long = {
      val m1 = ch ^ rot60(ch, 23) ^ rot60(ch, 41)
      m1 ^ rot60(m1, 13) ^ rot60(m1, 29)
    }
    kernelSh.foreach { case (id, fp) =>
      val hs = tokenHashes(id).map(t => mix(t._2))
      val expected = (0 until 64).map { i =>
        val votes = hs.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << i else 0L
      }.sum
      assert(fp === expected, s"simhash fingerprint mismatch for doc $id")
    }
    sample.unpersist()
  }

  test("WinnowSig kernel equals the compositional HOF form") {
    val sample = docs.limit(50)
    // the HOF pair is the readable reference; the kernel is the O(len)
    // production path (CollapseProject makes the fused HOF O(len^2))
    val viaHof = sample
      .select($"doc_id", Dedup.shingleHashes($"text").as("hs"))
      // hide hs behind a shuffle boundary so CollapseProject cannot
      // inline it into the winnow lambda (correct but O(len^2))
      .repartition(2).localCheckpoint()
      .select($"doc_id", Dedup.winnowMinima($"hs", 8).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaKernel = Dedup.winnowFingerprints(sample)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaKernel.keySet === viaHof.keySet)
    viaKernel.foreach { case (id, fps) =>
      assert(fps.toSet === viaHof(id).toSet, s"fingerprint mismatch for doc $id")
    }
    // guarantee: any shared substring of length >= w + k - 1 (= 12)
    // shares a fingerprint — two docs sharing a 40-char passage overlap
    val passage = "zq zq common stolen passage zq zq xx yy"
    val d = Seq((1L, s"aaa bbb $passage ccc"), (2L, s"ddd eee fff $passage ggg"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(d).as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
  }

  test("NgramHashes kernel equals hash-of-joined-token-slices") {
    import graft.functions.TextAnalytics
    val sample = docs.limit(50)
    val viaStrings = sample
      .select($"doc_id", explode(array_distinct(
        TextAnalytics.tokenNgrams(TextAnalytics.tokens($"text"), 5))).as("ngram"))
      .select($"doc_id", Sketches.tokenHash($"ngram").as("ngh"))
      .groupBy($"doc_id").agg(collect_set($"ngh").as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaKernel = sample
      .select($"doc_id",
        graft.expressions.NgramHashes.ngram_hashes($"text", 5).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaKernel.keySet === viaStrings.keySet.union(viaKernel.keySet))
    viaKernel.foreach { case (id, hs) =>
      assert(hs.toSet === viaStrings.getOrElse(id, Seq.empty).toSet,
        s"ngram hash set mismatch for doc $id")
    }
    // boundary semantics match split(): consecutive spaces make empty
    // tokens, and short docs yield no n-grams at all
    val edge = Seq((1L, "a  b c d e f"), (2L, "only four tokens here"), (3L, ""))
      .toDF("doc_id", "text")
    val viaK = edge.select($"doc_id",
        graft.expressions.NgramHashes.ngram_hashes($"text", 5).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaS = edge
      .select($"doc_id", array_distinct(transform(
        TextAnalytics.tokenNgrams(TextAnalytics.tokens($"text"), 5),
        s => Sketches.tokenHash(s))).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    viaK.foreach { case (id, hs) => assert(hs.toSet === viaS(id).toSet) }
    assert(viaK(2L).isEmpty && viaK(3L).isEmpty)
  }

  test("simhash of identical token multisets is identical") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val sh = Sketches.simHashes(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L) !== sh(3L))
  }

  test("simhash banding recall is 1.0 within the guaranteed hamming radius") {
    // Brute-force oracle: ALL pairs with hamming <= maxHamming over the
    // real doc fingerprints, compared against the banded path.
    for (maxHamming <- Seq(3, 10)) {
      val sh = Sketches.simHashes(docs)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val truth = (for {
        (ia, fa) <- sh; (ib, fb) <- sh
        if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= maxHamming
      } yield (ia, ib)).toSet
      val banded = Sketches.simHashPairs(docs, maxHamming)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(banded === truth,
        s"maxHamming=$maxHamming: banded ${banded.size} != brute-force ${truth.size}")
      assert(truth.nonEmpty || maxHamming < 10, s"radius-10 truth set empty on fixture")
    }
  }

  test("simhash length routing: sub-floor docs skip banding, floor is inclusive") {
    // 1/2: 30-token near-dup pair (one token edited) — stays banded.
    // 3/4: identical 5-token docs — a pair WITHOUT routing, excluded
    //      WITH it (short docs route to the exact/minhash families).
    // 5:   exactly SimHashMinTokens tokens — the >= floor keeps it.
    val longText = (1 to 30).map(i => s"tok$i").mkString(" ")
    // a one-token edit can flip more than 4 near-tied majority bits, so
    // search the 30 single-token edits for one inside the radius (the
    // kernel is deterministic: whatever the grid finds is pinned forever)
    def fp(s: String): Long =
      graft.expressions.SimHashSig.compute(s.getBytes("UTF-8"))
    val longEdit = (1 to 30)
      .map(i => longText.replaceFirst(s"\\btok$i\\b", s"zz$i"))
      .find(c => java.lang.Long.bitCount(fp(c) ^ fp(longText)) <= 4)
      .getOrElse(fail("no single-token edit within radius 4 — rebuild fixture"))
    val shortText = "just five little tokens here"
    val boundary = (1 to Sketches.SimHashMinTokens).map(i => s"b$i").mkString(" ")
    val d = Seq((1L, longText), (2L, longEdit), (3L, shortText),
      (4L, shortText), (5L, boundary)).toDF("doc_id", "text")
    val unrouted = Sketches.simHashPairs(d, maxHamming = 4)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(unrouted.contains((3L, 4L)), "identical short docs pair unrouted")
    assert(unrouted.contains((1L, 2L)))
    val routed = Sketches.simHashPairs(d, maxHamming = 4,
        minTokens = Sketches.SimHashMinTokens)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(routed.contains((1L, 2L)), "long near-dups survive routing")
    assert(!routed.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      "sub-floor docs must not reach the band join")
    // the boundary doc IS banded: it pairs with nothing here, but its
    // fingerprint must be in the routed set — prove via the band side
    val bandedIds = Sketches.simHashes(d.filter(length($"text")
        - length(translate($"text", " ", "")) + 1 >= Sketches.SimHashMinTokens))
      .select($"doc_id").as[Long].collect().toSet
    assert(bandedIds === Set(1L, 2L, 5L))
  }

  test("knnLsh recall against knnExact") {
    val exact = Similarity.knnExact(emb, nQueries = 10, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.knnLsh(emb, nQueries = 10, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    // random 64-dim vectors are the worst case for LSH; require a floor
    // well above chance (10/500 = 2%)
    assert(recall >= 0.25, s"ANN recall $recall < 0.25")
  }

  test("knnLshMultiProbe recall dominates single-probe at the same L") {
    val exact = Similarity.knnExact(emb, nQueries = 10, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val single = Similarity.knnLsh(emb, nQueries = 10, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val multi = Similarity.knnLshMultiProbe(emb, nQueries = 10, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val rSingle = exact.count(single.contains).toDouble / exact.size
    val rMulti = exact.count(multi.contains).toDouble / exact.size
    // probing the Hamming-1 buckets can only ADD candidates, so the
    // candidate set is a superset and recall cannot drop
    assert(rMulti >= rSingle, s"multi-probe $rMulti < single-probe $rSingle")
    assert(rMulti >= 0.5, s"multi-probe recall $rMulti < 0.5")
    info(f"recall single=$rSingle%.2f multi=$rMulti%.2f")
  }

  test("knnIvf recall against knnExact") {
    val exact = Similarity.knnExact(emb, nQueries = 10, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = graft.functions.Ivf.knnIvf(emb, k = 10, nQueries = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.25, s"IVF recall $recall < 0.25")
  }

  test("native quantization report is bit-identical to the HOF form") {
    val native = Similarity.quantizationReport(emb)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val hof = Similarity.quantizationReportHof(emb)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(native.length === hof.length && native.nonEmpty)
    native.zip(hof).foreach { case ((id1, s1, e1), (id2, s2, e2)) =>
      assert(id1 === id2)
      assert(java.lang.Double.doubleToLongBits(s1) === java.lang.Double.doubleToLongBits(s2),
        s"scale mismatch for vec $id1")
      assert(java.lang.Double.doubleToLongBits(e1) === java.lang.Double.doubleToLongBits(e2),
        s"max_abs_err mismatch for vec $id1")
    }
  }

  test("dedup clustering finds connected components and keeps one representative") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val clusters = Dedup.dedupClusters(pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(clusters === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("dedupedCorpus drops near-dup cluster members, keeps everything else") {
    import spark.implicits._
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.5)
    val kept = Dedup.dedupedCorpus(docs, pairs)
    val dropped = docs.count() - kept.count()
    val clusters = Dedup.dedupClusters(pairs)
    assert(dropped === clusters.filter(!$"keep").count())
    assert(dropped > 0, "fixture has planted near-dups, some must drop")
  }

  test("exact dedup groups: one group per distinct content") {
    val d = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(d, $"text", $"doc_id")
      .orderBy($"keep_id").collect()
    assert(g.length === 2)
    assert(g(0).getAs[Long]("keep_id") === 1L && g(0).getAs[Long]("dup_count") === 2L)
  }

  test("sourceSimilarity: identical sources at 1.0, disjoint near 0") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "sA"),
      (2L, "pack my box with five dozen liquor jugs again", "sA"),
      (3L, "the quick brown fox jumps over the lazy dog today", "sB"),
      (4L, "pack my box with five dozen liquor jugs again", "sB"),
      (5L, "zq wv yx uo pr mt kn jl hg fd", "sC")
    ).toDF("doc_id", "text", "source")
    val r = Sketches.sourceSimilarity(d)
      .orderBy($"source_a", $"source_b").collect()
    assert(r.length === 3) // AB, AC, BC
    val ab = r.find(x => x.getString(0) == "sA" && x.getString(1) == "sB").get
    // identical shingle sets -> identical union signatures -> est 1.0
    assert(ab.getAs[Double]("est_jaccard") === 1.0)
    assert(ab.getAs[Long]("docs_a") === 2L && ab.getAs[Long]("docs_b") === 2L)
    val ac = r.find(x => x.getString(0) == "sA" && x.getString(1) == "sC").get
    assert(ac.getAs[Double]("est_jaccard") < 0.2)
  }
}
