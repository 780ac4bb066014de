package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics

/** Contracts for BM25 top-k retrieval (cross-engine value parity is the
  * oracle gate; these pin the kernel semantics):
  *  - output geometry: k contiguous ranks per query, scores
  *    non-increasing along the rank order, positive (rational RSJ idf
  *    never goes negative),
  *  - the grid score is BITWISE reproducible driver-side from raw
  *    texts — query-term selection (first-occurrence distinct), df/tf,
  *    the length-normalized term fold, the 2^-24 floor-sum,
  *  - query-term selection ignores later duplicate occurrences (the
  *    min(pos) contract the oracle mirrors).
  *
  * The fixture corpus has a small, near-uniform vocabulary (every token
  * in ~77% of docs), so relevance-shaped assertions like self-retrieval
  * are unattainable by construction — geometry and bitwise parity are
  * the testable surface.
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private val K1 = 1.2
  private val B = 0.75

  test("geometry: contiguous ranks, non-increasing positive scores") {
    val out = TextAnalytics.bm25TopK(docs).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length),
        s"query $q ranks not contiguous")
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores not non-increasing")
      assert(scores.forall(_ > 0.0), s"query $q non-positive score")
    }
  }

  test("grid scores are bitwise reproducible driver-side from raw text") {
    val out = TextAnalytics.bm25TopK(docs).collect()
    assert(out.nonEmpty)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    // query terms: first qTerms distinct tokens in first-occurrence order
    def qTermsOf(qid: Long): Seq[String] =
      texts(qid).distinct.take(6)
    val nDocs = texts.size.toLong
    val totalLen = texts.values.map(_.length.toLong).sum
    val avgdl = totalLen.toDouble / nDocs.toDouble
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val terms = qTermsOf(q)
      // df per query term over the whole corpus
      val dfOf = terms.map(t => t -> texts.values.count(_.contains(t)).toLong).toMap
      rs.foreach { r =>
        val d = r.getLong(1); val got = r.getDouble(3)
        val dl = texts(d).length.toLong
        val sg = terms.map { t =>
          val tf = texts(d).count(_ == t).toLong
          if (tf == 0L) 0L
          else {
            val df = dfOf(t)
            val idf = (nDocs.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
            math.floor(idf * (tf.toDouble * (K1 + 1.0))
              / (tf.toDouble + K1 * ((1.0 - B) + B * dl.toDouble / avgdl))
              * TextAnalytics.Bm25Grid.toDouble).toLong
          }
        }.sum
        val want = sg.toDouble / TextAnalytics.Bm25Grid.toDouble
        assert(got == want, s"query $q doc $d: got $got want $want")
      }
    }
  }

  test("empty query slice -> empty result with the output schema") {
    import spark.implicits._
    val toy = Seq((10L, "a b c")).toDF("doc_id", "text") // no doc_id < nQueries
    val out = TextAnalytics.bm25TopK(toy, nQueries = 5)
    assert(out.columns.toSeq == Seq("query_id", "doc_id", "rank", "score"))
    assert(out.count() == 0)
  }

  test("rrfFuse: equal fused scores tie-break on doc_id") {
    import spark.implicits._
    // two docs each appearing in exactly one arm at the same rank ->
    // identical scores; the window must order them by doc_id
    val lex = Seq((0L, 200L, 1L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((0L, 100L, 1L)).toDF("query_id", "neighbor_id", "rank")
    val rows = graft.functions.Similarity.rrfFuse(lex, vec).collect()
      .sortBy(_.getLong(2))
    assert(rows.map(_.getDouble(3)).distinct.length == 1, "scores tie")
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((100L, 1L), (200L, 2L)))
  }

  test("rrfFuse: exact fused scores, outer-union queries, rank contract") {
    import spark.implicits._
    val lex = Seq((0L, 100L, 1L), (0L, 101L, 2L), (7L, 300L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((0L, 101L, 1L), (0L, 102L, 2L), (9L, 400L, 1L))
      .toDF("query_id", "neighbor_id", "rank")
    val out = graft.functions.Similarity.rrfFuse(lex, vec).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3),
          Option(r.get(r.fieldIndex("rank_lex"))),
          Option(r.get(r.fieldIndex("rank_vec"))))).toMap
    // doc in BOTH lists: 1/(60+2) + 1/(60+1), fixed lex-then-vec order
    val both = out((0L, 101L))
    assert(both._2 == 1.0 / 62.0 + 1.0 / 61.0)
    assert(both._1 == 1L, "dual-arm doc must outrank single-arm docs")
    // single-arm docs keep one contribution and a NULL other-arm rank
    assert(out((0L, 100L))._2 == 1.0 / 61.0 + 0.0)
    assert(out((0L, 100L))._4.isEmpty)
    assert(out((9L, 400L))._3.isEmpty, "vector-only query has NULL rank_lex")
    // queries fuse over the UNION of both arms' query slices
    assert(out.keySet.map(_._1) == Set(0L, 7L, 9L))
    // per-query ranks contiguous from 1
    out.groupBy(_._1._1).foreach { case (q, rs) =>
      assert(rs.values.map(_._1).toSeq.sorted == (1L to rs.size), s"query $q")
    }
  }

  test("parameterized NON-PREFIX query slice: bitwise scores, exact query set") {
    // the r8 verdict item 3 contract: the query set is an argument —
    // same operator against doc_id % 17 == 3 (non-prefix, fixed-size)
    val slice = docs.filter(col("doc_id") % 17 === 3 && col("doc_id") < 200)
      .select(col("doc_id").as("query_id"), col("text"))
    val out = TextAnalytics.bm25TopKFor(docs, slice).collect()
    assert(out.nonEmpty)
    val wantQids = docs.filter(col("doc_id") % 17 === 3 && col("doc_id") < 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == wantQids,
      "result queries must be exactly the supplied slice")
    assert(!wantQids.forall(_ < 5), "slice must actually be non-prefix")
    // bitwise driver-side reproduction, same kernel as the default-slice
    // test but over the parameterized query ids
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val nDocs = texts.size.toLong
    val avgdl = texts.values.map(_.length.toLong).sum.toDouble / nDocs.toDouble
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val terms = texts(q).distinct.take(6)
      val dfOf = terms.map(t => t -> texts.values.count(_.contains(t)).toLong).toMap
      rs.foreach { r =>
        val d = r.getLong(1); val got = r.getDouble(3)
        val dl = texts(d).length.toLong
        val sg = terms.map { t =>
          val tf = texts(d).count(_ == t).toLong
          if (tf == 0L) 0L
          else {
            val idf = (nDocs.toDouble - dfOf(t).toDouble + 0.5) / (dfOf(t).toDouble + 0.5)
            math.floor(idf * (tf.toDouble * (K1 + 1.0))
              / (tf.toDouble + K1 * ((1.0 - B) + B * dl.toDouble / avgdl))
              * TextAnalytics.Bm25Grid.toLong).toLong
          }
        }.sum
        assert(got == sg.toDouble / TextAnalytics.Bm25Grid.toDouble,
          s"query $q doc $d mismatch")
      }
    }
  }

  test("parameterized ANN arms keep identical-id corpus vectors") {
    // r9 ADVICE: self-exclusion is the CORPUS-SLICE wrappers' contract
    // (their query ids ARE corpus vec_ids); the parameterized For APIs
    // must NOT drop a corpus vector whose vec_id coincides with a
    // query_id. So a slice-instantiated For call returns the query
    // itself at rank 1 (cosine 1.0), and the remaining ranking equals
    // the slice wrapper's exactly.
    import graft.functions.Similarity
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val slice = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._3)).toSeq
    // knnLshFor buckets the query table independently of the corpus
    // index — same hyperplanes, so the slice instantiation lands on
    // identical buckets: same candidates plus the self match
    val cases = Seq(
      ("exact", Similarity.knnExactFor(emb, slice, k = 11),
        Similarity.knnExact(emb)),
      ("lsh", Similarity.knnLshFor(emb, slice, k = 11),
        Similarity.knnLsh(emb)),
      ("mp", Similarity.knnLshMultiProbeFor(emb, slice, k = 11),
        Similarity.knnLshMultiProbe(emb)))
    for ((label, forV, sliceV) <- cases) {
      val rows = forV.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
      for (q <- 0L until 10L) {
        val r1 = rows.find(t => t._1 == q && t._3 == 1L).get
        assert(r1._2 == q && r1._4 == 1.0,
          s"$label: query $q's identical-id corpus vector is not rank 1")
      }
      val nonSelf = rows.filter(t => t._1 != t._2)
        .map(t => (t._1, t._2, t._3 - 1, t._4)).sortBy(t => (t._1, t._3)).toSeq
      assert(nonSelf == canon(sliceV),
        s"$label: non-self ranking diverges from the slice wrapper")
    }
  }

  test("parameterized ANN arm on a NON-PREFIX slice matches brute force") {
    import graft.functions.Similarity
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val qs = emb.filter(col("vec_id") % 37 === 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = Similarity.knnExactFor(emb, qs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // driver-side brute force over the collected corpus
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val qids = qs.select("query_id").collect().map(_.getLong(0))
    qids.foreach { q =>
      val qv = vecs.find(_._1 == q).get._2
      // no id-based self-exclusion in the For API (r9 ADVICE): the
      // brute-force truth keeps the identical-id corpus vector too
      val want = vecs
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
      val gotQ = (1 to 5).map(r => got((q, r.toLong)))
      assert(gotQ == want, s"query $q neighbors diverge from brute force")
    }
  }

  test("query terms are first-occurrence distinct (duplicates ignored)") {
    import spark.implicits._
    val toy = Seq(
      (0L, "b b a c a d e f g h"), // distinct order: b a c d e f g h
      (1L, "zzz yyy"),
      (2L, "b a q r s t u v")
    ).toDF("doc_id", "text")
    val out = TextAnalytics.bm25TopK(toy, k = 3, nQueries = 1, qTerms = 6)
    // query 0's terms are b,a,c,d,e,f — doc 2 shares exactly b,a of them;
    // doc 1 shares none and must be absent from the result entirely
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).distinct.toSeq == Seq(0L))
    assert(!rows.map(_.getLong(1)).contains(1L), "no-term-overlap doc must not score")
    assert(rows.map(_.getLong(1)).toSet.contains(2L))
  }
}
