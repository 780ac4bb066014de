package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The (session, dir) memo lifecycle (r8 verdict item 2): every
  * persist()-backed shared derivation must be released by
  * SparkEntry.invalidate — a long-lived service looping over snapshot
  * dirs must not accumulate dead cached blocks — and a re-query after
  * invalidate must rebuild the same result. */
class CacheLifecycleSpec extends AnyFunSuite {
  // an ISOLATED session (newSession shares the context but not the
  // session-keyed memos), so concurrently running suites that use the
  // shared TestSpark session never see their caches dropped mid-test
  private lazy val s = {
    val ns = TestSpark.spark.newSession()
    TestSpark.spark.conf.getAll.foreach { case (k, v) =>
      if (ns.conf.isModifiable(k)) ns.conf.set(k, v)
    }
    ns
  }
  private val dir = TestSpark.Sf0001

  test("invalidate unpersists every memoized frame and drops the keys") {
    // touch several memo families: snapshot tables + topics analytic
    // table (q_topics_stats), text pair set (q_jaccard_pairs), embedding
    // pair set (q_cosine_neardups), incremental index + admissions
    // (q_incremental_dedup), bm25 (q_bm25_topk)
    val before = Map(
      "q_topics_stats" -> SparkEntry.queries("q_topics_stats")(s, dir).collect().toSeq,
      "q_jaccard_pairs" -> SparkEntry.queries("q_jaccard_pairs")(s, dir).collect().toSeq,
      "q_cosine_neardups" -> SparkEntry.queries("q_cosine_neardups")(s, dir).collect().toSeq,
      "q_incremental_dedup" -> SparkEntry.queries("q_incremental_dedup")(s, dir).collect().toSeq,
      "q_bm25_topk" -> SparkEntry.queries("q_bm25_topk")(s, dir).collect().toSeq,
      // the dup-span run/excision memos + the boilerplate strip memo
      // (r11 verdict item 1 / r12): the shared-derivation frames the
      // apply-half queries read
      "q_dup_spans" -> SparkEntry.queries("q_dup_spans")(s, dir).collect().toSeq,
      "q_dup_excision" -> SparkEntry.queries("q_dup_excision")(s, dir).collect().toSeq,
      "q_boilerplate_strip" -> SparkEntry.queries("q_boilerplate_strip")(s, dir).collect().toSeq)
    val frames = SparkEntry.cachedFrames(s, dir)
    assert(frames.size >= 11, s"expected the memo families to be populated, got ${frames.size}")
    // all persisted right now (storageLevel reads the cacheManager)
    frames.foreach(f => assert(f.storageLevel != StorageLevel.NONE))

    SparkEntry.invalidate(s, dir)

    // storage-level release: no frame stays registered in the cache
    frames.foreach(f => assert(f.storageLevel == StorageLevel.NONE,
      "a memoized frame survived invalidate with a live storage level"))
    // keys dropped: the accessor sees an empty memo set for (s, dir)
    assert(SparkEntry.cachedFrames(s, dir).isEmpty)

    // re-query rebuilds correctly (fresh derivation, same rows)
    before.foreach { case (name, rows) =>
      val again = SparkEntry.queries(name)(s, dir).collect().toSeq
      assert(again == rows, s"$name changed after invalidate/rebuild")
    }
    // and the rebuild re-populated (then release again — leave the
    // isolated session clean)
    assert(SparkEntry.cachedFrames(s, dir).nonEmpty)
    SparkEntry.invalidate(s, dir)
    assert(SparkEntry.cachedFrames(s, dir).isEmpty)
  }

  test("invalidate on an untouched (session, dir) is a no-op") {
    val other = TestSpark.spark.newSession()
    SparkEntry.invalidate(other, dir) // must not throw
    assert(SparkEntry.cachedFrames(other, dir).isEmpty)
  }

  test("the AtScale lshBits conf reaches the shared cosine pair set") {
    import org.apache.spark.sql.functions.col
    // The memo keys on (session, dir, RESOLVED bits) — r9 ADVICE: a
    // mid-session conf change must take effect on the NEXT build, not
    // silently serve the stale geometry until invalidate. So: build at
    // the default, flip the conf, and assert the wider geometry WITHOUT
    // an intervening invalidate; then flip back and assert the default
    // pair set is served again (both memo entries coexist).
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    SparkEntry.invalidate(s, dir)
    val default4 = canon(SparkEntry.queries("q_cosine_neardups")(s, dir)
      .select(col("vec_a"), col("vec_b")))
    s.conf.set(graft.functions.AtScale.LshBitsKey, "6")
    try {
      val viaEntry = canon(SparkEntry.queries("q_cosine_neardups")(s, dir)
        .select(col("vec_a"), col("vec_b")))
      val direct = canon(graft.functions.Similarity
        .scoredBucketPairs(emb, bitsPerTable = 6)
        .filter(col("score") >= 0.4).select(col("vec_a"), col("vec_b")))
      assert(viaEntry == direct,
        "conf change did not reach the next pair-set build (stale memo)")
    } finally s.conf.unset(graft.functions.AtScale.LshBitsKey)
    // default geometry again after the reset — no invalidate needed
    val back = canon(SparkEntry.queries("q_cosine_neardups")(s, dir)
      .select(col("vec_a"), col("vec_b")))
    val directDefault = canon(graft.functions.Similarity.scoredBucketPairs(emb)
      .filter(col("score") >= 0.4).select(col("vec_a"), col("vec_b")))
    assert(back == default4 && back == directDefault)
    // invalidate releases BOTH geometries' entries
    SparkEntry.invalidate(s, dir)
    assert(SparkEntry.cachedFrames(s, dir).isEmpty)
  }
}
