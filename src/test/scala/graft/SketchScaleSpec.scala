package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.tools.ScaleProof

/** Regression guard for the sketch path's scaling behavior: growing the
  * corpus K-fold with disjoint isomorphic replicas (tools.ScaleProof) must
  * keep band-join candidates/doc ~flat — linear total candidates, the
  * property that makes banded LSH the 100 TB dedup route. A quadratic
  * index (all-pairs, or band keys too weak for the corpus) fails this
  * immediately: candidates/doc would grow ~K-fold. */
class SketchScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("minhash band candidates grow linearly with corpus size") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n1 = docs.count()
    val c1 = Sketches.minHashBandCandidates(docs).count()

    val k = 8
    val scaledDocs = ScaleProof.scaled(docs, k)
    val nK = scaledDocs.count()
    assert(nK === k * n1)
    val cK = Sketches.minHashBandCandidates(scaledDocs).count()

    val perDoc1 = c1.toDouble / n1
    val perDocK = cK.toDouble / nK
    // ~flat per-doc rate: replicas are shingle-disjoint, so the only
    // growth beyond exactly-linear is accidental cross-replica band-key
    // collisions. 2x headroom covers hash-realization variance (each
    // permuted replica is a fresh hash realization with its own stop-
    // shingle minima); a quadratic index would show ~8x.
    assert(perDocK <= perDoc1 * 2.0 + 0.5,
      s"candidates/doc grew from $perDoc1 to $perDocK at ${k}x — " +
        "band-key selectivity no longer holds")
    // No INVENTED duplicates: every reported pair stays inside one
    // replica (per-replica counts vary with the hash realization — the
    // est-jaccard threshold is a property of the estimator, not the
    // corpus — but replicas never bleed into each other).
    val pairsK = Sketches.minHashPairs(scaledDocs, threshold = 0.3)
    val crossReplica = pairsK.filter(
      expr("doc_a div 100000000 <> doc_b div 100000000")).count()
    assert(crossReplica === 0L)
    assert(pairsK.count() >= Sketches.minHashPairs(docs, threshold = 0.3).count())
  }
}
