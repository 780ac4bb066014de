package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Pq
import graft.expressions.PqCodes.pq_codes

/** Pins the r15 PQ encode-kernel swap: the native
  * expressions.PqCodes (all subspaces in one node, codebooks as data)
  * must assign code-for-code what the literal
  * array_max(array(struct(2*dot - |c|^2, code))) tree assigned — the
  * exact expression the ADC arms used before (kept as
  * Pq.nearestCode, the reference form). Adversarial inputs: duplicate
  * codewords (score ties -> larger code wins), zero vectors, vectors
  * SHORTER than the subspace span (slice + min-length-dot semantics),
  * negative components, plus a randomized sweep; both codegen and
  * interpreted paths. */
class PqCodesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SubDim = Pq.SubDim
  private val NumSub = Pq.NumSub

  private def triples(cb: Seq[(Int, Array[Double])]) =
    cb.map { case (code, c) => (code, c.toIndexedSeq: Seq[Double],
      c.map(x => x * x).sum) }

  /** native kernel vs the literal reference form over the same rows. */
  private def check(vecs: Seq[Seq[Double]],
                    cbs: Seq[Seq[(Int, Array[Double])]]): Unit = {
    val df = vecs.toDF("v")
    val got = df.select(
      pq_codes(col("v"), cbs.map(triples), SubDim).as("codes"))
    val want = df.select(array((0 until cbs.length).map(s =>
      Pq.nearestCode(cbs(s), slice(col("v"), s * SubDim + 1, SubDim))): _*)
      .as("codes"))
    val g = got.collect().map(_.getSeq[Int](0))
    val w = want.collect().map(_.getSeq[Int](0))
    g.zip(w).zip(vecs).foreach { case ((a, b), v) =>
      assert(a == b, s"codes diverge for vector $v")
    }
  }

  private val rnd = new scala.util.Random(151515)
  private def randCb(k: Int): Seq[(Int, Array[Double])] =
    (0 until k).map(c => (c, Array.fill(SubDim)(rnd.nextDouble() * 2 - 1)))

  private def fullCbs(k: Int): Seq[Seq[(Int, Array[Double])]] =
    (0 until NumSub).map(_ => randCb(k))

  test("pq_codes == literal argmax on adversarial cases") {
    val cw = Array.fill(SubDim)(0.25)
    val tieCb = Seq((0, cw), (1, cw.clone()), (2, Array.fill(SubDim)(-0.5)))
    val cbs = Seq.fill(NumSub)(tieCb)
    val vecs = Seq(
      Seq.fill(NumSub * SubDim)(0.0),              // all scores = -|c|^2: ties
      Seq.fill(NumSub * SubDim)(1.0),
      Seq.fill(NumSub * SubDim)(-1.0),
      Seq.tabulate(NumSub * SubDim)(i => math.sin(i.toDouble)),
      Seq(0.5, -0.5, 0.125),                       // shorter than one subspace
      Seq.fill(SubDim * 3 + 2)(0.75),              // partial later subspace
      Seq.empty[Double])                           // no elements at all
    check(vecs, cbs)
  }

  test("pq_codes == literal argmax on a randomized sweep (pooled + per-subspace)") {
    val vecs = (1 to 100).map(_ =>
      Seq.fill(NumSub * SubDim)(rnd.nextDouble() * 4 - 2))
    check(vecs, fullCbs(Pq.CodebookK))                         // per-subspace
    val pooled = randCb(Pq.CodebookK)
    check(vecs, Seq.fill(NumSub)(pooled))                      // pooled
    check(vecs, fullCbs(3))                                    // short codebook
  }

  test("interpreted path agrees (wholestage codegen off)") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val vecs = (1 to 40).map(_ =>
        Seq.fill(NumSub * SubDim)(rnd.nextDouble() * 4 - 2))
      check(vecs, fullCbs(Pq.CodebookK))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null vector yields null codes") {
    val d = Seq(Option.empty[Seq[Double]]).toDF("v")
      .select(pq_codes(col("v"), fullCbs(4).map(triples), SubDim).as("c"))
      .collect()
    assert(d(0).isNullAt(0))
  }
}
