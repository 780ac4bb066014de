package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Pq, Similarity}

/** r8 verdict item 5: the isotropic random fixture cannot reward ANY
  * rotation/permutation (measured ~0 delta between pooled, per-subspace,
  * and OPQ — exactly as the OPQ deferral note predicted), so it cannot
  * SEPARATE the codebook configs either. This probe derives an
  * ANISOTROPIC fixture deterministically from the existing vectors —
  * dimension j is scaled by `hotScale` for j < SubDim, 1 otherwise, so
  * ALL the variance lands in the first PQ subspace — and reports
  * per-method mean recall@10 on both fixtures side by side.
  *
  * Why this shape separates the configs: with the raw dimension order,
  * subspace 0 holds every high-energy dim (16 codewords must quantize
  * an 8-D ball carrying ~hotScale^2 of the energy — large cell error),
  * while subspaces 1-7 quantize noise that barely matters; the OPQ
  * snake-draft permutation (Pq.trainPermutation) re-deals the 8 hot
  * dims ONE PER SUBSPACE, so each codebook spends its 16 cells mostly
  * on its single dominant dim. Pooled shares one codebook across
  * structurally different subspaces and should trail both.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.OpqFixtureProbe [hotScale]
  */
object OpqFixtureProbe {
  def main(args: Array[String]): Unit = {
    val hotScale = args.headOption.getOrElse("6.0").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // anisotropic derivation: first-subspace dims carry hotScale x the
    // amplitude (deterministic, float-kept so the fixture schema holds)
    val aniso = emb.select(col("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i < Pq.SubDim, x * lit(hotScale))
          .otherwise(x.cast("double")).cast("float")).as("embedding"),
      col("label"))

    def report(name: String, e: DataFrame): Unit = {
      val cb = Pq.trainCodebook(e)
      val cbs = Pq.trainCodebooks(e)
      val perm = Pq.trainPermutation(e)
      val opqCbs = Pq.trainCodebooks(Pq.permute(e, perm))
      val rows = Similarity.annRecall(e, cb, cbs, opqCbs, perm).collect()
      def mean(f: String): Double = {
        val vs = rows.filterNot(r => r.isNullAt(r.fieldIndex(f)))
          .map(r => r.getDouble(r.fieldIndex(f)))
        vs.sum / vs.length
      }
      println(f"[opqprobe] $name: pq=${mean("pq_recall")}%.3f " +
        f"pq_sub=${mean("pq_sub_recall")}%.3f opq=${mean("opq_recall")}%.3f " +
        f"(lsh=${mean("lsh_recall")}%.3f mp=${mean("multiprobe_recall")}%.3f) " +
        f"perm.head8=${perm.take(8).mkString(",")}")
    }
    report("isotropic", emb)
    report(f"aniso(hot=$hotScale%.1f)", aniso)
    spark.stop()
  }
}
