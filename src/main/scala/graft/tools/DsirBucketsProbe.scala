package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics

/** r9 verdict item 5: measure the DSIR bucket-count knob's collision
  * sensitivity — how much does the top-quartile SELECTION change when
  * the hashed feature space grows from the 1024-bucket oracle-parity
  * grid toward (and past) the paper's 2^13?
  *
  * For each candidate bucket count vs the 1024 baseline it prints:
  *  - selection overlap (|both selected| / |baseline selected|) — the
  *    decision-level agreement;
  *  - Spearman-ish rank agreement on the weight ordering (fraction of
  *    sampled doc pairs ordered identically) — the score-level
  *    agreement underneath the quartile cut;
  *  - keep-rate of the target language under each grid — the quantity
  *    DSIR exists to maximize, so a grid change that LOWERS it is a
  *    regression no overlap number excuses.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.DsirBucketsProbe
  */
object DsirBucketsProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val langOf = docs.select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    def run(buckets: Int): Map[Long, (Double, Boolean)] =
      TextAnalytics.dsirWeights(docs, buckets = buckets)
        .select(col("doc_id"), col("dsir_weight"), col("selected"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
        .toMap

    val base = run(1024)
    val baseSel = base.collect { case (id, (_, true)) => id }.toSet
    def keepRateEn(m: Map[Long, (Double, Boolean)]): Double = {
      val en = m.keys.filter(id => langOf(id) == "en").toSeq
      // empty-target-language guard (r10 ADVICE): report 0 rather than
      // NaN on a corpus with no target-language docs
      if (en.isEmpty) 0.0
      else en.count(id => m(id)._2).toDouble / en.size
    }
    println(f"[dsir_probe] dir=$dir docs=${base.size} " +
      f"baseline(1024): selected=${baseSel.size} en_keep=${keepRateEn(base)}%.3f")
    for (b <- Seq(2048, 4096, 8192, 16384)) {
      val m = run(b)
      val sel = m.collect { case (id, (_, true)) => id }.toSet
      val overlap = (sel & baseSel).size.toDouble / baseSel.size
      // rank agreement over a deterministic pair sample (ids k, k+17);
      // pairs TIED in either grid are skipped (r10 ADVICE: counting a
      // tie as agreement only when both grids tie the same way
      // understates agreement on heavily-collided grids)
      val ids = base.keys.toSeq.sorted
      val pairs = ids.zip(ids.drop(17)).filter { case (a, bId) =>
        base(a)._1 != base(bId)._1 && m(a)._1 != m(bId)._1 }
      val agree = pairs.count { case (a, bId) =>
        (base(a)._1 < base(bId)._1) == (m(a)._1 < m(bId)._1) }
      val rankAgree = if (pairs.isEmpty) 1.0 else agree.toDouble / pairs.size
      println(f"[dsir_probe] buckets=$b selected=${sel.size} " +
        f"overlap=$overlap%.3f rank_agree=$rankAgree%.3f " +
        f"(untied pairs ${pairs.size}) en_keep=${keepRateEn(m)}%.3f")
    }
    spark.stop()
  }
}
