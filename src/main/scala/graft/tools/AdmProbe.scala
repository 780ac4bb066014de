package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Dedup, Sketches}
import graft.operators.IncrementalDedup

/** Dev probe (r14 optimization round): decompose the cost of
  * IncrementalDedup.admissions — the shared engine of
  * q_incremental_dedup, q_dedup_reconcile's online side, and the
  * warmup incAdmissions — stage by stage, replicating its internals
  * with timers so the wall-clock is attributed to stage-1 exact
  * verdicts, crawl signatures, candidate generation, est-verify, or
  * label propagation, instead of guessed at.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.AdmProbe
  */
object AdmProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "89"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[adm] $name: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }

    val d = spark.read.parquet(s"$dir/documents.parquet")
    val split = IncrementalDedup.splitAt(d)
    val corpus = d.filter(col("doc_id") <= split)
    val crawl = d.filter(col("doc_id") > split)
    // index warm, like the bench memo
    val sigs = t("index: sigIndex+persist") {
      val s = IncrementalDedup.sigIndex(corpus).persist(); s.count(); s
    }
    val ex = t("index: exactIndex+persist") {
      val e = IncrementalDedup.exactIndex(corpus).persist(); e.count(); e
    }
    val bi = t("index: rankedIndex+persist") {
      val b = IncrementalDedup.rankedIndex(
        IncrementalDedup.bandRows(sigs)).persist(); b.count(); b
    }

    for (pass <- Seq("cold", "warm")) {
      System.err.println(s"=== pass $pass")
      // --- the admissions body, timed stage by stage (keep in sync
      // with IncrementalDedup.admissions)
      val threshold = 0.3
      val anchors = Sketches.BandAnchors
      val hashed = crawl.select(col("doc_id"), col("text"), col("source"),
        md5(col("text")).as("h"))
      val batchRank = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      val staged = t("stage1: exact verdicts (window+join+ckpt)") {
        val s = hashed
          .withColumn("batch_rn", row_number().over(batchRank))
          .join(ex.select(col("content_hash").as("h"))
            .withColumn("corpus_hit", lit(true)), Seq("h"), "left")
          .withColumn("exact_dup",
            coalesce(col("corpus_hit"), lit(false)) || col("batch_rn") > 1)
          .select(col("doc_id"), col("source"), col("exact_dup"))
          .localCheckpoint(false)
        s.count(); s
      }
      val survIds = staged.filter(!col("exact_dup")).select(col("doc_id"))
      val crawlSigs = t("stage2: crawl signatures (ckpt)") {
        val s = Sketches.minHashSignatures(
          crawl.join(survIds, Seq("doc_id"), "left_semi"), 5)
          .localCheckpoint(false)
        s.count(); s
      }
      val crawlBands = IncrementalDedup.bandRows(crawlSigs)
      val idxRanked = bi
      val bucketC = idxRanked.filter(col("rk") === 1)
        .select(col("band"), col("band_key"), col("c"))
      val probe = idxRanked.filter(col("rk") <= anchors).as("a")
        .join(crawlBands.as("b"),
          col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val crawlRanked = crawlBands.withColumn("crk", row_number().over(
        Window.partitionBy(col("band"), col("band_key")).orderBy(col("doc_id"))))
        .join(bucketC, Seq("band", "band_key"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val internal = crawlRanked.filter(col("crk") + col("c") <= anchors).as("a")
        .join(crawlBands.as("b"),
          col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val cand = probe.unionByName(internal).dropDuplicates("doc_a", "doc_b")
      val allSigs = sigs.unionByName(crawlSigs)
      val edges = t("stage3: candidates + est-verify (count)") {
        val e = cand
          .join(allSigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
            Seq("doc_a"))
          .join(crawlSigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
            Seq("doc_b"))
          .filter(Sketches.estJaccard("sig_a", "sig_b") >= threshold)
          .select(col("doc_a"), col("doc_b"))
        System.err.println(s"[adm] edges = ${e.count()}")
        e
      }
      val dropped = t("stage4: dedupClusters (CC)") {
        val dd = Dedup.dedupClusters(edges).filter(!col("keep"))
          .select(col("doc_id")).withColumn("near_hit", lit(true))
        dd.count(); dd
      }
      t("stage5: final join + noop") {
        staged
          .join(dropped, Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"),
            when(col("exact_dup"), lit("exact_dup"))
              .when(coalesce(col("near_hit"), lit(false)), lit("near_dup"))
              .otherwise(lit("admitted")).as("outcome"))
          .write.format("noop").mode("overwrite").save()
      }
      t(s"whole admissions() $pass (noop)") {
        IncrementalDedup.admissions(crawl, ex, bi, sigs)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
