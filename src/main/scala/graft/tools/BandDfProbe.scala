package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: distribution of band-key document frequency (how many
  * docs share a given (band, band_key)) as the corpus grows — the
  * quantity behind the candidates/doc drift (VERDICT r3 "what's wrong"
  * #2). Candidates contributed by a key with df docs is df*(df-1)/2, so
  * a handful of hot keys dominates; this prints the df histogram tail to
  * pick the hot-band cap.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt "runMain graft.tools.BandDfProbe"
  */
object BandDfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    args.headOption.getOrElse("1,8,20").split(",").map(_.trim.toInt).foreach { k =>
      val corpus = ScaleProof.scaled(docs, k).localCheckpoint()
      val sigs = graft.functions.Sketches.minHashSignatures(corpus)
      val withSig = sigs.select(col("doc_id"), col("sig"),
          explode(sequence(lit(0), lit(graft.functions.Sketches.MinHashBands - 1))).as("band"))
        .select(col("doc_id"), col("band"),
          expr(s"slice(sig, band * ${graft.functions.Sketches.RowsPerBand} + 1, ${graft.functions.Sketches.RowsPerBand})")
            .as("band_key"))
      val df = withSig.groupBy(col("band"), col("band_key")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 1)
      val nDocs = corpus.count()
      val stats = df.agg(
        count(lit(1)).as("keys"), max(col("df")).as("max_df"),
        sum((col("df") * (col("df") - 1)).cast("long") / 2).cast("long").as("cand"),
        sum(when(col("df") > 4, (col("df") * (col("df") - 1)).cast("long") / 2).otherwise(0L)).cast("long").as("cand_df_gt4"),
        sum(when(col("df") > 8, (col("df") * (col("df") - 1)).cast("long") / 2).otherwise(0L)).cast("long").as("cand_df_gt8"),
        sum(when(col("df") > 16, (col("df") * (col("df") - 1)).cast("long") / 2).otherwise(0L)).cast("long").as("cand_df_gt16"),
        sum(when(col("df") > 32, (col("df") * (col("df") - 1)).cast("long") / 2).otherwise(0L)).cast("long").as("cand_df_gt32"),
        sum(when(col("df") > 64, (col("df") * (col("df") - 1)).cast("long") / 2).otherwise(0L)).cast("long").as("cand_df_gt64")
      ).collect()(0)
      println(s"k=$k docs=$nDocs sharedKeys=${stats.getLong(0)} maxDf=${stats.getLong(1)} " +
        s"cand=${stats.getLong(2)} gt4=${stats.getLong(3)} gt8=${stats.getLong(4)} " +
        s"gt16=${stats.getLong(5)} gt32=${stats.getLong(6)} gt64=${stats.getLong(7)}")
      // top hot keys: what do they look like?
      df.orderBy(col("df").desc).limit(8).collect().foreach { r =>
        println(s"  band=${r.getInt(0)} df=${r.getLong(2)} key=${r.getSeq[Long](1).mkString(",")}")
      }
      // Decompose the band-join candidate stream: how many candidates are
      // cross-replica (pure accident — no true near-dup crosses replicas),
      // and of the cross-replica ones how many come from keys df > 8?
      val cand = graft.functions.Sketches.minHashBandCandidates(corpus)
        .withColumn("cross",
          expr("doc_a div 100000000 <> doc_b div 100000000"))
      val dec = cand.agg(count(lit(1)).as("all"),
        sum(when(col("cross"), 1L).otherwise(0L)).as("xrep")).collect()(0)
      println(s"  candidates=${dec.getLong(0)} crossReplica=${dec.getLong(1)}")
      // true-pair coverage: does a df cap lose real pairs? count pairs
      // (est>=0.3) whose EVERY shared band key is hot (df > cap)
      for (cap <- Seq(8, 16, 32)) {
        val okKeys = df.filter(col("df") <= cap).select(col("band"), col("band_key"))
        val sigs2 = graft.functions.Sketches.minHashSignatures(corpus)
        val bands2 = sigs2.select(col("doc_id"), col("sig"),
            explode(sequence(lit(0), lit(graft.functions.Sketches.MinHashBands - 1))).as("band"))
          .select(col("doc_id"), col("sig"), col("band"),
            expr(s"slice(sig, band * ${graft.functions.Sketches.RowsPerBand} + 1, ${graft.functions.Sketches.RowsPerBand})")
              .as("band_key"))
          .join(okKeys, Seq("band", "band_key"))
        val capped = bands2.as("a")
          .join(bands2.as("b"),
            col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            (expr("aggregate(zip_with(a.sig, b.sig, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
              .cast("double") / graft.functions.Sketches.NumHashes).as("est_jaccard"))
          .filter(col("est_jaccard") >= 0.3)
          .dropDuplicates("doc_a", "doc_b")
        val uncapped = graft.functions.Sketches.minHashPairs(corpus, threshold = 0.3)
        val lost = uncapped.select("doc_a", "doc_b")
          .except(capped.select("doc_a", "doc_b")).count()
        val cCount = capped.count()
        println(s"  cap=$cap pairs=$cCount lostTruePairs=$lost")
      }
    }
    spark.stop()
  }
}
