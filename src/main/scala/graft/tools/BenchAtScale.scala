package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a K-times-scaled copy of a testdata directory so the FULL
  * query surface can be benchmarked beyond sf0.1 (VERDICT r3 item 2) —
  * per-family ScaleProof runs cover the dedup/join kernels; this feeds
  * the whole 104-query Bench.
  *
  * Scaling must grow the data without faking structure (NOTES records
  * why naive copies fail: K identical replicas make every document a
  * K-clique of exact near-dups and blow the pair queries quadratically):
  *  - documents: K disjoint isomorphic replicas via seeded alphabet
  *    permutation (the ScaleProof technique) — duplicate DENSITY is
  *    preserved per replica, no cross-replica shingles;
  *  - embeddings: per-replica DIMENSION permutation — a rotation, so
  *    every within-replica norm/dot/neighborhood is preserved exactly
  *    while cross-replica vectors decorrelate; labels offset per replica
  *    (group count grows with the corpus, group size stays constant);
  *  - events: user/event id offsets (scaledEvents) — per-user sequences,
  *    sessions and as-of structure identical per replica;
  *  - TPC tables: all keys offset by a per-replica stride, foreign keys
  *    consistently (replica r's lineitem points at replica r's part/
  *    supplier/orders); nation/region stay shared dimensions;
  *  - snapshot tables need no scaling here: they derive from events, so
  *    their scan-side work grows K-fold while the topic/partition
  *    catalog stays fixed — which is what a K-times-busier fleet with
  *    the same topology looks like.
  *
  * Run (two steps so Bench stays the single timing harness):
  *   sbt "runMain graft.tools.BenchAtScale 10 /tmp/graft_sf_x10"
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf_x10 SPARK_GRAFT_CPUS=32 sbt "runMain graft.Bench"
  *
  * Note: events.ts is written back as BIGINT nanos (the exact values the
  * nanosAsLong read produces) — Snapshots.eventsRaw reads either
  * encoding identically.
  */
object BenchAtScale {

  private val Stride = 100000000L
  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.getOrElse("10").toInt
    val out = args.lift(1).getOrElse(s"/tmp/graft_sf_x$k")
    // replica distinctness needs only that the seeded shuffles differ,
    // not k <= 26: collision odds for k independent 26-letter
    // permutations are ~k^2/26! — negligible for any runnable k.
    // id strides stay collision-free far past this cap (doc/event ids
    // offset by r*1e8, user ids by r*1e6 — source ids are << both).
    require(k >= 1 && k <= 128, s"k out of range: $k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(table: String)(per: (DataFrame, Int) => DataFrame): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val scaled = (0 until k).map(r => per(df, r)).reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$out/$table.parquet")
      // count from the WRITTEN parquet (footer metadata only) — counting
      // `scaled` would re-execute the whole replication a second time
      println(s"[scale] $table x$k -> " +
        s"${spark.read.parquet(s"$out/$table.parquet").count()} rows")
    }
    def copy(table: String): Unit = replicate(table)((df, r) =>
      if (r == 0) df else df.limit(0))

    // --- documents: isomorphic replicas (disjoint shingle spaces)
    replicate("documents") { (df, r) =>
      val perm =
        if (r == 0) Alphabet
        else new scala.util.Random(88001L + r).shuffle(Alphabet.toList).mkString
      df.select((col("doc_id") + lit(r * Stride)).as("doc_id"),
        translate(col("text"), Alphabet, perm).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }

    // --- dirty-fixture corpora (r12 verdict item 6): the PII-dirtied and
    // templated corpora the audit→apply families query are materialized
    // as fixture TABLES of every ladder corpus, so committed bench/rung
    // numbers read the dirty text cold from parquet instead of deriving
    // it at query time. Derivation expressions live exactly once in
    // functions.FixtureCorpora (SparkEntry falls back to them only for
    // the read-only testdata dirs, where no fixture can land). Derived
    // from the WRITTEN scaled documents so the replica permutation has
    // already been applied — identical rows to the former query-time
    // derivation over the scaled corpus.
    def derived(table: String,
                derive: DataFrame => DataFrame): Unit = {
      val base = spark.read.parquet(s"$out/documents.parquet")
      derive(base).write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scale] $table -> " +
        s"${spark.read.parquet(s"$out/$table.parquet").count()} rows")
    }
    derived(graft.functions.FixtureCorpora.PiiTable,
      graft.functions.FixtureCorpora.piiDirty)
    derived(graft.functions.FixtureCorpora.TemplatedTable,
      graft.functions.FixtureCorpora.templated)

    // --- embeddings: dimension-permuted replicas (rotation-isomorphic)
    val dims = spark.read.parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding"))).first().getInt(0)
    replicate("embeddings") { (df, r) =>
      val perm =
        if (r == 0) (0 until dims).toList
        else new scala.util.Random(99001L + r).shuffle((0 until dims).toList)
      df.select((col("vec_id") + lit(r * Stride)).as("vec_id"),
        array(perm.map(i => col("embedding").getItem(i)): _*).as("embedding"),
        (col("label") + lit(r * 100)).as("label"))
    }

    // --- events: id-offset replicas (per-user structure preserved)
    replicate("events") { (df, r) =>
      df.select((col("event_id") + lit(r * Stride)).as("event_id"),
        col("ts"), (col("user_id") + lit(r * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }

    // --- TPC: consistent key strides per replica
    replicate("orders") { (df, r) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(r * Stride))
        .withColumn("o_custkey", col("o_custkey") + lit(r * Stride))
    }
    replicate("lineitem") { (df, r) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * Stride))
        .withColumn("l_partkey", col("l_partkey") + lit(r * Stride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * Stride))
    }
    // entity names are rebuilt from the strided key: a real K-times
    // customer base has K-times DISTINCT names, and leaving the base
    // names verbatim makes every name K-plicated — which fakes a
    // quadratic pair structure in the name-linkage ops exactly the way
    // plain doc copies fake dup structure (the x20 rung measured
    // q_editdist_pairs at 182 s before this; linear after)
    replicate("customer") { (df, r) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(r * Stride))
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
    }
    replicate("supplier") { (df, r) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(r * Stride))
        .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
    }
    replicate("part") { (df, r) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(r * Stride))
    }
    copy("nation")
    copy("region")

    println(s"[scale] done: $out")
    spark.stop()
  }
}
