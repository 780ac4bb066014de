package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling and uncertainty estimation over the documents
  * corpus — the "look at 0.1% before you commit the cluster" tools a
  * 100 TB curation pipeline runs daily.
  *
  * Everything here is hash-deterministic (no RNG): the same doc_id is in
  * or out of the sample on every run, on every executor, at every scale —
  * which is what makes samples reproducible across reruns and CONSISTENT
  * across tables keyed by the same id (Bernoulli hash-threshold sampling
  * is a pure row-local predicate, so it fuses into the scan with zero
  * shuffle before the final per-stratum rollup).
  *
  * Arithmetic note: all hash math reduces doc_id mod M BEFORE multiplying
  * so ANSI-mode BIGINT overflow is impossible at any id magnitude (the
  * scale-ladder corpora offset ids far beyond the base fixture).
  */
object Sampling {

  /** Universal-hash parameters (shared verbatim with the DuckDB oracle —
    * embedded into the SQL from these constants; never fork them). */
  val M: Long = 1000003L // prime modulus
  val A: Long = 48271L // multiplier (Lehmer/Park-Miller constant)
  val B: Long = 40503L
  val SampleCut: Long = 100000L // keep h < cut -> ~10% rate
  val Replicates: Int = 64
  val A2: Long = 69621L
  val B2: Long = 33703L

  private def h(id: org.apache.spark.sql.Column) =
    (pmod(id, lit(M)) * A + B) % M

  /** The membership predicate — shared verbatim with the streaming
    * twin (streaming/SampleStream), so batch backfill and stream agree
    * on every document. */
  def keepPredicate(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    h(id) < SampleCut

  /** Per-source stratified Bernoulli sample report: the achieved rate of
    * the hash-threshold sample vs the ~10% target, plus the sampled char
    * mass. One scan, map-side partial agg, |sources| result rows. */
  def stratifiedSample(docs: DataFrame): DataFrame = {
    val kept = keepPredicate(col("doc_id")).cast("long")
    docs
      .select(col("source"), col("n_chars"), kept.as("keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).as("sampled"),
        sum(col("keep") * col("n_chars")).as("samp_chars"))
      .withColumn("rate",
        col("sampled").cast("double") / col("n_docs").cast("double"))
      .select(col("source"), col("n_docs"), col("sampled"), col("rate"),
        col("samp_chars"))
  }

  /** Consistent JOIN sampling: both sides of a key relationship are
    * sampled by the SAME hash predicate on the JOIN KEY, so a sampled
    * customer keeps ALL their orders — per-entity statistics (orders per
    * customer here) stay unbiased on the slice. Independent Bernoulli
    * sampling of two fact tables retains only rate^2 of their join and
    * biases every per-entity ratio; key-hash sampling is the standard
    * fix and falls out of the id-consistency the sampler already
    * guarantees.
    *
    * Shape at 100 TB: orders pre-aggregate to per-customer counts before
    * the single hint-free join; the sample predicates are row-local; the
    * output is |segments| rows. */
  def consistentJoinSample(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    customer.select(col("c_custkey"), col("c_mktsegment"),
        keepPredicate(col("c_custkey")).cast("long").as("keep"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), col("keep"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("customers"),
        sum(col("keep")).as("sampled_customers"),
        sum(col("n_orders")).as("orders"),
        sum(col("keep") * col("n_orders")).as("sampled_orders"))
      .select(col("c_mktsegment"), col("customers"), col("sampled_customers"),
        col("orders"), col("sampled_orders"),
        (col("orders").cast("double") / col("customers").cast("double"))
          .as("opc_full"),
        when(col("sampled_customers") === 0L, lit(null).cast("double"))
          .otherwise(col("sampled_orders").cast("double")
            / col("sampled_customers").cast("double")).as("opc_sampled"))
  }

  /** Deterministic half-sample replication CI on per-source mean doc
    * length: 64 hash-defined half-samples, each replicate mean an exact
    * BIGINT-sum ratio (order-independent — no double accumulation), and
    * the CI the 2.5/97.5 exact percentiles of the replicate means.
    *
    * Shape at 100 TB: the explode is x64 on (source, n_chars) pairs only
    * (never text), partial-agg'd map-side to |sources| x 64 rows before
    * the exchange; the percentile runs over 64 values per stratum. */
  def bootstrapCi(docs: DataFrame): DataFrame = {
    val reps = docs
      .select(col("source"), col("n_chars"), pmod(col("doc_id"), lit(M)).as("r"),
        explode(sequence(lit(0), lit(Replicates - 1))).as("b"))
      .withColumn("w",
        (((col("r") * A2 + col("b") * B2) % M) % 2 === 0).cast("long"))
      .groupBy(col("source"), col("b"))
      .agg(sum(col("w")).as("cnt"), sum(col("w") * col("n_chars")).as("chars"))
      .filter(col("cnt") > 0)
      .select(col("source"),
        (col("chars").cast("double") / col("cnt").cast("double")).as("m"))
    val full = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars"))
    val ci = reps.groupBy(col("source"))
      .agg(count(lit(1)).as("replicates"),
        graft.functions.AtScale.quantiles(docs, col("m"),
          Seq(0.025, 0.975)).as("q"))
      .select(col("source"), col("replicates"),
        col("q").getItem(0).as("ci_lo"), col("q").getItem(1).as("ci_hi"))
    full.join(ci, Seq("source"))
      .select(col("source"), col("n_docs"), col("mean_chars"),
        col("ci_lo"), col("ci_hi"), col("replicates"))
  }
}
