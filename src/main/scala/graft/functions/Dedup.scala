package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM training-data pipeline.
  *
  * Three tiers, in increasing scale-efficiency:
  *  - exact:       content-hash groupBy (one shuffle on the hash).
  *  - n-gram Jaccard: character-5-gram shingle inverted index with a
  *    hot-shingle cap, candidate pairs via shingle equi-join. Oracle-
  *    checkable (pure SQL semantics).
  *  - MinHash/LSH and SimHash (graft.functions.Sketches): sketch + band
  *    join, the 100 TB path — candidates are generated from fixed-size
  *    signatures, never from the full shingle index.
  */
object Dedup {

  /** Exact dedup by md5 of the full content: one row per distinct content
    * with the kept (minimum) id and the duplicate count. */
  def exactGroups(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(md5(content).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact record dedup on a key subset: keep the minimum id per key
    * group (the other columns are the payload being deduplicated). */
  def recordGroups(df: DataFrame, keys: Seq[String], id: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(id).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct character 5-gram shingles per document:
    * substr(text, i, 5) for i in 1..len-4. Position-based so DuckDB can
    * mirror it with range() + array slicing (no WITH ORDINALITY needed). */
  def charShingles(docs: DataFrame, n: Int = 5): DataFrame =
    docs.select(col("doc_id"), col("text"),
      explode(sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(0))))
        .as("pos"))
      .select(col("doc_id"), expr(s"substring(text, pos, $n)").as("shingle"))
      .distinct()

  /** Pairwise n-gram Jaccard similarity over candidate pairs that share at
    * least one (non-hot) shingle.
    *
    * maxDocFreq drops shingles present in more than that many documents —
    * the skew guard that keeps the inverted-index join from exploding on
    * stop-shingles; applied identically in the oracle so results stay
    * comparable. At scale the shingle join shuffles on the shingle hash
    * (well distributed after the hot-key cap).
    */
  def jaccardPairs(docs: DataFrame, n: Int = 5, maxDocFreq: Int = 100,
                   threshold: Double = 0.5): DataFrame = {
    val sh = charShingles(docs, n)
    val rare = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select(col("shingle"))
    val shRare = sh.join(rare, "shingle")
    val sizes = shRare.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = shRare.as("a")
      .join(shRare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"), col("n_b"),
        col("jaccard"))
  }
}
