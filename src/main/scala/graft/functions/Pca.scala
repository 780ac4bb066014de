package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal direction of the embedding corpus via power iteration —
  * the preprocessing step for embedding whitening / decorrelation before
  * dedup or ANN indexing.
  *
  * ORACLE-REPRODUCIBLE iterative float math (the IVF integer-grid
  * technique generalized to a second iterative algorithm): each
  * iteration's matrix-vector product w = Σ_i x_i (x_i · v) accumulates
  * per-dimension contributions floor-quantized onto a 2^-20 grid, so the
  * cross-row sum is an exact BIGINT sum — order-free on any
  * partitioning — and the normalization uses the same left-to-right
  * fold as DuckDB's list_dot_product. Every iteration is therefore
  * bit-identical between engines and the DuckDB mirror simply unrolls
  * the loop in CTEs (OracleSqlExt q_pca_component).
  *
  * Scale shape: one scan + one dim-sized aggregation per iteration; the
  * only driver state is the dim-double direction (exactly the IVF
  * centroid contract). Uncentered — the top singular direction; at
  * 100 TB centering would be one more grid-quantized mean pass with the
  * same machinery.
  */
object Pca {
  val QuantScale = 1048576.0 // 2^20, the Ivf.MeanQuantScale grid

  /** The direction after `iters` power iterations from the fixed
    * deterministic start v0 = (1/sqrt(dim), ...). */
  def topDirection(emb: DataFrame, dim: Int = 64, iters: Int = 3): Array[Double] =
    topDirections(emb, nComponents = 1, dim, iters).head

  /** The first `nComponents` principal directions via deflation: after
    * each component, every vector sheds its projection onto it
    * (x' = x - (x·v) v — a row-local zip against the direction literal)
    * and the power iteration reruns on the residuals. Same exactness
    * contract per component; the oracle unrolls both levels
    * (OracleSqlExt q_pca_deflation). */
  def topDirections(emb: DataFrame, nComponents: Int = 2, dim: Int = 64,
                    iters: Int = 3): Seq[Array[Double]] = {
    var cur = emb.select(col("embedding").cast("array<double>").as("v"))
    val out = Seq.newBuilder[Array[Double]]
    for (_ <- 1 to nComponents) {
      val v = powerIterate(cur, dim, iters)
      out += v
      val vCol = array(v.toIndexedSeq.map(lit): _*)
      cur = cur.select(col("v"), Similarity.dot(col("v"), vCol).as("s"))
        .select(zip_with(col("v"), vCol, (x, c) => x - col("s") * c).as("v"))
    }
    out.result()
  }

  private def powerIterate(vectors: DataFrame, dim: Int, iters: Int): Array[Double] = {
    val base = vectors
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      for (_ <- 1 to iters) {
        val vCol = array(v.toIndexedSeq.map(lit): _*)
        val sums = base
          .select(Similarity.dot(col("v"), vCol).as("s"), col("v"))
          .select(col("s"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("pos"))
          .agg(sum(floor(col("x") * col("s") * lit(QuantScale)).cast("long")).as("q"))
          .collect().map(r => r.getAs[Int]("pos") -> r.getAs[Long]("q")).toMap
        val w = Array.tabulate(dim)(j => sums.getOrElse(j, 0L).toDouble / QuantScale)
        var acc = 0.0 // left-to-right fold == list_dot_product order
        var j = 0
        while (j < dim) { acc += w(j) * w(j); j += 1 }
        val nrm = math.sqrt(acc)
        v = w.map(_ / nrm)
      }
      v
    } finally { base.unpersist(); () }
  }

  /** (component, dim, loading) rows for the deflated direction stack. */
  def componentStack(emb: DataFrame, dirs: Seq[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    dirs.zipWithIndex.flatMap { case (v, c) =>
      v.zipWithIndex.map { case (x, i) => (c.toLong + 1, i.toLong, x) }
    }.toDF("component", "dim", "loading")
      .select(col("component"), col("dim"),
        round(col("loading"), 9).as("loading"))
  }

  /** (dim, loading) rows of the final direction; loadings go through
    * Spark's round(9) (the knnExact score convention, already proven
    * cross-engine-identical). */
  def topComponent(emb: DataFrame, dim: Int = 64, iters: Int = 3): DataFrame =
    componentRows(emb, topDirection(emb, dim, iters))

  /** Same, from an already-trained direction (callers holding the
    * 64-double state train once per session). */
  def componentRows(emb: DataFrame, v: Array[Double]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
      .toDF("dim", "loading")
      .select(col("dim"), round(col("loading"), 9).as("loading"))
  }

  /** Per-label distribution of the scalar projection onto the top
    * direction — how the corpus's labels separate along its principal
    * axis (the drift/cluster-structure report an embedding pipeline
    * runs after indexing). All statistics are ORDER-FREE (count, min,
    * max, exact percentiles over round(9) projections) so the report
    * mirrors bit-exactly; a double mean would not. One scan: the
    * projection is a row-local sequential-fold dot against the
    * broadcast-by-value direction literal. */
  def projectionByLabel(emb: DataFrame, dim: Int = 64, iters: Int = 3): DataFrame =
    projectionByLabelFrom(emb, topDirection(emb, dim, iters))

  /** Same, from an already-trained direction. */
  def projectionByLabelFrom(emb: DataFrame, v: Array[Double]): DataFrame = {
    val vCol = array(v.toIndexedSeq.map(lit): _*)
    emb.select(col("label"),
      round(Similarity.dot(col("embedding").cast("array<double>"), vCol), 9)
        .as("proj"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("proj")).as("min_proj"), max(col("proj")).as("max_proj"),
        AtScale.quantile(emb, col("proj"), 0.25).as("p25_proj"),
        AtScale.quantile(emb, col("proj"), 0.5).as("median_proj"),
        AtScale.quantile(emb, col("proj"), 0.75).as("p75_proj"))
  }
}
