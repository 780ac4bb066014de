package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Similarity.dot

/** IVF (inverted-file) approximate nearest neighbor — the second ANN
  * path next to hyperplane LSH (Similarity.knnLsh).
  *
  * Index build: k centroids trained with a few Lloyd iterations, entirely
  * as DataFrame aggregations (seeded deterministically from the first k
  * vectors, so runs reproduce without a stored model). Every vector is
  * assigned to its nearest centroid — the inverted list.
  *
  * Query: probe the `nprobe` nearest centroids, exact-rerank only the
  * vectors in those lists. At 100 TB the lists are the partition layout
  * (cluster-by-centroid), so a query touches nprobe/k of the corpus; the
  * centroid table (k x dim doubles) broadcasts everywhere.
  */
object Ivf {

  /** The centroid table in the shape the native argmax kernel holds:
    * (cid, vector, L2 norm), norms precomputed driver-side with the same
    * fold every prior path used. */
  private def centroidTable(centroids: Seq[(Int, Array[Double])])
      : Seq[(Int, Seq[Double], Double)] =
    centroids.map { case (cid, c) =>
      (cid, c.toIndexedSeq, math.sqrt(c.map(x => x * x).sum))
    }

  /** struct(score, cid) of the nearest centroid — ONE native codegen
    * kernel (graft.expressions.NearestCentroid) for ANY k: the centroid
    * matrix is data referenced by the generated loop, not expression
    * tree, so it stays a row-local scan-fused argmax at k = 16 and at
    * the 256 cap alike. Replaces r4's two-path scheme (literal
    * array_max(struct...) up to k = 32 — fine; broadcast-join + map-side
    * max(struct) past it — correct but paid a vec_id shuffle + groupBy +
    * join-back per assignment). Tie-break unchanged: max score, then max
    * cid, SQL double order. */
  private def nearestStruct(centroids: Seq[(Int, Array[Double])],
                            v: Column, vNorm: Column): Column =
    graft.expressions.NearestCentroid.nearest_centroid(
      v, vNorm, centroidTable(centroids))

  private def nearestCentroid(centroids: Seq[(Int, Array[Double])],
                              v: Column, vNorm: Column): Column =
    nearestStruct(centroids, v, vNorm).getField("cid")

  /** (vec_id, cid, score) of the nearest centroid for every vector —
    * the one assignment kernel shared by training, semDedup, and
    * prototypicalityPrune. `base` must carry (vec_id, v, nrm). */
  private def assignScored(base: DataFrame,
                           centroids: Seq[(Int, Array[Double])]): DataFrame =
    base.withColumn("best", nearestStruct(centroids, col("v"), col("nrm")))
      .select(col("vec_id"), col("best.cid").as("cid"), col("best.score").as("score"))

  /** Mean quantization grid: components are floored onto a 2^-20 grid
    * before summation so the centroid mean is an EXACT integer sum
    * divided once — order-free on any partitioning, hence bit-identical
    * in the DuckDB oracle (a double avg() is partition-order dependent).
    * 2^-20 is far below any embedding's signal floor. */
  val MeanQuantScale = 1048576.0 // 2^20

  /** Deterministic Lloyd-training sample cap: above this many vectors,
    * training runs on the `vec_id % stride == 0` stratum with stride =
    * ceil(n / cap) — a ~4-8k-vector deterministic sample the DuckDB
    * mirror reproduces with the same predicate. This is what keeps the
    * training pass O(sample·k·d) while k tracks the corpus (the SemDeDup
    * paper trains k-means on a subsample in exactly this regime); the
    * ASSIGNMENT pass still scores every vector. At every oracle-checked
    * sf (n <= 2000) stride = 1, so the sample IS the corpus and results
    * are bit-identical to the unsampled contract. */
  val TrainSampleCap = 4096L

  /** Train k centroids with `iters` Lloyd iterations. Returns the final
    * centroid vectors, collected (k x dim doubles — broadcast-sized by
    * construction). */
  def trainCentroids(emb: DataFrame, k: Int = 16, iters: Int = 3): Seq[(Int, Array[Double])] = {
    // The training set is scanned once per iteration (plus seeding) —
    // persist the projected vectors instead of re-deriving from parquet
    // each round.
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      Similarity.l2Norm(col("embedding")).as("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      val stride = math.max(1L, (n + TrainSampleCap - 1) / TrainSampleCap)
      val train =
        if (stride > 1) base.filter(col("vec_id") % stride === 0) else base
      trainOn(train, k, iters)
    } finally base.unpersist()
  }

  private def trainOn(base: DataFrame, k: Int, iters: Int): Seq[(Int, Array[Double])] = {
    // deterministic seeds: the first k vectors by vec_id
    var centroids: Seq[(Int, Array[Double])] = base.orderBy(col("vec_id")).limit(k)
      .collect().zipWithIndex.map { case (r, i) =>
        (i, r.getAs[scala.collection.Seq[Double]]("v").toArray)
      }.toSeq
    if (centroids.isEmpty) return centroids // empty table: nothing to train
    (1 to iters).foreach { _ =>
      val assigned =
        base.withColumn("cid", nearestCentroid(centroids, col("v"), col("nrm")))
      val means = assigned
        .select(col("cid"),
          posexplode(transform(col("v"), x => floor(x * lit(MeanQuantScale)))))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("col")).cast("double")
          / (lit(MeanQuantScale) * count(lit(1)).cast("double"))).as("m"))
        .groupBy(col("cid"))
        .agg(map_from_entries(collect_list(struct(col("pos"), col("m")))).as("byPos"))
        .collect()
        .map { r =>
          val m = r.getAs[Map[Int, Double]]("byPos")
          r.getInt(0) -> Array.tabulate(m.size)(m)
        }.toMap
      centroids = centroids.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    centroids
  }

  /** The inverted list: every vector tagged with its centroid id. */
  def assign(emb: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"),
      col("embedding").cast("array<double>").as("v"),
      Similarity.l2Norm(col("embedding")).as("nrm"))
    base.withColumn("cid", nearestCentroid(centroids, col("v"), col("nrm")))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
  }

  /** Grid for the order-free mean distance in clusterSummary: per-row
    * cosine distances are bit-identical doubles (the knn-proven dot
    * product shape), floored onto this grid and summed as exact BIGINT. */
  val DistQuantScale = 1073741824.0 // 2^30

  /** K-means cluster summary over the embedding corpus — the corpus-
    * structure report (how many latent groups, how tight, how balanced)
    * a curation pipeline reads before choosing mixture weights or
    * pruning a modality. Reuses the IVF centroid training (pass the
    * memoized centroids), so the index build is shared with the ANN
    * path.
    *
    * Columns: cluster size, share of corpus, mean cosine distance to the
    * centroid (order-free via the 2^-30 grid — a double avg() would
    * depend on partition order), and the exact min/max similarity
    * (min/max over bit-identical doubles are order-free as-is).
    *
    * Shape at 100 TB: assignment is a row-local argmin against the
    * broadcast k x dim centroid table fused into the scan; ONE hash
    * aggregation keyed by centroid id. */
  def clusterSummary(emb: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    if (centroids.isEmpty)
      return emb.limit(0).select(col("vec_id").cast("int").as("cid"),
        col("vec_id").as("vectors"), lit(0.0).as("corpus_frac"),
        lit(0.0).as("mean_dist"), lit(0.0).as("min_score"), lit(0.0).as("max_score"))
    val assigned = {
      val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        Similarity.l2Norm(col("embedding")).as("nrm"))
      assignScored(base, centroids)
        .select(col("vec_id"), col("cid"), round(col("score"), 9).as("score"))
    }
    val per = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("vectors"),
        (sum(floor((lit(1.0) - col("score")) * lit(DistQuantScale)).cast("long"))
          .cast("double") / (lit(DistQuantScale) * count(lit(1)).cast("double")))
          .as("mean_dist"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
    val tot = per.agg(sum(col("vectors")).as("n"))
    per.crossJoin(broadcast(tot)) // one row
      .select(col("cid"), col("vectors"),
        (col("vectors").cast("double") / col("n").cast("double")).as("corpus_frac"),
        col("mean_dist"), col("min_score"), col("max_score"))
  }

  /** IVF top-k: probe the nprobe nearest centroids per query, exact cosine
    * re-rank within the probed lists. */
  def knnIvf(emb: DataFrame, k: Int = 10, nQueries: Int = 10,
             nCentroids: Int = 16, nprobe: Int = 4): DataFrame =
    knnIvfWith(emb, trainCentroids(emb, nCentroids), k, nQueries, nprobe)

  /** knnIvf against pre-trained centroids — the deployment shape (the
    * index is trained once and shared across query sessions and with
    * clusterSummary). */
  def knnIvfWith(emb: DataFrame, centroids: Seq[(Int, Array[Double])],
                 k: Int = 10, nQueries: Int = 10, nprobe: Int = 4): DataFrame = {
    if (centroids.isEmpty) // empty table: empty result, correct schema
      return emb.limit(0).select(col("vec_id").as("query_id"),
        col("vec_id").as("neighbor_id"), col("vec_id").as("rank"),
        lit(0.0).as("score"))
    val lists = assign(emb, centroids)
    // nprobe nearest centroid ids per query vector
    val probes = (q: Column, qn: Column) => {
      val scored = centroids.map { case (cid, c) =>
        val cNorm = math.sqrt(c.map(x => x * x).sum)
        struct((dot(q, array(c.toIndexedSeq.map(lit): _*)) / (qn * lit(cNorm))).as("score"),
          lit(cid).as("cid"))
      }
      slice(reverse(array_sort(array(scored: _*))), 1, nprobe)
    }
    val queries = lists.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("nrm").as("qnrm"),
        explode(probes(col("embedding").cast("array<double>"), col("nrm")))
          .as("probe"))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        col("probe.cid").as("cid"))
    val scored = lists.join(broadcast(queries), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qvec"), col("embedding")) / (col("qnrm") * col("nrm")), 9)
          .as("score"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the shared IVF/k-means
    * index, compare vectors PAIRWISE ONLY WITHIN their cluster, connect
    * pairs whose cosine clears `threshold` into duplicate groups, and
    * keep — per the paper's rule — the group member with the LOWEST
    * similarity to its cluster centroid (the least prototypical one;
    * vec_id breaks ties). Output is one verdict row per vector that
    * belongs to a duplicate group; singletons are implicitly kept.
    *
    * Shape at 100 TB: assignment is a row-local argmax against the
    * broadcast k x dim centroid table; the pairwise stage shuffles on
    * cid only, and k grows with the corpus (the paper runs k ~ n/1000)
    * so per-cluster work stays bounded — this is the whole point of
    * SemDeDup vs an all-pairs scan. Group formation reuses the
    * distributed min-label propagation (Dedup.dedupClusters); edges
    * never cross clusters, so components stay cluster-local. */
  /** Adaptive cluster count for the dedup/prune index: k grows with the
    * corpus so the TARGET cluster size (~125) stays constant — the
    * SemDeDup paper's k ~ n/1000 setting scaled to the fixture. This is
    * what keeps semDedup's within-cluster pairwise stage LINEAR in
    * corpus size instead of quadratic-in-cluster-size. Capped at 1024
    * (r5; was 256 when the argmax rode broadcast-join fallbacks): the
    * assignment kernel scans the k x 64 centroid matrix per row
    * (graft.expressions.NearestCentroid) — k is DATA, not expression
    * tree, so the cap is set by per-row argmax cost (k·d mults) and the
    * 512 KiB broadcast, not codegen. With TrainSampleCap bounding the
    * Lloyd pass, cluster size stays ~125 up to 128k vectors; past the
    * cap it grows as n/1024, so the pairwise stage re-enters a
    * super-linear regime only at n >> 1e6 — where the deployment answer
    * is raising the cap further (the kernel scales; the 1024 default
    * balances the fixture ladder's assignment-vs-pairwise costs).
    * The floor of 16 keeps the small-sf oracle geometry identical to
    * the static ANN index (16 = max at <= 2000 vectors, so the DuckDB
    * mirror's dynamic greatest(16, n//125) reproduces it exactly). */
  def adaptiveK(n: Long, targetClusterSize: Int = 125, cap: Int = 1024): Int =
    math.min(cap, math.max(16, (n / targetClusterSize).toInt))

  /** Simplified (centroid-based) silhouette per cluster — the cluster-
    * quality report for the shared dedup/prune index: per vector,
    * a = 1 - cos(v, own centroid) and b = 1 - best cos(v, any OTHER
    * centroid), s = (b - a) / max(a, b) in [-1, 1]; per cluster the
    * size and mean/min/max silhouette. This is Rousseeuw's silhouette
    * with the cluster-mean distances replaced by centroid distances —
    * the O(n*k) formulation (the classical O(n^2) pairwise variant has
    * no 100 TB shape; with k capped at 1024 this stays one row-local
    * top-two kernel pass fused into the scan, then ONE cid-keyed
    * aggregation). Scores land on the 1e-9 round grid, s floors onto
    * the 2^-30 grid and sums exactly — order-free means, bit-stable in
    * the mirror. */
  def silhouette(emb: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
      Similarity.l2Norm(col("embedding")).as("nrm"))
    val t2 = graft.expressions.CentroidTopTwo.centroid_top_two(
      col("v"), col("nrm"), centroidTable(centroids))
    val s = base.withColumn("t", t2)
      .select(col("vec_id"), col("t.cid").as("cid"),
        (lit(1.0) - round(col("t.score"), 9)).as("a"),
        (lit(1.0) - round(col("t.second"), 9)).as("b"))
      .withColumn("s", when(greatest(col("a"), col("b")) === lit(0.0), lit(0.0))
        .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
    s.groupBy(col("cid"))
      .agg(count(lit(1)).as("vectors"),
        (sum(floor(col("s") * lit(DistQuantScale)).cast("long")).cast("double")
          / (lit(DistQuantScale) * count(lit(1)).cast("double")))
          .as("mean_silhouette"),
        min(col("s")).as("min_silhouette"),
        max(col("s")).as("max_silhouette"))
  }

  /** Prototypicality pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws", arXiv:2206.14486): in the data-rich regime, the
    * EASIEST examples — the ones closest to their cluster centroid —
    * contribute least to the loss, so each cluster drops its most
    * prototypical `dropPermille`/1000 fraction. Complements semDedup
    * (which removes near-copies): this trims redundancy-by-typicality.
    *
    * Emits one verdict row per vector: cluster id, centroid similarity,
    * the within-cluster prototypicality rank (1 = most prototypical),
    * and keep = rank past the drop cutoff floor(n * f). Assignment is
    * the same row-local argmax against the broadcast centroid table;
    * ranking is one window keyed by cid — cluster-sized partitions by
    * construction (k grows with the corpus). */
  def prototypicalityPrune(emb: DataFrame, centroids: Seq[(Int, Array[Double])],
                           dropPermille: Int = 200): DataFrame = {
    if (centroids.isEmpty)
      return emb.limit(0).select(col("vec_id"), col("vec_id").cast("int").as("cid"),
        lit(0.0).as("centroid_score"), col("vec_id").as("proto_rank"),
        lit(true).as("keep"))
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
      Similarity.l2Norm(col("embedding")).as("nrm"))
    val assigned = assignScored(base, centroids)
      .select(col("vec_id"), col("cid"), round(col("score"), 9).as("cscore"))
    val wRank = Window.partitionBy(col("cid"))
      .orderBy(col("cscore").desc, col("vec_id"))
    assigned
      .withColumn("proto_rank", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cid"))))
      .select(col("vec_id"), col("cid"), col("cscore").as("centroid_score"),
        col("proto_rank"),
        (col("proto_rank") >
          floor(col("n") * lit(dropPermille.toDouble) / lit(1000.0))).as("keep"))
  }

  def semDedup(emb: DataFrame, centroids: Seq[(Int, Array[Double])],
               threshold: Double = 0.4): DataFrame = {
    if (centroids.isEmpty)
      return emb.limit(0).select(col("vec_id"), col("vec_id").cast("int").as("cid"),
        col("vec_id").as("group_id"), lit(0.0).as("centroid_score"), lit(true).as("keep"))
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
      Similarity.l2Norm(col("embedding")).as("nrm"))
    // the native argmax keeps (v, nrm) in-row, so assignment needs no
    // join-back — one projection fused into the scan
    val assigned = base
      .withColumn("best", nearestStruct(centroids, col("v"), col("nrm")))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("best.cid").as("cid"), round(col("best.score"), 9).as("cscore"))
    val a = assigned.select(col("cid"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cid"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("cid"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 9)
        >= threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val groups = Dedup.dedupClusters(pairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id").as("group_id"))
    val w = Window.partitionBy(col("group_id"))
      .orderBy(col("centroid_score"), col("vec_id"))
    groups
      .join(assigned.select(col("vec_id"), col("cid"),
        col("cscore").as("centroid_score")), Seq("vec_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("vec_id"), col("cid"), col("group_id"),
        col("centroid_score"), col("keep"))
  }
}
