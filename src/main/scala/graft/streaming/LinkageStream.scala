package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Linkage

/** Streaming record linkage against a STATIC reference index — the
  * entity-resolution twin of NearDupStream: each arriving entity is
  * checked for ed<=1 name matches against an existing registry (the
  * "is this customer already in the master table under a mistyped id"
  * gate a 100 TB ingest runs per record).
  *
  * Entirely STATELESS: the incoming row derives its deletion-
  * neighborhood variants row-locally (the same U(k) kernel as the
  * batch self-join), stream-static equi-joins the pre-built variant
  * index, and verifies with levenshtein on the joined names. No state
  * store, no watermark; each micro-batch is an independent batch join,
  * so streamed matches are EXACTLY the batch join's rows
  * (LinkageStreamSpec proves equality including multiplicity — a pair
  * sharing several variants appears once per shared variant; the
  * terminal sink's grouping collapses it, exactly as the batch pair
  * query's dropDuplicates does).
  */
object LinkageStream {

  /** The static reference index: (ref_id, ref_name, variant) rows.
    * Build once from the registry and hand to [[matches]]. */
  def variantIndex(reference: DataFrame, idCol: String,
                   nameCol: String): DataFrame =
    Linkage.variantRows(reference, idCol, nameCol)
      .select(col("id").as("ref_id"), col("name").as("ref_name"),
        col("variant"))

  /** Streaming ed<=1 matches of incoming entities (`id`, `name`)
    * against the index: (id, ref_id, name, ref_name, dist) rows, one
    * per shared variant. Append output mode. */
  def matches(entities: DataFrame, index: DataFrame): DataFrame =
    Linkage.variantRows(entities, "id", "name")
      .join(index, Seq("variant"))
      .filter(col("id") =!= col("ref_id"))
      .withColumn("dist", levenshtein(col("name"), col("ref_name")))
      .filter(col("dist") <= 1)
      .select(col("id"), col("ref_id"), col("name"), col("ref_name"),
        col("dist").cast("long").as("dist"))
}
