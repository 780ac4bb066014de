package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage: edit-distance similarity self-join via deletion
  * neighborhoods (the FastSS family — Bocek et al. 2007, "Fast Similarity
  * Search in Large Dictionaries").
  *
  * The naive edit-distance join is quadratic per block; classic blocking
  * (same nation, same length) merely caps the constant. Deletion-
  * neighborhood blocking is exact AND linear for distance 1 on
  * equal-length keys: two strings at substitution distance 1 that differ
  * only at position p produce the IDENTICAL deletion variant at p (and at
  * no other position), so emitting the |key| deletion variants of every
  * row and self-joining on (position, variant) yields each true pair
  * exactly once, with zero false candidates at equal length — the
  * levenshtein verify is kept as the operator's semantic guard for the
  * general (cross-length) case.
  *
  * Shape at 100 TB: one exchange on (pos, variant). Row replication is
  * |key| (9 here) short strings; for a fixed position, a bucket can hold
  * at most |alphabet| distinct keys (each member fixes every character
  * except the deleted one), so per-bucket pair work is bounded by
  * C(|alphabet|, 2) — no whale buckets, candidates provably linear in
  * rows. Compare the reference's single-process pandas scans
  * (kafka_overwatch/processing/: no linkage op — this is pipeline
  * breadth beyond the reference).
  */
object Linkage {

  /** ed<=1 name pairs over a (id, name, nation) entity table whose match
    * key is the trailing `keyLen` characters (the TPC-H name's 9-digit
    * suffix). Returns one row per unordered pair, found-once by
    * construction (no distinct needed: equal variants at two different
    * positions would force the names equal, excluded by id1 < id2). */
  def editDistancePairs(entities: DataFrame, idCol: String, nameCol: String,
                        nationCol: String, keyLen: Int = 9): DataFrame = {
    val base = entities.select(
      col(idCol).as("id"), col(nameCol).as("name"),
      col(nationCol).cast("int").as("nation"),
      expr(s"substring($nameCol, length($nameCol) - ${keyLen - 1}, $keyLen)")
        .as("k"))
    // |keyLen| deletion variants per row; pos rides in the join key so
    // variants from different positions never meet.
    val variants = base
      .select(col("id"), col("name"), col("nation"),
        explode(sequence(lit(1), lit(keyLen))).as("pos"), col("k"))
      .select(col("id"), col("name"), col("nation"), col("pos"),
        concat(col("k").substr(lit(1), col("pos") - 1),
          col("k").substr(col("pos") + 1, lit(keyLen))).as("variant"))
    val a = variants.select(col("pos"), col("variant"), col("id").as("id1"),
      col("name").as("name1"), col("nation").as("nation1"))
    val b = variants.select(col("pos"), col("variant"), col("id").as("id2"),
      col("name").as("name2"), col("nation").as("nation2"))
    a.join(b, Seq("pos", "variant"))
      .filter(col("id1") < col("id2"))
      // equal-length pairs are found at exactly one position, but keys
      // of DIFFERENT lengths (mixed-width id spaces, e.g. the scale
      // ladder's strided keys) can collide at every position — dedupe
      // on the pair id before the verify so the output stays a set
      .select(col("id1"), col("id2"), col("name1"), col("name2"),
        col("nation1"), col("nation2"))
      .dropDuplicates("id1", "id2")
      .withColumn("dist", levenshtein(col("name1"), col("name2")))
      .filter(col("dist") <= 1)
      .select(col("id1"), col("id2"), col("name1"), col("name2"),
        col("dist").cast("long").as("dist"),
        (col("nation1") === col("nation2")).as("same_nation"))
  }
}
