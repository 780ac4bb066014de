package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two deterministically-dirtied corpora the audit→apply families
  * run on (PII scan/redact over injected emails/phones/IPs; boilerplate
  * detect/strip over injected per-source templates) — ONE source of
  * truth for the dirtying expressions (r12 verdict item 6: the
  * derivations lived inline in SparkEntry while the DuckDB oracle
  * mirrored the same expressions, which was the one place engine/oracle
  * independence thinned).
  *
  * Who consumes which form:
  *  - [[graft.tools.BenchAtScale]] MATERIALIZES both corpora as parquet
  *    fixture tables (`documents_pii.parquet`, `documents_templated
  *    .parquet`) in every scale-ladder corpus dir, so the bench/ladder
  *    rungs read the dirty text COLD from a fixture column — no query-
  *    time derivation in any committed rung number.
  *  - SparkEntry reads those fixture tables when the dir carries them
  *    and only falls back to these expressions for the driver's
  *    READ-ONLY testdata dirs (where no fixture can land); the DuckDB
  *    oracle mirrors the same expressions there, which the
  *    OracleContractSpec pins.
  */
object FixtureCorpora {

  /** Fixture table names a corpus dir may carry (generator-written). */
  val PiiTable = "documents_pii"
  val TemplatedTable = "documents_templated"

  /** The deterministically templated corpus (header on doc_id%2, footer
    * on %3 — per-source df ~50%/~33% clears the 25% boilerplate floor
    * while organic trigrams stay far below it) shared by the
    * boilerplate detect report and the strip family. */
  def templated(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), concat(
      when(col("doc_id") % 2 === 0,
        lit("all rights reserved contact us for more info "))
        .otherwise(lit("")),
      col("text"),
      when(col("doc_id") % 3 === 0,
        lit(" subscribe to our newsletter for weekly updates"))
        .otherwise(lit(""))).as("text"))

  /** The deterministically PII-dirtied corpus (emails on doc_id%3,
    * phones on %5, dotted quads on %7) shared by the PII audit and its
    * redaction apply half. */
  def piiDirty(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        lit(" call +1 (555) 123-4567")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string")))
        .otherwise(lit(""))).as("text"))
}
