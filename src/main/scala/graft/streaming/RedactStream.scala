package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.functions.TextCleaning

/** Streaming PII REDACTION — the twin of q_pii_redact
  * ([[graft.functions.TextCleaning.piiRedact]], r12 verdict item 4).
  *
  * The batch operator is a single row-local map stage (three chained
  * codegen'd regexp_replace calls plus the original-text match counts),
  * so the stream program IS the batch expression applied to an unbounded
  * frame: no watermark, no state operator of any kind — Structured
  * Streaming plans it as a stateless projection per micro-batch, and
  * RedactStreamSpec pins both the batch==stream bitwise equivalence
  * (arbitrary micro-batch boundaries) and the zero-state-operator plan.
  *
  * At 100 TB-rate ingest this is the ideal streaming shape: per-doc cost
  * is O(text) with no exchange, so throughput scales with cores and
  * nothing accumulates. */
object RedactStream {

  /** The stream program — deliberately the SAME function the batch
    * query runs ([[TextCleaning.piiRedact]]): output columns (doc_id,
    * redacted_text, emails, phones, ips), one row per arriving doc. */
  def redacted(docs: DataFrame): DataFrame = TextCleaning.piiRedact(docs)
}
