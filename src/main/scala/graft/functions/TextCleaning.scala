package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text normalization / scrubbing for training-data prep — row-local
  * column expressions (single map stage at any scale, fully inside
  * whole-stage codegen). Regexes are kept to the syntax subset that
  * behaves identically under Java regex and RE2.
  */
object TextCleaning {

  /** Drop HTML/XML tags. */
  def stripHtml(c: Column): Column = regexp_replace(c, "<[^>]*>", "")

  /** Collapse runs of whitespace to single spaces and trim. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "[ \\t\\r\\n]+", " "))

  /** Remove ASCII control characters (except the whitespace handled
    * above). */
  def stripControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")

  /** PII scrub: emails and long digit runs (phone/card shaped) masked. */
  def scrubPii(c: Column): Column = {
    val noEmail = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "\\+?[0-9][0-9 ()+.-]{7,}[0-9]", "<PHONE>")
  }

  /** The full cleaning pipeline in canonical order: tags out first (their
    * removal may create whitespace runs), then control chars, PII, and
    * whitespace normalization last. */
  def clean(c: Column): Column =
    normalizeWhitespace(scrubPii(stripControlChars(stripHtml(c))))

  /** Cleaning impact report per document. */
  def cleaningReport(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      length(col("text")).cast("long").as("raw_len"),
      length(clean(col("text"))).cast("long").as("clean_len"))
      .withColumn("changed", col("raw_len") =!= col("clean_len"))

  /** PII patterns for the exposure report — the same RE2-safe email and
    * phone regexes [[scrubPii]] masks, plus a dotted-quad IPv4. The
    * families are counted INDEPENDENTLY (a dotted quad long enough to be
    * phone-shaped counts in both families — a report convention, not a
    * classification). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9 ()+.-]{7,}[0-9]"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Per-source PII exposure: how many documents carry each PII family
    * and how many total mentions — the audit that decides which feeds
    * need scrubbing before training (the reference reports governance
    * compliance per resource; this is the same rollup shape over text
    * content). Row-local regexp_count per document then one hash
    * aggregation on source — a single map stage plus one
    * source-cardinality exchange at any corpus size. */
  /** PII REDACTION — the apply half of [[piiReport]] (the audit says
    * which feeds leak; this scrubs them before training): emails, phone
    * numbers, and dotted quads replaced with typed placeholders, chained
    * in the audit's class order (email -> phone -> IP). The placeholders
    * contain no digits, so a replacement can never mint a later-stage
    * match; a dotted quad that also satisfies the phone pattern is
    * consumed by the phone stage — consistent with [[piiReport]], whose
    * independent per-class counts attribute it to both classes. Per-doc
    * match counts (on the ORIGINAL text, as the audit counts) ride
    * along so a savings rollup needs no second scan. Row-local — one
    * map stage at any corpus size. */
  def piiRedact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
        Ipv4Pattern, "<IP>").as("redacted_text"),
      regexp_count(col("text"), lit(EmailPattern)).cast("long").as("emails"),
      regexp_count(col("text"), lit(PhonePattern)).cast("long").as("phones"),
      regexp_count(col("text"), lit(Ipv4Pattern)).cast("long").as("ips"))

  def piiReport(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        regexp_count(col("text"), lit(EmailPattern)).cast("long").as("emails"),
        regexp_count(col("text"), lit(PhonePattern)).cast("long").as("phones"),
        regexp_count(col("text"), lit(Ipv4Pattern)).cast("long").as("ips"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("emails") > 0, 1L).otherwise(0L)).as("email_docs"),
        sum(col("emails")).as("emails"),
        sum(when(col("phones") > 0, 1L).otherwise(0L)).as("phone_docs"),
        sum(col("phones")).as("phones"),
        sum(when(col("ips") > 0, 1L).otherwise(0L)).as("ip_docs"),
        sum(col("ips")).as("ips"))
}
