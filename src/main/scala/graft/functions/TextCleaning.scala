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
}
