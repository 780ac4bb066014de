package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.FixtureCorpora

/** The dirty-fixture read path (r12 verdict item 6): a corpus dir
  * carrying generator-written `documents_pii.parquet` /
  * `documents_templated.parquet` must be read COLD by the audit→apply
  * queries — the bench/ladder evidence depends on the fixture tables
  * actually being used, not silently re-derived. Pins: (1) a
  * generator-faithful fixture dir produces bitwise the same results as
  * the read-only-testdata derivation fallback, (2) the fixture takes
  * PRECEDENCE over the derivation (a poisoned fixture shows up in the
  * output), which also proves (1) is not vacuous. */
class FixtureCorporaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  /** A corpus dir with documents + the two fixture tables, `poison`
    * optionally rewriting one PII-fixture doc's text to a sentinel.
    * REBUILT on every suite run — reusing on bare existence would read
    * a fixture minted by an older FixtureCorpora (the exact
    * bare-existence trap ladder_refresh keys content hashes against),
    * failing the equivalence test spuriously after a derivation edit. */
  private def fixtureDir(name: String, poison: Boolean,
                         marker: Boolean = true): String = {
    val dir = s"/tmp/graft_fixture_spec_$name"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pii = FixtureCorpora.piiDirty(docs)
    val piiOut =
      if (poison) pii.withColumn("text",
        when(col("doc_id") === 0, lit("poisoned fixture sentinel"))
          .otherwise(col("text")))
      else pii
    piiOut.write.mode("overwrite")
      .parquet(s"$dir/${FixtureCorpora.PiiTable}.parquet")
    FixtureCorpora.templated(docs).write.mode("overwrite")
      .parquet(s"$dir/${FixtureCorpora.TemplatedTable}.parquet")
    // the corpus-dir completion marker ladder_refresh writes after
    // BenchAtScale finishes — the fixture read path is gated on it
    val m = new java.io.File(dir, "_SUCCESS")
    if (marker) {
      val w = new java.io.PrintWriter(m, "UTF-8")
      try w.println("spec-fixture") finally w.close()
    } else m.delete()
    dir
  }

  private def rows(q: String, dir: String): Seq[Seq[Any]] =
    SparkEntry.queries(q)(spark, dir).collect().map(_.toSeq.toVector).toSeq

  test("a generator-faithful fixture dir == the derivation fallback bitwise") {
    val dir = fixtureDir("clean", poison = false)
    for (q <- Seq("q_pii_redact", "q_pii_scan", "q_boilerplate_strip",
        "q_boilerplate_rollup")) {
      assert(rows(q, dir) == rows(q, TestSpark.Sf0001),
        s"$q diverged between fixture read and derivation fallback")
    }
  }

  test("the fixture table takes precedence over the derivation") {
    val dir = fixtureDir("poison", poison = true)
    val redacted = SparkEntry.queries("q_pii_redact")(spark, dir)
      .filter(col("doc_id") === 0).collect()
    assert(redacted.length == 1 &&
      redacted(0).getString(1) == "poisoned fixture sentinel",
      "q_pii_redact ignored the fixture table — the cold-read path is dead")
  }

  test("a fixture dir without the _SUCCESS marker falls back to the derivation") {
    // r13 ADVICE 2: precedence is absolute only for COMPLETE corpora —
    // a fixture dir missing the completion marker (an interrupted
    // manual BenchAtScale run, a partial copy) must not be preferred.
    // The poisoned fixture is present but unmarked, so the clean
    // derivation must win.
    val dir = fixtureDir("unmarked", poison = true, marker = false)
    val redacted = SparkEntry.queries("q_pii_redact")(spark, dir)
      .filter(col("doc_id") === 0).collect()
    assert(redacted.length == 1 &&
      redacted(0).getString(1) != "poisoned fixture sentinel",
      "an unmarked (possibly partial) fixture dir was read over the derivation")
  }
}
