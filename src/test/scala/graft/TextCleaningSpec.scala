package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextCleaning

class TextCleaningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cleanOne(s: String): String =
    Seq(Tuple1(s)).toDF("text")
      .select(TextCleaning.clean($"text")).collect()(0).getString(0)

  test("strips tags, keeps text") {
    assert(cleanOne("<p>hello <b>world</b></p>") === "hello world")
  }

  test("scrubs emails and phone-shaped digit runs") {
    assert(cleanOne("mail me at a.user+x@example.co.uk today")
      === "mail me at <EMAIL> today")
    assert(cleanOne("call +1 (555) 123-4567 now") === "call <PHONE> now")
    // short numbers survive (not phone-shaped)
    assert(cleanOne("room 42 on floor 3") === "room 42 on floor 3")
  }

  test("normalizes whitespace and control chars") {
    assert(cleanOne("a\t\tb\n\ncd") === "a b cd")
  }

  test("pipeline order: tag removal before whitespace collapse") {
    assert(cleanOne("x<br> <br>y") === "x y")
  }

  test("cleaning report over the (clean) fixture corpus is identity") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val r = TextCleaning.cleaningReport(docs)
    assert(r.filter($"changed").count() === 0)
    assert(r.count() === docs.count())
  }

  test("pii report counts families independently per source") {
    val docs = Seq(
      ("s1", "mail a@b.com and c@d.org today"),       // 2 emails
      ("s1", "call +1 (555) 123-4567 now"),           // 1 phone
      ("s1", "nothing to see"),
      ("s2", "host 10.2.0.4 only"),                   // 1 ip (too short for phone)
      ("s2", "quad 192.168.100.200 is phone-shaped")  // 1 ip AND 1 phone
    ).toDF("source", "text")
    val r = TextCleaning.piiReport(docs).orderBy($"source")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
    assert(r(0) === ("s1", 3L, 1L, 2L, 1L, 1L, 0L, 0L))
    assert(r(1) === ("s2", 2L, 0L, 0L, 1L, 1L, 2L, 2L))
  }

  test("redaction closes the audit: a re-scan of redacted text is clean") {
    val docs = Seq(
      (1L, "s1", "mail a@b.com and c@d.org today"),
      (2L, "s1", "call +1 (555) 123-4567 now"),
      (3L, "s1", "nothing to see"),
      (4L, "s2", "host 10.2.0.4 only"),
      (5L, "s2", "quad 192.168.100.200 is phone-shaped")
    ).toDF("doc_id", "source", "text")
    val red = TextCleaning.piiRedact(docs)
    val out = red.collect().map(x => x.getLong(0) ->
      (x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(out(1L) == (("mail <EMAIL> and <EMAIL> today", 2L, 0L, 0L)))
    assert(out(2L) == (("call <PHONE> now", 0L, 1L, 0L)))
    assert(out(3L) == (("nothing to see", 0L, 0L, 0L)))
    assert(out(4L) == (("host <IP> only", 0L, 0L, 1L)))
    // the phone stage runs before the IP stage, so a phone-shaped quad
    // is consumed as a phone — consistent with the audit's independent
    // per-class counts, which attribute it to both classes
    assert(out(5L) == (("quad <PHONE> is phone-shaped", 0L, 1L, 1L)))
    // audit∘apply residual: re-scanning the redacted corpus finds nothing
    val rescan = TextCleaning.piiReport(
        red.select($"doc_id", lit("s").as("source"),
          $"redacted_text".as("text")))
      .collect()(0)
    assert((rescan.getLong(3), rescan.getLong(5), rescan.getLong(7)) ==
      ((0L, 0L, 0L)), "redacted text still matches a PII pattern")
  }
}
