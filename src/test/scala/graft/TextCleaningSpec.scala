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
}
