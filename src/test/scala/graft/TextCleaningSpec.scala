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
}
