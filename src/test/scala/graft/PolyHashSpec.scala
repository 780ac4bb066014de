package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.PolyHash

class PolyHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ref(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % PolyHash.Mod)

  test("polyhash matches the reference fold (codegen path)") {
    val d = Seq((1L, "hello world"), (2L, ""), (3L, "a"), (4L, "the quick brown fox"))
      .toDF("id", "text")
    val got = d.select($"id", PolyHash.polyhash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === ref("hello world"))
    assert(got(2L) === 0L)
    assert(got(3L) === ref("a"))
    assert(got(4L) === ref("the quick brown fox"))
  }

  test("polyhash is null-safe") {
    val d = Seq(Tuple1(Option.empty[String]), Tuple1(Some("x"))).toDF("text")
    val got = d.select(PolyHash.polyhash($"text").as("h")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getLong(0) === ref("x"))
  }

  test("polyhash runs interpreted too (eval parity with codegen)") {
    // wholestage off forces the interpreted/eval path
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val d = Seq(Tuple1("interpreted path")).toDF("text")
      val h = d.select(PolyHash.polyhash($"text")).collect()(0).getLong(0)
      assert(h === ref("interpreted path"))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
