package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs every declared query at sf0.001 — the regression net ensuring the
  * whole SparkEntry surface stays executable. */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without a query: $extra")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, TestSpark.Sf0001).count()
      assert(n >= 0)
    }
  }
}
