package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Scale-safety plan assertions: fact tables (orders, customer) must never
  * carry a forced broadcast hint — a hint cannot be demoted by AQE, so at
  * 100x data it would ship the whole fact table to every executor. Only
  * true dimensions (nation, supplier) may be hint-broadcast.
  */
class RelationalPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def tbl(name: String) =
    spark.read.parquet(s"${TestSpark.Sf0001}/$name.parquet")

  /** Count broadcast join-strategy hints surviving into the optimized plan. */
  private def broadcastHints(df: org.apache.spark.sql.DataFrame): Int =
    "strategy=broadcast".r
      .findAllIn(df.queryExecution.optimizedPlan.toString).length

  /** Count BroadcastExchange operators in the physical plan when the size
    * threshold is too small for ANY size-based broadcast — every exchange
    * left is hint-forced. */
  private def forcedExchanges(mk: => org.apache.spark.sql.DataFrame): Int = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1")
      "BroadcastExchange".r
        .findAllIn(mk.queryExecution.executedPlan.toString).length
    } finally spark.conf.set(key, prev)
  }

  test("revenueByNation broadcasts only the nation dim, never orders/customer") {
    val df = Relational.revenueByNation(tbl("lineitem"), tbl("orders"),
      tbl("customer"), tbl("nation"))
    assert(broadcastHints(df) === 1) // nation only
    assert(forcedExchanges(Relational.revenueByNation(tbl("lineitem"),
      tbl("orders"), tbl("customer"), tbl("nation"))) === 1)
  }

  test("topCustomers carries no broadcast hint at all") {
    val df = Relational.topCustomers(tbl("lineitem"), tbl("orders"), tbl("customer"))
    assert(broadcastHints(df) === 0)
    assert(forcedExchanges(Relational.topCustomers(tbl("lineitem"),
      tbl("orders"), tbl("customer"))) === 0)
  }

  test("revenueRollup broadcasts only the nation dim") {
    val df = Relational.revenueRollup(tbl("lineitem"), tbl("orders"),
      tbl("customer"), tbl("nation"))
    assert(broadcastHints(df) === 1)
  }

  test("topSuppliersPerNation broadcasts only supplier and nation dims") {
    val df = Relational.topSuppliersPerNation(tbl("lineitem"), tbl("supplier"),
      tbl("nation"))
    assert(broadcastHints(df) === 2)
  }
}
