package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Contracts for the retention-cohort and event-transition matrices
  * (cross-engine value parity is the oracle gate; these pin the
  * algebra). */
class EventMatrixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev = Relational.eventsWithEpoch(spark, TestSpark.Sf0001)

  test("retention: offset-0 rows are exactly the cohort (retention 1.0)") {
    val rows = Relational.retentionCohorts(ev).collect()
    assert(rows.nonEmpty)
    val day0 = rows.filter(_.getAs[Long]("day_offset") == 0L)
    assert(day0.nonEmpty)
    day0.foreach { r =>
      assert(r.getAs[Long]("active_users") == r.getAs[Long]("cohort_users"))
      assert(r.getAs[Double]("retention") == 1.0)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cohort_users"))
      assert(r.getAs[Long]("day_offset") >= 0L)
    }
    // cohorts partition the user base
    val users = ev.select($"user_id").distinct().count()
    assert(day0.map(_.getAs[Long]("cohort_users")).sum == users)
  }

  test("transitions: rows sum to a stochastic matrix, mass = events - users") {
    val rows = Relational.eventTransitions(ev).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (_, rs) =>
      val p = rs.map(_.getAs[Double]("probability")).sum
      assert(math.abs(p - 1.0) < 1e-9)
    }
    val total = rows.map(_.getAs[Long]("transitions")).sum
    val events = ev.count()
    val users = ev.select($"user_id").distinct().count()
    assert(total == events - users)
  }
}
