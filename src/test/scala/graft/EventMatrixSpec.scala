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

  test("cohort/minute buckets FLOOR for pre-1970 epochs (no div truncation)") {
    // ts = -1 ns: floor gives epoch_s = -1 → cohort_day = -1, minute = -1;
    // truncating `div` would give 0 at every step. Pins the r6-verdict
    // bug class (q_cohort_revenue mirror divergence) engine-side.
    val neg = Seq(
      ("u1", "signup", 0.0, -1L),             // 1 ns before the epoch
      ("u1", "purchase", 19.99, 5L * 1000000000L),
      ("u2", "signup", 0.0, 86400L * 1000000000L),
      ("u2", "purchase", 1.00, 86400L * 1000000000L)
    ).toDF("user_id", "event_type", "value", "ts")
      .withColumn("epoch_s", expr("(ts - pmod(ts, 1000000000)) div 1000000000"))
    val cohorts = Relational.cohortRevenue(neg).collect()
      .map(r => r.getAs[Long]("cohort_day") -> r.getAs[Long]("cents")).toMap
    assert(cohorts == Map(-1L -> 1999L, 1L -> 100L))
    val minutes = Relational.eventsMinuteRollup(neg)
      .filter($"event_type" === "signup").collect()
      .map(_.getAs[Long]("minute")).toSet
    assert(minutes == Set(-1L, 1440L))
    // and the epoch_s derivation itself floors: -1 ns → second -1
    val es = Relational.eventsWithEpoch(spark, TestSpark.Sf0001)
    assert(es.schema.fieldNames.contains("epoch_s")) // smoke: unchanged shape
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
