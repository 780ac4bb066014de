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
    // and the production epoch_s derivation itself floors: a one-row
    // parquet with ts = -1 ns must yield second -1, not trunc's 0
    // (r7 ADVICE: the old assertion only checked schema shape)
    val dir = java.nio.file.Files.createTempDirectory("graft-negts")
      .toFile.getAbsolutePath
    Seq((1L, -1L, 7L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val es = Relational.eventsWithEpoch(spark, dir)
    assert(es.select($"epoch_s").as[Long].collect().toSeq == Seq(-1L))
  }

  test("nanos->micros conversions FLOOR for pre-1970 ts (asof tus)") {
    // ts = -1 ns: floor micros = -1; truncating `div` gave 0 — the same
    // divergence class vs DuckDB `//` as the bucket fix above, on the
    // micros paths (r7 ADVICE item 2). The click at exactly -1 s floors
    // to -1e6 micros; gap_s = (-1 - -1000000) div 1e6 = 0 (non-negative
    // by the as-of contract, so trunc == floor there).
    val negEv = Seq(
      (1L, "u", "purchase", 1.0, -1L),
      (2L, "u", "click", 0.2, -1000000000L)
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val asof = Relational.purchaseClickAsof(negEv).collect()
    assert(asof.length == 1)
    assert(asof(0).getAs[Long]("p_ts") == -1L, "purchase micros must floor")
    assert(asof(0).getAs[Long]("gap_s") == 0L)
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
