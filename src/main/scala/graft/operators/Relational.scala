package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** General relational analytics over the driver's TPC-H-ish tables and
  * the events stream table — the engine's bread-and-butter scan/filter/
  * join/aggregate/window surface, written scale-first:
  *
  *  - money sums run in DECIMAL (exact, order-independent) and surface as
  *    DOUBLE, so results are reproducible under any partitioning;
  *  - dimension joins are broadcast; fact-fact joins shuffle on the join
  *    key only after pre-aggregation where possible;
  *  - event-time arithmetic is integer epoch math (ts arrives as BIGINT
  *    nanos via the nanosAsLong parquet conf).
  */
object Relational {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary over lineitem. */
  def pricingSummary(li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") <= expr("timestamp'1998-09-02 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))

  /** Revenue per nation: lineitem joined through orders/customer/nation.
    * True dimensions (nation) broadcast; orders/customer are fact-sized and
    * carry NO broadcast hint — AQE picks broadcast vs shuffle-hash from
    * runtime sizes (a forced hint cannot be demoted and OOMs at 100x).
    * Revenue is pre-aggregated per order before the customer join so the
    * shuffle carries order-level rows, not line-level. */
  def revenueByNation(li: DataFrame, orders: DataFrame, customer: DataFrame,
                      nation: DataFrame): DataFrame = {
    val orderRev = li.groupBy(col("l_orderkey"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .as("order_rev"))
    orderRev.join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("order_rev")).cast("double").as("revenue"),
        countDistinct(col("o_custkey")).as("customers"),
        count(lit(1)).as("orders"))
  }

  /** TPC-H Q17-style small-quantity revenue: per brand, the revenue of
    * lineitems whose quantity is below 20% of that part's average — the
    * classic correlated scalar aggregate, decorrelated into a per-part
    * aggregate joined back on the same key. Both sides of the back-join
    * hash-partition on l_partkey (the aggregate's exchange is reusable),
    * the part dimension broadcasts, and revenue accumulates in DECIMAL
    * (double sums are order-dependent; quantity sums are exact because
    * quantities are integral). */
  def smallQuantityRevenue(li: DataFrame, part: DataFrame): DataFrame = {
    val lim = li.groupBy(col("l_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1)) * lit(0.2)).as("qty_limit"))
    li.join(lim, "l_partkey")
      .filter(col("l_quantity") < col("qty_limit"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(dec("l_extendedprice")).cast("double").as("small_qty_revenue"),
        count(lit(1)).as("line_count"))
  }

  /** Top-k customers by revenue (Q3-flavored). */
  def topCustomers(li: DataFrame, orders: DataFrame, customer: DataFrame,
                   k: Int = 10): DataFrame = {
    val orderRev = li.groupBy(col("l_orderkey"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .as("order_rev"))
    orderRev.join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("order_rev")).as("rev_d"), count(lit(1)).as("orders"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("rev_d").cast("double").as("revenue"),
        col("orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Revenue rollup over (nation, market segment) — grouping-sets surface.
    * Subtotal rows carry NULL dimension values, as in ANSI ROLLUP. */
  def revenueRollup(li: DataFrame, orders: DataFrame, customer: DataFrame,
                    nation: DataFrame): DataFrame = {
    val orderRev = li.groupBy(col("l_orderkey"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .as("order_rev"))
    orderRev.join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey"),
        col("c_mktsegment")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(sum(col("order_rev")).cast("double").as("revenue"),
        count(lit(1)).as("orders"))
  }

  /** Top-k suppliers by revenue within each nation — ranking-window
    * surface (row_number with a deterministic tiebreak). */
  def topSuppliersPerNation(li: DataFrame, supplier: DataFrame,
                            nation: DataFrame, k: Int = 3): DataFrame = {
    val supRev = li.groupBy(col("l_suppkey"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .as("rev_d"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("rev_d").desc, col("s_suppkey"))
    supRev.join(broadcast(supplier.select(col("s_suppkey"), col("s_name"),
        col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("n_name"), col("s_suppkey"), col("s_name"),
        col("rev_d").cast("double").as("revenue"), col("rnk").cast("long").as("rnk"))
  }

  /** Orders with at least one lineitem (left-semi / EXISTS shape), counted
    * per priority. */
  def orderPriorityCheck(li: DataFrame, orders: DataFrame): DataFrame =
    orders.join(li.select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** events with integer epoch-second column (ts is BIGINT nanos).
    * FLOOR division via pmod, not `div` (truncation toward zero): the
    * DuckDB mirror's `//` is floor, and the two differ for pre-1970
    * nanos — same bug class as the retentionCohorts r6 fix, applied
    * here once so every downstream second/minute/day bucket inherits
    * input-independent semantics. */
  def eventsWithEpoch(spark: SparkSession, dir: String): DataFrame =
    Snapshots.eventsRaw(spark, dir)
      .withColumn("epoch_s",
        expr("(ts - pmod(ts, 1000000000)) div 1000000000"))

  /** BIGINT nanos -> epoch MICROS with FLOOR semantics (pmod idiom):
    * DuckDB's `//` floors, Spark's `div` truncates toward zero, and the
    * two diverge for pre-1970 nanos — the same bug class the epoch_s
    * bucket fix above eliminated, applied to every ts->micros
    * conversion (r7 ADVICE). Downstream integer differences of these
    * micros (asof gap_s) are non-negative by construction, so their
    * plain `div` is already floor. */
  private def nanosToMicros: Column = expr("(ts - pmod(ts, 1000)) div 1000")

  /** Tumbling per-minute rollup per event type: counts + exact value sums
    * (DECIMAL accumulate, DOUBLE surface). */
  def eventsMinuteRollup(ev: DataFrame): DataFrame =
    ev.withColumn("minute", expr("(epoch_s - pmod(epoch_s, 60)) div 60"))
      .groupBy(col("event_type"), col("minute"))
      .agg(count(lit(1)).as("events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
        countDistinct(col("user_id")).as("users"))

  /** Sliding event-time windows (10 min size, 5 min slide) per event
    * type — Spark's native `window()` operator; each event lands in
    * exactly two epoch-aligned windows, which is what the oracle
    * mirrors by exploding the two qualifying starts. Counts and exact
    * DECIMAL value sums, keyed by epoch-second window start. */
  def slidingEventCounts(ev: DataFrame): DataFrame =
    ev.withColumn("tss", timestamp_micros(nanosToMicros))
      .groupBy(col("event_type"),
        window(col("tss"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("event_type"), unix_micros(col("w.start")).as("w_start"),
        col("events"), col("value_sum"))

  /** Event-time session windows per user (30-minute gap) — Spark's
    * native `session_window()`, the merge-on-overlap stateful window.
    * Emitted keys are exact epoch-micro session bounds (end = last
    * event + gap), so the oracle reproduces them with the gap-break
    * island construction: a session breaks when the gap is >= 30 min
    * (session_window's interval is [start, start + gap)). */
  def sessionWindows(ev: DataFrame): DataFrame =
    ev.withColumn("tss", timestamp_micros(nanosToMicros))
      .groupBy(col("user_id"), session_window(col("tss"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("events"),
        countDistinct(col("event_type")).as("event_types"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s_start"),
        unix_micros(col("w.end")).as("s_end"), col("events"), col("event_types"))

  /** Signup-cohort revenue via the SALTED join ([[SkewJoin]]): the
    * purchase fact side gets a random salt and the per-user cohort
    * dimension replicates `salt` times, spreading any hot user over
    * `salt` tasks — the manual skew guard when AQE's runtime split
    * isn't enough. Salting is plan-level only: results are identical
    * to the plain equi-join (which is exactly what the DuckDB oracle
    * runs — the driver gate doubles as the salting equivalence proof).
    * Money is converted once per row with round(value * 100) — the
    * half-up cents convention, mirrored verbatim in the oracle (a
    * floor() here was REJECTED: IEEE 19.99 * 100 = 1998.999..., so
    * floor silently dropped a cent) — and accumulates as BIGINT. */
  def cohortRevenue(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("cents"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      // FLOOR day bucket (pmod idiom), mirroring DuckDB `//` — `div`
      // truncates toward zero and diverges for pre-1970 signups.
      .agg(min(expr("(epoch_s - pmod(epoch_s, 86400)) div 86400"))
        .as("cohort_day"))
    SkewJoin.saltedInnerJoin(purchases, cohort, "user_id", salt = 8)
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("purchases"), sum(col("cents")).as("cents"),
        countDistinct(col("user_id")).as("buyers"))
  }

  /** Trailing-window anomaly detection on the per-minute money stream,
    * per event type: a minute is anomalous when its cents total sits
    * more than `zLimit` sample standard deviations from the trailing
    * `trailing` observed minutes' mean. Everything before the final
    * z-score is EXACT integer arithmetic AFTER the one per-row
    * round(value * 100) cents conversion (per-minute cents sums, window
    * sums of cents and cents², all BIGINT — magnitudes stay far below
    * 2^53 so even the double conversions are exact), and IEEE sqrt /
    * division are correctly rounded — so the z-score is reproducible
    * bit-for-bit on any engine and partitioning. One aggregation plus
    * one per-type ordered window (trailing = OBSERVED minutes, a ROWS
    * frame — empty minutes don't exist in the stream). */
  def eventAnomalies(ev: DataFrame, trailing: Int = 10, minPrior: Int = 5,
                     zLimit: Double = 3.0): DataFrame = {
    val perMin = ev.withColumn("minute",
        expr("(epoch_s - pmod(epoch_s, 60)) div 60"))
      .groupBy(col("event_type"), col("minute"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("minute"))
      .rowsBetween(-trailing, -1)
    perMin
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("ss", sum(col("cents") * col("cents")).over(w))
      .filter(col("k") >= minPrior)
      .withColumn("mean", col("s").cast("double") / col("k"))
      .withColumn("variance",
        greatest(col("ss").cast("double") / col("k") - col("mean") * col("mean"),
          lit(1e-6)))
      .withColumn("z",
        round((col("cents").cast("double") - col("mean")) / sqrt(col("variance")), 9))
      .filter(abs(col("z")) > zLimit)
      .select(col("event_type"), col("minute"), col("cents"), col("z"))
  }

  /** Two-stage funnel: users who signed up, and of those, users with a
    * purchase at-or-after their first signup. Stage joins stay on
    * user_id — one shuffle key end to end. */
  def signupPurchaseFunnel(ev: DataFrame): DataFrame = {
    val total = ev.agg(countDistinct(col("user_id")).as("total_users"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("epoch_s")).as("signup_ts"))
    val converted = su.join(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("epoch_s")), Seq("user_id"))
      .filter(col("epoch_s") >= col("signup_ts"))
      .select(col("user_id")).distinct()
    total
      .crossJoin(su.agg(count(lit(1)).as("signed_up")))
      .crossJoin(converted.agg(count(lit(1)).as("converted")))
      .withColumn("conversion_pct",
        col("converted") * lit(100.0) / nullif(col("signed_up"), lit(0L)))
  }

  /** Customer re-order cadence: per customer with 2+ orders, the total
    * and mean day gap between consecutive orders — the lag-window
    * pattern. Gaps are integral day counts, so sums and the mean are
    * exact; the window partitions per customer (no global sort). */
  def orderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("orders"), sum(col("gap_days")).as("total_gap_days"))
      .filter(col("orders") >= 2)
      .withColumn("avg_gap_days",
        col("total_gap_days").cast("double") / (col("orders") - lit(1L)))
  }

  /** For each purchase event, the user's most recent click at-or-before
    * the purchase — attribution's "last touch" query, an as-of join
    * ([[AsofJoin]]). The click side is first reduced to one row per
    * (user, ts) with the max event_id winning (the as-of contract;
    * nanosecond ties are near-impossible but the dedup makes the result
    * deterministic on every engine). Timestamps are BIGINT epoch MICROS
    * (integer math end to end) — micros, not the parquet nanos, because
    * DuckDB timestamps are micro-resolution and the oracle must order
    * by the same clock the engine does. */
  def purchaseClickAsof(ev: DataFrame): DataFrame = {
    val e = ev.withColumn("tus", nanosToMicros)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("tus"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("tus"))
      .agg(max(col("event_id")).as("click_id"),
        max_by(col("value"), col("event_id")).as("click_value"))
      .withColumn("click_tus", col("tus"))
    AsofJoin.asofJoin(purchases, clicks, Seq("user_id"), "tus",
        Seq("click_id", "click_value", "click_tus"))
      .select(col("purchase_id"), col("user_id"), col("tus").as("p_ts"),
        col("click_id"), col("click_value"),
        expr("(tus - click_tus) div 1000000").as("gap_s"))
  }

  /** Order velocity: for each order, how many URGENT-priority orders —
    * and how much money — landed in the 7 days after it. A point-in-
    * interval self range join ([[RangeJoin]]): intervals are
    * (day+1 .. day+7] per order, points are the urgent orders' days;
    * bucket width 8 ≥ span, so each interval replicates to at most two
    * buckets. Money accumulates as integer cents (round(price * 100),
    * the half-up convention) — BIGINT sums are order-free on any
    * partitioning.
    *
    * Because both measures are ADDITIVE and the bounds are day-granular,
    * the point side collapses to one row per day before the join (count
    * + cents per day) — the joined row count drops from |orders| x
    * avg-matches (~13M at sf0.1) to |orders| x 7 day-rows, and the tiny
    * day aggregate is a natural AQE broadcast (no hint: its size is
    * bounded by the time span, which is not ours to promise). Measured
    * at sf0.1: 7.4 s -> sub-second, identical result. */
  def orderVelocity(orders: DataFrame): DataFrame = {
    val d = orders.select(col("o_orderkey"), col("o_orderpriority"),
      expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").as("day"),
      round(col("o_totalprice") * lit(100), 0).cast("long").as("cents"))
    val points = d.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("d_cnt"), sum(col("cents")).as("d_cents"))
      .select(col("day").as("pt"), col("d_cnt"), col("d_cents"))
    val intervals = d.select(col("o_orderkey"),
      (col("day") + lit(1L)).as("lo"), (col("day") + lit(7L)).as("hi"))
    val hits = RangeJoin.pointInInterval(points, intervals, bucketWidth = 8L)
      .groupBy(col("o_orderkey"))
      .agg(sum(col("d_cnt")).as("following_urgent"), sum(col("d_cents")).as("following_cents"))
    d.select(col("o_orderkey")).join(hits, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("following_urgent"), lit(0L)).as("following_urgent"),
        coalesce(col("following_cents"), lit(0L)).as("following_cents"))
  }

  /** Z-order cell map of orders over (order day, customer): each cell
    * is a 256x256 rectangle of the 2-D key space on this fixture (the
    * 31-bit-per-dimension interleave never aliases larger key domains), and the report shows every cell's
    * bounding box — the statistics a z-ordered layout exposes to file
    * skipping ([[graft.sources.ZOrderLayout]]; the layout itself is
    * proven tighter than a 1-D sort in ZOrderSpec). One hash
    * aggregation over row-local integer bit arithmetic. */
  def zorderCells(orders: DataFrame): DataFrame = {
    val d = orders.select(
      expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").as("day"),
      col("o_custkey"))
    d.withColumn("cell", shiftright(
        graft.sources.ZOrderLayout.interleave31(col("day"), col("o_custkey")), 16))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("orders"),
        min(col("day")).as("day_lo"), max(col("day")).as("day_hi"),
        min(col("o_custkey")).as("cust_lo"), max(col("o_custkey")).as("cust_hi"))
  }

  /** Semi-structured property extraction: parse the events' JSON `props`
    * column row-locally (get_json_object — Catalyst's codegen'd JSON-path
    * evaluator, no UDF) and roll the extracted numeric key up per event
    * type. At 100 TB the JSON strings never shuffle — the parse is fused
    * into the scan and only (event_type, k) pairs reach the exchange
    * (partial aggregation first). Exact integer aggregates only, so the
    * result is partitioning-independent. */
  def propsExtract(ev: DataFrame): DataFrame =
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"),
        count(col("k")).as("with_k"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        countDistinct(col("k")).as("k_distinct"))

  /** Key-skew diagnostic over the event stream — the report that decides
    * whether a downstream user-keyed join needs salting ([[SkewJoin]])
    * before it runs: per event type, total events, distinct users, the
    * hottest user's count, and how much of the volume the top-N users
    * carry.
    *
    * Shape at 100 TB: one partial-agg'd (event_type, user_id) rollup;
    * totals are a second tiny aggregation; the top-N side filters
    * rnk <= N directly after row_number so Spark plans it as
    * WindowGroupLimit — a map-side per-partition top-N BELOW the
    * exchange, so the window never sorts a whale partition. The final
    * join is broadcast (|event_type| rows). */
  def keySkew(ev: DataFrame, topN: Int = 10): DataFrame = {
    val per = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val tot = per.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("events"), count(lit(1)).as("users"),
        max(col("cnt")).as("max_user_events"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cnt").desc, col("user_id"))
    val top = per.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .groupBy(col("event_type")).agg(sum(col("cnt")).as("topn_events"))
    tot.join(broadcast(top), Seq("event_type"))
      .select(col("event_type"), col("events"), col("users"),
        col("max_user_events"), col("topn_events"),
        (col("topn_events").cast("double") / col("events").cast("double"))
          .as("topn_share"),
        (col("events").cast("double") / col("users").cast("double"))
          .as("avg_user_events"))
  }

  /** Sessionization: a session break is a >30min gap per user; returns
    * per-user session/event counts and mean session length in events.
    * One window over (user, time) — a single shuffle on user_id. */
  def sessionize(ev: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s"), col("event_id"))
    ev.withColumn("prev_s", lag(col("epoch_s"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_s").isNull || col("epoch_s") - col("prev_s") > gapSeconds, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("sessions"), count(lit(1)).as("events"))
      .withColumn("events_per_session",
        col("events").cast("double") / col("sessions"))
  }

  /** Weekly-style retention matrix on day granularity: users cohorted by
    * their FIRST active day, then (cohort_day, day_offset) active-user
    * counts with the retention rate vs the cohort's size.
    *
    * Shape at 100 TB: the event stream is pre-aggregated to DISTINCT
    * (user_id, day) rows before anything else (one exchange on user),
    * the first-day derivation is a window over those day-level rows
    * (NOT raw events), and the output is |days|^2/2-bounded. Cohort
    * sizes are a tiny rollup broadcast back onto the matrix. */
  def retentionCohorts(ev: DataFrame): DataFrame = {
    // FLOOR division, not `div` (truncation toward zero): the two differ
    // for negative epochs (pre-1970 timestamps), and the DuckDB mirror's
    // `//` is floor — the day bucket must be input-independent, not
    // fixture-positive by luck. pmod keeps it integer-exact.
    val userDays = ev
      .select(col("user_id"),
        expr("(epoch_s - pmod(epoch_s, 86400)) div 86400").as("day"))
      .distinct()
    val byUser = Window.partitionBy(col("user_id"))
    val offsets = userDays
      .withColumn("cohort_day", min(col("day")).over(byUser))
      .select(col("user_id"), col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
    val cohortSizes = offsets.filter(col("day_offset") === 0)
      .groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_users"))
    offsets.groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(cohortSizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("active_users"),
        col("cohort_users"),
        (col("active_users").cast("double") / col("cohort_users").cast("double"))
          .as("retention"))
  }

  /** First-order event-type transition matrix (the Markov-chain view of
    * user behavior): per user, consecutive event pairs in (epoch_s,
    * event_id) order, counted into (prev_type, event_type) cells with
    * the per-prev transition probability.
    *
    * Shape at 100 TB: ONE window shuffle on user_id (the sessionize
    * exchange), then a map-side-combined aggregation to |types|^2
    * cells; the probability join is a |types|-row broadcast. */
  def eventTransitions(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s"), col("event_id"))
    val pairs = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("transitions"))
    val totals = pairs.groupBy(col("prev_type"))
      .agg(sum(col("transitions")).as("from_total"))
    pairs.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("transitions"),
        (col("transitions").cast("double") / col("from_total").cast("double"))
          .as("probability"))
  }
}
