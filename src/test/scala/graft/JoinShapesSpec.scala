package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin, Relational}
import graft.functions.{CountSketch, TextAnalytics}

/** The two non-equi join shapes (as-of, point-in-interval) checked
  * against brute-force inequality-join references, plus plan assertions
  * that neither ever degenerates to the O(L*R) nested-loop/cartesian
  * plan Catalyst would pick for the naive encoding — that degeneration
  * is the whole reason these operators exist. CountSketch invariants
  * ride along (CMS never underestimates; linear counter never
  * overcounts buckets).
  */
class JoinShapesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events =
    Relational.eventsWithEpoch(spark, TestSpark.Sf0001)
  private def orders =
    spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
  private def docs =
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // --- as-of join ---

  test("asofJoin matches the brute-force greatest-right-ts-<=-left-ts reference") {
    val got = Relational.purchaseClickAsof(events)
    // reference: inequality join + max(click ts) per purchase + re-join
    val e = events.withColumn("tus", expr("ts div 1000"))
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"tus".as("p_ts"))
    val c = e.filter($"event_type" === "click")
      .groupBy($"user_id", $"tus")
      .agg(max($"event_id").as("click_id"), max_by($"value", $"event_id").as("click_value"))
      .select($"user_id".as("c_user"), $"tus".as("c_ts"), $"click_id", $"click_value")
    val best = p.join(c, $"user_id" === $"c_user" && $"c_ts" <= $"p_ts")
      .groupBy($"purchase_id").agg(max($"c_ts").as("best_ts"))
    val want = p
      .join(best, Seq("purchase_id"), "left")
      .join(c, $"user_id" === $"c_user" && $"c_ts" === $"best_ts", "left")
      .select($"purchase_id", $"user_id", $"p_ts", $"click_id", $"click_value",
        expr("(p_ts - c_ts) div 1000000").as("gap_s"))
    assert(got.count() === p.count()) // exactly one row per purchase
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("asofJoin is inclusive at equal timestamps and null before any right row") {
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 100L, "r100"), (1L, 60L, "r60"), (2L, 20L, "r20"))
      .toDF("k", "t", "rv")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", Seq("rv"))
      .orderBy($"k", $"t").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      Option(r.getString(3)))).toSeq === Seq(
      (1L, 50L, "b", None),          // before any right row -> null
      (1L, 100L, "a", Some("r100")), // equal ts -> right row visible
      (2L, 10L, "c", None)))         // right row strictly later -> null
  }

  test("asofJoin payload stays atomic when a right row carries a null field") {
    // regression (ADVICE r3): with per-column fill windows, rv2's null at
    // t=60 fell back to t=20's "x20" while rv1 came from t=60 — a payload
    // mixing two right rows. The struct fill must emit BOTH fields from
    // the matched (latest) right row, nulls included.
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "lv")
    val right = Seq((1L, 20L, "r20", "x20"),
        (1L, 60L, "r60", null.asInstanceOf[String]))
      .toDF("k", "t", "rv1", "rv2")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", Seq("rv1", "rv2"))
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(3) === "r60")
    assert(out(0).isNullAt(4),
      s"rv2 must be the matched row's null, not an older row's value: ${out(0)}")
  }

  test("asofJoin plans one key shuffle, no nested-loop and no broadcast") {
    val plan = physical(Relational.purchaseClickAsof(events))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastExchange"))
    // two exchanges total: the click-side (user, ts) dedup aggregate and
    // the single union-wide window shuffle on user_id — never a third
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 2)
    assert(plan.contains("Exchange hashpartitioning(user_id"))
  }

  // --- point-in-interval range join ---

  test("pointInInterval equals the naive inequality join, with no dup pairs") {
    val d = orders.select($"o_orderkey",
      expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").as("day"))
    val points = d.select($"o_orderkey".as("p_key"), $"day".as("pt"))
    val intervals = d.select($"o_orderkey".as("i_key"),
      ($"day" + 1L).as("lo"), ($"day" + 7L).as("hi"))
    val got = RangeJoin.pointInInterval(points, intervals, bucketWidth = 8L)
      .select($"p_key", $"i_key")
    val want = points.join(intervals, $"pt" >= $"lo" && $"pt" <= $"hi")
      .select($"p_key", $"i_key")
    assert(got.count() === want.count()) // no duplicate meetings
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("orderVelocity keeps zero-follower orders at (0, 0) and all orders present") {
    val out = Relational.orderVelocity(orders)
    assert(out.count() === orders.count())
    assert(out.filter($"following_urgent" === 0 && $"following_cents" =!= 0).isEmpty)
  }

  test("range join plans an equi-join on the bucket key, never a nested loop") {
    val plan = physical(Relational.orderVelocity(orders))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  // --- fixed-memory sketches ---

  test("CMS estimates never fall below the exact count") {
    val rows = CountSketch.cmsHeavyHitters(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"CMS underestimated ${r.getAs[String]("token")}")
    }
  }

  test("HLL registers bounded and raw estimate accurate past the LC regime") {
    val rows = CountSketch.hllDistinct(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("distinct_exact")
      val occ = r.getAs[Long]("occupied")
      assert(occ + r.getAs[Long]("zero_registers") === CountSketch.HllM)
      assert(occ <= exact && occ <= CountSketch.HllM)
      // raw estimator is the recommended one past 2.5m (below that the
      // linear-counting correction — deliberately OUT of the oracle
      // query, see scaladoc — would take over); 512 registers carry
      // ~4.6% standard error, assert a 5-sigma band
      if (exact >= (2.5 * CountSketch.HllM).toLong) {
        assert(math.abs(r.getAs[Double]("rel_err")) <= 0.23,
          s"HLL rel_err ${r.getAs[Double]("rel_err")} at exact=$exact")
      }
    }
  }

  test("bigram rarity: every score >= 1, bigram counts tie to token counts") {
    val out = TextAnalytics.bigramRarity(docs).collect()
    val nTok = docs.select($"doc_id",
      size(split($"text", " ")).cast("long").as("nt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length === nTok.count(_._2 >= 2))
    out.foreach { r =>
      // p is a convex combination of two probabilities <= 1, so the
      // inverse-probability mean can never fall below 1
      assert(r.getAs[Double]("bigram_rarity") >= 1.0 - 1e-9)
      assert(r.getAs[Long]("n_bigrams") === nTok(r.getAs[Long]("doc_id")) - 1)
    }
  }

  test("bigram rarity ranks scrambled text above natural repetition") {
    import spark.implicits._
    // one heavily repetitive doc vs one all-unique-transition doc on a
    // shared vocabulary: the LM must find the unique transitions rarer
    val corpus = Seq(
      (1L, ("ab " * 40).trim, "en", "s", 0L),
      (2L, (1 to 41).map(i => s"w$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextAnalytics.bigramRarity(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bigram_rarity")).toMap
    assert(m(2L) > m(1L))
  }

  test("linear counter occupancy bounds and estimate quality") {
    val rows = CountSketch.distinctSketch(docs).collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("distinct_exact")
      val occ = r.getAs[Long]("occupied")
      assert(occ <= exact && occ <= CountSketch.LcBuckets)
      // Whang estimator (ln stays OUT of the oracle query: libm parity
      // is not guaranteed; here a loose accuracy band is enough)
      val m = CountSketch.LcBuckets.toDouble
      val est = -m * math.log1p(-occ / m)
      assert(math.abs(est - exact) <= math.max(0.15 * exact, 8.0),
        s"linear-count estimate $est vs exact $exact")
    }
  }
}
