package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.LongType
import graft.sources.Snapshots

/** Fixture-schema canary: the driver regenerates /root/testdata between
  * rounds and has drifted column encodings before (r4: events.ts went
  * TIMESTAMP(NANOS) → timestamp[us], silently breaking 8 queries as 12
  * scattered AnalysisExceptions). This spec pins the fixture contract in
  * ONE place: every table opens, carries its canonical columns, and the
  * engine's normalization layer (Snapshots.eventsRaw) still lands events.ts
  * on BIGINT nanos. A future drift fails here first, naming the column.
  *
  * Footer-only reads (schema + one tiny aggregate on events) — fast at
  * every sf. */
class FixtureCanarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val contract: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Set("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  private val sfDirs = Seq(TestSpark.Sf0001, TestSpark.Sf001, TestSpark.Sf01)
    .filter(d => new java.io.File(d).isDirectory)

  for (dir <- sfDirs; (table, cols) <- contract.toSeq.sortBy(_._1)) {
    test(s"$dir/$table carries its canonical columns") {
      val actual = spark.read.parquet(s"$dir/$table.parquet").columns.toSet
      val missing = cols -- actual
      assert(missing.isEmpty,
        s"fixture drift in $table: missing/renamed column(s) $missing " +
          s"(present: ${actual.toSeq.sorted.mkString(", ")})")
    }
  }

  for (dir <- sfDirs) {
    test(s"$dir events.ts normalizes to BIGINT nanos via eventsRaw") {
      val ev = Snapshots.eventsRaw(spark, dir)
      val dt = ev.schema("ts").dataType
      assert(dt == LongType,
        s"eventsRaw must land ts on BIGINT nanos; got $dt — the fixture's " +
          "ts encoding drifted past Snapshots.eventsRaw's adaptive read")
      // unit check, not just type check: a seconds/millis/micros value
      // mis-scaled into the nanos column is the silent flavor of this bug.
      // Any date between 2000 and 2100 in nanos is ~9.5e17..4.1e18.
      val row = ev.selectExpr("min(ts)", "max(ts)", "count(*)").head()
      val (lo, hi, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(n > 0, "events fixture is empty")
      assert(lo > 9.4e17.toLong && hi < 4.2e18.toLong,
        s"events.ts range [$lo, $hi] is not nanos-scale epoch — unit drift " +
          "in the normalization (seconds~1e9, millis~1e12, micros~1e15)")
    }
  }
}
