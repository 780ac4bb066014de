package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.expressions.GraftExtensions

class SkewAndSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join equals the plain inner join on skewed data") {
    import spark.implicits._
    // 90% of rows on one hot key
    val big = (1 to 5000).map(i => (if (i % 10 == 0) s"k$i" else "hot", i.toLong))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B"), ("nomatch", "X"))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k")).select("k", "v", "label")
      .as[(String, Long, String)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", salt = 8)
      .select("k", "v", "label").as[(String, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.size === 4500 + 2)
  }

  test("polyhash and dot_product are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT polyhash('abc') AS h, dot_product(array(1.0F, 2.0F), array(3.0D, 4.0D)) AS d")
      .collect()(0)
    val expect = "abc".getBytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(r.getLong(0) === expect)
    assert(r.getDouble(1) === 11.0)
  }

  test("sketch and quantize kernels are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT size(min_hash_sig('abcdefgh')) AS ms, sim_hash_sig('a b c') AS ss, " +
        "array_max_abs(array(1.0F, -3.0F)) AS mx, " +
        "quantize_max_err(array(0.0F, 0.0F)) AS qe").collect()(0)
    assert(r.getInt(0) === graft.functions.Sketches.NumHashes)
    assert(r.getLong(1) !== 0L)
    assert(r.getDouble(2) === 3.0)
    assert(r.getDouble(3) === 0.0)
  }

  test("ngram_hashes SQL form validates its n argument") {
    GraftExtensions.register(spark)
    // happy path: a foldable integer literal (arithmetic folds too)
    assert(spark.sql("SELECT size(ngram_hashes('a b c', 2)) AS n")
      .collect()(0).getInt(0) === 2)
    // n = 0 / negative would index out of the token-boundary arrays
    for (bad <- Seq("0", "-3")) {
      val e = intercept[Exception](
        spark.sql(s"SELECT ngram_hashes('a b c', $bad)").collect())
      assert(e.getMessage.contains("must be >= 1"), e.getMessage)
    }
    // a non-foldable n would eval() an unbound attribute and mis-resolve
    val e2 = intercept[Exception](
      spark.sql("SELECT ngram_hashes('a b', length('xy') + id) FROM range(1)")
        .collect())
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
  }

  test("extensions class registers functions on a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // note: getOrCreate may return the existing session; register covers both
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT polyhash('x')").collect()(0).getLong(0) ===
      ("x".getBytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)))
  }
}
