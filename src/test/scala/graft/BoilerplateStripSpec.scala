package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics

/** Boilerplate-strip apply half (r11 verdict item 4 — the detect→apply
  * closure for q_source_boilerplate, as ExcisionSpec is for dup spans).
  * Cross-engine value parity is the oracle gate (q_boilerplate_strip
  * hashes cleaned_text itself); these pin the contracts against an
  * INDEPENDENT in-memory reference (trigram STRINGS, no hashing — a
  * kernel hash bug cannot cancel out), the strip's effect on the
  * template fixture, the rollup consistency, and the plan shape. */
class BoilerplateStripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The q_source_boilerplate templated fixture: header on doc_id%2,
    * footer on %3 — per-source df ~50%/~33% clears the 25% floor. */
  private def templated = {
    val d = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    d.select(col("doc_id"), col("source"), concat(
      when(col("doc_id") % 2 === 0,
        lit("all rights reserved contact us for more info "))
        .otherwise(lit("")),
      col("text"),
      when(col("doc_id") % 3 === 0,
        lit(" subscribe to our newsletter for weekly updates"))
        .otherwise(lit(""))).as("text"))
  }

  private lazy val result = TextAnalytics
    .boilerplateStrip(templated, carry = Seq("source"))
    .collect()
    .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3), r.getLong(4),
      r.getLong(5)))
    .toMap

  /** Brute force over trigram STRINGS: per source, a trigram is
    * boilerplate when >= 3 of the source's docs contain it AND >= 25%
    * do; token t of a doc is covered iff some trigram window [p, p+2]
    * containing t is boilerplate for the doc's source. */
  private lazy val reference: Map[Long, (String, Long, Long, Long)] = {
    val corpus = templated.select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = corpus.map { case (id, src, text) =>
      val toks = text.split(" ", -1)
      (id, src, if (toks.length < 3) Set.empty[String]
                else toks.sliding(3).map(_.mkString(" ")).toSet)
    }
    val srcDocs = corpus.groupBy(_._2).view.mapValues(_.length).toMap
    val boiler: Map[String, Set[String]] = grams.groupBy(_._2).map {
      case (src, rows) =>
        val df = rows.flatMap(_._3).groupBy(identity).view.mapValues(_.size)
        src -> df.filter { case (_, n) =>
          n >= 3 && n.toDouble >= srcDocs(src) * 0.25 }.keySet.toSet
    }
    corpus.map { case (id, src, text) =>
      val toks = text.split(" ", -1)
      val b = boiler(src)
      val covered = (0 to toks.length - 3)
        .filter(p => b(toks.slice(p, p + 3).mkString(" ")))
        .flatMap(p => p to p + 2).toSet
      val kept = toks.indices.filterNot(covered)
      val cleaned = kept.map(toks).mkString(" ")
      def bytes(s: String) = s.getBytes("UTF-8").length.toLong
      id -> (cleaned, toks.length.toLong, kept.size.toLong,
        bytes(text) - bytes(cleaned))
    }.toMap
  }

  test("cleaned_text matches the trigram-string brute force bitwise") {
    assert(result.keySet == reference.keySet)
    for ((id, got) <- result) assert(got == reference(id), s"doc $id")
  }

  test("the injected header and footer are actually stripped") {
    val stripped = result.count { case (_, (_, n, kept, _)) => kept < n }
    // every %2 doc carries the header and every %3 doc the footer —
    // at least the union (2/3 of docs) must lose tokens
    assert(stripped >= result.size * 3 / 5,
      s"only $stripped/${result.size} docs lost tokens — detect side broken?")
    for ((id, (cleaned, _, _, _)) <- result) {
      if (id % 2 == 0)
        assert(!cleaned.contains("all rights reserved contact us"),
          s"doc $id kept its header")
      if (id % 3 == 0)
        assert(!cleaned.contains("subscribe to our newsletter"),
          s"doc $id kept its footer")
    }
  }

  test("a template-free corpus round-trips untouched") {
    import spark.implicits._
    // every trigram unique per source -> no boilerplate -> no excision
    val clean = Seq(
      (1L, "s1", "alpha beta gamma delta"),
      (2L, "s1", "epsilon zeta eta theta"),
      (3L, "s2", "iota kappa lambda mu")).toDF("doc_id", "source", "text")
    val out = TextAnalytics.boilerplateStrip(clean).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    assert(out(1L) == (("alpha beta gamma delta", 0L)))
    assert(out(2L) == (("epsilon zeta eta theta", 0L)))
    assert(out(3L) == (("iota kappa lambda mu", 0L)))
  }

  test("rollup is consistent with the per-doc frame") {
    val roll = TextAnalytics.excisionRollupOf(
      TextAnalytics.boilerplateStrip(templated, carry = Seq("source")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val srcOf = templated.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = result.toSeq.groupBy { case (id, _) => srcOf(id) }
    assert(roll.keySet == bySrc.keySet)
    for ((src, rows) <- bySrc) {
      val (docsN, before, removed, bytes, frac) = roll(src)
      assert(docsN == rows.size.toLong)
      assert(before == rows.map(_._2._2).sum)
      assert(removed == rows.map { case (_, (_, n, kept, _)) => n - kept }.sum)
      assert(bytes == rows.map(_._2._4).sum)
      assert(math.abs(frac - removed.toDouble / before) < 1e-15)
    }
  }

  test("plan shape: pinned shuffle-hash joins; only the source-count " +
      "dimension broadcasts") {
    val plan = TextAnalytics.boilerplateStrip(templated)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "expected the pinned shuffle-hash joins in the strip plan")
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(broadcasts <= 1,
      s"$broadcasts broadcast exchanges — a corpus-proportional side " +
        "was promoted beyond the source-count dimension")
  }
}
