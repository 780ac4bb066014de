package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test
import graft.operators.{Linkage, Sampling}

/** Property tests for the linkage/sampling kernels over RANDOM inputs —
  * the fixture's regular key patterns (zero-padded sequential ids) are
  * exactly the kind of structure a blocking-scheme bug could hide
  * behind. Case counts are small: every case runs real Spark jobs. */
object LinkagePropsSpec extends Properties("graft.linkage") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // random digit keys of MIXED lengths (3-6), dense enough to collide
  private val namesGen: Gen[List[String]] = for {
    n <- Gen.choose(15, 40)
    keys <- Gen.listOfN(n, for {
      len <- Gen.choose(3, 6)
      ds <- Gen.listOfN(len, Gen.numChar)
    } yield ds.mkString)
  } yield keys.distinct.map(k => s"Ent#$k")

  property("editDistancePairs == brute force on random mixed-width keys") =
    forAll(namesGen) { names =>
      val ents = names.zipWithIndex.map { case (nm, i) => (i.toLong, nm, i % 3) }
        .toDF("id", "name", "nation")
      val got = Linkage.editDistancePairs(ents, "id", "name", "nation")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        i <- names.indices; j <- (i + 1) until names.length
        if lev(names(i), names(j)) <= 1
      } yield (i.toLong, j.toLong)).toSet
      got == want
    }

  // the adversarial class the digit-only generator above never produces:
  // a mid-run non-digit corruption changes what the key extractor SEES
  // ("Ent#123" vs "Ent#1X3" extracts "123" vs "3"), so that true ed=1
  // pair is legitimately unreachable by this blocking. The contract is:
  // emitted == (true ed<=1) ∩ (keys share a deletion variant) — recall
  // conditional on extraction-stable edits, precision unconditional.
  private val corruptedNamesGen: Gen[List[String]] = for {
    base <- namesGen
    corrupted <- Gen.sequence[List[String], String](base.map { nm =>
      Gen.frequency(
        3 -> Gen.const(nm),
        2 -> (for {
          pos <- Gen.choose(4, nm.length - 1) // inside the digit run
          c <- Gen.oneOf('X', 'Q', '#')
        } yield nm.updated(pos, c)))
    })
  } yield corrupted.distinct

  private def trailingDigits(s: String): String = {
    val m = "([0-9]+)$".r.findFirstMatchIn(s)
    m.map(_.group(1)).getOrElse("")
  }
  private def variantSet(s: String): Set[String] = {
    val k = trailingDigits(s)
    if (k.isEmpty) Set.empty
    else Set(k) ++ k.indices.map(i => k.take(i) + k.drop(i + 1))
  }

  property("corrupted keys: emitted == ed<=1 ∩ variant-intersecting (and ⊆ ed<=1)") =
    forAll(corruptedNamesGen) { names =>
      val ents = names.zipWithIndex.map { case (nm, i) => (i.toLong, nm, i % 3) }
        .toDF("id", "name", "nation")
      val got = Linkage.editDistancePairs(ents, "id", "name", "nation")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val trueEd1 = (for {
        i <- names.indices; j <- (i + 1) until names.length
        if lev(names(i), names(j)) <= 1
      } yield (i.toLong, j.toLong)).toSet
      val blocked = trueEd1.filter { case (i, j) =>
        variantSet(names(i.toInt)).intersect(variantSet(names(j.toInt))).nonEmpty
      }
      got.subsetOf(trueEd1) && got == blocked
    }

  property("sample membership is a pure function of the id (any stratum mix)") =
    forAll(Gen.listOfN(30, Gen.choose(0L, Long.MaxValue / 2)),
      Gen.listOfN(30, Gen.oneOf("a", "b", "c"))) { (ids, srcs) =>
      val docs = ids.distinct.zip(srcs).map { case (id, s) => (id, s, 100L) }
        .toDF("doc_id", "source", "n_chars")
      val report = Sampling.stratifiedSample(docs).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("sampled")).toMap
      val direct = ids.distinct.zip(srcs).groupBy(_._2).view.mapValues(_.count {
        case (id, _) =>
          ((id % Sampling.M) * Sampling.A + Sampling.B) % Sampling.M < Sampling.SampleCut
      }.toLong).toMap
      report == direct.filter { case (k, _) => report.contains(k) } &&
        report.keySet == direct.keySet
    }
}
