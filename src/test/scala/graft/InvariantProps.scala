package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.app.{LogRedaction, Notifications, Secrets}
import graft.expressions.PolyHash
import graft.report.TarGz

/** Property-based invariants over the pure kernels (SURVEY §5.3). The
  * Spark-level invariants live in InvariantSparkProps with a reduced case
  * count. */
object InvariantProps extends Properties("graft.pure") {

  property("polyhash stays in [0, mod) and is deterministic") =
    forAll { (s: String) =>
      val h1 = PolyHash.hash(s.getBytes("UTF-8"))
      val h2 = PolyHash.hash(s.getBytes("UTF-8"))
      h1 == h2 && h1 >= 0 && h1 < PolyHash.Mod
    }

  private val entryGen: Gen[(String, Array[Byte])] = for {
    name <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(80))
    data <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  } yield (name, data)

  property("tar.gz round-trips arbitrary entries") =
    forAll(Gen.listOfN(3, entryGen)) { entries =>
      val named = entries.zipWithIndex.map { case ((n, d), i) => (s"$i-$n", d) }
      val got = TarGz.read(new java.io.ByteArrayInputStream(TarGz.writeBytes(named)))
      got.map(_._1) == named.map(_._1) &&
        got.map(_._2.toSeq) == named.map(_._2.toSeq)
    }

  private val asciiTextGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 1 -> Gen.numChar, 3 -> Gen.const(' ')))
      .map(_.mkString)

  property("MinHashSig.compute == brute-force min over shingle polyhashes") =
    forAll(asciiTextGen) { text =>
      val bytes = text.getBytes("UTF-8")
      val sig = graft.expressions.MinHashSig.compute(bytes, 5).toSeq
      val shingles = (0 to bytes.length - 5).map(i =>
        PolyHash.hash(bytes.slice(i, i + 5)))
      val expected = (0 until graft.functions.Sketches.NumHashes).map { i =>
        if (shingles.isEmpty) Long.MaxValue
        else shingles.map(graft.functions.Sketches.univ(_, i)).min
      }
      sig == expected
    }

  property("SimHashSig.compute == brute-force token majority vote") =
    forAll(asciiTextGen) { text =>
      val fp = graft.expressions.SimHashSig.compute(text.getBytes("UTF-8"))
      // split(' ') semantics: empty tokens at runs/ends participate
      val tokens = text.split(" ", -1).toSeq
      def tokenHash(t: String): Long = {
        val b = t.getBytes("UTF-8")
        PolyHash.hash(b, PolyHash.Base2, PolyHash.Mod2) * (1L << 30) +
          PolyHash.hash(b)
      }
      // XOR-rotate mixing re-derived in the %/*/+ wrap-free form (the
      // kernel uses shift-mask; the two must agree bit for bit)
      def rot60(x: Long, r: Int): Long =
        (x % (1L << (60 - r))) * (1L << r) + x / (1L << (60 - r))
      def mix60(ch: Long): Long = {
        val m1 = ch ^ rot60(ch, 23) ^ rot60(ch, 41)
        m1 ^ rot60(m1, 13) ^ rot60(m1, 29)
      }
      val hs = tokens.map(t => mix60(tokenHash(t)))
      val expected = (0 until 64).map { i =>
        val votes = hs.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << i else 0L
      }.sum
      fp == expected
    }

  property("sketch mix is deterministic") =
    forAll { (x: Long, s: Long) =>
      graft.functions.Sketches.mix(x, s) == graft.functions.Sketches.mix(x, s)
    }

  property("log redaction masks passwords and JWTs, never grows secrets") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { secret =>
      val line = s"connecting with password=$secret to broker"
      val red = LogRedaction.redact(line)
      !red.contains(s"password=$secret") && red.contains("password=******")
    }

  property("secret interpolation substitutes every placeholder") =
    forAll(Gen.identifier.suchThat(_.nonEmpty), Gen.alphaNumStr) { (ref, v) =>
      val out = Secrets.interpolate(
        s"user:{{resolve:vault:$ref}}:rest",
        Map("vault" -> (_ => v)))
      out == s"user:$v:rest"
    }

  property("template render binds all vars") =
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (c, u) =>
      val body = Notifications.render(Notifications.DefaultTemplate,
        Map("cluster_name" -> c, "timestamp" -> "t", "report_url" -> u))
      body.contains(c) && body.contains(u)
    }

  property("template render fails loudly on unbound vars") =
    Prop.throws(classOf[IllegalArgumentException]) {
      Notifications.render("${missing}", Map.empty)
    }

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)
}
