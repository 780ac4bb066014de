package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import graft.sources.v2._

/** The collector retry policy (reference: kafka_resources/topics.py:95-131
  * re-queues failed describe batches, groups.py:23-52 recurses on the
  * failed remainder — both effectively retry with backoff). */
class FetchPolicySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Fails the first `failures` calls of every method, then delegates. */
  private class Flaky(inner: WatermarkFetcher, failures: Int)
      extends WatermarkFetcher {
    val calls = mutable.Map.empty[String, Int].withDefaultValue(0)
    private def flaky[T](name: String)(body: => T): T = {
      calls(name) += 1
      if (calls(name) <= failures) throw new RuntimeException(s"transient $name")
      body
    }
    override def listTopics(): Seq[String] = flaky("listTopics")(inner.listTopics())
    override def listGroups(): Seq[String] = flaky("listGroups")(inner.listGroups())
    override def fetch(topic: String): Array[WmRow] = flaky("fetch")(inner.fetch(topic))
    override def fetchGroupOffsets(topic: String): Array[GoRow] =
      flaky("fetchGroupOffsets")(inner.fetchGroupOffsets(topic))
    override def fetchGroup(grp: String): Array[GdRow] =
      flaky("fetchGroup")(inner.fetchGroup(grp))
  }

  private def fixture = new FixtureFetcher(TestSpark.Sf0001)

  test("transient failures are retried up to the policy's attempts") {
    val flaky = new Flaky(fixture, failures = 3)
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val f = new RetryingFetcher(flaky, FetchPolicy(attempts = 5, baseMs = 10L),
      sleeps += _)
    val topics = f.listTopics()
    assert(topics.nonEmpty)
    assert(flaky.calls("listTopics") === 4) // 3 failures + 1 success
    // deterministic exponential backoff + jitter schedule
    assert(sleeps.toSeq === (1 to 3).map(a =>
      graft.report.RemotePut.backoffMs(a, 10L)))
    assert(f.fetch(topics.head).nonEmpty) // per-method counters: retried too
    assert(flaky.calls("fetch") === 4)
  }

  test("a hard failure surfaces after the attempt budget, with the cause") {
    val flaky = new Flaky(fixture, failures = 99)
    val f = new RetryingFetcher(flaky, FetchPolicy(attempts = 3, baseMs = 1L), _ => ())
    val e = intercept[java.io.IOException](f.listGroups())
    assert(flaky.calls("listGroups") === 3)
    assert(e.getCause.getMessage.contains("transient"))
  }

  test("admin RPC timeout floors at the reference's 60s minimum") {
    assert(FetchPolicy(requestTimeoutMs = 1000L).effectiveTimeoutMs === 60000L)
    assert(FetchPolicy(requestTimeoutMs = 120000L).effectiveTimeoutMs === 120000L)
  }

  test("fetch.retries / fetch.backoff.ms options plumb through the source") {
    val base = spark.read.format("kafka-metadata")
      .option("dir", TestSpark.Sf0001).load().count()
    val tuned = spark.read.format("kafka-metadata")
      .option("dir", TestSpark.Sf0001)
      .option("fetch.retries", "2").option("fetch.backoff.ms", "5").load().count()
    assert(tuned === base)
  }
}
