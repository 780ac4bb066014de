package graft.report

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import scala.util.control.NonFatal

/** K3: remote upload with bounded retries — the reference's S3 put loop
  * (kafka_overwatch/aws_helpers/s3.py:52-84: retry with exponential
  * backoff + jitter), expressed over the Hadoop FileSystem API so the
  * SAME code path serves s3a://bucket/key in production and file:///...
  * in tests (no cloud SDK needed in either place).
  */
object RemotePut {

  /** Deterministic backoff with jitter: base * 2^(attempt-1) plus a
    * hash-derived jitter of up to base/2 ms (deterministic so tests can
    * assert the schedule; a production caller may not care). */
  def backoffMs(attempt: Int, baseMs: Long): Long = {
    val jitter = math.floorMod(graft.functions.Sketches.mix(attempt.toLong, 0x5bd1e995L),
      math.max(baseMs / 2, 1L))
    baseMs * (1L << math.min(attempt - 1, 16)) + jitter
  }

  /** Run `body` with up to `attempts` tries; sleeps between failures. */
  def retrying[T](attempts: Int, baseMs: Long = 100L,
                  sleeper: Long => Unit = Thread.sleep)(body: () => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < attempts) {
      try return body()
      catch {
        case NonFatal(e) =>
          lastErr = e
          attempt += 1
          if (attempt < attempts) sleeper(backoffMs(attempt, baseMs))
      }
    }
    throw new java.io.IOException(s"failed after $attempts attempts", lastErr)
  }

  /** Upload bytes to a Hadoop-filesystem URL, overwriting, with retries. */
  def put(bytes: Array[Byte], destUrl: String,
          conf: Configuration = new Configuration(),
          attempts: Int = 5, baseMs: Long = 100L,
          sleeper: Long => Unit = Thread.sleep): Unit =
    retrying(attempts, baseMs, sleeper) { () =>
      val path = new Path(destUrl)
      val fs = path.getFileSystem(conf)
      val out = fs.create(path, true)
      try out.write(bytes) finally out.close()
    }
}
