package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.report.{SchemaRegistryBackup, TarGz}
import graft.sources.Snapshots

class BackupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tar.gz round-trips entries byte-exactly") {
    val entries = Seq(
      "a.txt" -> "hello".getBytes(UTF_8),
      "sub::1::AVRO::101.txt" -> ("x" * 1000).getBytes(UTF_8),
      "empty.txt" -> Array.empty[Byte])
    val got = TarGz.read(new java.io.ByteArrayInputStream(TarGz.writeBytes(entries)))
    assert(got.map(_._1) === entries.map(_._1))
    assert(got.map(_._2.toSeq) === entries.map(_._2.toSeq))
  }

  test("tar.gz is readable by system tar (ustar compliance)") {
    val bytes = TarGz.writeBytes(Seq("f.txt" -> "data123".getBytes(UTF_8)))
    val dir = java.nio.file.Files.createTempDirectory("graft-tar")
    val p = dir.resolve("t.tar.gz")
    java.nio.file.Files.write(p, bytes)
    val proc = new ProcessBuilder("tar", "-xzf", p.toString, "-C", dir.toString)
      .redirectErrorStream(true).start()
    assert(proc.waitFor() === 0)
    assert(new String(java.nio.file.Files.readAllBytes(dir.resolve("f.txt")), UTF_8)
      === "data123")
  }

  test("SR backup archive round-trips and carries the index contract") {
    import spark.implicits._
    val sr = Snapshots.srSubjects(spark, TestSpark.Sf0001)
    val archive = SchemaRegistryBackup.writeArchive(sr)
    val entries = TarGz.read(new java.io.ByteArrayInputStream(archive))
    val index = new String(entries.find(_._1 == "index.json").get._2, UTF_8)
    assert(index.contains("\"orphan-value\": {\"1\": \"orphan-value::1::JSON::202.txt\"}"))
    val back = SchemaRegistryBackup.readArchive(spark, archive)
    val orig = sr.select("subject", "version", "schema_type", "schema_id", "schema_string")
      .as[(String, Long, String, Long, String)].collect().toSet
    val rt = back.select("subject", "version", "schema_type", "schema_id", "schema_string")
      .as[(String, Long, String, Long, String)].collect().toSet
    assert(rt === orig)
  }

  test("restore plan skips versions already in the target registry") {
    import spark.implicits._
    val sr = Snapshots.srSubjects(spark, TestSpark.Sf0001)
    val archive = SchemaRegistryBackup.readArchive(spark,
      SchemaRegistryBackup.writeArchive(sr))
    val existing = sr.filter($"subject" === "orphan-value")
    val plan = SchemaRegistryBackup.restorePlan(archive, existing)
    assert(plan.count() === sr.count() - 1)
    assert(plan.filter($"subject" === "orphan-value").count() === 0)
  }

  test("executeRestore drives the client in IMPORT-mode windows, versions ascending") {
    import spark.implicits._
    val archive = Seq(
      ("s1", 2L, "AVRO", 12L, "{}"),
      ("s1", 1L, "AVRO", 11L, "{}"),
      ("s2", 1L, "JSON", 21L, "{}"),
      ("s3", 1L, "AVRO", 31L, "{}"))
      .toDF("subject", "version", "schema_type", "schema_id", "schema_string")
    val existing = Seq(("s3", 1L)).toDF("subject", "version")
    val client = new SchemaRegistryBackup.RecordingRestoreClient
    val n = SchemaRegistryBackup.executeRestore(
      SchemaRegistryBackup.restorePlan(archive, existing), client)
    assert(n === 3L) // s3 skipped (already present)
    assert(client.ops.toSeq === Seq(
      "begin:s1", "put:s1:1:11", "put:s1:2:12", "end:s1",
      "begin:s2", "put:s2:1:21", "end:s2"))
  }

  test("http restore client PUTs mode windows and POSTs original version+id") {
    import spark.implicits._
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("localhost", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      calls.synchronized {
        calls += ((ex.getRequestMethod, ex.getRequestURI.getPath, body))
      }
      val resp = """{"id": 1}"""
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp.getBytes(UTF_8))
      ex.close()
    })
    srv.start()
    try {
      val archive = Seq(
        ("click-value", 2L, "AVRO", 12L, """{"type":"string"}"""),
        ("click-value", 1L, "AVRO", 11L, """{"type":"int"}"""),
        ("other", 1L, "JSON", 21L, "{}"))
        .toDF("subject", "version", "schema_type", "schema_id", "schema_string")
      val existing = Seq(("other", 1L)).toDF("subject", "version")
      val client = new SchemaRegistryBackup.HttpRestoreClient(
        s"http://localhost:${srv.getAddress.getPort}")
      val n = SchemaRegistryBackup.executeRestore(
        SchemaRegistryBackup.restorePlan(archive, existing), client)
      assert(n === 2L) // "other" skipped before any HTTP traffic for it
      val seq = calls.toSeq
      assert(seq.map(c => (c._1, c._2)) === Seq(
        ("PUT", "/mode/click-value"),
        ("POST", "/subjects/click-value/versions"),
        ("POST", "/subjects/click-value/versions"),
        ("PUT", "/mode/click-value")))
      assert(seq.head._3 === """{"mode": "IMPORT"}""")
      assert(seq.last._3 === """{"mode": "READWRITE"}""")
      // versions ascend and carry the ORIGINAL ids + escaped schema text
      assert(seq(1)._3.contains(""""version": 1""") &&
        seq(1)._3.contains(""""id": 11""") &&
        seq(1)._3.contains("""\"type\":\"int\""""))
      assert(seq(2)._3.contains(""""version": 2""") &&
        seq(2)._3.contains(""""id": 12"""))
    } finally srv.stop(0)
  }

  test("http restore client surfaces non-2xx as errors") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("localhost", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(409, 0); ex.close()
    })
    srv.start()
    try {
      val client = new SchemaRegistryBackup.HttpRestoreClient(
        s"http://localhost:${srv.getAddress.getPort}")
      val e = intercept[java.io.IOException](client.beginImport("s"))
      assert(e.getMessage.contains("HTTP 409"))
    } finally srv.stop(0)
  }
}
