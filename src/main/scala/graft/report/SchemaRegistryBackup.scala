package graft.report

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-registry backup / restore (K7/K8), preserving the reference's
  * archive contract so archives are interchangeable:
  *  - per-version files `subject::version::type::id.txt` containing the
  *    schema string,
  *  - `index.json` = {subject: {version: file_name}} with sorted keys,
  *  - everything in one tar.gz
  * (reference: kafka_overwatch/overwatch_resources/schema_registry/
  * __init__.py:95-129; restore: schemas_restore.py:18-96).
  *
  * Registry metadata is small (thousands of subjects), so the archive is
  * assembled on the driver from the collected index DataFrame; the query
  * side (backupIndex) stays distributed.
  */
object SchemaRegistryBackup {

  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Build the tar.gz archive bytes from sr_subjects. */
  def writeArchive(sr: DataFrame): Array[Byte] = {
    val rows = graft.operators.SchemaRegistryOps.backupIndex(sr)
      .select("file_name", "subject", "version", "schema_string")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val files: Seq[(String, Array[Byte])] =
      rows.toSeq.map { case (fn, _, _, schema) => fn -> schema.getBytes(UTF_8) }
    val index = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (subject, vs) =>
      val versions = vs.sortBy(_._3).map { case (fn, _, v, _) =>
        s""""$v": "${jsonEsc(fn)}"""" }.mkString("{", ", ", "}")
      s""""${jsonEsc(subject)}": $versions"""
    }.mkString("{", ", ", "}")
    TarGz.writeBytes(files :+ ("index.json" -> index.getBytes(UTF_8)))
  }

  /** Read an archive back into a DataFrame with the restore-relevant
    * columns (the engine-side equivalent of the reference's restore walk;
    * the live-registry PUT loop plugs in where `restorePlan` ends). */
  def readArchive(spark: SparkSession, archive: Array[Byte]): DataFrame = {
    import spark.implicits._
    val entries = TarGz.read(new java.io.ByteArrayInputStream(archive))
    val rows = entries.filter(_._1 != "index.json").map { case (name, data) =>
      val parts = name.stripSuffix(".txt").split("::")
      (name, parts(0), parts(1).toLong, parts(2), parts(3).toLong,
        new String(data, UTF_8))
    }
    rows.toDF("file_name", "subject", "version", "schema_type", "schema_id",
      "schema_string")
  }

  /** K8: the ordered restore plan — one row per (subject, version) in
    * IMPORT-mode order, skipping versions already present in the target. */
  def restorePlan(archive: DataFrame, existing: DataFrame): DataFrame =
    archive.join(existing.select(col("subject"), col("version")).distinct()
        .withColumn("already", lit(true)),
      Seq("subject", "version"), "left")
      .filter(col("already").isNull)
      .select(col("subject"), col("version"), col("schema_type"),
        col("schema_id"), col("schema_string"))
      .orderBy(col("subject"), col("version"))

  /** The live-registry seam of K8: the reference switches each subject to
    * IMPORT mode, PUTs its versions oldest-first with original schema ids,
    * then restores normal mode (schemas_restore.py:18-96). A deployment
    * implements this against the registry's REST API; tests use the
    * recording implementation. */
  trait RestoreClient {
    def beginImport(subject: String): Unit
    def putVersion(subject: String, version: Long, schemaType: String,
                   schemaId: Long, schemaString: String): Unit
    def endImport(subject: String): Unit
  }

  final class RecordingRestoreClient extends RestoreClient {
    val ops = scala.collection.mutable.ArrayBuffer.empty[String]
    override def beginImport(subject: String): Unit = ops += s"begin:$subject"
    override def putVersion(subject: String, version: Long, schemaType: String,
                            schemaId: Long, schemaString: String): Unit =
      ops += s"put:$subject:$version:$schemaId"
    override def endImport(subject: String): Unit = ops += s"end:$subject"
  }

  /** Live [[RestoreClient]] over the registry's REST API (JDK HttpClient,
    * no extra dependency), the endpoints the reference's restore walks
    * (schemas_restore.py:27,43-49,50 via kafka_schema_registry_admin):
    *  - IMPORT-mode window: PUT /mode/{subject} {"mode":"IMPORT"} ...
    *    {"mode":"READWRITE"},
    *  - each version: POST /subjects/{subject}/versions carrying the
    *    ORIGINAL version and schema id (the point of IMPORT mode —
    *    re-registering under new ids would orphan every serialized
    *    record's writer-schema reference). */
  final class HttpRestoreClient(baseUrl: String,
                                timeoutMillis: Long = 10000L) extends RestoreClient {
    private val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis)).build()
    private val base = baseUrl.stripSuffix("/")

    private def enc(s: String): String =
      java.net.URLEncoder.encode(s, UTF_8).replace("+", "%20")

    private def request(method: String, path: String, body: String): Unit = {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$base$path"))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .method(method,
          java.net.http.HttpRequest.BodyPublishers.ofString(body, UTF_8))
        .build()
      val resp = http.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 300)
        throw new java.io.IOException(
          s"$method $path returned HTTP ${resp.statusCode()}: ${resp.body()}")
    }

    private def putMode(subject: String, mode: String): Unit =
      request("PUT", s"/mode/${enc(subject)}", s"""{"mode": "$mode"}""")

    override def beginImport(subject: String): Unit = putMode(subject, "IMPORT")
    override def endImport(subject: String): Unit = putMode(subject, "READWRITE")
    override def putVersion(subject: String, version: Long, schemaType: String,
                            schemaId: Long, schemaString: String): Unit =
      request("POST", s"/subjects/${enc(subject)}/versions",
        s"""{"version": $version, "id": $schemaId, "schemaType": "$schemaType", """ +
          s""""schema": "${jsonEsc(schemaString)}"}""")
  }

  /** Drive a RestoreClient from the ordered restore plan: one IMPORT-mode
    * window per subject, versions strictly ascending inside it. Registry
    * metadata is driver-scale by definition (the reference walks it
    * sequentially too), so the plan is collected. Returns the number of
    * versions put. */
  def executeRestore(plan: DataFrame, client: RestoreClient): Long = {
    val rows = plan.select(col("subject"), col("version"), col("schema_type"),
      col("schema_id"), col("schema_string")).collect()
    var current: String = null
    rows.foreach { r =>
      val subj = r.getString(0)
      if (subj != current) {
        if (current != null) client.endImport(current)
        client.beginImport(subj)
        current = subj
      }
      client.putVersion(subj, r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4))
    }
    if (current != null) client.endImport(current)
    rows.length.toLong
  }
}
