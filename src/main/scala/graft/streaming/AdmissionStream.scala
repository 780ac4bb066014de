package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Sketches
import graft.operators.IncrementalDedup

/** Streaming ADMISSION GATE — the stateful-ingest counterpart of
  * [[graft.operators.IncrementalDedup.admissions]] (r9 verdict item 6c:
  * the one heavyweight family without a streaming twin), in the same
  * index-then-serve split as [[DsirStream]]/[[RetrievalStream]]: the
  * corpus-to-date index (exact hashes + anchored band rows + signatures
  * — the three lake tables) is FROZEN, then every arriving document is
  * gated at the door: exact_dup if its content hash is already indexed,
  * near_dup if any anchored index row in a shared band bucket verifies
  * at est-jaccard >= threshold, admitted otherwise.
  *
  * Plan shape, all stages stateless: hashing/signature/banding are
  * ROW-LOCAL expressions (md5 + the MinHashSig kernel + slice); the
  * exact check and the band probe are stream-STATIC equi-joins against
  * the skinny index tables; the per-document collapse runs through
  * flatMapGroupsWithState that never writes state (every marker row of
  * a document derives from its single arrival row, so the group is
  * complete within its own micro-batch) — retained state is ZERO rows,
  * asserted in AdmissionStreamSpec. At 100 TB the static probe side is
  * the anchored band slice (bounded per bucket), persisted once per
  * index rebuild.
  *
  * Contract vs the batch operator: the gate scores each document
  * against the CORPUS INDEX ONLY — it does not deduplicate the stream
  * against itself (two near-identical docs arriving in one day both
  * pass if neither resembles the corpus), and it cannot see
  * transitive chains through crawl-internal edges. That is the honest
  * online shape: per-doc verdicts are exactly
  * admissions(singleton crawl) — AdmissionStreamSpec pins that
  * equivalence — and the periodic offline reconciliation
  * (q_dedup_reconcile) is the mechanism that retires the difference,
  * exactly as it already does for the online ingestBatch path. */
object AdmissionStream {

  /** Shingle width of the signature kernel — the sigIndex contract. */
  val GateN = 5

  case class Marker(doc_id: Long, source: String, exact_dup: Boolean,
                    near_hit: Boolean, is_base: Boolean)
  case class Verdict(doc_id: Long, source: String, outcome: String)
  /** [[Marker]] with the document text carried on its base row — the
    * [[admittedStream]] form, where the gate's output is the admitted
    * documents themselves (hit rows carry ""). */
  case class DocMarker(doc_id: Long, source: String, text: String,
                       exact_dup: Boolean, near_hit: Boolean, is_base: Boolean)
  case class AdmittedDoc(doc_id: Long, text: String, source: String)

  /** Static probe table (band, band_key, idx_sig): the anchored slice
    * of the corpus band index joined to its signatures — built once per
    * index rebuild (persist it alongside the ranked index). Accepts a
    * pre-ranked index (the lake form) or ranks a raw one. */
  def probeTable(bandIdx: DataFrame, sigIdx: DataFrame,
                 anchors: Int = Sketches.BandAnchors): DataFrame = {
    val ranked =
      if (bandIdx.columns.contains("rk")) bandIdx
      else IncrementalDedup.rankedIndex(bandIdx)
    ranked.filter(col("rk") <= anchors)
      .join(sigIdx.select(col("doc_id"), col("sig")), Seq("doc_id"))
      .select(col("band"), col("band_key"), col("sig").as("idx_sig"))
  }

  /** Shared stage builder (stream and batch run the SAME expressions —
    * the DsirStream pattern): one marker row per document (is_base,
    * with its exact verdict) plus one hit row per verified corpus edge.
    * Documents shorter than the shingle width carry a null signature
    * and can only be exact_dup or admitted. */
  private def markerRows(docs: DataFrame, exactIdx: DataFrame,
                         probe: DataFrame, threshold: Double): DataFrame =
    markersFrom(baseRows(docs, exactIdx), probe, threshold)

  /** Row-local hash/signature + the exact-index probe — the expensive
    * per-doc work, built once so [[gateBatch]] can materialize it
    * (lazy localCheckpoint) before it fans into the marker and hit
    * branches; the streaming path consumes it unmaterialized
    * (localCheckpoint is illegal on a streaming frame, and each
    * micro-batch computes it once per branch — bounded by batch size,
    * not corpus size). */
  private def baseRows(docs: DataFrame, exactIdx: DataFrame,
                       carryText: Boolean = false): DataFrame = {
    // carryText threads the document body through to the base marker
    // (the admittedStream form, whose output is the documents) — kept
    // OFF for the verdict gate so its marker shuffle stays skinny
    val textCol = if (carryText) Seq(col("text")) else Nil
    val hashed = docs.select(Seq(col("doc_id"), col("source"),
      md5(col("text")).as("h"),
      when(length(col("text")) >= GateN,
        graft.expressions.MinHashSig.min_hash_sig(col("text"), GateN))
        .otherwise(lit(null)).as("sig")) ++ textCol: _*)
    hashed.join(
        exactIdx.select(col("content_hash").as("h"), lit(true).as("eh")),
        Seq("h"), "left")
      .select(Seq(col("doc_id"), col("source"),
        coalesce(col("eh"), lit(false)).as("exact_dup"),
        col("sig")) ++ textCol: _*)
  }

  private def markersFrom(base: DataFrame, probe: DataFrame,
                          threshold: Double,
                          carryText: Boolean = false): DataFrame = {
    val bands = base.filter(!col("exact_dup") && col("sig").isNotNull)
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(Sketches.MinHashBands - 1))).as("band"))
      .select(col("doc_id"), col("sig"), col("band"),
        expr(s"slice(sig, band * ${Sketches.RowsPerBand} + 1, " +
          s"${Sketches.RowsPerBand})").as("band_key"))
    val hitText = if (carryText) Seq(lit("").as("text")) else Nil
    val baseText = if (carryText) Seq(col("text")) else Nil
    val hits = bands.join(probe, Seq("band", "band_key"))
      .filter(Sketches.estJaccard("sig", "idx_sig") >= threshold)
      .select(Seq(col("doc_id"), lit(null).cast("string").as("source")) ++
        hitText ++ Seq(lit(false).as("exact_dup"), lit(true).as("near_hit"),
        lit(false).as("is_base")): _*)
    base.select(Seq(col("doc_id"), col("source")) ++ baseText ++
        Seq(col("exact_dup"), lit(false).as("near_hit"),
          lit(true).as("is_base")): _*)
      .unionByName(hits)
  }

  /** Batch form of the gate — the oracle-checkable twin
    * (q_admission_gate) and the equivalence baseline for the stream. */
  def gateBatch(docs: DataFrame, exactIdx: DataFrame, probe: DataFrame,
                threshold: Double = 0.3): DataFrame =
    markersFrom(baseRows(docs, exactIdx).localCheckpoint(false),
        probe, threshold)
      .groupBy(col("doc_id"))
      .agg(first(when(col("is_base"), col("source")), ignoreNulls = true)
          .as("source"),
        (sum(when(col("exact_dup"), 1).otherwise(0)) > 0).as("ed"),
        (sum(when(col("near_hit"), 1).otherwise(0)) > 0).as("nh"))
      .select(col("doc_id"), col("source"),
        when(col("ed"), lit("exact_dup"))
          .when(col("nh"), lit("near_dup"))
          .otherwise(lit("admitted")).as("outcome"))

  /** The streaming gate: marker rows collapse per doc_id through a
    * flatMapGroupsWithState that NEVER writes state — all of a doc's
    * markers live in its arrival micro-batch, so the group function is
    * a per-batch collapse and retained state stays at zero rows.
    *
    * `mode` is the collapse's declared output mode (Update by default,
    * matching the original twin); pass Append when the gate is one
    * stage of a larger chained query — Spark permits a query with
    * multiple flatMapGroupsWithState stages only when every stage and
    * the sink run in append mode, and the two modes are semantically
    * identical here because the collapse never writes state. */
  def gateStream(docs: DataFrame, exactIdx: DataFrame, probe: DataFrame,
                 threshold: Double = 0.3,
                 mode: OutputMode = OutputMode.Update): Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    val markers = markerRows(docs, exactIdx, probe, threshold).as[Marker]
    def collapse(id: Long, rows: Iterator[Marker],
                 state: GroupState[Boolean]): Iterator[Verdict] = {
      val rs = rows.toList
      // doc_id is the append-only unique ingest key (a re-crawled page
      // arrives under a NEW id — the recrawl fixture in
      // AdmissionStreamSpec): two same-id docs in one micro-batch would
      // collapse to one verdict over the union of both docs' markers —
      // fail loudly instead of silently merging. Ingest sources that
      // can REPLAY a key within a batch opt into the documented
      // first-wins policy upstream ([[IngestChain.firstWins]]) — or
      // route the violating rows to a dead-letter sink before the gate;
      // this stage deliberately never guesses which copy to keep.
      require(rs.count(_.is_base) <= 1,
        s"duplicate doc_id $id within a micro-batch — the admission " +
          "gate requires the append-only unique ingest key")
      rs.find(_.is_base).map { b =>
        val outcome =
          if (b.exact_dup) "exact_dup"
          else if (rs.exists(_.near_hit)) "near_dup"
          else "admitted"
        Verdict(id, b.source, outcome)
      }.iterator
    }
    markers.groupByKey(_.doc_id)
      .flatMapGroupsWithState(mode, GroupStateTimeout.NoTimeout)(collapse)
  }

  /** The gate emitting the ADMITTED documents themselves — the
    * upstream half of the production ingest chain
    * ([[IngestChain.chainStream]]: gate → span excision, one streaming
    * query): dropped docs vanish at the door and admitted ones flow on
    * WITH their text, so the downstream excision stage never sees
    * rejected traffic. Same zero-retained-state collapse as
    * [[gateStream]]; defaults to Append because chaining is this
    * form's purpose (see [[gateStream]] on Spark's multi-stage rule). */
  def admittedStream(docs: DataFrame, exactIdx: DataFrame, probe: DataFrame,
                     threshold: Double = 0.3,
                     mode: OutputMode = OutputMode.Append): Dataset[AdmittedDoc] = {
    import docs.sparkSession.implicits._
    val markers = markersFrom(
      baseRows(docs, exactIdx, carryText = true), probe, threshold,
      carryText = true).as[DocMarker]
    def collapse(id: Long, rows: Iterator[DocMarker],
                 state: GroupState[Boolean]): Iterator[AdmittedDoc] = {
      val rs = rows.toList
      // same append-only-key contract (and upstream policy seam) as
      // gateStream — one base row per doc_id per micro-batch
      require(rs.count(_.is_base) <= 1,
        s"duplicate doc_id $id within a micro-batch — the admission " +
          "gate requires the append-only unique ingest key")
      rs.find(_.is_base)
        .filter(b => !b.exact_dup && !rs.exists(_.near_hit))
        .map(b => AdmittedDoc(id, b.text, b.source)).iterator
    }
    markers.groupByKey(_.doc_id)
      .flatMapGroupsWithState(mode, GroupStateTimeout.NoTimeout)(collapse)
  }
}
