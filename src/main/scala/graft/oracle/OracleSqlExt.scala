package graft.oracle

/** DuckDB oracle SQL for the text-analysis, dedup, similarity, and
  * relational queries (these run directly on the raw parquet tables; no
  * snapshot CTEs needed). Mirrors graft.functions.* and
  * graft.operators.Relational expression-for-expression.
  */
object OracleSqlExt {

  private val stop = "('the', 'a', 'of', 'and', 'to', 'in')"

  private val decPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  private val orev =
    s"orev AS (SELECT l_orderkey, sum($decPrice) AS order_rev FROM lineitem GROUP BY 1)"

  /** Polynomial token hash mirrors (graft.expressions.PolyHash): fold
    * over byte values, every intermediate below 2^63 — the reason the
    * engine's SimHash is oracle-reproducible at all. */
  private def polyFold(base: Long, mod: Long, c: String = "token") =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($c) + 1), " +
      s"i -> CAST(ascii($c[i:i]) AS BIGINT))), (acc, ch) -> (acc * $base + ch) % $mod)"

  /** 60-bit combined token hash: h2 * 2^30 + h1 (mirror of Sketches.tokenHash). */
  private def tokenHashSqlOf(c: String) =
    s"(${polyFold(131, 998244353L, c)} * 1073741824 + ${polyFold(31, 1000000007L, c)})"

  private val tokenHashSql = tokenHashSqlOf("token")

  /** Per-bit majority vote over the MIXED token hash -> fingerprint, as
    * one generated 60-term sum (the mixing lives in [[simhashMixSql]]). */
  private val simhashBitsSql = (0 until 60).map(i =>
    s"CASE WHEN sum(CASE WHEN (ch >> $i) & 1 = 1 THEN 1 ELSE -1 END) > 0" +
      s" THEN CAST(${1L << i} AS BIGINT) ELSE 0 END").mkString(" + ")

  /** Two XOR-rotate mixing levels over the 60-bit token hash — mirror
    * of SimHashSig.compute's mx (same offsets 23/41 then 13/29). The
    * 60-bit rotation is the wrap-free (x % 2^(60-r)) * 2^r + x //
    * 2^(60-r) form: every intermediate stays below 2^60, so no 64-bit
    * wrapping arithmetic is needed. */
  private def rot60Sql(x: String, r: Int): String =
    s"((($x) % ${1L << (60 - r)}) * ${1L << r} + (($x) // ${1L << (60 - r)}))"
  private def mix60Sql(x: String): String =
    s"xor(xor($x, ${rot60Sql(x, 23)}), ${rot60Sql(x, 41)})"
  private def mix60Sql2(x: String): String =
    s"xor(xor($x, ${rot60Sql(x, 13)}), ${rot60Sql(x, 29)})"

  /** MinHash mirror: signature position i = min over shingle hashes x of
    * (a_i * x + b_i) mod p — constants shared with Sketches.univ. */
  private val minhashSigSql = {
    import graft.functions.Sketches.{NumHashes, P31, UnivA, UnivB}
    "[" + (0 until NumHashes).map(i =>
      s"list_min(list_transform(xs, x -> (${UnivA(i)} * x + ${UnivB(i)}) % $P31))")
      .mkString(", ") + "]"
  }

  /** Banded candidate pairs over `f`(doc_id, sig) — the exact mirror of
    * Sketches.minHashBandCandidates: 16 band keys (4 consecutive sig
    * positions each; DuckDB [a:b] slicing is 1-based end-inclusive like
    * Spark's slice(arr, start, len)), per-bucket row_number by doc_id,
    * and anchored emission (only the BandAnchors smallest doc_ids of a
    * bucket pair against the rest — the hot-bucket fan-out bound). */
  private def minhashCandCtesSfx(x: String) = {
    import graft.functions.Sketches.{BandAnchors, MinHashBands, RowsPerBand}
    s"""bk$x AS (
  SELECT doc_id, sig, g.band AS band,
         sig[g.band * $RowsPerBand + 1 : g.band * $RowsPerBand + $RowsPerBand] AS bkey
  FROM f$x, (SELECT unnest(range($MinHashBands)) AS band) g),
rk$x AS (
  SELECT doc_id, sig, band, bkey,
         row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS rk
  FROM bk$x),
cand$x AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64
           AS est_jaccard
  FROM rk$x a JOIN bk$x b ON a.band = b.band AND a.bkey = b.bkey
    AND a.doc_id < b.doc_id AND a.rk <= $BandAnchors)"""
  }

  private val minhashCandCtes = minhashCandCtesSfx("")

  /** The whole from-scratch two-stage union-dedup verdict pipeline as a
    * CTE chain (every name suffixed with `x`) ending in
    * v$x(doc_id, source, outcome) over the documents rows satisfying
    * `pred` — used twice by q_dedup_reconcile, once per corpus horizon.
    * Identical decomposition to q_incremental_dedup's oracle. */
  private def unionVerdictCtes(x: String, pred: String) = s"""
h$x AS (SELECT doc_id, source, text, md5(text) AS ch FROM documents WHERE $pred),
km$x AS (SELECT ch, min(doc_id) AS keep_id FROM h$x GROUP BY 1),
surv$x AS (SELECT h$x.doc_id, h$x.text FROM h$x
         JOIN km$x ON h$x.ch = km$x.ch AND h$x.doc_id = km$x.keep_id),
sh$x AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM surv$x WHERE length(text) >= 5),
xs$x AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM sh$x),
f$x AS (SELECT doc_id, $minhashSigSql AS sig FROM xs$x),
${minhashCandCtesSfx(x)},
prs$x AS (SELECT doc_a, doc_b FROM cand$x WHERE est_jaccard >= 0.3),
edges$x AS (SELECT doc_a AS src, doc_b AS dst FROM prs$x
          UNION SELECT doc_b, doc_a FROM prs$x),
nodes$x AS (SELECT DISTINCT src AS node FROM edges$x),
reach$x(node, label) AS (
  SELECT node, node FROM nodes$x
  UNION
  SELECT e.src, r.label FROM edges$x e JOIN reach$x r ON e.dst = r.node),
cl$x AS (SELECT node AS doc_id, min(label) <> node AS dropped
       FROM reach$x GROUP BY node),
v$x AS (SELECT h$x.doc_id, h$x.source,
       CASE WHEN km$x.keep_id <> h$x.doc_id THEN 'exact_dup'
            WHEN coalesce(cl$x.dropped, false) THEN 'near_dup'
            ELSE 'admitted' END AS outcome
FROM h$x JOIN km$x ON h$x.ch = km$x.ch
LEFT JOIN cl$x ON cl$x.doc_id = h$x.doc_id)"""

  /** CMS mirrors (graft.functions.CountSketch): one UNION ALL branch per
    * sketch row, bucket = (a_i*h + b_i) mod p mod Width — constants
    * shared with minhash (single source of truth: Sketches.UnivA/B). */
  private val cmsCellRows = {
    import graft.functions.Sketches.{P31, UnivA, UnivB}
    import graft.functions.CountSketch.{Depth, Width}
    (0 until Depth).map(i =>
      s"SELECT cnt, ((${UnivA(i)} * h + ${UnivB(i)}) % $P31) % $Width AS bucket, $i AS row_i FROM hh")
      .mkString(" UNION ALL ")
  }

  private val cmsProbeRows = {
    import graft.functions.Sketches.{P31, UnivA, UnivB}
    import graft.functions.CountSketch.{Depth, Width}
    (0 until Depth).map(i =>
      s"SELECT rnk, token, cnt, ((${UnivA(i)} * h + ${UnivB(i)}) % $P31) % $Width AS bucket, $i AS row_i FROM top")
      .mkString(" UNION ALL ")
  }

  /** 60-bit hash of an n-gram string bound to lambda variable `s` —
    * mirror of the NgramHashes kernel values. */
  private val ngramHashS = tokenHashSqlOf("s")

  /** The shared near-dup cluster chain (char-5-gram shingles, <=100-df
    * rare-shingle blocking, 0.3 jaccard, recursive-CTE connected
    * components) — SEVEN mirrors compose it (q_dedup_clusters,
    * q_cluster_sizes, q_dedup_weights, q_dedup_corpus,
    * q_dedup_rate_by_source, q_cross_source_dups via q_curation_funnel's
    * chain, q_cluster_keep_best), so the threshold constants live here
    * exactly once. */
  private val clusterChainCtes = """sh AS (
  SELECT DISTINCT doc_id, text[i:i+4] AS shingle
  FROM documents, unnest(range(1, greatest(length(text) - 3, 1))) t(i)),
rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 100),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node)"""

  /** Shared CTE chain of the excision mirrors (q_dup_excision,
    * q_excision_rollup): the q_dup_spans duplicated-5-gram positions,
    * expanded to the COVERED token-index set (start + 0..4; DISTINCT
    * merges overlapping runs), anti-joined against the positional token
    * stream; kept tokens re-join with ' ' in position order. Positions
    * are 1-based here (range()) — internally consistent, and only the
    * rebuilt text and counts reach the output. */
  private val dupExcisionCtes = s"""
t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
ng AS (SELECT doc_id,
         unnest(range(1, len(toks) - 3)) AS pos,
         unnest(list_transform(
                  list_transform(range(1, len(toks) - 3),
                    g -> array_to_string(toks[g:g+4], ' ')),
                  s -> ${tokenHashSqlOf("s")})) AS ngh
       FROM t WHERE len(toks) >= 5),
dfq AS (SELECT ngh FROM (SELECT DISTINCT doc_id, ngh FROM ng)
        GROUP BY ngh HAVING count(*) > 1),
dp AS (SELECT doc_id, pos FROM ng JOIN dfq USING (ngh)),
cov AS (SELECT DISTINCT doc_id, pos + o.off AS cpos
        FROM dp CROSS JOIN (VALUES (0),(1),(2),(3),(4)) o(off)),
tok AS (SELECT doc_id, unnest(toks) AS token,
               unnest(range(1, len(toks) + 1)) AS tpos FROM t),
kept AS (SELECT k.doc_id, k.token, k.tpos
         FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.tpos = c.cpos
         WHERE c.cpos IS NULL),
cl AS (SELECT doc_id, string_agg(token, ' ' ORDER BY tpos) AS cleaned_text,
              CAST(count(*) AS BIGINT) AS kept_tokens FROM kept GROUP BY 1)"""

  /** Shared CTE chain of the boilerplate-strip mirrors
    * (q_boilerplate_strip, q_boilerplate_rollup): the q_source_boilerplate
    * per-source trigram boilerplate set over the SAME templated corpus
    * (header on doc_id%2, footer on %3), located positionally, expanded
    * to covered token indices (start + 0..2; DISTINCT merges overlaps),
    * anti-joined against the positional token stream; kept tokens
    * re-join with ' ' in position order — the dupExcisionCtes shape with
    * the detect half swapped. df is over per-doc-DISTINCT (doc, ngh)
    * pairs, matching the engine's ngram_hashes distinct-set contract. */
  private val boilerExcisionCtes = s"""
dirty AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 2 = 0
           THEN 'all rights reserved contact us for more info ' ELSE '' END
         || text ||
         CASE WHEN doc_id % 3 = 0
           THEN ' subscribe to our newsletter for weekly updates' ELSE '' END AS text
  FROM documents),
t AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM dirty),
ng AS (SELECT doc_id, source,
         unnest(range(1, len(toks) - 1)) AS pos,
         unnest(list_transform(
                  list_transform(range(1, len(toks) - 1),
                    g -> array_to_string(toks[g:g+2], ' ')),
                  s -> ${tokenHashSqlOf("s")})) AS ngh
       FROM t WHERE len(toks) >= 3),
srcn AS (SELECT source, count(*) AS docs FROM documents GROUP BY 1),
dfx AS (SELECT source, ngh, count(*) AS df
        FROM (SELECT DISTINCT doc_id, source, ngh FROM ng) GROUP BY 1, 2),
boiler AS (SELECT d.source, d.ngh
           FROM dfx d JOIN srcn s USING (source)
           WHERE df >= 3 AND CAST(df AS DOUBLE) >= s.docs * 0.25),
bp AS (SELECT doc_id, pos FROM ng JOIN boiler USING (source, ngh)),
cov AS (SELECT DISTINCT doc_id, pos + o.off AS cpos
        FROM bp CROSS JOIN (VALUES (0),(1),(2)) o(off)),
tok AS (SELECT doc_id, unnest(toks) AS token,
               unnest(range(1, len(toks) + 1)) AS tpos FROM t),
kept AS (SELECT k.doc_id, k.token, k.tpos
         FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.tpos = c.cpos
         WHERE c.cpos IS NULL),
cl AS (SELECT doc_id, string_agg(token, ' ' ORDER BY tpos) AS cleaned_text,
              CAST(count(*) AS BIGINT) AS kept_tokens FROM kept GROUP BY 1)"""

  /** Linear-counter bucket of a token (row LcHashIdx of the family). */
  private val lcBucketSql = {
    import graft.functions.Sketches.{P31, UnivA, UnivB}
    import graft.functions.CountSketch.{LcBuckets, LcHashIdx}
    s"((${UnivA(LcHashIdx)} * ${polyFold(31, 1000000007L)} + ${UnivB(LcHashIdx)}) % $P31) % $LcBuckets"
  }

  /** Hyperplane-LSH mirrors (graft.functions.Similarity): plane component
    * j of plane p regenerated from the same double-round affine constants;
    * bucket key = 4 sign bits per table. */
  private def planeSql(planeIdx: Int): String = {
    import graft.functions.Similarity._
    val base = planeIdx * 64
    s"list_transform(range(0, 64), j -> (CAST(($PlaneA2 * (($PlaneA1 * ($base + j) + $PlaneB1) % $PlaneP1) + $PlaneB2) % $PlaneP2 AS DOUBLE) / $PlaneP2) * 2 - 1)"
  }

  private def lshKeySql(t: Int): String = {
    import graft.functions.Similarity.BitsPerTable
    (0 until BitsPerTable).map(i =>
      s"CASE WHEN list_dot_product(v, ${planeSql(t * BitsPerTable + i)}) > 0" +
        s" THEN CAST(${1L << i} AS BIGINT) ELSE 0 END").mkString(" + ")
  }

  /** Three unrolled power iterations (functions.Pca): per iteration,
    * s = v·dir, per-dimension contributions floor-quantized to the
    * 2^-20 grid summed as exact BIGINTs, then the left-to-right
    * list_dot_product normalization. v0 = 1/sqrt(64) = 0.125 exact. */
  /** Three unrolled power iterations over source CTE `src`, CTE names
    * prefixed with `p` (final direction: `${p}n3`). */
  private def pcaIters(p: String, src: String): String = {
    def iter(t: Int, prev: String): String = s"""
${p}s$t AS (SELECT v, list_dot_product(v, (SELECT vl FROM $prev)) AS s FROM $src),
${p}c$t AS (SELECT t.pos,
          CAST(sum(CAST(floor(${p}s$t.v[t.pos] * ${p}s$t.s * 1048576.0) AS BIGINT)) AS DOUBLE)
            / 1048576.0 AS w
        FROM ${p}s$t, unnest(range(1, 65)) AS t(pos) GROUP BY t.pos),
${p}w$t AS (SELECT list(w ORDER BY pos) AS wl FROM ${p}c$t),
${p}n$t AS (SELECT list_transform(wl, x -> x / sqrt(list_dot_product(wl, wl))) AS vl
        FROM ${p}w$t)"""
    s"${iter(1, "v0")},\n${iter(2, s"${p}n1")},\n${iter(3, s"${p}n2")}"
  }

  private val pcaCtes: String =
    s"""e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
v0 AS (SELECT list_transform(range(0, 64), i -> 0.125) AS vl),
${pcaIters("", "e")}"""

  private val lshBucketsCte = {
    import graft.functions.Similarity.NumTables
    "b AS (" + (0 until NumTables).map(t =>
      s"SELECT vec_id, v, nrm, $t AS tbl, ${lshKeySql(t)} AS key FROM n")
      .mkString(" UNION ALL ") + ")"
  }

  /** Anchored same-bucket candidate pairs over `b` — the exact mirror of
    * Similarity.scoredBucketPairs' per-bucket anchor emission (only the
    * BucketAnchors smallest vec_ids of a bucket pair with the rest). */
  private val lshCandCtes = {
    import graft.functions.Similarity.BucketAnchors
    s"""rb AS (
  SELECT vec_id, tbl, key,
         row_number() OVER (PARTITION BY tbl, key ORDER BY vec_id) AS rk
  FROM b),
c AS (
  SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b
  FROM rb a JOIN b b2 ON a.tbl = b2.tbl AND a.key = b2.key
    AND a.vec_id < b2.vec_id AND a.rk <= $BucketAnchors)"""
  }

  /** Full IVF mirror (graft.functions.Ivf.knnIvf): deterministic seeds
    * (first k by vec_id), three unrolled Lloyd iterations with the
    * 2^-20-grid integer mean (the order-free trick that makes iterative
    * k-means oracle-checkable at all), then probe + exact re-rank.
    * Tie-breaks mirror the engine's struct array_max / sorted-slice:
    * score DESC, cid DESC. */
  private val IvfIters = 3

  private def ivfCosine(v: String, nrm: String, cv: String) =
    s"list_dot_product($v, $cv) / ($nrm * sqrt(list_dot_product($cv, $cv)))"

  private def ivfArgTop(src: String, pred: String, keep: Int,
                        rel: String = "q") =
    s"""(SELECT vec_id, vq, cid FROM (
    SELECT q.vec_id, q.vq, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY ${ivfCosine("q.v", "q.nrm", "c.cv")} DESC, c.cid DESC) AS rn
    FROM $rel q CROSS JOIN $src c$pred) WHERE rn <= $keep)"""

  /** Shared IVF training mirror (graft.functions.Ivf.trainCentroids):
    * deterministic seeds (first k by vec_id), three unrolled Lloyd
    * iterations with the 2^-20-grid integer mean (the order-free trick
    * that makes iterative k-means oracle-checkable at all). Emits CTEs
    * e/n/q/c0..c3; the final centroid table is `c$IvfIters`. Shared by
    * q_knn_ivf and q_embedding_clusters exactly like the engine shares
    * the memoized centroid training between them. */
  private val ivfTrainingCtes: String = ivfTrainingCtesK("16")

  /** Same training mirror with the cluster count as a SQL expression —
    * the dedup/prune index uses the ADAPTIVE k (Ivf.adaptiveK: cluster
    * size held at ~125, capped at 1024) so a `kk` CTE computes
    * least(1024, greatest(16, n // 125)) and is referenced here. At the
    * oracle-checked scale factors (<= 2000 vectors) this evaluates to
    * 16, bit-identical to the static ANN geometry. */
  private def ivfTrainingCtesK(k: String): String = {
    import graft.functions.Ivf.{MeanQuantScale, TrainSampleCap}
    // Lloyd runs over the deterministic training sample `ts` (engine:
    // Ivf.trainCentroids vec_id % stride == 0, stride = ceil(n/cap));
    // assignment/probing CTEs keep reading the full `q`. At every
    // oracle-checked sf stride = 1, so ts == q and the geometry is
    // bit-identical to the unsampled contract.
    val iterCtes = (1 to IvfIters).map { t =>
      s"""a$t AS ${ivfArgTop(s"c${t - 1}", "", 1, rel = "ts")},
m$t AS (
  SELECT cid, list(m ORDER BY pos) AS mv FROM (
    SELECT cid, pos,
           CAST(sum(qc) AS DOUBLE) / ($MeanQuantScale * CAST(count(*) AS DOUBLE)) AS m
    FROM (SELECT cid, unnest(vq) AS qc, generate_subscripts(vq, 1) AS pos FROM a$t)
    GROUP BY 1, 2) GROUP BY 1),
c$t AS (SELECT p.cid, COALESCE(m.mv, p.cv) AS cv
        FROM c${t - 1} p LEFT JOIN m$t m USING (cid))"""
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, nrm,
        list_transform(v, x -> CAST(floor(x * $MeanQuantScale) AS BIGINT)) AS vq
      FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)),
q AS (SELECT vec_id, v, nrm, vq FROM n),
scc AS (SELECT greatest(1, (count(*) + ${TrainSampleCap - 1}) // $TrainSampleCap) AS sc
        FROM embeddings),
ts AS (SELECT vec_id, v, nrm, vq FROM q
       WHERE vec_id % (SELECT sc FROM scc) = 0),
c0 AS (SELECT cid, cv FROM (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv FROM ts)
       WHERE cid < $k),
$iterCtes"""
  }

  private val ivfOracle: String = {
    val nprobe = 4; val nq = 10; val topk = 10
    s"""
WITH $ivfTrainingCtes,
lists AS ${ivfArgTop(s"c$IvfIters", "", 1)},
probes AS (SELECT vec_id AS query_id, cid
           FROM ${ivfArgTop(s"c$IvfIters", s" WHERE q.vec_id < $nq", nprobe)}),
cand AS (
  SELECT p.query_id, l.vec_id,
         round(list_dot_product(qn.v, xn.v) / (qn.nrm * xn.nrm), 9) AS score
  FROM probes p JOIN lists l USING (cid)
  JOIN n qn ON qn.vec_id = p.query_id JOIN n xn ON xn.vec_id = l.vec_id
  WHERE l.vec_id <> p.query_id),
r AS (SELECT query_id, vec_id AS neighbor_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      FROM cand)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank", score
FROM r WHERE rnk <= $topk ORDER BY query_id, "rank""""
  }

  /** Mirror of graft.functions.Pq.knnPq — see the entry comment in
    * `queries`. The argmax tie-break (score DESC, code DESC) and the
    * 2^-20 Lloyd mean grid follow the IVF mirror; the ADC/norm sums run
    * on the 2^-30 grid as exact BIGINTs. */
  /** The PQ chain (training sample -> unrolled Lloyd -> codes -> ADC
    * `scored`) as composable CTEs assuming `e`/`n` are already defined —
    * shared by q_knn_pq and the q_ann_recall report exactly like the
    * engine shares the memoized codebook. */
  private val pqChainCtes: String = {
    import graft.functions.Pq.{NumSub, SubDim, CodebookK, PqIters, Grid20, Grid30}
    import graft.functions.Ivf.TrainSampleCap
    val nq = 10
    def argCode(src: String, cbRel: String, out: String) =
      s"""$out AS (SELECT vec_id, s, sub, subq, code FROM (
    SELECT t.vec_id, t.s, t.sub, t.subq, c.code,
           row_number() OVER (PARTITION BY t.vec_id, t.s
             ORDER BY 2*list_dot_product(t.sub, c.cv)
                      - list_dot_product(c.cv, c.cv) DESC, c.code DESC) AS rn
    FROM $src t CROSS JOIN $cbRel c) WHERE rn = 1)"""
    val iterCtes = (1 to PqIters).map { t =>
      s"""${argCode("tsv", s"pc${t - 1}", s"pa$t")},
pm$t AS (SELECT code, list(m ORDER BY pos) AS mv FROM (
    SELECT code, pos,
           CAST(sum(qc) AS DOUBLE) / ($Grid20 * CAST(count(*) AS DOUBLE)) AS m
    FROM (SELECT code, unnest(subq) AS qc, generate_subscripts(subq, 1) AS pos
          FROM pa$t)
    GROUP BY 1, 2) GROUP BY 1),
pc$t AS (SELECT p.code, COALESCE(m.mv, p.cv) AS cv
         FROM pc${t - 1} p LEFT JOIN pm$t m USING (code))"""
    }.mkString(",\n")
    s"""sv AS (SELECT vec_id, ss.s AS s,
              v[(ss.s*$SubDim+1):(ss.s*$SubDim+$SubDim)] AS sub,
              list_transform(v[(ss.s*$SubDim+1):(ss.s*$SubDim+$SubDim)],
                x -> CAST(floor(x * $Grid20) AS BIGINT)) AS subq
       FROM n CROSS JOIN (SELECT unnest(generate_series(0, ${NumSub - 1})) AS s) ss),
scc AS (SELECT greatest(1, (count(*) + ${TrainSampleCap - 1}) // $TrainSampleCap) AS sc
        FROM embeddings),
tsv AS (SELECT vec_id, s, sub, subq FROM sv
        WHERE vec_id % (SELECT sc FROM scc) = 0),
pc0 AS (SELECT code, cv FROM (
          SELECT row_number() OVER (ORDER BY vec_id, s) - 1 AS code, sub AS cv
          FROM tsv)
        WHERE code < $CodebookK),
$iterCtes,
${argCode("sv", s"pc$PqIters", "codes")},
cn AS (SELECT code, cv,
              CAST(floor(list_dot_product(cv, cv) * $Grid30) AS BIGINT) AS cn2q
       FROM pc$PqIters),
rn2 AS (SELECT c.vec_id, CAST(sum(k.cn2q) AS BIGINT) AS rq
        FROM codes c JOIN cn k USING (code) GROUP BY 1),
qsub AS (SELECT vec_id AS query_id, s, sub FROM sv WHERE vec_id < $nq),
qn AS (SELECT vec_id AS query_id, nrm FROM n WHERE vec_id < $nq),
lut AS (SELECT q.query_id, q.s, c.code,
               CAST(floor(list_dot_product(q.sub, c.cv) * $Grid30) AS BIGINT) AS pq
        FROM qsub q CROSS JOIN cn c),
adc AS (SELECT l.query_id, c.vec_id, CAST(sum(l.pq) AS BIGINT) AS aq
        FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
        WHERE c.vec_id <> l.query_id GROUP BY 1, 2),
pqscored AS (SELECT a.query_id, a.vec_id,
        round((CAST(a.aq AS DOUBLE) / $Grid30)
          / (q.nrm * sqrt(CAST(r.rq AS DOUBLE) / $Grid30)), 9) AS score
      FROM adc a JOIN rn2 r ON r.vec_id = a.vec_id JOIN qn q USING (query_id))"""
  }

  /** The PER-SUBSPACE codebook chain (Pq.trainCodebooks /
    * knnPqSubWith), parameterized so q_ann_recall can instantiate it
    * twice — once over the raw subvector views ("z", the pqs config)
    * and once over the OPQ-permuted ones ("o"). `px` prefixes every
    * generated CTE name; `svRel`/`tsvRel`/`qsubRel`/`qnRel` name the
    * full-corpus subvectors, training-sample subvectors, query
    * subvectors, and query-norm relations the chain reads. Everything
    * trained is keyed by (s, code); the final scored relation is
    * `${px}pqscored`. */
  private def pqSubChain(px: String, svRel: String, tsvRel: String,
                         qsubRel: String, qnRel: String): String = {
    import graft.functions.Pq.{CodebookK, PqIters, Grid20, Grid30}
    def argCodeS(src: String, cbRel: String, out: String) =
      s"""$out AS (SELECT vec_id, s, sub, subq, code FROM (
    SELECT t.vec_id, t.s, t.sub, t.subq, c.code,
           row_number() OVER (PARTITION BY t.vec_id, t.s
             ORDER BY 2*list_dot_product(t.sub, c.cv)
                      - list_dot_product(c.cv, c.cv) DESC, c.code DESC) AS rn
    FROM $src t JOIN $cbRel c ON c.s = t.s) WHERE rn = 1)"""
    val iterCtes = (1 to PqIters).map { t =>
      s"""${argCodeS(tsvRel, s"${px}c${t - 1}", s"${px}a$t")},
${px}m$t AS (SELECT s, code, list(m ORDER BY pos) AS mv FROM (
    SELECT s, code, pos,
           CAST(sum(qc) AS DOUBLE) / ($Grid20 * CAST(count(*) AS DOUBLE)) AS m
    FROM (SELECT s, code, unnest(subq) AS qc, generate_subscripts(subq, 1) AS pos
          FROM ${px}a$t)
    GROUP BY 1, 2, 3) GROUP BY 1, 2),
${px}c$t AS (SELECT p.s, p.code, COALESCE(m.mv, p.cv) AS cv
         FROM ${px}c${t - 1} p LEFT JOIN ${px}m$t m ON m.s = p.s AND m.code = p.code)"""
    }.mkString(",\n")
    s"""${px}c0 AS (SELECT s, code, cv FROM (
          SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code,
                 sub AS cv
          FROM $tsvRel)
        WHERE code < $CodebookK),
$iterCtes,
${argCodeS(svRel, s"${px}c$PqIters", s"${px}codes")},
${px}cn AS (SELECT s, code, cv,
               CAST(floor(list_dot_product(cv, cv) * $Grid30) AS BIGINT) AS cn2q
        FROM ${px}c$PqIters),
${px}rn AS (SELECT c.vec_id, CAST(sum(k.cn2q) AS BIGINT) AS rq
        FROM ${px}codes c JOIN ${px}cn k ON k.s = c.s AND k.code = c.code GROUP BY 1),
${px}lut AS (SELECT q.query_id, q.s, c.code,
                CAST(floor(list_dot_product(q.sub, c.cv) * $Grid30) AS BIGINT) AS pq
         FROM $qsubRel q JOIN ${px}cn c ON c.s = q.s),
${px}adc AS (SELECT l.query_id, c.vec_id, CAST(sum(l.pq) AS BIGINT) AS aq
         FROM ${px}codes c JOIN ${px}lut l ON l.s = c.s AND l.code = c.code
         WHERE c.vec_id <> l.query_id GROUP BY 1, 2),
${px}pqscored AS (SELECT a.query_id, a.vec_id,
        round((CAST(a.aq AS DOUBLE) / $Grid30)
          / (q.nrm * sqrt(CAST(r.rq AS DOUBLE) / $Grid30)), 9) AS score
      FROM ${px}adc a JOIN ${px}rn r ON r.vec_id = a.vec_id
      JOIN $qnRel q USING (query_id))"""
  }

  private val pqSubChainCtes: String = pqSubChain("z", "sv", "tsv", "qsub", "qn")

  /** Mirror of TextAnalytics.bm25TopK as composable CTEs (bm-prefixed
    * to stay disjoint from the lsh/pq chains): first-occurrence query
    * terms, rational RSJ idf, 2^-24-grid exact contribution sums.
    * Constants interpolated from the same Scala doubles the engine
    * uses (Double.toString round-trips). The final relation is
    * `bmr(query_id, doc_id, sg, rnk)` — unfiltered ranks so consumers
    * pick their own k. */
  /** The bm25 chain parameterized by the query-slice predicate (r8
    * verdict item 3: the slice is a parameter, not a convention) — the
    * default instantiation keeps q_bm25_topk/q_rrf_fusion byte-stable. */
  private def bm25Chain(querySlice: String): String = {
    import graft.functions.TextAnalytics.Bm25Grid
    val k1 = 1.2; val b = 0.75
    s"""bmdt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
bmqf AS (SELECT query_id, token, min(pos) AS fp FROM (
         SELECT doc_id AS query_id, unnest(ts) AS token,
                generate_subscripts(ts, 1) AS pos
         FROM bmdt WHERE $querySlice) GROUP BY 1, 2),
bmqt AS (SELECT query_id, token FROM (
             SELECT query_id, token,
                    row_number() OVER (PARTITION BY query_id ORDER BY fp) AS rn
             FROM bmqf) WHERE rn <= 6),
bmvoc AS (SELECT DISTINCT token FROM bmqt),
bmtf AS (SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf FROM (
           SELECT doc_id, len(ts) AS dl, unnest(ts) AS token FROM bmdt)
         JOIN bmvoc USING (token) GROUP BY 1, 2, 3),
bmdf AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM bmtf GROUP BY 1),
bmst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(len(ts)) AS BIGINT) AS total_len FROM bmdt),
bmc AS (SELECT q.query_id, t.doc_id,
        CAST(floor(
          ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
             / (CAST(df AS DOUBLE) + 0.5))
          * (CAST(tf AS DOUBLE) * ${k1 + 1.0})
          / (CAST(tf AS DOUBLE) + $k1 * (${1.0 - b}
              + $b * CAST(dl AS DOUBLE)
                / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))
          * ${Bm25Grid.toDouble}) AS BIGINT) AS cg
      FROM bmtf t JOIN bmqt q USING (token) JOIN bmdf USING (token)
      CROSS JOIN bmst),
bms AS (SELECT query_id, doc_id, CAST(sum(cg) AS BIGINT) AS sg
        FROM bmc GROUP BY 1, 2),
bmr AS (SELECT query_id, doc_id, sg,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sg DESC, doc_id) AS rnk
      FROM bms)"""
  }

  private val bm25ChainCtes: String = bm25Chain("doc_id < 5")

  /** Mirror of Pq.trainPermutation + the OPQ measurement basis: per-dim
    * energy as the exact BIGINT sum of 2^-20-grid-floored x^2 (order-
    * free), snake-draft assignment of the energy ranking over the 8
    * subspaces, vectors re-listed in permuted order. Spark's posexplode
    * is 0-based and generate_subscripts 1-based, but the ranking only
    * orders (s2 DESC, pos ASC) — a monotone shift, same permutation.
    * Assumes e (vec_id, v) and scc are declared; emits osv/otsv/oqsub/
    * oqn for the "o"-prefixed per-subspace chain. oqn recomputes the
    * query norm from the PERMUTED list because the engine collects
    * queries from the permuted frame — a float sum is order-sensitive,
    * so mirroring the permuted summation order is part of the parity
    * contract. */
  private val opqPermCtes: String = {
    import graft.functions.Pq.{NumSub, SubDim, Grid20}
    val nq = 10
    s"""de AS (SELECT pos, sum(CAST(floor(x * x * $Grid20) AS BIGINT)) AS s2
       FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
       GROUP BY 1),
dr AS (SELECT pos, row_number() OVER (ORDER BY s2 DESC, pos) - 1 AS r0 FROM de),
dp AS (SELECT pos AS old_pos,
              (CASE WHEN (r0 // $NumSub) % 2 = 0 THEN r0 % $NumSub
                    ELSE ${NumSub - 1} - (r0 % $NumSub) END) * $SubDim
                + (r0 // $NumSub) AS new_pos
       FROM dr),
pe AS (SELECT vec_id, list(x ORDER BY new_pos) AS v
       FROM (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos
             FROM e) t
       JOIN dp ON dp.old_pos = t.pos GROUP BY 1),
osv AS (SELECT vec_id, ss.s AS s,
              v[(ss.s*$SubDim+1):(ss.s*$SubDim+$SubDim)] AS sub,
              list_transform(v[(ss.s*$SubDim+1):(ss.s*$SubDim+$SubDim)],
                x -> CAST(floor(x * $Grid20) AS BIGINT)) AS subq
       FROM pe CROSS JOIN (SELECT unnest(generate_series(0, ${NumSub - 1})) AS s) ss),
otsv AS (SELECT vec_id, s, sub, subq FROM osv
        WHERE vec_id % (SELECT sc FROM scc) = 0),
oqsub AS (SELECT vec_id AS query_id, s, sub FROM osv WHERE vec_id < $nq),
oqn AS (SELECT vec_id AS query_id, sqrt(list_dot_product(v, v)) AS nrm
        FROM pe WHERE vec_id < $nq)"""
  }

  private val pqOracle: String = {
    val topk = 10
    s"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
$pqChainCtes,
rr AS (SELECT query_id, vec_id AS neighbor_id, score,
              row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, vec_id) AS rnk
       FROM pqscored)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank", score
FROM rr WHERE rnk <= $topk ORDER BY query_id, "rank""""
  }

  /** Mirror of graft.functions.Ivf.clusterSummary: assignment by the
    * same argmax tie-break (score DESC, cid DESC), per-cluster mean
    * distance on the 2^-30 integer grid (order-free), min/max over the
    * bit-identical rounded scores. */
  private val embeddingClustersOracle: String = {
    import graft.functions.Ivf.DistQuantScale
    val cos = ivfCosine("q.v", "q.nrm", "c.cv")
    s"""
WITH $ivfTrainingCtes,
assigned AS (SELECT vec_id, cid, round(score, 9) AS score FROM (
    SELECT q.vec_id, c.cid, $cos AS score,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY $cos DESC, c.cid DESC) AS rn
    FROM q CROSS JOIN c$IvfIters c) WHERE rn = 1),
per AS (SELECT cid, count(*) AS vectors,
          CAST(sum(CAST(floor((1.0 - score) * $DistQuantScale) AS BIGINT)) AS DOUBLE)
            / ($DistQuantScale * CAST(count(*) AS DOUBLE)) AS mean_dist,
          min(score) AS min_score, max(score) AS max_score
        FROM assigned GROUP BY 1),
tot AS (SELECT CAST(sum(vectors) AS BIGINT) AS n FROM per)
SELECT CAST(cid AS INTEGER) AS cid, vectors,
  CAST(vectors AS DOUBLE) / CAST(n AS DOUBLE) AS corpus_frac,
  mean_dist, min_score, max_score
FROM per CROSS JOIN tot ORDER BY cid"""
  }

  /** Mirror of graft.functions.Ivf.semDedup: assignment by the same
    * argmax tie-break, pairwise cosine within each cluster at the
    * rounded-score 0.4 threshold, the q_dedup_clusters recursive
    * min-label CTE for group formation, then the SemDeDup keeper rule
    * (lowest centroid similarity, vec_id tie-break). */
  /** Mirror of TextAnalytics.bpeMerges — the merge loop unrolled like
    * the Lloyd iterations: each round counts adjacent symbol pairs over
    * the vocabulary-sized table, picks the (cnt DESC, l, r) argmax, and
    * applies the double-separator replace. A round whose b-CTE is empty
    * (no pairs left) contributes no output row and NULLs the symbol
    * strings, which the coalesce guard turns into empty pair sets for
    * the remaining rounds — matching the engine's early stop. */
  private val BpeRounds = 6

  /** The fitting CTE chain shared by the merge-report and encode
    * mirrors: v (global word-freq vocabulary), s0 (double-separator
    * symbol strings), then per round t: p$t (adjacent pair counts),
    * b$t (the argmax merge), s$t (vocabulary after the merge). */
  private val bpeFitCtes: String = {
    val iter = (1 to BpeRounds).map { t =>
      s"""p$t AS (
  SELECT ss[i] AS l, ss[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT string_split(sym, '  ') AS ss, freq FROM s${t - 1}) x,
       unnest(range(2, greatest(coalesce(len(ss), 0) - 1, 2))) AS u(i)
  GROUP BY 1, 2),
b$t AS MATERIALIZED (SELECT l, r, cnt FROM p$t ORDER BY cnt DESC, l, r LIMIT 1),
s$t AS (SELECT replace(sym,
          ' ' || (SELECT l FROM b$t) || '  ' || (SELECT r FROM b$t) || ' ',
          ' ' || (SELECT l FROM b$t) || (SELECT r FROM b$t) || ' ') AS sym, freq
        FROM s${t - 1})"""
    }.mkString(",\n")
    s"""v AS (SELECT w, count(*) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY w),
s0 AS (SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS sym, freq FROM v),
$iter"""
  }

  private val bpeMergesOracle: String = {
    val sel = (1 to BpeRounds).map(t => s"SELECT $t AS rnk, l, r, cnt FROM b$t")
      .mkString("\nUNION ALL\n")
    s"""
WITH $bpeFitCtes
SELECT CAST(rnk AS BIGINT) AS "rank", l AS "left", r AS "right", cnt AS pair_count
FROM ($sel) ORDER BY "rank""""
  }

  /** Mirror of TextAnalytics.bpeEncode: the fitted merges (b1..bN above,
    * MATERIALIZED one-row CTEs — a per-row scalar subquery here made
    * DuckDB re-derive the whole fit chain per vocabulary row; the LEFT
    * JOIN evaluates each merge once) applied in rank order to the
    * per-source vocabulary, then the per-source token rollup. The CASE
    * guard turns an empty b$t (early-stopped fit) into a no-op —
    * matching the engine folding only over merges that exist. */
  private val bpeEncodeOracle: String = {
    val encIter = (1 to BpeRounds).map { t =>
      s"""e$t AS (SELECT source, w, freq,
      CASE WHEN m.l IS NULL THEN sym
           ELSE replace(sym, ' ' || m.l || '  ' || m.r || ' ', ' ' || m.l || m.r || ' ')
      END AS sym
    FROM e${t - 1} LEFT JOIN b$t m ON TRUE)"""
    }.mkString(",\n")
    s"""
WITH $bpeFitCtes,
pv AS (SELECT source, w, count(*) AS freq
       FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
       GROUP BY 1, 2),
e0 AS (SELECT source, w, freq,
       '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS sym FROM pv),
$encIter,
enc AS (SELECT source, w, freq,
        CAST(len(string_split(sym, '  ')) - 2 AS BIGINT) AS nsym FROM e$BpeRounds)
SELECT source, count(*) AS words, CAST(sum(freq) AS BIGINT) AS wsp_tokens,
  CAST(sum(freq * nsym) AS BIGINT) AS bpe_tokens,
  CAST(sum(freq * length(w)) AS BIGINT) AS chars,
  CAST(sum(freq * length(w)) AS DOUBLE) / CAST(sum(freq * nsym) AS DOUBLE)
    AS chars_per_token
FROM enc GROUP BY source ORDER BY source"""
  }

  /** Mirror of TextAnalytics.bpeFertility: the encode chain keyed by
    * (lang, source, w) instead of (source, w), exact BIGINT rollups per
    * (lang, source), the per-language baseline joined back, one double
    * division per reported column at the very end (same IEEE shapes as
    * the engine: each ratio is DOUBLE/DOUBLE of BIGINT casts, and
    * fertility_ratio divides the two already-divided doubles). */
  private val bpeFertilityOracle: String = {
    val encIter = (1 to BpeRounds).map { t =>
      s"""f$t AS (SELECT lang, source, w, freq,
      CASE WHEN m.l IS NULL THEN sym
           ELSE replace(sym, ' ' || m.l || '  ' || m.r || ' ', ' ' || m.l || m.r || ' ')
      END AS sym
    FROM f${t - 1} LEFT JOIN b$t m ON TRUE)"""
    }.mkString(",\n")
    s"""
WITH $bpeFitCtes,
fv AS (SELECT lang, source, w, count(*) AS freq
       FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS w
             FROM documents)
       GROUP BY 1, 2, 3),
f0 AS (SELECT lang, source, w, freq,
       '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS sym FROM fv),
$encIter,
fenc AS (SELECT lang, source, w, freq,
         CAST(len(string_split(sym, '  ')) - 2 AS BIGINT) AS nsym FROM f$BpeRounds),
ps AS (SELECT lang, source,
         CAST(sum(freq) AS BIGINT) AS wsp_tokens,
         CAST(sum(freq * nsym) AS BIGINT) AS bpe_tokens,
         CAST(sum(freq * length(w)) AS BIGINT) AS chars
       FROM fenc GROUP BY 1, 2),
pl AS (SELECT lang,
         CAST(sum(wsp_tokens) AS BIGINT) AS lang_wsp,
         CAST(sum(bpe_tokens) AS BIGINT) AS lang_bpe
       FROM ps GROUP BY 1)
SELECT ps.lang, ps.source, wsp_tokens, bpe_tokens, chars,
  CAST(bpe_tokens AS DOUBLE) / CAST(wsp_tokens AS DOUBLE) AS fertility,
  CAST(chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE) AS bytes_per_token,
  CAST(lang_bpe AS DOUBLE) / CAST(lang_wsp AS DOUBLE) AS lang_fertility,
  (CAST(bpe_tokens AS DOUBLE) / CAST(wsp_tokens AS DOUBLE))
    / (CAST(lang_bpe AS DOUBLE) / CAST(lang_wsp AS DOUBLE)) AS fertility_ratio
FROM ps JOIN pl USING (lang) ORDER BY ps.lang, ps.source"""
  }

  /** The synthetic-URL derivation + normalization CTE chain shared by
    * the WebCuration mirrors (g: host/path parts from the dup-cohort
    * arithmetic, r: the messy doc_id%5 url variants, n: the normalized
    * canonical key). Constants interpolate from WebCuration so the two
    * engines can never fork. DuckDB's replace-FIRST regexp_replace
    * equals Spark's replace-all here because every normalization
    * pattern is anchored. */
  private val urlCtes: String = {
    import graft.functions.WebCuration.{UrlCohort, UrlHosts}
    s"""g AS (SELECT doc_id, text,
       'h' || CAST((doc_id // $UrlCohort) % $UrlHosts AS VARCHAR)
           || '.example.com' AS host,
       '/p/' || CAST(doc_id // $UrlCohort AS VARCHAR) AS path
     FROM documents),
r AS (SELECT doc_id, text,
       CASE doc_id % 5
         WHEN 0 THEN 'https://' || host || path
         WHEN 1 THEN 'https://www.' || host || path
         WHEN 2 THEN 'HTTPS://' || upper(host) || path
         WHEN 3 THEN 'https://' || host || path
                  || '?utm_source=rss&utm_id=' || CAST(doc_id AS VARCHAR)
         ELSE 'https://' || host || path || '/'
       END AS url
     FROM g),
n AS (SELECT doc_id, url,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url),
         '^https?://', ''), '^www\\.', ''), '[?#].*$$', ''), '/$$', '')
         AS url_norm
     FROM r)"""
  }

  /** The adaptive-k CTE shared by the dedup/prune mirrors — the SQL
    * twin of Ivf.adaptiveK(n). */
  private val adaptiveKCte =
    "kk AS (SELECT least(1024, greatest(16, count(*) // 125)) AS ak FROM embeddings)"

  private val semDedupOracle: String = {
    val cos = ivfCosine("q.v", "q.nrm", "c.cv")
    s"""
WITH RECURSIVE $adaptiveKCte,
${ivfTrainingCtesK("(SELECT ak FROM kk)")},
assigned AS (SELECT vec_id, cid, round(score, 9) AS cscore FROM (
    SELECT q.vec_id, c.cid, $cos AS score,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY $cos DESC, c.cid DESC) AS rn
    FROM q CROSS JOIN c$IvfIters c) WHERE rn = 1),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN n x ON a.vec_id = x.vec_id JOIN n y ON b.vec_id = y.vec_id
  WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) >= 0.4),
edges AS (SELECT vec_a AS src, vec_b AS dst FROM p
          UNION SELECT vec_b, vec_a FROM p),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.node),
grp AS (SELECT node AS vec_id, min(label) AS group_id FROM reach GROUP BY node),
mem AS (SELECT g.vec_id, a.cid, g.group_id, a.cscore AS centroid_score
        FROM grp g JOIN assigned a USING (vec_id)),
r AS (SELECT *, row_number() OVER (PARTITION BY group_id
         ORDER BY centroid_score, vec_id) AS rn FROM mem)
SELECT vec_id, CAST(cid AS INTEGER) AS cid, CAST(group_id AS BIGINT) AS group_id,
       centroid_score, rn = 1 AS keep
FROM r ORDER BY vec_id"""
  }

  /** Mirror of graft.functions.Ivf.silhouette over the same adaptive-k
    * trained index: per-vector top-two centroid scores via the rn
    * window (rn = 2's score IS the best-other-centroid score, ties
    * included), silhouette on the 1e-9 rounded grid, 2^-30-floored
    * exact sums for the order-free mean. */
  private val silhouetteOracle: String = {
    import graft.functions.Ivf.DistQuantScale
    val cos = ivfCosine("q.v", "q.nrm", "c.cv")
    s"""
WITH $adaptiveKCte,
${ivfTrainingCtesK("(SELECT ak FROM kk)")},
sc AS (SELECT q.vec_id, c.cid, $cos AS score,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY $cos DESC, c.cid DESC) AS rn
       FROM q CROSS JOIN c$IvfIters c),
ab AS (SELECT a.vec_id, a.cid,
         1.0 - round(a.score, 9) AS a,
         1.0 - round(b.score, 9) AS b
       FROM sc a JOIN sc b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
sv AS (SELECT vec_id, cid,
         CASE WHEN greatest(a, b) = 0 THEN 0.0
              ELSE (b - a) / greatest(a, b) END AS s
       FROM ab)
SELECT CAST(cid AS INTEGER) AS cid, count(*) AS vectors,
  CAST(sum(CAST(floor(s * $DistQuantScale) AS BIGINT)) AS DOUBLE)
    / ($DistQuantScale * CAST(count(*) AS DOUBLE)) AS mean_silhouette,
  min(s) AS min_silhouette, max(s) AS max_silhouette
FROM sv GROUP BY cid ORDER BY cid"""
  }

  /** Mirror of graft.functions.Ivf.prototypicalityPrune: same argmax
    * assignment, within-cluster rank by centroid similarity DESC with
    * vec_id tie-break, keep = rank past floor(n * 200/1000). */
  private val protoPruneOracle: String = {
    val cos = ivfCosine("q.v", "q.nrm", "c.cv")
    s"""
WITH $adaptiveKCte,
${ivfTrainingCtesK("(SELECT ak FROM kk)")},
assigned AS (SELECT vec_id, cid, round(score, 9) AS cscore FROM (
    SELECT q.vec_id, c.cid, $cos AS score,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY $cos DESC, c.cid DESC) AS rn
    FROM q CROSS JOIN c$IvfIters c) WHERE rn = 1),
r AS (SELECT vec_id, cid, cscore,
        row_number() OVER (PARTITION BY cid ORDER BY cscore DESC, vec_id) AS proto_rank,
        count(*) OVER (PARTITION BY cid) AS n
      FROM assigned)
SELECT vec_id, CAST(cid AS INTEGER) AS cid, cscore AS centroid_score,
       CAST(proto_rank AS BIGINT) AS proto_rank,
       proto_rank > floor(n * 200.0 / 1000.0) AS keep
FROM r ORDER BY vec_id"""
  }

  /** Mirror of graft.functions.TextAnalytics.gopherRules over the
    * q_gopher_rules dirt derivation (doc_id%4 appends 12 '#' tokens,
    * doc_id%9 appends 60 'a' tokens). */
  private val gopherRulesOracle: String = s"""
WITH d AS (SELECT source,
  text || CASE WHEN doc_id % 4 = 0 THEN repeat(' #', 12) ELSE '' END
       || CASE WHEN doc_id % 9 = 0 THEN repeat(' a', 60) ELSE '' END AS text
  FROM documents),
t AS (SELECT source, string_split(text, ' ') AS toks, text FROM d),
s AS (SELECT source,
  CAST(len(toks) AS BIGINT) AS nw,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS cw,
  CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS na,
  CAST(len(list_intersect(list_distinct(toks), ['the','a','of','and','to','in'])) AS BIGINT) AS nstop,
  CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes
  FROM t),
rules AS (SELECT source,
  (nw >= 50 AND nw <= 100000) AS r_wc,
  (CAST(cw AS DOUBLE) / nw >= 3.0 AND CAST(cw AS DOUBLE) / nw <= 10.0) AS r_mwl,
  (CAST(na AS DOUBLE) / nw >= 0.8) AS r_alpha,
  (CAST(hashes AS DOUBLE) / nw <= 0.1) AS r_sym,
  (nstop >= 2) AS r_stop
  FROM s)
SELECT source, count(*) AS docs,
  CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordcount,
  CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordlen,
  CAST(sum(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS pass_alpha,
  CAST(sum(CASE WHEN r_sym THEN 1 ELSE 0 END) AS BIGINT) AS pass_symbol,
  CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopwords,
  CAST(sum(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_sym AND r_stop
           THEN 1 ELSE 0 END) AS BIGINT) AS pass_all,
  CAST(sum(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_sym AND r_stop
           THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pass_rate
FROM rules GROUP BY source ORDER BY source"""

  /** Mirror of graft.functions.Similarity.centroidDrift over the
    * q_centroid_drift v2 derivation: per-(label,pos) 2^-20-grid integer
    * means (order-free), component lists assembled by pos, cosine via
    * list_dot_product (the DotProduct-proven fold). */
  private val centroidDriftOracle: String = {
    import graft.functions.Ivf.MeanQuantScale
    def centroidCte(name: String, src: String) =
      s"""$name AS (SELECT label, list(m ORDER BY pos) AS c, max(cnt) AS n FROM (
    SELECT label, pos,
           CAST(sum(qc) AS DOUBLE) / ($MeanQuantScale * CAST(count(*) AS DOUBLE)) AS m,
           count(*) AS cnt
    FROM (SELECT label,
                 unnest(list_transform(v, x -> CAST(floor(x * $MeanQuantScale) AS BIGINT))) AS qc,
                 generate_subscripts(v, 1) AS pos
          FROM $src)
    GROUP BY 1, 2) GROUP BY 1)"""
    s"""
WITH b1 AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b2 AS (
  SELECT label,
         CASE WHEN vec_id % 17 = 0 THEN list_reverse(CAST(embedding AS DOUBLE[]))
              ELSE CAST(embedding AS DOUBLE[]) END AS v
  FROM embeddings WHERE vec_id % 13 <> 0
  UNION ALL
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id % 19 = 0),
${centroidCte("c1", "b1")},
${centroidCte("c2", "b2")}
SELECT c1.label, CAST(c1.n AS BIGINT) AS n_v1, CAST(c2.n AS BIGINT) AS n_v2,
       round(list_dot_product(c1.c, c2.c)
         / (sqrt(list_dot_product(c1.c, c1.c)) * sqrt(list_dot_product(c2.c, c2.c))), 9)
         AS centroid_cosine
FROM c1 JOIN c2 ON c1.label = c2.label ORDER BY c1.label"""
  }

  val queries: Map[String, String] = Map(
    "q_knn_ivf" -> ivfOracle,
    "q_embedding_clusters" -> embeddingClustersOracle,
    "q_semdedup" -> semDedupOracle,
    "q_centroid_drift" -> centroidDriftOracle,
    "q_proto_prune" -> protoPruneOracle,
    "q_silhouette" -> silhouetteOracle,
    "q_gopher_rules" -> gopherRulesOracle,
    "q_cosine_neardups" -> s"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
$lshBucketsCte,
$lshCandCtes,
s AS (
  SELECT vec_a, vec_b, round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) AS score
  FROM c JOIN n x ON c.vec_a = x.vec_id JOIN n y ON c.vec_b = y.vec_id)
SELECT vec_a, vec_b, score FROM s WHERE score >= 0.4 ORDER BY vec_a, vec_b""",

    // mirror of Similarity.knnJoinFrom over the full scored pair set
    "q_knn_join" -> s"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
$lshBucketsCte,
$lshCandCtes,
s AS (
  SELECT vec_a, vec_b, round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) AS score
  FROM c JOIN n x ON c.vec_a = x.vec_id JOIN n y ON c.vec_b = y.vec_id),
sym AS (SELECT vec_a AS vec_id, vec_b AS neighbor_id, score FROM s
        UNION ALL
        SELECT vec_b AS vec_id, vec_a AS neighbor_id, score FROM s),
r AS (SELECT vec_id, neighbor_id, score,
             row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, neighbor_id) AS rnk
      FROM sym)
SELECT vec_id, CAST(rnk AS BIGINT) AS "rank", neighbor_id, score
FROM r WHERE rnk <= 3 ORDER BY vec_id, "rank"""",

    // mirror of Relational.cohortRevenue — the PLAIN equi-join (salting
    // is plan-level only, so hash-matching this IS the equivalence proof)
    "q_cohort_revenue" -> """
WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS epoch_s,
                  "value" AS v FROM events),
p AS (SELECT user_id, CAST(round(v * 100) AS BIGINT) AS cents
      FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, CAST(min(epoch_s // 86400) AS BIGINT) AS cohort_day
      FROM e WHERE event_type = 'signup' GROUP BY 1)
SELECT cohort_day, count(*) AS purchases,
       CAST(sum(cents) AS BIGINT) AS cents,
       count(DISTINCT p.user_id) AS buyers
FROM p JOIN c USING (user_id)
GROUP BY 1 ORDER BY cohort_day""",

    // mirror of Relational.eventAnomalies (exact BIGINT window sums; the
    // z-score's doubles are all exactly-representable integers or
    // correctly-rounded IEEE ops)
    "q_event_anomalies" -> """
WITH m AS (SELECT event_type, epoch_ns(ts) // 1000000000 // 60 AS minute,
                  CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, minute, cents,
             count(*) OVER tw AS k,
             CAST(sum(cents) OVER tw AS BIGINT) AS s,
             CAST(sum(cents * cents) OVER tw AS BIGINT) AS ss
      FROM m
      WINDOW tw AS (PARTITION BY event_type ORDER BY minute
                    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
z AS (SELECT event_type, minute, cents,
             round((CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / k)
               / sqrt(greatest(CAST(ss AS DOUBLE) / k
                 - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k), 0.000001)), 9) AS z
      FROM w WHERE k >= 5)
SELECT event_type, minute, cents, z
FROM z WHERE abs(z) > 3.0 ORDER BY event_type, minute""",

    "q_knn_lsh" -> s"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
$lshBucketsCte,
qb AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, tbl, key FROM b WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT query_id, vec_id,
         round(list_dot_product(qv, b.v) / (qnrm * b.nrm), 9) AS score
  FROM b JOIN qb USING (tbl, key) WHERE vec_id <> query_id),
r AS (SELECT query_id, vec_id AS neighbor_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      FROM cand)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank", score
FROM r WHERE rnk <= 10 ORDER BY query_id, "rank"""",

    // mirror of functions.Pca.topComponent: three power iterations
    // unrolled in CTEs. Per iteration: s = v·dir (sequential fold),
    // per-dimension contributions floor-quantized to the 2^-20 grid and
    // summed as exact BIGINTs (order-free), then normalized with the
    // same left-to-right list_dot_product fold the engine uses.
    // v0 = 1/sqrt(64) = 0.125 exactly.
    "q_pca_component" -> s"""
WITH $pcaCtes
SELECT CAST(t.pos - 1 AS BIGINT) AS dim, round(n3.vl[t.pos], 9) AS loading
FROM n3, unnest(range(1, 65)) AS t(pos)
ORDER BY dim""",

    // mirror of functions.Pca.projectionByLabel: the regenerated top
    // direction projected onto every vector; order-free stats only
    "q_pca_projection" -> s"""
WITH $pcaCtes,
p AS (SELECT label,
        round(list_dot_product(CAST(embedding AS DOUBLE[]),
          (SELECT vl FROM n3)), 9) AS proj
      FROM embeddings)
SELECT label, count(*) AS n_vecs,
       min(proj) AS min_proj, max(proj) AS max_proj,
       quantile_cont(proj, 0.25) AS p25_proj,
       quantile_cont(proj, 0.5) AS median_proj,
       quantile_cont(proj, 0.75) AS p75_proj
FROM p GROUP BY 1 ORDER BY label""",

    // mirror of functions.Pca.topDirections(2) via deflation: after the
    // first unrolled power iteration, every vector sheds its projection
    // onto n3 (x' = x - (x·v) v, elementwise) and the iterations rerun
    // on the residuals with the "b" prefix
    "q_pca_deflation" -> s"""
WITH $pcaCtes,
d1 AS (SELECT v, list_dot_product(v, n3.vl) AS s, n3.vl AS pv
       FROM e CROSS JOIN n3),
e2 AS (SELECT list_transform(range(1, 65), i -> v[i] - s * pv[i]) AS v
       FROM d1),
${pcaIters("b", "e2")}
SELECT CAST(1 AS BIGINT) AS component, CAST(t.pos - 1 AS BIGINT) AS dim,
       round(n3.vl[t.pos], 9) AS loading
FROM n3, unnest(range(1, 65)) AS t(pos)
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(t.pos - 1 AS BIGINT), round(bn3.vl[t.pos], 9)
FROM bn3, unnest(range(1, 65)) AS t(pos)
ORDER BY component, dim""",

    // mirror of Similarity.knnLshMultiProbe: qb expands each query key
    // with the Hamming-distance-1 probes (xor with one bit, plus 0)
    // mirror of Similarity.annRecall: the exact, single-probe,
    // multi-probe, pooled-PQ, and per-subspace-PQ top-10 sets
    // regenerated (the committed mirrors composed over shared
    // e/n/b/sv CTEs), hit-counted per query
    "q_ann_recall" -> s"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 10),
p AS (SELECT query_id, vec_id, round(list_dot_product(qv, v) / (qnrm * nrm), 9) AS score
      FROM q, n WHERE vec_id <> query_id),
ex AS (SELECT query_id, vec_id AS neighbor_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
         FROM p) WHERE rnk <= 10),
$lshBucketsCte,
qb1 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, tbl, key FROM b WHERE vec_id < 10),
cand1 AS (SELECT DISTINCT query_id, vec_id,
            round(list_dot_product(qv, b.v) / (qnrm * b.nrm), 9) AS score
          FROM b JOIN qb1 USING (tbl, key) WHERE vec_id <> query_id),
l1 AS (SELECT query_id, vec_id AS neighbor_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
         FROM cand1) WHERE rnk <= 10),
qb2 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, tbl,
               xor(CAST(key AS BIGINT), f.flip) AS key
        FROM b, (VALUES (CAST(0 AS BIGINT)), (1), (2), (4), (8)) f(flip)
        WHERE vec_id < 10),
cand2 AS (SELECT DISTINCT query_id, vec_id,
            round(list_dot_product(qv, b.v) / (qnrm * b.nrm), 9) AS score
          FROM b JOIN qb2 USING (tbl, key) WHERE vec_id <> query_id),
l2 AS (SELECT query_id, vec_id AS neighbor_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
         FROM cand2) WHERE rnk <= 10),
$pqChainCtes,
l3 AS (SELECT query_id, vec_id AS neighbor_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
         FROM pqscored) WHERE rnk <= 10),
$pqSubChainCtes,
l4 AS (SELECT query_id, vec_id AS neighbor_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
         FROM zpqscored) WHERE rnk <= 10),
$opqPermCtes,
${pqSubChain("o", "osv", "otsv", "oqsub", "oqn")},
l5 AS (SELECT query_id, vec_id AS neighbor_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
         FROM opqscored) WHERE rnk <= 10),
h1 AS (SELECT ex.query_id, CAST(count(l1.neighbor_id) AS BIGINT) AS lsh_hits
       FROM ex LEFT JOIN l1 USING (query_id, neighbor_id) GROUP BY 1),
h2 AS (SELECT ex.query_id, CAST(count(l2.neighbor_id) AS BIGINT) AS multiprobe_hits
       FROM ex LEFT JOIN l2 USING (query_id, neighbor_id) GROUP BY 1),
h3 AS (SELECT ex.query_id, CAST(count(l3.neighbor_id) AS BIGINT) AS pq_hits
       FROM ex LEFT JOIN l3 USING (query_id, neighbor_id) GROUP BY 1),
h4 AS (SELECT ex.query_id, CAST(count(l4.neighbor_id) AS BIGINT) AS pq_sub_hits
       FROM ex LEFT JOIN l4 USING (query_id, neighbor_id) GROUP BY 1),
h5 AS (SELECT ex.query_id, CAST(count(l5.neighbor_id) AS BIGINT) AS opq_hits
       FROM ex LEFT JOIN l5 USING (query_id, neighbor_id) GROUP BY 1)
SELECT h1.query_id, lsh_hits, CAST(lsh_hits AS DOUBLE) / 10.0 AS lsh_recall,
       multiprobe_hits, CAST(multiprobe_hits AS DOUBLE) / 10.0 AS multiprobe_recall,
       pq_hits, CAST(pq_hits AS DOUBLE) / 10.0 AS pq_recall,
       pq_sub_hits, CAST(pq_sub_hits AS DOUBLE) / 10.0 AS pq_sub_recall,
       opq_hits, CAST(opq_hits AS DOUBLE) / 10.0 AS opq_recall
FROM h1 JOIN h2 USING (query_id) JOIN h3 USING (query_id)
JOIN h4 USING (query_id) JOIN h5 USING (query_id) ORDER BY query_id""",

    "q_knn_lsh_multiprobe" -> s"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
$lshBucketsCte,
qb AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, tbl,
              xor(CAST(key AS BIGINT), f.flip) AS key
       FROM b, (VALUES (CAST(0 AS BIGINT)), (1), (2), (4), (8)) f(flip)
       WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT query_id, vec_id,
         round(list_dot_product(qv, b.v) / (qnrm * b.nrm), 9) AS score
  FROM b JOIN qb USING (tbl, key) WHERE vec_id <> query_id),
r AS (SELECT query_id, vec_id AS neighbor_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      FROM cand)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank", score
FROM r WHERE rnk <= 10 ORDER BY query_id, "rank"""",

    // mirror of Dedup.winnowPairs: positional 5-gram polyhash sequence
    // (NOT distinct-ed — winnowing is positional), per-window-of-4
    // minima distinct-ed per doc, capped inverted index, pairs with
    // >= 2 shared fingerprints
    "q_winnow_pairs" -> """
WITH sg AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4]) AS sgl
  FROM documents),
hs AS (
  SELECT doc_id,
         list_transform(sgl, s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(s) + 1),
             i -> CAST(ascii(s[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS hs
  FROM sg),
fpt AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(hs) >= 8
             THEN list_transform(range(1, len(hs) - 6),
                    j -> list_min(hs[j:j+7]))
             ELSE [] END)) AS fp
  FROM hs),
rare AS (SELECT fp FROM fpt GROUP BY 1 HAVING count(*) <= 50),
fpr AS (SELECT f.doc_id, f.fp FROM fpt f JOIN rare USING (fp)),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM fpr GROUP BY 1),
shrd AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, shared, sa.n_fp AS n_a, sb.n_fp AS n_b,
       CAST(shared AS DOUBLE) / (sa.n_fp + sb.n_fp - shared) AS sim
FROM shrd JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(shared AS DOUBLE) / (sa.n_fp + sb.n_fp - shared) >= 0.3
ORDER BY doc_a, doc_b""",

    // mirror of q_minhash_calibration: minhash-estimate CTEs joined to
    // TRUE full-shingle jaccard (distinct shingle-hash list intersects
    // per candidate pair — not the df-capped index)
    "q_minhash_calibration" -> s"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM documents),
xs AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM sh),
f AS (SELECT doc_id, $minhashSigSql AS sig FROM xs),
$minhashCandCtes,
hs AS (SELECT doc_id, list_distinct(xs) AS hs FROM xs),
cal AS (
  SELECT p.est_jaccard,
         CAST(len(list_intersect(xa.hs, xb.hs)) AS DOUBLE)
           / (len(xa.hs) + len(xb.hs) - len(list_intersect(xa.hs, xb.hs)))
           AS true_j
  FROM cand p JOIN hs xa ON p.doc_a = xa.doc_id JOIN hs xb ON p.doc_b = xb.doc_id)
SELECT CAST(floor(est_jaccard * 8) AS BIGINT) AS bucket,
       count(*) AS pairs,
       quantile_cont(abs(est_jaccard - true_j), 0.5) AS p50_abs_err,
       max(abs(est_jaccard - true_j)) AS max_abs_err
FROM cal GROUP BY 1 ORDER BY bucket""",

    "q_minhash_pairs" -> s"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM documents),
xs AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM sh),
f AS (SELECT doc_id, $minhashSigSql AS sig FROM xs),
$minhashCandCtes
SELECT doc_a, doc_b, est_jaccard FROM cand
WHERE est_jaccard >= 0.3
ORDER BY doc_a, doc_b""",

    // mirror of IncrementalDedup.incrementalRun — deliberately NOT the
    // engine's decomposition: this runs the FROM-SCRATCH two-stage dedup
    // of the whole union (exact keep-min, then minhash-LSH connected
    // components keep-min) and reads off the crawl docs' verdicts, so
    // the hash gate IS the incremental-equals-from-scratch equivalence
    // proof. Split boundary = 4/5 of max id, same scalar both sides.
    "q_incremental_dedup" -> s"""
WITH RECURSIVE
bnd AS (SELECT (max(doc_id) * 4) // 5 AS t FROM documents),
h AS (SELECT doc_id, source, text, md5(text) AS ch FROM documents),
km AS (SELECT ch, min(doc_id) AS keep_id FROM h GROUP BY 1),
surv AS (SELECT h.doc_id, h.text FROM h
         JOIN km ON h.ch = km.ch AND h.doc_id = km.keep_id),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM surv WHERE length(text) >= 5),
xs AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM sh),
f AS (SELECT doc_id, $minhashSigSql AS sig FROM xs),
$minhashCandCtes,
prs AS (SELECT doc_a, doc_b FROM cand WHERE est_jaccard >= 0.3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION SELECT doc_b, doc_a FROM prs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
cl AS (SELECT node AS doc_id, min(label) <> node AS dropped
       FROM reach GROUP BY node)
SELECT h.doc_id, h.source,
       CASE WHEN km.keep_id <> h.doc_id THEN 'exact_dup'
            WHEN coalesce(cl.dropped, false) THEN 'near_dup'
            ELSE 'admitted' END AS outcome
FROM h JOIN km ON h.ch = km.ch
LEFT JOIN cl ON cl.doc_id = h.doc_id
CROSS JOIN bnd WHERE h.doc_id > bnd.t
ORDER BY h.doc_id""",

    // mirror of AdmissionStream.gateBatch: the per-document ARRIVAL
    // gate — exact_dup on a corpus hash hit, near_dup on any verified
    // (est >= 0.3) edge to an ANCHORED corpus band row, admitted
    // otherwise. Corpus side = exact survivors of the 80% horizon with
    // per-bucket anchor ranks (the rankedIndex mirror); crawl side =
    // every doc above the horizon, signatures computed per doc (no
    // crawl-internal effects of any kind — the gate contract).
    "q_admission_gate" -> {
      import graft.functions.Sketches.{BandAnchors, MinHashBands, RowsPerBand}
      s"""
WITH
bnd AS (SELECT (max(doc_id) * 4) // 5 AS t FROM documents),
hc AS (SELECT doc_id, text, md5(text) AS ch FROM documents
       WHERE doc_id <= (SELECT t FROM bnd)),
kmc AS (SELECT ch, min(doc_id) AS keep_id FROM hc GROUP BY 1),
survc AS (SELECT hc.doc_id, hc.text FROM hc
          JOIN kmc ON hc.ch = kmc.ch AND hc.doc_id = kmc.keep_id),
shc AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM survc WHERE length(text) >= 5),
xsc AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM shc),
fc AS (SELECT doc_id, $minhashSigSql AS sig FROM xsc),
bkc AS (
  SELECT doc_id, sig, g.band AS band,
         sig[g.band * $RowsPerBand + 1 : g.band * $RowsPerBand + $RowsPerBand] AS bkey
  FROM fc, (SELECT unnest(range($MinHashBands)) AS band) g),
rkc AS (
  SELECT doc_id, sig, band, bkey,
         row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS rk
  FROM bkc),
hx AS (SELECT doc_id, source, text, md5(text) AS ch FROM documents
       WHERE doc_id > (SELECT t FROM bnd)),
shx AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM hx WHERE length(text) >= 5),
xsx AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM shx),
fx AS (SELECT doc_id, $minhashSigSql AS sig FROM xsx),
bkx AS (
  SELECT doc_id, sig, g.band AS band,
         sig[g.band * $RowsPerBand + 1 : g.band * $RowsPerBand + $RowsPerBand] AS bkey
  FROM fx, (SELECT unnest(range($MinHashBands)) AS band) g),
hits AS (
  SELECT DISTINCT b.doc_id
  FROM rkc a JOIN bkx b ON a.band = b.band AND a.bkey = b.bkey
    AND a.rk <= $BandAnchors
  WHERE CAST(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) AS DOUBLE)
        / 64 >= 0.3),
exh AS (SELECT DISTINCT ch FROM hc)
SELECT hx.doc_id, hx.source,
  CASE WHEN exh.ch IS NOT NULL THEN 'exact_dup'
       WHEN hits.doc_id IS NOT NULL THEN 'near_dup'
       ELSE 'admitted' END AS outcome
FROM hx LEFT JOIN exh ON hx.ch = exh.ch
LEFT JOIN hits ON hits.doc_id = hx.doc_id
ORDER BY hx.doc_id"""
    },

    // mirror of IncrementalDedup.reconcile: online verdicts for the
    // window (split1, split2] equal the from-scratch union verdicts of
    // docs <= split2 (the admissions equivalence contract the
    // q_incremental_dedup gate proves), so the reconciliation is two
    // from-scratch runs diffed — horizon t2 ("what online admission
    // saw") vs the full corpus ("what the weekly CC knows now").
    "q_dedup_reconcile" -> s"""
WITH RECURSIVE
bnd AS (SELECT (max(doc_id) * 4) // 5 AS t1, (max(doc_id) * 9) // 10 AS t2
        FROM documents),
${unionVerdictCtes("_w", "doc_id <= (SELECT t2 FROM bnd)")},
${unionVerdictCtes("_u", "true")}
SELECT w.doc_id, w.source, w.outcome AS online_outcome,
       u.outcome AS offline_outcome,
       (w.outcome = 'admitted' AND u.outcome = 'near_dup') AS retro_dropped
FROM v_w w JOIN v_u u ON w.doc_id = u.doc_id
CROSS JOIN bnd WHERE w.doc_id > bnd.t1 AND w.doc_id <= bnd.t2
ORDER BY w.doc_id""",

    // mirror of the cross-crawl span-level excision
    // (q_incremental_excision): admission verdicts come from the literal
    // from-scratch union pipeline (the admissions equivalence contract);
    // for each ADMITTED crawl doc, every positional 5-gram whose hash
    // exists anywhere in the prior corpus (doc_id <= split — presence,
    // not the within-corpus df>1 dup set) covers its 5 tokens, DISTINCT
    // merges overlaps, and kept tokens re-join in position order — the
    // dup-excision rebuild with the detect half swapped for the
    // prior-corpus n-gram presence set
    "q_incremental_excision" -> s"""
WITH RECURSIVE
bnd AS (SELECT (max(doc_id) * 4) // 5 AS t FROM documents),
${unionVerdictCtes("_u", "true")},
adm AS (SELECT v.doc_id FROM v_u v, bnd
        WHERE v.doc_id > bnd.t AND v.outcome = 'admitted'),
t AS (SELECT d.doc_id, d.text, string_split(d.text, ' ') AS toks
      FROM documents d JOIN adm USING (doc_id)),
ng AS (SELECT doc_id,
         unnest(range(1, len(toks) - 3)) AS pos,
         unnest(list_transform(
                  list_transform(range(1, len(toks) - 3),
                    g -> array_to_string(toks[g:g+4], ' ')),
                  s -> ${tokenHashSqlOf("s")})) AS ngh
       FROM t WHERE len(toks) >= 5),
ct AS (SELECT string_split(text, ' ') AS toks
       FROM documents, bnd WHERE doc_id <= bnd.t),
pset AS (SELECT DISTINCT unnest(list_transform(
           list_transform(range(1, len(toks) - 3),
             g -> array_to_string(toks[g:g+4], ' ')),
           s -> ${tokenHashSqlOf("s")})) AS ngh
         FROM ct WHERE len(toks) >= 5),
dp AS (SELECT doc_id, pos FROM ng JOIN pset USING (ngh)),
cov AS (SELECT DISTINCT doc_id, pos + o.off AS cpos
        FROM dp CROSS JOIN (VALUES (0),(1),(2),(3),(4)) o(off)),
tok AS (SELECT doc_id, unnest(toks) AS token,
               unnest(range(1, len(toks) + 1)) AS tpos FROM t),
kept AS (SELECT k.doc_id, k.token, k.tpos
         FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.tpos = c.cpos
         WHERE c.cpos IS NULL),
cle AS (SELECT doc_id, string_agg(token, ' ' ORDER BY tpos) AS cleaned_text,
               CAST(count(*) AS BIGINT) AS kept_tokens FROM kept GROUP BY 1)
SELECT t.doc_id, coalesce(cle.cleaned_text, '') AS cleaned_text,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(cle.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(strlen(t.text) - strlen(coalesce(cle.cleaned_text, ''))
            AS BIGINT) AS bytes_removed
FROM t LEFT JOIN cle USING (doc_id) ORDER BY doc_id""",

    // mirror of Similarity.hybridVerify: the banded MinHash candidate
    // set (text signal) joined to exact embedding cosine (semantic
    // signal) on the shared doc_id == vec_id key
    "q_hybrid_dedup" -> s"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM documents),
xs AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM sh),
f AS (SELECT doc_id, $minhashSigSql AS sig FROM xs),
$minhashCandCtes,
en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
       FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings))
SELECT c.doc_a, c.doc_b, c.est_jaccard,
  round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) AS cosine,
  round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) >= 0.4 AS confirmed
FROM cand c
JOIN en x ON c.doc_a = x.vec_id JOIN en y ON c.doc_b = y.vec_id
WHERE c.est_jaccard >= 0.3
ORDER BY doc_a, doc_b""",

    // mirror of Sketches.sourceSimilarity: per-doc minhash sigs (docs
    // shorter than the shingle width excluded, as in minHashSignatures),
    // elementwise min per source = the source's UNION signature, then
    // the S^2/2 agreement comparison
    "q_source_similarity" -> s"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM documents WHERE length(text) >= 5),
xs AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM sh),
f AS (SELECT doc_id, $minhashSigSql AS sig FROM xs),
fs AS (SELECT f.doc_id, d.source, f.sig
       FROM f JOIN documents d USING (doc_id)),
s AS (SELECT source, count(*) AS docs,
             [${(1 to graft.functions.Sketches.NumHashes)
                  .map(i => s"min(sig[$i])").mkString(", ")}] AS sig
      FROM fs GROUP BY source)
SELECT a.source AS source_a, b.source AS source_b,
       a.docs AS docs_a, b.docs AS docs_b,
       CAST(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64
         AS est_jaccard
FROM s a JOIN s b ON a.source < b.source
ORDER BY source_a, source_b""",

    // mirror of TextAnalytics.fuzzyContaminationAgainst over the
    // perturbed bench suite (doc_id % 97, token at doc_id % n_tokens
    // replaced by 'xq'): minhash sigs on both sides, banded candidates
    // (bench side has no anchor cap — it is bounded by contract),
    // levenshtein verification within 10% of the longer text
    "q_fuzzy_contamination" -> s"""
WITH bsrc AS (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE doc_id % 97 = 0
              ORDER BY doc_id LIMIT 100),
bench AS (
  SELECT doc_id AS bench_id,
         array_to_string(list_transform(range(1, len(toks) + 1),
           i -> CASE WHEN i - 1 = doc_id % len(toks) THEN 'xq' ELSE toks[i] END),
           ' ') AS text
  FROM bsrc),
csh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM documents WHERE length(text) >= 5),
cxs AS (
  SELECT doc_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM csh),
cf AS (SELECT doc_id, $minhashSigSql AS sig FROM cxs),
bsh AS (
  SELECT bench_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
           i -> text[i:i+4])) AS shingles
  FROM bench WHERE length(text) >= 5),
bxs AS (
  SELECT bench_id,
         list_transform(shingles, sgl -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(sgl) + 1), i -> CAST(ascii(sgl[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007)) AS xs
  FROM bsh),
bf AS (SELECT bench_id, $minhashSigSql AS sig FROM bxs),
cbk AS (SELECT doc_id, g.band AS band,
               sig[g.band * 4 + 1 : g.band * 4 + 4] AS bkey
        FROM cf, (SELECT unnest(range(16)) AS band) g),
bbk AS (SELECT bench_id, g.band AS band,
               sig[g.band * 4 + 1 : g.band * 4 + 4] AS bkey
        FROM bf, (SELECT unnest(range(16)) AS band) g),
cand AS (SELECT DISTINCT c.doc_id, b.bench_id
         FROM cbk c JOIN bbk b ON c.band = b.band AND c.bkey = b.bkey),
lev AS (
  SELECT cand.bench_id, cand.doc_id,
         levenshtein(d.text, bn.text) AS dist,
         greatest(length(d.text), length(bn.text)) AS mx
  FROM cand JOIN documents d USING (doc_id) JOIN bench bn USING (bench_id)),
per AS (
  SELECT bench_id, count(*) AS candidates,
         sum(CASE WHEN dist <= mx * 0.1 THEN 1 ELSE 0 END) AS matches,
         min(dist) AS min_dist
  FROM lev GROUP BY 1)
SELECT b.bench_id,
       CAST(coalesce(candidates, 0) AS BIGINT) AS candidates,
       CAST(coalesce(matches, 0) AS BIGINT) AS matches,
       CAST(min_dist AS BIGINT) AS min_dist,
       coalesce(matches, 0) > 0 AS flagged
FROM bench b LEFT JOIN per USING (bench_id)
ORDER BY bench_id""",

    // mirror of TextAnalytics.sourceBoilerplate over the templated
    // corpus (header on doc_id%2, footer on %3): per-doc-distinct
    // 3-gram hashes, source df floor (df >= 3 AND df >= 25% of the
    // source's docs), hit counting joined back on the same key
    "q_source_boilerplate" -> s"""
WITH dirty AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 2 = 0
           THEN 'all rights reserved contact us for more info ' ELSE '' END
         || text ||
         CASE WHEN doc_id % 3 = 0
           THEN ' subscribe to our newsletter for weekly updates' ELSE '' END AS text
  FROM documents),
t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM dirty),
ng AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           list_transform(range(1, len(toks) - 1),
             g -> array_to_string(toks[g:g+2], ' ')),
           s -> ${tokenHashSqlOf("s")}))) AS ngh
  FROM t WHERE len(toks) >= 3),
srcn AS (SELECT source, count(*) AS docs FROM documents GROUP BY 1),
dfx AS (SELECT source, ngh, count(*) AS df FROM ng GROUP BY 1, 2),
boiler AS (SELECT d.source, d.ngh
           FROM dfx d JOIN srcn s USING (source)
           WHERE df >= 3 AND CAST(df AS DOUBLE) >= s.docs * 0.25),
bcount AS (SELECT source, count(*) AS boiler_ngrams FROM boiler GROUP BY 1),
hits AS (SELECT ng.source, count(*) AS boiler_hits
         FROM ng JOIN boiler USING (source, ngh) GROUP BY 1),
tot AS (SELECT source, count(*) AS n_ngrams FROM ng GROUP BY 1)
SELECT s.source, s.docs,
       CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(boiler_ngrams, 0) AS BIGINT) AS boiler_ngrams,
       CAST(coalesce(boiler_hits, 0) AS BIGINT) AS boiler_hits,
       CASE WHEN coalesce(n_ngrams, 0) > 0
         THEN CAST(coalesce(boiler_hits, 0) AS DOUBLE) / n_ngrams
         ELSE 0.0 END AS boiler_frac
FROM srcn s LEFT JOIN bcount USING (source) LEFT JOIN hits USING (source)
  LEFT JOIN tot USING (source)
ORDER BY source""",

    // mirror of TextAnalytics.lengthDrift: v2 derived as in
    // q_corpus_diff (13 drops, 17 edits appending ' v2', 19 re-adds),
    // exact KS numerator in HUGEINT (the engine uses DECIMAL(38,0) —
    // both exact on this grid), reported as BIGINT (a decimal output
    // column is representation-unstable across the compare harness)
    "q_length_drift" -> """
WITH v1 AS (SELECT lang, CAST(length(text) AS BIGINT) AS n_chars FROM documents),
v2 AS (
  SELECT lang, CAST(length(CASE WHEN doc_id % 17 = 0 THEN text || ' v2'
                                ELSE text END) AS BIGINT) AS n_chars
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT lang, CAST(length(text) AS BIGINT) FROM documents WHERE doc_id % 19 = 0),
g1 AS (SELECT lang, n_chars, count(*) AS c1 FROM v1 GROUP BY 1, 2),
g2 AS (SELECT lang, n_chars, count(*) AS c2 FROM v2 GROUP BY 1, 2),
grid AS (SELECT lang, n_chars, coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
         FROM g1 FULL OUTER JOIN g2 USING (lang, n_chars)),
cum AS (
  SELECT lang,
         sum(c1) OVER (PARTITION BY lang ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
         sum(c2) OVER (PARTITION BY lang ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2,
         sum(c1) OVER (PARTITION BY lang) AS n1,
         sum(c2) OVER (PARTITION BY lang) AS n2
  FROM grid),
agg AS (
  SELECT lang, max(n1) AS n1, max(n2) AS n2,
         max(abs(CAST(f1 AS HUGEINT) * CAST(n2 AS HUGEINT)
               - CAST(f2 AS HUGEINT) * CAST(n1 AS HUGEINT))) AS ks_num
  FROM cum GROUP BY 1)
SELECT lang, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(ks_num AS BIGINT) AS ks_num,
       CASE WHEN n1 > 0 AND n2 > 0
         THEN CAST(ks_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
         ELSE NULL END AS ks_stat
FROM agg ORDER BY lang""",

    // length routing mirrored: the same spaces+1 token floor as
    // Sketches.simHashPairs(minTokens = SimHashMinTokens)
    "q_simhash_pairs" -> s"""
WITH d AS (SELECT doc_id, text FROM documents
           WHERE length(text) - length(translate(text, ' ', '')) + 1
                 >= ${graft.functions.Sketches.SimHashMinTokens}),
t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM d),
h0 AS (SELECT doc_id, $tokenHashSql AS ch FROM t),
h1 AS (SELECT doc_id, ${mix60Sql("ch")} AS ch FROM h0),
h AS (SELECT doc_id, ${mix60Sql2("ch")} AS ch FROM h1),
f AS (SELECT doc_id, $simhashBitsSql AS simhash FROM h GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM f a JOIN f b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
ORDER BY doc_a, doc_b""",

    // mirror of Multimodal.sizeStats (ASCII corpus: char length ==
    // byte length, the q_multimodal_features convention)
    "q_multimodal_sizes" -> """
WITH a AS (
  SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
         CAST(length(text) AS BIGINT) AS bytes
  FROM documents)
SELECT kind, count(*) AS n_assets,
       min(bytes) AS min_bytes, max(bytes) AS max_bytes,
       quantile_cont(bytes, 0.5) AS median_bytes,
       CAST(sum(bytes) AS BIGINT) AS total_bytes
FROM a GROUP BY 1 ORDER BY kind""",

    "q_multimodal_features" -> """
WITH a AS (
  SELECT doc_id AS asset_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
         text, length(text) AS n
  FROM documents),
bins AS (
  SELECT kind, unnest(list_transform(range(1, n + 1), i -> ascii(text[i:i]) // 16)) AS bin
  FROM a),
bincnt AS (SELECT kind, bin, count(*) AS cnt FROM bins GROUP BY 1, 2),
ka AS (SELECT kind, CAST(sum(n) AS BIGINT) AS total_bytes, count(*) AS n_assets
       FROM a GROUP BY 1),
grid AS (SELECT kind, CAST(p AS INT) AS pos
         FROM (SELECT DISTINCT kind FROM a), range(0, 16) t(p))
SELECT g.kind, g.pos,
       CAST(COALESCE(b.cnt, 0) AS BIGINT) AS bin_count,
       ka.total_bytes,
       CAST(COALESCE(b.cnt, 0) AS DOUBLE) / ka.total_bytes AS pooled_feature,
       ka.n_assets
FROM grid g JOIN ka ON g.kind = ka.kind
LEFT JOIN bincnt b ON b.kind = g.kind AND b.bin = g.pos
ORDER BY g.kind, g.pos""",

    "q_doc_length_histogram" -> """
SELECT n_chars // 100 AS bucket, count(*) AS docs
FROM documents GROUP BY 1 ORDER BY bucket""",

    "q_doc_stats" -> """
SELECT doc_id, n_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
    / len(string_split(text, ' ')) AS avg_token_len
FROM documents ORDER BY doc_id""",

    "q_token_freq" -> """
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY 1 ORDER BY cnt DESC, token LIMIT 50""",

    "q_token_counts" -> """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpeish_tokens,
  CAST(length(text) AS DOUBLE)
    / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS chars_per_token
FROM documents ORDER BY doc_id""",

    "q_quality" -> s"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> x IN $stop)) AS BIGINT) AS n_stop,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
      FROM t)
SELECT doc_id, n_tokens, n_stop, n_unique,
  CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
  0.4 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
    + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
    + 0.3 * (CAST(n_unique AS DOUBLE) / n_tokens) AS quality_score
FROM s ORDER BY doc_id""",

    // mirror of TextAnalytics.bpeMerges: word-freq vocabulary, then 6
    // unrolled merge rounds (the Lloyd-unrolling technique) — same
    // double-space symbol representation, same non-overlapping replace,
    // same (cnt DESC, l, r) tie-break
    "q_bpe_merges" -> bpeMergesOracle,
    "q_bpe_encode" -> bpeEncodeOracle,
    "q_bpe_fertility" -> bpeFertilityOracle,

    // mirror of WebCuration.urlDedup over the synthetic fixture URLs:
    // the messy-url derivation, the anchored-regex normalization chain
    // (replace-first == replace-all on anchored patterns), and the
    // one-window verdict (group size + min-doc_id keep)
    "q_url_dedup" -> s"""
WITH $urlCtes
SELECT doc_id, url, url_norm,
  CAST(count(*) OVER (PARTITION BY url_norm) AS BIGINT) AS url_docs,
  doc_id = min(doc_id) OVER (PARTITION BY url_norm) AS keep
FROM n ORDER BY doc_id""",

    // mirror of WebCuration.domainRollup: per-domain volume, URL-dedup
    // pressure, exact-BIGINT token sums, quantile_cont median quality
    // (the proven percentile parity), dup_rate as the same
    // (docs - kept)::DOUBLE / docs::DOUBLE IEEE shape
    "q_domain_rollup" -> s"""
WITH $urlCtes,
v AS (SELECT doc_id, url_norm,
        CAST(count(*) OVER (PARTITION BY url_norm) AS BIGINT) AS url_docs,
        doc_id = min(doc_id) OVER (PARTITION BY url_norm) AS keep
      FROM n),
q AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        0.4 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN $stop)) AS DOUBLE)
               / len(string_split(text, ' ')))
          + 0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
          + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' '))) AS quality_score
      FROM documents),
d AS (SELECT v.doc_id, regexp_replace(url_norm, '/.*$$', '') AS domain,
        url_norm, keep, n_tokens, quality_score
      FROM v JOIN q ON v.doc_id = q.doc_id)
SELECT domain,
  CAST(count(*) AS BIGINT) AS docs,
  CAST(count(DISTINCT url_norm) AS BIGINT) AS distinct_urls,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
  CAST(count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS dup_rate,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  quantile_cont(quality_score, 0.5) AS median_quality
FROM d GROUP BY domain ORDER BY domain""",

    // mirror of TextAnalytics.qualityProbe: exact-integer ridge probe
    // trained on clean-vs-degraded (40 appended '#@' tokens) — same
    // features, HUGEINT normal equations + Cramer determinants, the
    // same pure-integer keep comparison (no doubles until the rates)
    "q_quality_probe" -> s"""
WITH base AS (SELECT doc_id, source, text FROM documents),
u AS (SELECT doc_id, source, text, 1 AS y FROM base
      UNION ALL
      SELECT doc_id, source, text || repeat(' #@', 40), 0 AS y FROM base),
s AS (SELECT doc_id, source, y,
        least(CAST(len(string_split(text, ' ')) AS BIGINT), 127) AS x1,
        CAST(len(list_filter(string_split(text, ' '), x -> x IN $stop)) AS BIGINT) * 127
          // greatest(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS x2
      FROM u),
m AS (SELECT CAST(count(*) AS HUGEINT) + 1 AS a,
             CAST(coalesce(sum(x1), 0) AS HUGEINT) AS b,
             CAST(coalesce(sum(x2), 0) AS HUGEINT) AS c,
             CAST(coalesce(sum(x1*x1), 0) AS HUGEINT) + 1 AS d,
             CAST(coalesce(sum(x1*x2), 0) AS HUGEINT) AS e,
             CAST(coalesce(sum(x2*x2), 0) AS HUGEINT) + 1 AS f,
             CAST(coalesce(sum(y), 0) AS HUGEINT) AS b0,
             CAST(coalesce(sum(x1*y), 0) AS HUGEINT) AS b1,
             CAST(coalesce(sum(x2*y), 0) AS HUGEINT) AS b2
      FROM s),
w AS (SELECT
        a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c) AS det,
        b0*(d*f - e*e) - b*(b1*f - e*b2) + c*(b1*e - d*b2) AS det0,
        a*(b1*f - e*b2) - b0*(b*f - e*c) + c*(b*b2 - b1*c) AS det1,
        a*(d*b2 - b1*e) - b*(b*b2 - b1*c) + b0*(b*e - d*c) AS det2
      FROM m),
k AS (SELECT source, y,
        (2*det0 + 2*det1*x1 + 2*det2*x2 >= det) AS kept
      FROM s CROSS JOIN w)
SELECT source, CAST(sum(y) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN kept AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_clean,
       CAST(sum(CASE WHEN kept AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept_degraded,
       CAST(sum(CASE WHEN kept AND y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(sum(y) AS DOUBLE) AS clean_rate,
       CAST(sum(CASE WHEN kept AND y = 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(sum(y) AS DOUBLE) AS degraded_rate
FROM k GROUP BY source ORDER BY source""",

    "q_langid" -> """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
m AS (SELECT doc_id, lang,
        CAST(len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS BIGINT) AS m_en,
        CAST(len(list_filter(toks, x -> x IN ('der','die','und','das'))) AS BIGINT) AS m_de,
        CAST(len(list_filter(toks, x -> x IN ('le','la','et','les'))) AS BIGINT) AS m_fr,
        CAST(len(list_filter(toks, x -> x IN ('el','los','que','y'))) AS BIGINT) AS m_es,
        CAST(len(list_filter(toks, x -> x IN ('de5','shi4','le5','zai4'))) AS BIGINT) AS m_zh
      FROM t),
p AS (SELECT *, greatest(m_en, m_de, m_fr, m_es, m_zh) AS mx FROM m)
SELECT doc_id, m_en, m_de, m_fr, m_es, m_zh,
  CASE WHEN mx <= 0 THEN 'und'
       WHEN m_en = mx THEN 'en' WHEN m_de = mx THEN 'de'
       WHEN m_fr = mx THEN 'fr' WHEN m_es = mx THEN 'es'
       ELSE 'zh' END AS predicted_lang,
  (CASE WHEN mx <= 0 THEN 'und'
        WHEN m_en = mx THEN 'en' WHEN m_de = mx THEN 'de'
        WHEN m_fr = mx THEN 'fr' WHEN m_es = mx THEN 'es'
        ELSE 'zh' END) = lang AS label_match
FROM p ORDER BY doc_id""",

    // mirror of TextAnalytics.languageIdConfusion: same marker argmax,
    // label totals from the cells themselves (a window over the rollup)
    "q_langid_confusion" -> """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
m AS (SELECT doc_id, lang,
        len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS m_en,
        len(list_filter(toks, x -> x IN ('der','die','und','das'))) AS m_de,
        len(list_filter(toks, x -> x IN ('le','la','et','les'))) AS m_fr,
        len(list_filter(toks, x -> x IN ('el','los','que','y'))) AS m_es,
        len(list_filter(toks, x -> x IN ('de5','shi4','le5','zai4'))) AS m_zh
      FROM t),
p AS (SELECT *, greatest(m_en, m_de, m_fr, m_es, m_zh) AS mx FROM m),
c AS (SELECT lang,
        CASE WHEN mx <= 0 THEN 'und'
             WHEN m_en = mx THEN 'en' WHEN m_de = mx THEN 'de'
             WHEN m_fr = mx THEN 'fr' WHEN m_es = mx THEN 'es'
             ELSE 'zh' END AS predicted_lang
      FROM p),
cells AS (SELECT lang, predicted_lang, count(*) AS docs FROM c GROUP BY 1, 2)
SELECT lang, predicted_lang, docs,
       CAST(docs AS DOUBLE) /
         CAST(sum(docs) OVER (PARTITION BY lang) AS DOUBLE) AS label_share
FROM cells ORDER BY lang, predicted_lang""",

    "q_fingerprint" -> """
SELECT doc_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(range(1, length(text) + 1), i -> CAST(ascii(text[i:i]) AS BIGINT))),
    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
FROM documents ORDER BY doc_id""",

    "q_dedup_exact_docs" -> """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY 1 ORDER BY content_hash""",

    "q_dedup_records" -> """
SELECT user_id, event_type, min(event_id) AS keep_id, count(*) AS dup_count
FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""",

    "q_cross_source_dups" -> """
WITH sh AS (
  SELECT DISTINCT doc_id, text[i:i+4] AS shingle
  FROM documents, unnest(range(1, greatest(length(text) - 3, 1))) t(i)),
rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 100),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.3),
srcs AS (
  SELECT da.source AS src_a, db.source AS src_b
  FROM pairs JOIN documents da ON doc_a = da.doc_id
  JOIN documents db ON doc_b = db.doc_id
  WHERE da.source <> db.source)
SELECT least(src_a, src_b) AS source_a, greatest(src_a, src_b) AS source_b,
       count(*) AS shared_neardups
FROM srcs GROUP BY 1, 2 ORDER BY source_a, source_b""",

    "q_jaccard_pairs" -> """
WITH sh AS (
  SELECT DISTINCT doc_id, text[i:i+4] AS shingle
  FROM documents, unnest(range(1, greatest(length(text) - 3, 1))) t(i)),
rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 100),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
       sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.3
ORDER BY doc_a, doc_b""",

    // mirror of Dedup.containmentPairs (same candidate derivation as
    // q_jaccard_pairs, one-sided overlap score)
    "q_containment_pairs" -> """
WITH sh AS (
  SELECT DISTINCT doc_id, text[i:i+4] AS shingle
  FROM documents, unnest(range(1, greatest(length(text) - 3, 1))) t(i)),
rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 100),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
       sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) AS containment
FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.6
ORDER BY doc_a, doc_b""",

    // mirror of TextAnalytics.qualityDeciles (ntile over the same
    // deterministic (score, doc_id) order; min/max are order-free)
    "q_quality_deciles" -> s"""
WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> x IN $stop)) AS BIGINT) AS n_stop,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
      FROM t),
q AS (SELECT doc_id, source,
        0.4 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
          + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
          + 0.3 * (CAST(n_unique AS DOUBLE) / n_tokens) AS quality_score
      FROM s),
d AS (SELECT source, quality_score,
        CAST(ntile(10) OVER (PARTITION BY source
          ORDER BY quality_score, doc_id) AS BIGINT) AS decile
      FROM q)
SELECT source, decile, count(*) AS docs,
       min(quality_score) AS q_lo, max(quality_score) AS q_hi
FROM d GROUP BY 1, 2 ORDER BY source, decile""",

    // mirror of TextAnalytics.histogramQuantile (256-bucket estimate
    // next to the exact median; bucket edges k/256 are exact doubles)
    "q_histogram_quantile" -> s"""
WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> x IN $stop)) AS BIGINT) AS n_stop,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
      FROM t),
q AS (SELECT doc_id, source,
        0.4 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
          + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
          + 0.3 * (CAST(n_unique AS DOUBLE) / n_tokens) AS quality_score
      FROM s),
h AS (SELECT source, least(255, CAST(floor(quality_score * 256) AS BIGINT)) AS b,
             count(*) AS cnt
      FROM q GROUP BY 1, 2),
c AS (SELECT source, b, cnt,
             sum(cnt) OVER (PARTITION BY source ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY source) AS n
      FROM h),
e AS (SELECT source, CAST(max(n) AS BIGINT) AS n_docs, min(b) AS med_b
      FROM c WHERE cum * 2 >= n GROUP BY 1),
x AS (SELECT source, quantile_cont(quality_score, 0.5) AS exact_median
      FROM q GROUP BY 1)
SELECT e.source AS source, n_docs, CAST(med_b AS DOUBLE) / 256.0 AS est_median,
       exact_median,
       abs(CAST(med_b AS DOUBLE) / 256.0 - exact_median) AS abs_err
FROM e JOIN x ON e.source = x.source ORDER BY source""",

    // mirror of Dedup.dedupRateBySource (cluster CTEs reused verbatim)
    "q_dedup_rate_by_source" -> s"""
WITH RECURSIVE $clusterChainCtes,
cl AS (SELECT node AS doc_id, min(label) = node AS keep
       FROM reach GROUP BY node),
ex AS (SELECT source, count(*) AS docs,
              count(DISTINCT md5(text)) AS distinct_content
       FROM documents GROUP BY 1),
nd AS (SELECT d.source, count(*) AS near_dup_dropped
       FROM documents d JOIN cl ON d.doc_id = cl.doc_id
       WHERE NOT cl.keep GROUP BY 1)
SELECT ex.source AS source, docs, distinct_content,
       docs - distinct_content AS exact_dup_docs,
       coalesce(near_dup_dropped, 0) AS near_dup_dropped,
       CAST(docs - distinct_content AS DOUBLE) / docs AS exact_dup_rate,
       CAST(coalesce(near_dup_dropped, 0) AS DOUBLE) / docs AS near_dup_rate
FROM ex LEFT JOIN nd ON ex.source = nd.source ORDER BY source""",

    "q_dedup_clusters" -> s"""
WITH RECURSIVE $clusterChainCtes
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id,
       min(label) = node AS keep
FROM reach GROUP BY node ORDER BY doc_id""",

    "q_cluster_sizes" -> s"""
WITH RECURSIVE $clusterChainCtes,
lbl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY 1),
cs AS (SELECT cluster_id, count(*) AS members FROM lbl GROUP BY 1)
SELECT members, count(*) AS clusters FROM cs GROUP BY 1 ORDER BY members""",

    // mirror of Dedup.softDedupWeights over the shared 0.3-threshold
    // cluster assignment: per-doc cluster size and 1/n sample weight;
    // unclustered docs are their own cluster at weight 1.0
    "q_dedup_weights" -> s"""
WITH RECURSIVE $clusterChainCtes,
lbl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY 1),
cs AS (SELECT cluster_id, count(*) AS members FROM lbl GROUP BY 1)
SELECT d.doc_id,
  CAST(coalesce(lbl.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
  CAST(coalesce(cs.members, 1) AS BIGINT) AS cluster_size,
  1.0 / CAST(coalesce(cs.members, 1) AS DOUBLE) AS sample_weight
FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.doc_id
LEFT JOIN cs ON lbl.cluster_id = cs.cluster_id
ORDER BY d.doc_id""",

    // mirror of Dedup.keepBestByQuality over the shared 0.3-threshold
    // cluster assignment: the qualityScores formula joined onto the
    // assignment, keeper = row_number() over (quality DESC, doc_id) = 1
    // — the batch window's exact deterministic order
    "q_cluster_keep_best" -> s"""
WITH RECURSIVE $clusterChainCtes,
lbl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY 1),
tq AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
q AS (SELECT doc_id,
        0.4 * (1.0 - CAST(len(list_filter(toks, x -> x IN $stop)) AS DOUBLE)
                 / len(toks))
          + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
          + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
          AS quality_score
      FROM tq),
asg AS (SELECT d.doc_id,
               CAST(coalesce(lbl.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
               q.quality_score
        FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.doc_id
        JOIN q ON d.doc_id = q.doc_id)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       quality_score,
       row_number() OVER (PARTITION BY cluster_id
         ORDER BY quality_score DESC, doc_id) = 1 AS keep_best
FROM asg ORDER BY doc_id""",

    "q_dedup_corpus" -> s"""
WITH RECURSIVE $clusterChainCtes,
dropped AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING min(label) <> node)
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY doc_id""",

    "q_knn_exact" -> """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 10),
p AS (SELECT query_id, vec_id, round(list_dot_product(qv, v) / (qnrm * nrm), 9) AS score
      FROM q, n WHERE vec_id <> query_id),
r AS (SELECT query_id, vec_id AS neighbor_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      FROM p)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank", score
FROM r WHERE rnk <= 10 ORDER BY query_id, "rank"""",

    "q_quality_by_source" -> s"""
WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
q AS (SELECT doc_id, source,
        0.4 * (1.0 - CAST(len(list_filter(toks, x -> x IN $stop)) AS DOUBLE)
          / len(toks))
          + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
          + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
          AS quality_score
      FROM t)
SELECT source, count(*) AS docs,
       quantile_cont(quality_score, 0.5) AS median_quality,
       quantile_cont(quality_score, 0.1) AS p10_quality,
       min(quality_score) AS min_quality,
       max(quality_score) AS max_quality
FROM q GROUP BY 1 ORDER BY source""",

    "q_token_budget" -> """
WITH t AS (
  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
r AS (SELECT lang, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_tokens
      FROM t)
SELECT lang, count(*) AS docs_in_budget,
       CAST(max(running_tokens) AS BIGINT) AS tokens_used
FROM r WHERE running_tokens <= 5000 GROUP BY 1 ORDER BY lang""",

    "q_mixture" -> """
WITH u AS (
  SELECT lang, n_chars,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(text) + 1),
             i -> CAST(ascii(text[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007) AS DOUBLE) / 1000000007.0 AS u,
         CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5 WHEN 'fr' THEN 0.5
                   WHEN 'es' THEN 0.5 WHEN 'zh' THEN 0.25 ELSE 0.1 END AS rate
  FROM documents)
SELECT lang, max(rate) AS rate, count(*) AS total_docs,
       CAST(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN u < rate THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
       CAST(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS kept_frac
FROM u GROUP BY 1 ORDER BY lang""",

    "q_contamination" -> s"""
WITH sp AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CASE WHEN substr(md5(text), 1, 2) < 'f6' THEN 'train'
              WHEN substr(md5(text), 1, 2) < 'fb' THEN 'val'
              ELSE 'test' END AS split
  FROM documents),
ng AS (
  SELECT doc_id, split,
         list_distinct(CASE WHEN len(toks) >= 8
           THEN list_transform(
                  list_transform(range(1, len(toks) - 6),
                    g -> array_to_string(toks[g:g+7], ' ')),
                  s -> $ngramHashS)
           ELSE [] END) AS ngrams
  FROM sp),
tng AS (SELECT doc_id, unnest(ngrams) AS ngram FROM ng WHERE split = 'test'),
trn AS (SELECT DISTINCT unnest(ngrams) AS ngram FROM ng WHERE split = 'train'),
hits AS (SELECT doc_id, count(*) AS contaminated
         FROM tng WHERE ngram IN (SELECT ngram FROM trn) GROUP BY 1),
tot AS (SELECT doc_id, count(*) AS n_ngrams FROM tng GROUP BY 1)
SELECT t.doc_id, t.n_ngrams, COALESCE(h.contaminated, 0) AS contaminated,
       CAST(COALESCE(h.contaminated, 0) AS DOUBLE) / t.n_ngrams
         AS contamination_frac,
       CAST(COALESCE(h.contaminated, 0) AS DOUBLE) / t.n_ngrams > 0.2 AS flagged
FROM tot t LEFT JOIN hits h USING (doc_id) ORDER BY t.doc_id""",

    // mirror of TextAnalytics.decontaminateReport under the
    // q_contamination_bench convention (bench suite = doc_id % 97 == 0):
    // a training doc sharing ANY distinct 8-gram hash with the suite is
    // dropped; per-source removal rollup
    "q_decontam_rollup" -> s"""
WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
ng AS (SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 8
           THEN list_transform(
                  list_transform(range(1, len(toks) - 6),
                    g -> array_to_string(toks[g:g+7], ' ')),
                  s -> $ngramHashS)
           ELSE [] END) AS ngrams
       FROM t),
bn AS (SELECT DISTINCT unnest(ngrams) AS ngh FROM ng WHERE doc_id % 97 = 0),
cn AS (SELECT doc_id, unnest(ngrams) AS ngh FROM ng WHERE doc_id % 97 <> 0),
hits AS (SELECT DISTINCT doc_id FROM cn WHERE ngh IN (SELECT ngh FROM bn)),
base AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens
         FROM t WHERE doc_id % 97 <> 0)
SELECT source, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped_docs,
       CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN n_tokens ELSE 0 END)
            AS BIGINT) AS dropped_tokens,
       CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS dropped_frac
FROM base LEFT JOIN hits h USING (doc_id) GROUP BY 1 ORDER BY source""",

    "q_repetition" -> """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bg AS (SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
           i -> toks[i] || ' ' || toks[i + 1])) AS bigram
       FROM t),
c AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
             count(*) AS distinct_bigrams, max(cnt) AS top_cnt
      FROM c GROUP BY 1)
SELECT doc_id, n_bigrams, distinct_bigrams,
  1.0 - CAST(distinct_bigrams AS DOUBLE) / n_bigrams AS dup_bigram_frac,
  CAST(top_cnt AS DOUBLE) / n_bigrams AS top_bigram_frac,
  (1.0 - CAST(distinct_bigrams AS DOUBLE) / n_bigrams) <= 0.5
    AND (CAST(top_cnt AS DOUBLE) / n_bigrams) <= 0.1 AS passes_repetition
FROM a ORDER BY doc_id""",

    // mirror of TextAnalytics.rarityScores: exact integer division onto
    // the 2^40 grid (DuckDB // == Spark div for non-negatives), BIGINT
    // sum, one trailing double conversion
    "q_rarity" -> """
WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT token, count(*) AS c FROM tk GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS vocab FROM tf),
g AS (SELECT token, 1099511627776 // (c + 1) AS g FROM tf),
d AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(g) AS BIGINT) AS gsum
      FROM tk JOIN g USING (token) GROUP BY 1)
SELECT doc_id, n_tokens,
  (CAST(gsum AS DOUBLE) / n_tokens) * CAST(n_total + vocab AS DOUBLE)
    / 1099511627776.0 AS rarity
FROM d CROSS JOIN tot ORDER BY doc_id""",

    // mirror of TextAnalytics.sourceDivergence: per-token chi-square
    // terms are deterministic IEEE expressions over integer-derived
    // doubles, floor-quantized to the 2^40 grid, summed as BIGINT
    "q_source_divergence" -> """
WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
bs AS (SELECT source, token, count(*) AS cs FROM tk GROUP BY 1, 2),
corpus AS (SELECT token, CAST(sum(cs) AS BIGINT) AS c FROM bs GROUP BY 1),
nsrc AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM bs GROUP BY 1),
ntot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM corpus),
t AS (SELECT source, ns,
        CAST(floor((CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)
                      - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)
                      - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   * 1099511627776.0) AS BIGINT) AS gterm
      FROM bs JOIN corpus USING (token) JOIN nsrc USING (source) CROSS JOIN ntot)
SELECT source, max(ns) AS n_tokens, count(*) AS vocab,
  CAST(sum(gterm) AS DOUBLE) / 1099511627776.0 AS chi2
FROM t GROUP BY 1 ORDER BY source""",

    // mirror of TextAnalytics.dupNgramCoverage (overlapping 5-grams,
    // distinct per document, document-frequency > 1 = duplicated)
    // n-grams collapse to the 60-bit token hash before the df count —
    // mirror of the engine's NgramHashes kernel (hash of the joined
    // n-gram string, distinct BY HASH; same constants, so any collision
    // lands identically on both engines)
    "q_dup_ngram_coverage" -> s"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ng AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
         THEN list_transform(
                list_transform(range(1, len(toks) - 3),
                  g -> array_to_string(toks[g:g+4], ' ')),
                s -> ${tokenHashSqlOf("s")})
         ELSE [] END)) AS ngh
       FROM t),
dfq AS (SELECT ngh, count(*) AS df FROM ng GROUP BY 1)
SELECT doc_id, count(*) AS n_ngrams,
  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_ngrams,
  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
    AS dup_ngram_frac
FROM ng JOIN dfq USING (ngh) GROUP BY 1 ORDER BY doc_id""",

    // mirror of TextAnalytics.dupSpans: positional 5-gram hashes (zipped
    // parallel unnest = posexplode), duplicated-hash set from df > 1 over
    // per-doc-distinct hashes, gaps-and-islands over surviving positions
    // (pos base offset cancels in the pos - row_number() group key)
    "q_dup_spans" -> s"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ng AS (SELECT doc_id,
         unnest(range(1, len(toks) - 3)) AS pos,
         unnest(list_transform(
                  list_transform(range(1, len(toks) - 3),
                    g -> array_to_string(toks[g:g+4], ' ')),
                  s -> ${tokenHashSqlOf("s")})) AS ngh
       FROM t WHERE len(toks) >= 5),
dfq AS (SELECT ngh FROM (SELECT DISTINCT doc_id, ngh FROM ng)
        GROUP BY ngh HAVING count(*) > 1),
dp AS (SELECT doc_id, pos FROM ng JOIN dfq USING (ngh)),
isl AS (SELECT doc_id,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM dp),
runs AS (SELECT doc_id, grp, count(*) AS run FROM isl GROUP BY 1, 2),
per AS (SELECT doc_id, CAST(sum(run) AS BIGINT) AS dup_positions,
               CAST(max(run) + 4 AS BIGINT) AS max_dup_span
        FROM runs GROUP BY 1),
base AS (SELECT doc_id, CAST(len(toks) - 4 AS BIGINT) AS n_ngrams
         FROM t WHERE len(toks) >= 5)
SELECT doc_id, n_ngrams,
       CAST(coalesce(dup_positions, 0) AS BIGINT) AS dup_positions,
       CAST(coalesce(max_dup_span, 0) AS BIGINT) AS max_dup_span
FROM base LEFT JOIN per USING (doc_id) ORDER BY doc_id""",

    // mirror of TextAnalytics.exciseDupSpans: the dup-position chain of
    // q_dup_spans, expanded to COVERED token indices (each duplicated
    // 5-gram start covers its 5 tokens; DISTINCT merges overlapping
    // runs), anti-joined against the positional token stream, and the
    // kept tokens re-joined in position order — cleaned_text is
    // value-hashed by the driver, so span boundaries must match the
    // engine's row-local kernel exactly. A doc whose every token is
    // covered has no kept rows: coalesce to the empty string.
    "q_dup_excision" -> s"""
WITH $dupExcisionCtes
SELECT t.doc_id, coalesce(cl.cleaned_text, '') AS cleaned_text,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(cl.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(strlen(t.text) - strlen(coalesce(cl.cleaned_text, ''))
            AS BIGINT) AS bytes_removed
FROM t LEFT JOIN cl USING (doc_id) ORDER BY doc_id""",

    // mirror of TextAnalytics.excisionRollup: the per-doc excision frame
    // aggregated per source (savings fraction as the one double, from
    // exactly-represented BIGINT sums — order-free)
    "q_excision_rollup" -> s"""
WITH $dupExcisionCtes,
per AS (SELECT t.doc_id, coalesce(cl.cleaned_text, '') AS cleaned_text,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(cl.kept_tokens, 0) AS BIGINT) AS kept_tokens,
               CAST(strlen(t.text) - strlen(coalesce(cl.cleaned_text, ''))
                    AS BIGINT) AS bytes_removed
        FROM t LEFT JOIN cl USING (doc_id))
SELECT d.source, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
       CAST(sum(n_tokens - kept_tokens) AS BIGINT) AS tokens_removed,
       CAST(sum(bytes_removed) AS BIGINT) AS bytes_removed,
       CAST(sum(n_tokens - kept_tokens) AS DOUBLE)
         / CAST(sum(n_tokens) AS DOUBLE) AS token_savings_frac
FROM per JOIN documents d USING (doc_id) GROUP BY 1 ORDER BY source""",

    // mirror of TextAnalytics.boilerplateStrip over the templated corpus
    // (the q_source_boilerplate fixture): per-source boilerplate trigram
    // spans excised; cleaned_text is value-hashed by the driver, so the
    // strip's span-boundary semantics sit in the oracle gate exactly as
    // the dup-excision mirror's do
    "q_boilerplate_strip" -> s"""
WITH $boilerExcisionCtes
SELECT t.doc_id, coalesce(cl.cleaned_text, '') AS cleaned_text,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(cl.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(strlen(t.text) - strlen(coalesce(cl.cleaned_text, ''))
            AS BIGINT) AS bytes_removed
FROM t LEFT JOIN cl USING (doc_id) ORDER BY doc_id""",

    // mirror of TextAnalytics.excisionRollupOf over the boilerplate
    // strip frame: per-source savings (exact BIGINT sums, one double)
    "q_boilerplate_rollup" -> s"""
WITH $boilerExcisionCtes,
per AS (SELECT t.doc_id, t.source,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(cl.kept_tokens, 0) AS BIGINT) AS kept_tokens,
               CAST(strlen(t.text) - strlen(coalesce(cl.cleaned_text, ''))
                    AS BIGINT) AS bytes_removed
        FROM t LEFT JOIN cl USING (doc_id))
SELECT source, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
       CAST(sum(n_tokens - kept_tokens) AS BIGINT) AS tokens_removed,
       CAST(sum(bytes_removed) AS BIGINT) AS bytes_removed,
       CAST(sum(n_tokens - kept_tokens) AS DOUBLE)
         / CAST(sum(n_tokens) AS DOUBLE) AS token_savings_frac
FROM per GROUP BY 1 ORDER BY source""",

    // mirror of TextAnalytics.bm25TopK: first-occurrence query terms
    // (min(pos) rank, NOT list_distinct — order is the contract),
    // rational RSJ idf, per-term contributions floored onto the 2^-24
    // grid and summed as exact integers (HUGEINT cast back to BIGINT),
    // the one double conversion at the end.
    "q_bm25_topk" -> s"""
WITH $bm25ChainCtes
SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS "rank",
       CAST(sg AS DOUBLE) / ${graft.functions.TextAnalytics.Bm25Grid.toDouble}
         AS score
FROM bmr WHERE rnk <= 10 ORDER BY query_id, "rank"""",

    // the PARAMETERIZED retrieval surface under the gate: the same bm25
    // chain instantiated over a non-prefix, bounded-by-construction
    // query slice (doc_id % 17 = 3 below 200 — fixed-size past sf0.01,
    // the benchmark-set contract), proving the query set is an argument
    // of the operator, not a convention baked into it
    "q_bm25_queryset" -> s"""
WITH ${bm25Chain("doc_id % 17 = 3 AND doc_id < 200")}
SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS "rank",
       CAST(sg AS DOUBLE) / ${graft.functions.TextAnalytics.Bm25Grid.toDouble}
         AS score
FROM bmr WHERE rnk <= 10 ORDER BY query_id, "rank"""",

    // mirror of Similarity.rrfFuse(bm25TopK, knnLshMultiProbe): the
    // committed bm25 and multi-probe chains composed, fused by the
    // fixed-shape coalesce(lex, 0) + coalesce(vec, 0) expression —
    // constants interpolated from the engine's doubles
    "q_rrf_fusion" -> {
      val kRrf = 60.0
      s"""
WITH $bm25ChainCtes,
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
$lshBucketsCte,
vqb AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, tbl,
               xor(CAST(key AS BIGINT), f.flip) AS key
        FROM b, (VALUES (CAST(0 AS BIGINT)), (1), (2), (4), (8)) f(flip)
        WHERE vec_id < 10),
vcand AS (SELECT DISTINCT query_id, vec_id,
            round(list_dot_product(qv, b.v) / (qnrm * b.nrm), 9) AS score
          FROM b JOIN vqb USING (tbl, key) WHERE vec_id <> query_id),
vr AS (SELECT query_id, vec_id AS neighbor_id, rnk FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id) AS rnk
         FROM vcand) WHERE rnk <= 10),
lx AS (SELECT query_id, doc_id, rnk FROM bmr WHERE rnk <= 10),
f AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
             coalesce(l.doc_id, v.neighbor_id) AS doc_id,
             coalesce(1.0 / ($kRrf + CAST(l.rnk AS DOUBLE)), 0.0)
               + coalesce(1.0 / ($kRrf + CAST(v.rnk AS DOUBLE)), 0.0) AS score,
             CAST(l.rnk AS BIGINT) AS rank_lex, CAST(v.rnk AS BIGINT) AS rank_vec
      FROM lx l FULL OUTER JOIN vr v
        ON v.query_id = l.query_id AND v.neighbor_id = l.doc_id)
SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS "rank", score,
       rank_lex, rank_vec
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY score DESC, doc_id) AS rnk FROM f)
WHERE rnk <= 10 ORDER BY query_id, "rank""""
    },

    "q_tfidf_terms" -> """
WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT lang, token, count(*) AS tf FROM t GROUP BY 1, 2),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
s AS (SELECT lang, token, tf, df,
        CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS tfidf
      FROM tf JOIN dfreq USING (token) CROSS JOIN n)
SELECT lang, token, tf, df, tfidf, rnk
FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, token) AS rnk
      FROM s)
WHERE rnk <= 5 ORDER BY lang, rnk""",

    "q_embedding_stats" -> """
WITH n AS (SELECT label,
             round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))), 9) AS nrm
           FROM embeddings)
SELECT label, count(*) AS n_vecs, min(nrm) AS min_norm, max(nrm) AS max_norm,
       quantile_cont(nrm, 0.25) AS p25_norm,
       quantile_cont(nrm, 0.5) AS median_norm,
       quantile_cont(nrm, 0.75) AS p75_norm
FROM n GROUP BY 1 ORDER BY label""",

    "q_top_tokens_per_lang" -> """
WITH c AS (
  SELECT lang, token, count(*) AS cnt
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY 1, 2)
SELECT lang, token, cnt, rnk
FROM (SELECT lang, token, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rnk
      FROM c)
WHERE rnk <= 5 ORDER BY lang, rnk""",

    // mirror of TextAnalytics.corpusReport: same quality formula,
    // md5-based exact-dup count and split buckets, 2^-20-grid mean
    "q_corpus_report" -> s"""
WITH t AS (SELECT doc_id, lang, source, n_chars, text,
                  string_split(text, ' ') AS toks FROM documents),
s AS (SELECT lang, source, n_chars, md5(text) AS h,
        substr(md5(text), 1, 2) AS h2,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> x IN $stop)) AS BIGINT) AS n_stop,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
      FROM t),
q AS (SELECT *,
        0.4 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
          + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
          + 0.3 * (CAST(n_unique AS DOUBLE) / n_tokens) AS qs
      FROM s)
SELECT count(*) AS docs,
  count(DISTINCT source) AS sources, count(DISTINCT lang) AS langs,
  CAST(sum(n_tokens) AS BIGINT) AS tokens, CAST(sum(n_chars) AS BIGINT) AS chars,
  CAST(count(*) - count(DISTINCT h) AS BIGINT) AS exact_dup_docs,
  CAST(sum(CAST(floor(qs * ${graft.functions.Ivf.MeanQuantScale}) AS BIGINT)) AS DOUBLE)
    / (${graft.functions.Ivf.MeanQuantScale} * CAST(count(*) AS DOUBLE)) AS mean_quality,
  CAST(sum(CASE WHEN h2 < 'f6' THEN 1 ELSE 0 END) AS BIGINT) AS train_docs,
  CAST(sum(CASE WHEN h2 >= 'f6' AND h2 < 'fb' THEN 1 ELSE 0 END) AS BIGINT) AS val_docs,
  CAST(sum(CASE WHEN h2 >= 'fb' THEN 1 ELSE 0 END) AS BIGINT) AS test_docs
FROM q""",

    "q_split_summary" -> """
WITH sa AS (SELECT doc_id, substr(md5(text), 1, 2) AS h2 FROM documents),
sp AS (SELECT doc_id, CASE WHEN h2 < 'f6' THEN 'train'
                           WHEN h2 < 'fb' THEN 'val'
                           ELSE 'test' END AS split FROM sa)
SELECT lang, split, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents JOIN sp USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_quantize_report" -> """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v,
        list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
          (a, b) -> greatest(a, b)) AS scale FROM e),
q AS (SELECT vec_id, v, scale,
        list_transform(v, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(round(x * 127.0 / scale, 0) AS BIGINT) END) AS qv
      FROM s)
SELECT vec_id, scale,
  list_reduce(list_prepend(0.0,
    list_transform(list_zip(v, qv),
      p -> abs(p[1] - p[2] * scale / 127.0))),
    (a, b) -> greatest(a, b)) AS max_abs_err
FROM q ORDER BY vec_id""",

    "q_pricing_summary" -> s"""
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum($decPrice) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2""",

    // mirror of Relational.orderGaps (lag-window re-order cadence;
    // integral day gaps => exact sums)
    "q_order_gaps" -> """
WITH g AS (
  SELECT o_custkey,
         date_diff('day', lag(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap
  FROM orders)
SELECT o_custkey, count(*) AS orders, CAST(sum(gap) AS BIGINT) AS total_gap_days,
       CAST(sum(gap) AS DOUBLE) / (count(*) - 1) AS avg_gap_days
FROM g GROUP BY 1 HAVING count(*) >= 2 ORDER BY o_custkey""",

    // mirror of Relational.smallQuantityRevenue (Q17-style correlated
    // aggregate, decorrelated): qty sums are exact (integral doubles),
    // revenue accumulates in DECIMAL
    "q_small_qty_revenue" -> """
WITH lim AS (SELECT l_partkey, sum(l_quantity) / count(*) * 0.2 AS qty_limit
             FROM lineitem GROUP BY 1)
SELECT p_brand,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS small_qty_revenue,
       count(*) AS line_count
FROM lineitem JOIN lim USING (l_partkey)
JOIN part ON l_partkey = p_partkey
WHERE l_quantity < qty_limit
GROUP BY 1 ORDER BY p_brand""",

    "q_revenue_by_nation" -> s"""
WITH $orev
SELECT n_name, CAST(sum(order_rev) AS DOUBLE) AS revenue,
       count(DISTINCT o_custkey) AS customers, count(*) AS orders
FROM orev JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY n_name""",

    "q_top_customers" -> s"""
WITH $orev,
cr AS (SELECT o_custkey, sum(order_rev) AS rev_d, count(*) AS orders
       FROM orev JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)
SELECT c_custkey, c_name, CAST(rev_d AS DOUBLE) AS revenue, orders
FROM cr JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey LIMIT 10""",

    "q_revenue_rollup" -> s"""
WITH $orev
SELECT n_name, c_mktsegment, CAST(sum(order_rev) AS DOUBLE) AS revenue,
       count(*) AS orders
FROM orev JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""",

    "q_top_suppliers" -> s"""
WITH srev AS (SELECT l_suppkey, sum($decPrice) AS rev_d FROM lineitem GROUP BY 1)
SELECT n_name, s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS revenue, rnk
FROM (SELECT n_name, s_suppkey, s_name, rev_d,
             row_number() OVER (PARTITION BY n_name ORDER BY rev_d DESC, s_suppkey) AS rnk
      FROM srev JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey)
WHERE rnk <= 3 ORDER BY n_name, rnk""",

    "q_order_priority" -> """
SELECT o_orderpriority, count(*) AS order_count
FROM orders WHERE o_orderkey IN (SELECT DISTINCT l_orderkey FROM lineitem)
GROUP BY 1 ORDER BY 1""",

    // mirror of Relational.keySkew: per-type user rollup, totals, and
    // the top-10 window slice
    "q_key_skew" -> """
WITH per AS (SELECT event_type, user_id, count(*) AS cnt FROM events GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS events,
               count(*) AS users, max(cnt) AS max_user_events
        FROM per GROUP BY 1),
top AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS topn_events FROM (
          SELECT event_type, cnt,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY cnt DESC, user_id) AS rnk
          FROM per)
        WHERE rnk <= 10 GROUP BY 1)
SELECT t.event_type, t.events, t.users, t.max_user_events, p.topn_events,
  CAST(p.topn_events AS DOUBLE) / CAST(t.events AS DOUBLE) AS topn_share,
  CAST(t.events AS DOUBLE) / CAST(t.users AS DOUBLE) AS avg_user_events
FROM tot t JOIN top p USING (event_type) ORDER BY event_type""",

    // mirror of Relational.propsExtract: DuckDB's independent JSON-path
    // implementation over the same props strings
    "q_props_extract" -> """
WITH e AS (SELECT event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
SELECT event_type, count(*) AS events, count(k) AS with_k,
  CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max,
  count(DISTINCT k) AS k_distinct
FROM e GROUP BY event_type ORDER BY event_type""",

    "q_events_minute" -> """
SELECT event_type, epoch_ns(ts) // 1000000000 // 60 AS minute,
       count(*) AS events,
       CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       count(DISTINCT user_id) AS users
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_funnel" -> """
WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS epoch_s FROM events),
su AS (SELECT user_id, min(epoch_s) AS signup_ts FROM e WHERE event_type = 'signup' GROUP BY 1),
conv AS (SELECT DISTINCT su.user_id
         FROM su JOIN e ON su.user_id = e.user_id
         WHERE e.event_type = 'purchase' AND e.epoch_s >= su.signup_ts)
SELECT (SELECT count(DISTINCT user_id) FROM e) AS total_users,
       (SELECT count(*) FROM su) AS signed_up,
       (SELECT count(*) FROM conv) AS converted,
       (SELECT count(*) FROM conv) * 100.0 / nullif((SELECT count(*) FROM su), 0) AS conversion_pct""",

    // mirror of Relational.slidingEventCounts: the two epoch-aligned
    // 10-min/5-min-slide windows containing each event, exploded
    "q_sliding_windows" -> """
WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS tus, "value" AS v FROM events),
w AS (SELECT event_type, v,
             unnest([ (tus // 300000000) * 300000000,
                      (tus // 300000000) * 300000000 - 300000000 ]) AS w_start
      FROM e)
SELECT event_type, w_start, count(*) AS events,
       CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM w GROUP BY 1, 2 ORDER BY event_type, w_start""",

    // mirror of Relational.sessionWindows: gap-break island construction
    // (a session breaks when the gap is >= 30 min — session_window's
    // interval is [start, start + gap)); end = last event + gap
    "q_session_windows" -> """
WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
x AS (SELECT user_id, event_type, tus,
             lag(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
      FROM e),
y AS (SELECT user_id, event_type, tus,
             CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END AS ns
      FROM x),
z AS (SELECT user_id, event_type, tus,
             sum(ns) OVER (PARTITION BY user_id ORDER BY tus
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM y)
SELECT user_id, min(tus) AS s_start, max(tus) + 1800000000 AS s_end,
       count(*) AS events, count(DISTINCT event_type) AS event_types
FROM z GROUP BY user_id, sid ORDER BY user_id, s_start""",

    "q_sessionize" -> """
WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS epoch_s FROM events),
x AS (SELECT user_id, epoch_s,
             lag(epoch_s) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS prev_s
      FROM e),
y AS (SELECT user_id,
             CASE WHEN prev_s IS NULL OR epoch_s - prev_s > 1800 THEN 1 ELSE 0 END AS ns
      FROM x)
SELECT user_id, CAST(sum(ns) AS BIGINT) AS sessions, count(*) AS events,
       CAST(count(*) AS DOUBLE) / CAST(sum(ns) AS BIGINT) AS events_per_session
FROM y GROUP BY 1 ORDER BY user_id""",

    // mirror of Relational.purchaseClickAsof — DuckDB's native ASOF JOIN
    // is an INDEPENDENT implementation of the same inclusive backward-
    // join semantics the engine builds from union + running-last window
    "q_asof_clicks" -> """
WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS tus, "value" AS v FROM events),
p AS (SELECT event_id AS purchase_id, user_id, tus AS p_ts FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, tus AS c_ts, arg_max(event_id, event_id) AS click_id,
             arg_max(v, event_id) AS click_value
      FROM e WHERE event_type = 'click' GROUP BY 1, 2)
SELECT purchase_id, p.user_id AS user_id, p_ts, click_id, click_value,
       (p_ts - c_ts) // 1000000 AS gap_s
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
ORDER BY purchase_id""",

    // mirror of Relational.orderVelocity — DuckDB plans the raw
    // inequality join (IEJoin); the engine buckets it into an equi-join
    "q_order_velocity" -> """
WITH d AS (SELECT o_orderkey, o_orderpriority,
                  date_diff('day', DATE '1970-01-01', o_orderdate) AS day,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT a.o_orderkey,
       count(b.o_orderkey) AS following_urgent,
       coalesce(CAST(sum(b.cents) AS BIGINT), 0) AS following_cents
FROM d a LEFT JOIN d b
  ON b.o_orderpriority = '1-URGENT' AND b.day > a.day AND b.day <= a.day + 7
GROUP BY 1 ORDER BY a.o_orderkey""",

    // mirror of Relational.zorderCells: the 31-bit spread ladder as a
    // CTE chain (pure integer bit arithmetic, identical on both engines)
    "q_zorder_cells" -> """
WITH d AS (SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS day,
                  o_custkey AS cust
           FROM orders),
s0 AS (SELECT day, cust, (day & 2147483647) AS a0, (cust & 2147483647) AS b0 FROM d),
s1 AS (SELECT day, cust, ((a0 | (a0 << 16)) & 281470681808895) AS a1,
              ((b0 | (b0 << 16)) & 281470681808895) AS b1 FROM s0),
s2 AS (SELECT day, cust, ((a1 | (a1 << 8)) & 71777214294589695) AS a2,
              ((b1 | (b1 << 8)) & 71777214294589695) AS b2 FROM s1),
s3 AS (SELECT day, cust, ((a2 | (a2 << 4)) & 1085102592571150095) AS a3,
              ((b2 | (b2 << 4)) & 1085102592571150095) AS b3 FROM s2),
s4 AS (SELECT day, cust, ((a3 | (a3 << 2)) & 3689348814741910323) AS a4,
              ((b3 | (b3 << 2)) & 3689348814741910323) AS b4 FROM s3),
s5 AS (SELECT day, cust, ((a4 | (a4 << 1)) & 6148914691236517205) AS a5,
              ((b4 | (b4 << 1)) & 6148914691236517205) AS b5 FROM s4),
z AS (SELECT day, cust, ((a5 | (b5 << 1)) >> 16) AS cell FROM s5)
SELECT cell, count(*) AS orders,
       min(day) AS day_lo, max(day) AS day_hi,
       min(cust) AS cust_lo, max(cust) AS cust_hi
FROM z GROUP BY 1 ORDER BY cell""",

    // mirror of CountSketch.cmsHeavyHitters (Carter-Wegman rows shared
    // with minhash; cells rebuilt from the exact aggregate)
    "q_heavy_hitters" -> s"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
ex AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
hh AS (SELECT token, cnt, ${polyFold(31, 1000000007L)} AS h FROM ex),
rb AS ($cmsCellRows),
cells AS (SELECT row_i, bucket, CAST(sum(cnt) AS BIGINT) AS cell FROM rb GROUP BY 1, 2),
top AS (SELECT token, cnt, h,
               CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rnk
        FROM hh QUALIFY rnk <= 20),
pr AS ($cmsProbeRows),
est AS (SELECT rnk, token, cnt, min(cell) AS est
        FROM pr JOIN cells USING (row_i, bucket) GROUP BY 1, 2, 3)
SELECT rnk, token, cnt AS exact_cnt, est, est - cnt AS overestimate
FROM est ORDER BY rnk""",

    // mirror of CountSketch.distinctSketch (linear counting, row 4 of
    // the same family; load factor is an exact power-of-two division)
    "q_distinct_sketch" -> s"""
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
hb AS (SELECT lang, token, $lcBucketSql AS bucket FROM tok)
SELECT lang, count(DISTINCT token) AS distinct_exact,
       count(DISTINCT bucket) AS occupied,
       CAST(count(DISTINCT bucket) AS DOUBLE) / ${graft.functions.CountSketch.LcBuckets}.0 AS load_factor
FROM hb GROUP BY 1 ORDER BY lang""",

    // mirror of CountSketch.hllDistinct: registers rebuilt from the same
    // 60-bit double-polyhash; rho via length(bin(w)) (minimal binary on
    // both engines); integer-grid harmonic sum, one trailing division
    "q_hll_distinct" -> s"""
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
dt AS (SELECT DISTINCT lang, token FROM tok),
hh AS (SELECT lang, $tokenHashSql AS h FROM dt),
hr AS (SELECT lang, h % 512 AS bucket, h // 512 AS w FROM hh),
rr AS (SELECT lang, bucket,
              CASE WHEN w = 0 THEN 52 ELSE 52 - length(bin(w)) END AS rho
       FROM hr),
regs AS (SELECT lang, bucket, max(rho) AS m FROM rr GROUP BY 1, 2),
ag AS (SELECT lang, count(*) AS occupied,
              CAST(sum(CAST(1 AS BIGINT) << (52 - m)) AS BIGINT) AS s_occ
       FROM regs GROUP BY 1),
ex AS (SELECT lang, count(DISTINCT token) AS distinct_exact FROM tok GROUP BY 1),
fin AS (SELECT lang, distinct_exact, occupied,
               512 - occupied AS zero_registers,
               s_occ + (512 - occupied) * 4503599627370496 AS s_int
        FROM ag JOIN ex USING (lang)),
est AS (SELECT lang, distinct_exact, occupied, zero_registers,
               0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * 4503599627370496.0
                 / CAST(s_int AS DOUBLE) AS raw_est
        FROM fin)
SELECT lang, distinct_exact, occupied, zero_registers, raw_est,
       (raw_est - CAST(distinct_exact AS DOUBLE))
         / CAST(distinct_exact AS DOUBLE) AS rel_err
FROM est ORDER BY lang""",

    // mirror of TextAnalytics.bigramRarity: interpolated inverse bigram
    // probability as a deterministic IEEE expression over integer-derived
    // doubles, floor-quantized to the 2^30 grid, summed as BIGINT
    "q_bigram_rarity" -> """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bp AS (SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
           i -> {'prev': toks[i], 'cur': toks[i + 1]})) AS p
       FROM t),
pr AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM bp),
cbg AS (SELECT prev, cur, count(*) AS cbg FROM pr GROUP BY 1, 2),
cctx AS (SELECT prev, CAST(sum(cbg) AS BIGINT) AS cctx FROM cbg GROUP BY 1),
cug AS (SELECT cur, CAST(sum(cbg) AS BIGINT) AS cug FROM cbg GROUP BY 1),
tot AS (SELECT CAST(sum(cug) AS BIGINT) AS n_total, count(*) AS vocab FROM cug),
g AS (SELECT prev, cur,
        floor(1073741824.0 /
          (0.5 * (CAST(cbg + 1 AS DOUBLE) / CAST(cctx + vocab AS DOUBLE))
         + 0.5 * (CAST(cug + 1 AS DOUBLE) / CAST(n_total + vocab AS DOUBLE)))) AS g
      FROM cbg JOIN cctx USING (prev) JOIN cug USING (cur) CROSS JOIN tot),
d AS (SELECT doc_id, count(*) AS n_bigrams,
             CAST(sum(CAST(g AS BIGINT)) AS BIGINT) AS gsum
      FROM pr JOIN g USING (prev, cur) GROUP BY 1)
SELECT doc_id, n_bigrams,
  CAST(gsum AS DOUBLE) / n_bigrams / 1073741824.0 AS bigram_rarity
FROM d ORDER BY doc_id""",

    // mirror of TextAnalytics.perplexityBuckets: the q_bigram_rarity
    // chain, then per-language 30/70 quantile_cont cuts (== Spark's
    // exact percentile) and the CCNet head/middle/tail CASE on the
    // same rounded-identical doubles
    "q_perplexity_buckets" -> """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bp AS (SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
           i -> {'prev': toks[i], 'cur': toks[i + 1]})) AS p
       FROM t),
pr AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM bp),
cbg AS (SELECT prev, cur, count(*) AS cbg FROM pr GROUP BY 1, 2),
cctx AS (SELECT prev, CAST(sum(cbg) AS BIGINT) AS cctx FROM cbg GROUP BY 1),
cug AS (SELECT cur, CAST(sum(cbg) AS BIGINT) AS cug FROM cbg GROUP BY 1),
tot AS (SELECT CAST(sum(cug) AS BIGINT) AS n_total, count(*) AS vocab FROM cug),
g AS (SELECT prev, cur,
        floor(1073741824.0 /
          (0.5 * (CAST(cbg + 1 AS DOUBLE) / CAST(cctx + vocab AS DOUBLE))
         + 0.5 * (CAST(cug + 1 AS DOUBLE) / CAST(n_total + vocab AS DOUBLE)))) AS g
      FROM cbg JOIN cctx USING (prev) JOIN cug USING (cur) CROSS JOIN tot),
d AS (SELECT doc_id, count(*) AS n_bigrams,
             CAST(sum(CAST(g AS BIGINT)) AS BIGINT) AS gsum
      FROM pr JOIN g USING (prev, cur) GROUP BY 1),
r AS (SELECT d.doc_id, doc.lang,
        CAST(gsum AS DOUBLE) / n_bigrams / 1073741824.0 AS br
      FROM d JOIN documents doc ON d.doc_id = doc.doc_id),
c AS (SELECT lang, quantile_cont(br, 0.3) AS p30,
             quantile_cont(br, 0.7) AS p70
      FROM r GROUP BY 1)
SELECT r.doc_id, r.lang, r.br AS bigram_rarity,
  CASE WHEN r.br <= c.p30 THEN 'head'
       WHEN r.br <= c.p70 THEN 'middle'
       ELSE 'tail' END AS ppl_bucket
FROM r JOIN c USING (lang) ORDER BY r.doc_id""",

    // mirror of TextAnalytics.dsirWeights: hashed unigram+bigram buckets,
    // add-one-smoothed target/raw likelihood ratio on the 2^30 grid,
    // exact top-quartile selection (quantile_cont == Spark percentile)
    "q_dsir_weights" -> s"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
f AS (SELECT doc_id, lang,
        unnest(list_concat(toks,
          list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))) AS feat
      FROM t),
fb AS (SELECT doc_id, lang,
         ${polyFold(31, 1000000007L, "feat")} % 1024 AS bucket
       FROM f),
bc AS (SELECT bucket, count(*) AS n_r,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_t
       FROM fb GROUP BY 1),
tot AS (SELECT CAST(sum(n_r) AS BIGINT) AS nr_tot,
               CAST(sum(n_t) AS BIGINT) AS nt_tot FROM bc),
w AS (SELECT bucket,
        floor(1073741824.0
          * (CAST(n_t + 1 AS DOUBLE) / CAST(nt_tot + 1024 AS DOUBLE))
          / (CAST(n_r + 1 AS DOUBLE) / CAST(nr_tot + 1024 AS DOUBLE))) AS g
      FROM bc CROSS JOIN tot),
d AS (SELECT doc_id, count(*) AS n_feats,
             CAST(sum(CAST(g AS BIGINT)) AS BIGINT) AS gsum
      FROM fb JOIN w USING (bucket) GROUP BY 1),
sc AS (SELECT doc_id, n_feats,
              CAST(gsum AS DOUBLE) / n_feats / 1073741824.0 AS dsir_weight
       FROM d),
thr AS (SELECT quantile_cont(dsir_weight, 0.75) AS thr FROM sc)
SELECT doc_id, n_feats, dsir_weight, dsir_weight >= thr AS selected
FROM sc CROSS JOIN thr ORDER BY doc_id""",

    // mirror of TextAnalytics.dsirMixture: the same chain carried through
    // a per-source rollup of exact BIGINT grid sums (one division at the
    // end — no double summed over rows)
    "q_dsir_mixture" -> s"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
f AS (SELECT doc_id, lang,
        unnest(list_concat(toks,
          list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))) AS feat
      FROM t),
fb AS (SELECT doc_id, lang,
         ${polyFold(31, 1000000007L, "feat")} % 1024 AS bucket
       FROM f),
bc AS (SELECT bucket, count(*) AS n_r,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_t
       FROM fb GROUP BY 1),
tot AS (SELECT CAST(sum(n_r) AS BIGINT) AS nr_tot,
               CAST(sum(n_t) AS BIGINT) AS nt_tot FROM bc),
w AS (SELECT bucket,
        floor(1073741824.0
          * (CAST(n_t + 1 AS DOUBLE) / CAST(nt_tot + 1024 AS DOUBLE))
          / (CAST(n_r + 1 AS DOUBLE) / CAST(nr_tot + 1024 AS DOUBLE))) AS g
      FROM bc CROSS JOIN tot),
d AS (SELECT doc_id, count(*) AS n_feats,
             CAST(sum(CAST(g AS BIGINT)) AS BIGINT) AS gsum
      FROM fb JOIN w USING (bucket) GROUP BY 1),
sc AS (SELECT doc_id, n_feats, gsum,
              CAST(gsum AS DOUBLE) / n_feats / 1073741824.0 AS dsir_weight
       FROM d),
thr AS (SELECT quantile_cont(dsir_weight, 0.75) AS thr FROM sc),
sel AS (SELECT doc_id, n_feats, gsum, dsir_weight >= thr AS selected
        FROM sc CROSS JOIN thr),
j AS (SELECT doc.source, sel.n_feats, sel.gsum, sel.selected
      FROM sel JOIN documents doc USING (doc_id)),
g AS (SELECT source, count(*) AS docs,
        CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT) AS selected_docs,
        CAST(sum(gsum) AS BIGINT) AS gsum_tot,
        CAST(sum(n_feats) AS BIGINT) AS feats_tot
      FROM j GROUP BY 1)
SELECT source, docs, selected_docs,
  CAST(selected_docs AS DOUBLE) / CAST(docs AS DOUBLE) AS keep_rate,
  CAST(gsum_tot AS DOUBLE) / CAST(feats_tot AS DOUBLE) / 1073741824.0 AS mean_weight
FROM g ORDER BY source""",

    // mirror of TextCleaning.cleaningReport over the dirtied corpus —
    // the same regex chain (RE2-safe subset) with DuckDB's 'g' flag
    "q_text_cleaning" -> """
WITH dirty AS (
  SELECT doc_id,
         '<b>title</b> ' || text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com or +1 (555) 123-4567 now' AS text
  FROM documents),
cl AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS raw_len,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '<[^>]*>', '', 'g'),
                 '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9][0-9 ()+.-]{7,}[0-9]', '<PHONE>', 'g'),
           '[ \t\r\n]+', ' ', 'g')) AS cleaned
  FROM dirty)
SELECT doc_id, raw_len, CAST(length(cleaned) AS BIGINT) AS clean_len,
       raw_len <> CAST(length(cleaned) AS BIGINT) AS changed
FROM cl ORDER BY doc_id""",

    // mirror of TextCleaning.piiReport over the modularly dirtied corpus
    // (same email/phone patterns as q_text_cleaning, plus a dotted-quad
    // IPv4; families counted independently — a quad long enough to be
    // phone-shaped lands in both counts on both engines)
    "q_pii_scan" -> """
WITH dirty AS (
  SELECT source,
         text
           || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN ' call +1 (555) 123-4567' ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN ' from 10.'
                || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                || CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS text
  FROM documents),
c AS (
  SELECT source,
         len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
         len(regexp_extract_all(text,
           '\+?[0-9][0-9 ()+.-]{7,}[0-9]')) AS phones,
         len(regexp_extract_all(text,
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ips
  FROM dirty)
SELECT source, count(*) AS docs,
  CAST(sum(CASE WHEN emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS email_docs,
  CAST(sum(emails) AS BIGINT) AS emails,
  CAST(sum(CASE WHEN phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS phone_docs,
  CAST(sum(phones) AS BIGINT) AS phones,
  CAST(sum(CASE WHEN ips > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ip_docs,
  CAST(sum(ips) AS BIGINT) AS ips
FROM c GROUP BY 1 ORDER BY source""",

    // mirror of TextCleaning.piiRedact over the q_pii_scan dirty fixture:
    // the same three patterns chained email -> phone -> IP with global
    // replacement; per-class counts on the ORIGINAL text, as the audit
    "q_pii_redact" -> """
WITH dirty AS (
  SELECT doc_id,
         text
           || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN ' call +1 (555) 123-4567' ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN ' from 10.'
                || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                || CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\+?[0-9][0-9 ()+.-]{7,}[0-9]', '<PHONE>', 'g'),
    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
    AS redacted_text,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS emails,
  CAST(len(regexp_extract_all(text,
    '\+?[0-9][0-9 ()+.-]{7,}[0-9]')) AS BIGINT) AS phones,
  CAST(len(regexp_extract_all(text,
    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS ips
FROM dirty ORDER BY doc_id""",

    // mirror of TextAnalytics.corpusDiff over the derived v2
    "q_corpus_diff" -> """
WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
v2 AS (SELECT doc_id,
              md5(CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END) AS h2
       FROM documents WHERE doc_id % 13 <> 0
       UNION ALL
       SELECT doc_id + 10000000, md5(text) FROM documents WHERE doc_id % 19 = 0),
j AS (SELECT h1, h2 FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
SELECT CASE WHEN h1 IS NULL THEN 'added' WHEN h2 IS NULL THEN 'removed'
            WHEN h1 = h2 THEN 'unchanged' ELSE 'modified' END AS status,
       count(*) AS docs
FROM j GROUP BY 1 ORDER BY status""",

    // mirror of TextAnalytics.chunkDedup (non-overlapping 32-token windows)
    "q_chunk_dedup" -> """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ch AS (SELECT doc_id,
         unnest(list_transform(range(0, (len(toks) - 1) // 32 + 1),
           i -> array_to_string(toks[i * 32 + 1 : i * 32 + 32], ' '))) AS chunk
       FROM t),
f AS (SELECT chunk, count(*) AS occ FROM ch GROUP BY 1)
SELECT doc_id, count(*) AS n_chunks,
       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS dup_chunk_frac
FROM ch JOIN f USING (chunk) GROUP BY 1 ORDER BY doc_id""",

    // mirror of TextAnalytics.qualitySourceFilter (q = 0.25; exact
    // percentile == quantile_cont, same quality formula as q_quality)
    "q_quality_filter" -> s"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> x IN $stop)) AS BIGINT) AS n_stop,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
      FROM t),
sc AS (SELECT doc_id,
         0.4 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
           + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
           + 0.3 * (CAST(n_unique AS DOUBLE) / n_tokens) AS quality_score
       FROM s),
j AS (SELECT sc.doc_id, sc.quality_score, d.source, d.n_chars
      FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
th AS (SELECT source, quantile_cont(quality_score, 0.25) AS threshold
       FROM j GROUP BY 1)
SELECT j.source, max(th.threshold) AS threshold, count(*) AS total_docs,
       CAST(sum(CASE WHEN quality_score >= threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS kept_docs,
       CAST(sum(CASE WHEN quality_score >= threshold THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars,
       CAST(sum(CASE WHEN quality_score >= threshold THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS kept_frac
FROM j JOIN th USING (source) GROUP BY j.source ORDER BY j.source""",

    // mirror of TextAnalytics.contaminationAgainst with the bench suite
    // = doc_id % 97 == 0, corpus = the rest
    "q_contamination_bench" -> s"""
WITH sp AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ng AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 8
           THEN list_transform(
                  list_transform(range(1, len(toks) - 6),
                    g -> array_to_string(toks[g:g+7], ' ')),
                  s -> $ngramHashS)
           ELSE [] END) AS ngrams
  FROM sp),
bng AS (SELECT doc_id AS bench_id, unnest(ngrams) AS ngram
        FROM ng WHERE doc_id % 97 = 0),
cng AS (SELECT DISTINCT unnest(ngrams) AS ngram
        FROM ng WHERE doc_id % 97 <> 0),
hits AS (SELECT bench_id, count(*) AS contaminated
         FROM bng WHERE ngram IN (SELECT ngram FROM cng) GROUP BY 1),
tot AS (SELECT bench_id, count(*) AS n_ngrams FROM bng GROUP BY 1)
SELECT t.bench_id, t.n_ngrams, COALESCE(h.contaminated, 0) AS contaminated,
       CAST(COALESCE(h.contaminated, 0) AS DOUBLE) / t.n_ngrams
         AS contamination_frac,
       CAST(COALESCE(h.contaminated, 0) AS DOUBLE) / t.n_ngrams > 0.2 AS flagged
FROM tot t LEFT JOIN hits h USING (bench_id) ORDER BY t.bench_id""",

    // mirror of TextAnalytics.evalSample: N lowest content-draw u per
    // language (same polyhash uniform as q_mixture)
    "q_eval_sample" -> """
WITH u AS (
  SELECT doc_id, lang,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(text) + 1),
             i -> CAST(ascii(text[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007) AS DOUBLE) / 1000000007.0 AS u
  FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rnk
      FROM u)
SELECT doc_id, lang, u, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5 ORDER BY lang, rnk""",

    // mirror of TextAnalytics.temperatureMixture (α = 0.5): integer-grid
    // sqrt quantization makes the normalizing sums exact BIGINTs
    "q_mixture_temperature" -> """
WITH t AS (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
per AS (SELECT lang, count(*) AS docs, CAST(sum(n) AS BIGINT) AS tokens
        FROM t GROUP BY 1),
g AS (SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1048576.0) AS BIGINT) AS g
      FROM per),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot_tokens,
               CAST(sum(g) AS BIGINT) AS tot_g FROM g),
w AS (SELECT lang, docs, tokens,
        CAST(tokens AS DOUBLE) / tot_tokens AS raw_frac,
        CAST(g AS DOUBLE) / tot_g AS alpha_weight
      FROM g CROSS JOIN tot)
SELECT lang, docs, tokens, raw_frac, alpha_weight,
       alpha_weight / raw_frac AS upsample
FROM w ORDER BY lang""",

    // mirror of TextAnalytics.shardReport (16 shards, polyhash sharding)
    // mirror of TextAnalytics.packSequences: running-total placement
    // within each hash shard, integer sequence ids and straddle flags
    "q_pack_sequences" -> """
WITH d AS (SELECT doc_id,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, length(text) + 1),
        i -> CAST(ascii(text[i:i]) AS BIGINT))),
      (acc, c) -> (acc * 31 + c) % 1000000007) % 16 AS shard,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
p AS (SELECT shard, n_tokens,
        coalesce(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS before
      FROM d),
q AS (SELECT shard, n_tokens, before,
             before // 2048 AS seq,
             CASE WHEN (before + n_tokens - 1) // 2048 > before // 2048
                  THEN 1 ELSE 0 END AS straddles
      FROM p),
r AS (SELECT shard, count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS tokens,
             CAST(max((before + n_tokens - 1) // 2048) + 1 AS BIGINT) AS sequences,
             CAST(sum(straddles) AS BIGINT) AS straddling_docs
      FROM q GROUP BY 1)
SELECT shard, docs, tokens, sequences, straddling_docs,
       CAST(tokens AS DOUBLE) / (sequences * 2048) AS mean_fill
FROM r ORDER BY shard""",

    "q_shards" -> """
WITH h AS (SELECT
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, length(text) + 1),
        i -> CAST(ascii(text[i:i]) AS BIGINT))),
      (acc, c) -> (acc * 31 + c) % 1000000007) % 16 AS shard,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, n_chars
  FROM documents),
per AS (SELECT shard, count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS tokens,
          CAST(sum(n_chars) AS BIGINT) AS chars FROM h GROUP BY 1),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot_tokens FROM per)
SELECT shard, docs, tokens, chars,
       CAST(tokens AS DOUBLE) * 16 / tot_tokens AS relative_load
FROM per CROSS JOIN tot ORDER BY shard""",

    // mirror of TextAnalytics.curationFunnel: cumulative quality ->
    // exact-dedup -> near-dup-drop -> train-split survival; near-dup
    // keep comes from the same recursive min-label CTE as
    // q_dedup_clusters
    "q_curation_funnel" -> s"""
WITH RECURSIVE t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks, md5(text) AS h,
         CASE WHEN substr(md5(text), 1, 2) < 'f6' THEN 'train'
              WHEN substr(md5(text), 1, 2) < 'fb' THEN 'val'
              ELSE 'test' END AS split
  FROM documents),
s AS (SELECT doc_id, n_chars, h, split,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> x IN $stop)) AS BIGINT) AS n_stop,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
      FROM t),
q AS (SELECT *,
        (0.4 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
         + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
         + 0.3 * (CAST(n_unique AS DOUBLE) / n_tokens)) >= 0.5 AS q
      FROM s),
m AS (SELECT *, min(CASE WHEN q THEN doc_id END)
               OVER (PARTITION BY h) AS keep_id FROM q),
$clusterChainCtes,
cl AS (SELECT node AS doc_id, min(label) = node AS nd_keep
       FROM reach GROUP BY node),
f AS (SELECT m.*, COALESCE(cl.nd_keep, TRUE) AS ndk
      FROM m LEFT JOIN cl USING (doc_id)),
g AS (SELECT *, q AS s1, (q AND doc_id = keep_id) AS s2,
        (q AND doc_id = keep_id AND ndk) AS s3,
        (q AND doc_id = keep_id AND ndk AND split = 'train') AS s4
      FROM f),
a AS (SELECT count(*) AS d0, CAST(sum(n_tokens) AS BIGINT) AS t0,
        CAST(sum(n_chars) AS BIGINT) AS c0,
        CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(sum(CASE WHEN s1 THEN n_tokens ELSE 0 END) AS BIGINT) AS t1,
        CAST(sum(CASE WHEN s1 THEN n_chars ELSE 0 END) AS BIGINT) AS c1,
        CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        CAST(sum(CASE WHEN s2 THEN n_tokens ELSE 0 END) AS BIGINT) AS t2,
        CAST(sum(CASE WHEN s2 THEN n_chars ELSE 0 END) AS BIGINT) AS c2,
        CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        CAST(sum(CASE WHEN s3 THEN n_tokens ELSE 0 END) AS BIGINT) AS t3,
        CAST(sum(CASE WHEN s3 THEN n_chars ELSE 0 END) AS BIGINT) AS c3,
        CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
        CAST(sum(CASE WHEN s4 THEN n_tokens ELSE 0 END) AS BIGINT) AS t4,
        CAST(sum(CASE WHEN s4 THEN n_chars ELSE 0 END) AS BIGINT) AS c4
      FROM g)
SELECT 0 AS stage, 'raw' AS stage_name, d0 AS docs, t0 AS tokens, c0 AS chars FROM a
UNION ALL SELECT 1, 'quality', d1, t1, c1 FROM a
UNION ALL SELECT 2, 'exact_dedup', d2, t2, c2 FROM a
UNION ALL SELECT 3, 'near_dedup', d3, t3, c3 FROM a
UNION ALL SELECT 4, 'train_split', d4, t4, c4 FROM a
ORDER BY stage""",

    // mirror of Similarity.embeddingDedupClusters: the q_cosine_neardups
    // pair set fed through the q_dedup_clusters recursive min-label CTE
    "q_embedding_dedup" -> s"""
WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
$lshBucketsCte,
$lshCandCtes,
s AS (
  SELECT vec_a, vec_b FROM (
    SELECT vec_a, vec_b,
           round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) AS score
    FROM c JOIN n x ON c.vec_a = x.vec_id JOIN n y ON c.vec_b = y.vec_id)
  WHERE score >= 0.4),
edges AS (SELECT vec_a AS src, vec_b AS dst FROM s
          UNION SELECT vec_b, vec_a FROM s),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.node)
SELECT node AS vec_id, CAST(min(label) AS BIGINT) AS cluster_id,
       min(label) = node AS keep
FROM reach GROUP BY node ORDER BY vec_id""",

    // mirror of Pq.knnPq: shared-codebook product quantization with
    // grid-exact ADC — pooled-subvector Lloyd (2 unrolled rounds, same
    // 2^-20 mean grid as the IVF mirror), codes via the L2 argmax
    // (2*dot - |c|^2, tie-break code DESC), and 2^-30-grid integer ADC
    // accumulation so the 8-term sum is order-free in both engines
    "q_knn_pq" -> pqOracle,

    // mirror of Pq.knnPqRerank: the pq chain's ADC top-50 per query,
    // exact-cosine re-ranked to top-10 (the chain's n/qn CTEs reused)
    "q_knn_pq_rerank" -> s"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
$pqChainCtes,
pcand AS (SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, vec_id) AS rnk
    FROM pqscored) WHERE rnk <= 50),
ex AS (SELECT c.query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, xn.v) / (q.nrm * xn.nrm), 9) AS score
       FROM pcand c JOIN n xn ON xn.vec_id = c.vec_id
       JOIN n q ON q.vec_id = c.query_id),
rr AS (SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, neighbor_id) AS rnk
       FROM ex)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank", score
FROM rr WHERE rnk <= 10 ORDER BY query_id, "rank"""",

    // mirror of Relational.retentionCohorts: distinct user-days, min-day
    // cohort window, (cohort_day, day_offset) matrix
    "q_retention_cohorts" -> """
WITH ud AS (SELECT DISTINCT user_id,
  (epoch_ns(ts) // 1000000000) // 86400 AS day FROM events),
o AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM ud),
off AS (SELECT user_id, cohort_day, day - cohort_day AS day_offset FROM o),
cs AS (SELECT cohort_day, count(*) AS cohort_users FROM off
       WHERE day_offset = 0 GROUP BY 1)
SELECT f.cohort_day, f.day_offset, count(*) AS active_users, cs.cohort_users,
       CAST(count(*) AS DOUBLE) / CAST(cs.cohort_users AS DOUBLE) AS retention
FROM off f JOIN cs USING (cohort_day)
GROUP BY f.cohort_day, f.day_offset, cs.cohort_users
ORDER BY cohort_day, day_offset""",

    // mirror of Relational.eventTransitions: per-user lag in
    // (epoch_s, event_id) order, |types|^2 cells, per-prev probability
    "q_event_transitions" -> """
WITH e AS (SELECT user_id, event_id, event_type,
  epoch_ns(ts) // 1000000000 AS epoch_s FROM events),
p AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_s, event_id) AS prev_type
      FROM e),
c AS (SELECT prev_type, event_type, count(*) AS transitions FROM p
      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev_type, CAST(sum(transitions) AS BIGINT) AS from_total
      FROM c GROUP BY 1)
SELECT c.prev_type, c.event_type, c.transitions,
       CAST(c.transitions AS DOUBLE) / CAST(t.from_total AS DOUBLE) AS probability
FROM c JOIN t USING (prev_type) ORDER BY prev_type, event_type""",

    // mirror of Linkage.editDistancePairs: FastSS deletion-neighborhood
    // blocking on the full trailing digit run — U(k) = {k} ∪ deletions,
    // distinct per row — then DuckDB's independent levenshtein verify
    "q_editdist_pairs" -> """
WITH base AS (
  SELECT c_custkey AS id, c_name AS name, CAST(c_nationkey AS INT) AS nation,
         regexp_extract(c_name, '([0-9]+)$', 1) AS k
  FROM customer
  WHERE length(regexp_extract(c_name, '([0-9]+)$', 1)) >= 1),
v AS (
  SELECT DISTINCT id, name, nation, u.variant
  FROM base, unnest(list_distinct(list_append(
    list_transform(range(1, length(k) + 1),
      p -> substring(k, 1, p - 1) || substring(k, p + 1, length(k))),
    k))) AS u(variant))
SELECT DISTINCT a.id AS id1, b.id AS id2, a.name AS name1, b.name AS name2,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       (a.nation = b.nation) AS same_nation
FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= 1
ORDER BY id1, id2""",

    // mirror of Sampling.stratifiedSample (constants shared from the
    // Scala object — never fork them)
    "q_stratified_sample" -> {
      import graft.operators.Sampling.{M, A, B, SampleCut}
      s"""
WITH d AS (SELECT source, n_chars,
  CASE WHEN ((doc_id % $M) * $A + $B) % $M < $SampleCut
       THEN 1 ELSE 0 END AS keep
  FROM documents)
SELECT source, count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS sampled,
  CAST(sum(keep) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rate,
  CAST(sum(keep * n_chars) AS BIGINT) AS samp_chars
FROM d GROUP BY 1 ORDER BY source"""
    },

    // mirror of Sampling.consistentJoinSample: same key-hash predicate
    // on both sides of the customer/orders relationship
    "q_consistent_sample" -> {
      import graft.operators.Sampling.{M, A, B, SampleCut}
      s"""
WITH pc AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
c AS (SELECT c_custkey, c_mktsegment,
        CASE WHEN ((c_custkey % $M) * $A + $B) % $M < $SampleCut
             THEN 1 ELSE 0 END AS keep
      FROM customer),
j AS (SELECT c.c_mktsegment, c.keep, COALESCE(pc.n_orders, 0) AS n_orders
      FROM c LEFT JOIN pc ON c.c_custkey = pc.o_custkey)
SELECT c_mktsegment, count(*) AS customers,
  CAST(sum(keep) AS BIGINT) AS sampled_customers,
  CAST(sum(n_orders) AS BIGINT) AS orders,
  CAST(sum(keep * n_orders) AS BIGINT) AS sampled_orders,
  CAST(sum(n_orders) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS opc_full,
  CASE WHEN sum(keep) = 0 THEN NULL
       ELSE CAST(sum(keep * n_orders) AS DOUBLE) / CAST(sum(keep) AS DOUBLE)
  END AS opc_sampled
FROM j GROUP BY 1 ORDER BY c_mktsegment"""
    },

    // mirror of Sampling.bootstrapCi: 64 hash-defined half-samples,
    // exact-integer replicate sums, quantile_cont == Spark percentile
    "q_bootstrap_ci" -> {
      import graft.operators.Sampling.{M, A2, B2, Replicates}
      s"""
WITH r0 AS (
  SELECT source, b.b AS b, n_chars,
         CASE WHEN (((doc_id % $M) * $A2 + b.b * $B2) % $M) % 2 = 0
              THEN 1 ELSE 0 END AS w
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(0, ${Replicates - 1})) AS b) b),
m AS (
  SELECT source, b,
         CAST(sum(w * n_chars) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
  FROM r0 GROUP BY 1, 2 HAVING sum(w) > 0),
ci AS (
  SELECT source, count(*) AS replicates,
         quantile_cont(m, 0.025) AS ci_lo, quantile_cont(m, 0.975) AS ci_hi
  FROM m GROUP BY 1),
f AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_chars
  FROM documents GROUP BY 1)
SELECT f.source, f.n_docs, f.mean_chars, ci.ci_lo, ci.ci_hi, ci.replicates
FROM f JOIN ci USING (source) ORDER BY source"""
    })
}
