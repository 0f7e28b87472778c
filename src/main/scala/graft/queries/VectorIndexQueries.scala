package graft.queries

import org.apache.spark.sql.functions._

import graft.GQuery
import graft.functions.Similarity
import graft.sources.Tables

/** Vector-index tier, round 8c: product quantization (Jegou/Douze/Schmid,
  * "Product quantization for nearest neighbor search", TPAMI 2011) — the
  * missing third leg of the ANN scale triad next to hyperplane LSH (q40)
  * and IVF (q54/q68). PQ is what makes 100 TB vector corpora searchable
  * at all: codes are m bytes per vector instead of dims·4 of floats (32×
  * at dims=64, m=8), so the candidate set that IVF cells produce can be
  * scored from memory-resident codes.
  *
  * Cross-engine exactness: the two floating-point kernels this tier adds
  * — a left-to-right double-fold dot product and sqrt-of-squared-diff
  * L2 — were probed bit-identical to DuckDB's list_dot_product /
  * list_distance on the fixture embeddings (the q39 sequential-fold law
  * extended), so the gate is EXACT, not invariant-bounded.
  */
object VectorIndexQueries {

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    // q244: PQ encode + asymmetric-distance top-k. The codebook is m=8
    // subspaces × ks=16 sub-centroids of formula components (dyadic
    // md5-derived — the q220 discipline; production trains them with the
    // gated k-means, the gate's formula keeps the oracle model-free) and
    // is baked into the plan as LITERALS, so encode is scan-speed
    // projection: per subspace, argmin L2 over 16 literal sub-centroids
    // (ties → lower code id via lexicographic struct-min; the L2 keeps
    // its sqrt because two sums can be distinct doubles yet round to one
    // sqrt — only the sqrt'd value tie-breaks identically cross-engine).
    //
    // Scoring is ADC in reconstruction form: score(q, x) = dot(q,
    // recon(codes(x))) with one full-width 64-dim fold — mathematically
    // the per-subspace lookup-table sum, but computed in the ONE
    // dimension order both engines share (a per-subspace LUT sum would
    // round differently between the engines' group orders). Queries are
    // the sparse vec_id % 97 slice (broadcast); per-query top-5 uses the
    // straggler-free two-level window (local top-k per partition, then
    // global — Similarity.topKPerQuery). The top-k rows also carry the
    // neighbor's code signature, gating the encoder output directly.
    //
    // 100 TB shape: encode touches each vector once, map-side, zero
    // joins/shuffles (PlanShapeSpec-locked: no non-broadcast join in the
    // plan); scoring shuffles only (query, neighbor, score) doubles
    // through the pruned window. In production the corpus keeps ONLY
    // codes (m bytes/vector) and IVF cells (q54) prune which codes each
    // query scores; here every code is scored so the oracle can replay
    // the exact ranking.
    GQuery(
      "q244_pq_adc",
      (s, d) => {
        val (dims, m, ks, k) = (64, 8, 16, 5)
        val emb = Tables.embeddings(s, d)
        val vd = transform(col("embedding"), x => x.cast("double"))
        // the fixture ships one parquet file per table — spread the
        // encode pass or the whole scan-speed projection runs on one task
        val enc = Tables.spread(emb, col("vec_id"))
          .select(col("vec_id"), Similarity.pqEncode(vd, dims, m, ks).as("codes"))
          .select(col("vec_id"),
            concat_ws(",", transform(col("codes"), c => c.cast("string"))).as("code_sig"),
            Similarity.pqReconstruct(col("codes"), dims, m, ks).as("recon"))
        val q = emb.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("query_id"),
            transform(col("embedding"), x => x.cast("double")).as("qv"))
        val scored = enc.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            Similarity.dotFold(col("qv"), col("recon")).as("sim"))
        val topk = Similarity.topKPerQuery(scored, k)
          .withColumnRenamed("sim", "score")
        // code signatures of the ≤ Q·k winners: broadcast the tiny top-k
        // side; the corpus-sized encode stays map-side on both passes
        enc.select(col("vec_id").as("neighbor_id"), col("code_sig"))
          .join(broadcast(topk), Seq("neighbor_id"))
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("score"), col("code_sig"))
          .orderBy(col("query_id").asc, col("rank").asc)
      },
      Some("""WITH cb AS (
             |  SELECT mm.m, jj.j,
             |         list((CAST(('0x'||substr(md5('pq:'||mm.m||':'||jj.j||':'||dd.d),1,15)) AS BIGINT)
             |               % 2001 - 1000) / 1024.0 ORDER BY dd.d) AS cvec
             |  FROM (SELECT unnest(range(0, 8)) AS m) mm,
             |       (SELECT unnest(range(0, 16)) AS j) jj,
             |       (SELECT unnest(range(0, 8)) AS d) dd
             |  GROUP BY mm.m, jj.j),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |codes AS (
             |  SELECT vec_id, m, j FROM (
             |    SELECT e.vec_id, cb.m, cb.j,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.m ORDER BY
             |             list_distance(e.v[cb.m*8+1 : cb.m*8+8], cb.cvec) ASC, cb.j ASC) AS rn
             |    FROM e CROSS JOIN cb)
             |  WHERE rn = 1),
             |sig AS (
             |  SELECT vec_id, string_agg(CAST(j AS VARCHAR), ',' ORDER BY m) AS code_sig
             |  FROM codes GROUP BY vec_id),
             |recon AS (
             |  SELECT c.vec_id, flatten(list(cb.cvec ORDER BY c.m)) AS r
             |  FROM codes c JOIN cb ON cb.m = c.m AND cb.j = c.j
             |  GROUP BY c.vec_id),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
             |scored AS (
             |  SELECT q.query_id, r.vec_id AS neighbor_id,
             |         list_dot_product(q.qv, r.r) AS score
             |  FROM q CROSS JOIN recon r WHERE r.vec_id <> q.query_id),
             |topk AS (
             |  SELECT query_id, neighbor_id, score,
             |         row_number() OVER (PARTITION BY query_id
             |           ORDER BY score DESC, neighbor_id ASC) AS rank
             |  FROM scored)
             |SELECT t.query_id, CAST(t.rank AS INT) AS rank, t.neighbor_id,
             |       t.score, s.code_sig
             |FROM topk t JOIN sig s ON s.vec_id = t.neighbor_id
             |WHERE t.rank <= 5
             |ORDER BY t.query_id ASC, t.rank ASC""".stripMargin),
      "product quantization: literal-codebook scan-speed encode + exact ADC ranking == DuckDB replay (dot/L2 folds probed bit-identical)"),

    // ------------------------------------------------------------------
    // q252: LSH recall/precision AUDIT — the measurement harness every
    // production ANN deployment needs before trusting its index: on a
    // deterministic corpus slice (vec_id % 4), compare hyperplane-LSH
    // bucket-collision candidates (4 planes × 4 tables, the q40
    // signature machinery) against the EXACT cosine-threshold pair set,
    // per label block. Output per label: |relevant|, |candidates|,
    // |hits|, and recall/precision in integer fixed-point. The oracle
    // replays the ENTIRE pipeline — md5-derived ±1 planes, sign-bit
    // buckets via list_dot_product (probed bit-identical to the fold),
    // exact cosines, the set algebra — so the audit itself is gated
    // exactly, not spot-checked. A label with no relevant pairs reports
    // -1 (never a 0/0).
    //
    // 100 TB shape: this is an OFFLINE audit run on a sampled slice by
    // construction (the % 4 gate is the sample); exact pairs stay
    // bounded by block² on the sample, candidates by bucket occupancy —
    // the operator's whole point is that you never run it on the full
    // corpus, you run it on a slice sized to answer "is my recall ≥ X".
    GQuery(
      "q252_lsh_recall",
      (s, d) => {
        val theta = 0.15
        val planes = 4
        val tables = 4
        val emb = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
          .select(col("vec_id"), col("label"), col("embedding"))
        val rel = Similarity.blockedNearDupPairs(
            emb, "vec_id", "embedding", "label", theta)
          .join(emb.select(col("vec_id").as("id_a"), col("label")), Seq("id_a"))
          .select(col("label"), col("id_a"), col("id_b"))
        val sigs = emb.select(col("vec_id"), col("label"),
          explode(array((0 until tables).map(t =>
            struct(lit(t).as("t"),
              Similarity.hyperplaneSignature(col("embedding"), 64, planes, t)
                .as("bucket"))): _*)).as("e"))
          .select(col("vec_id"), col("label"),
            col("e.t").as("t"), col("e.bucket").as("bucket"))
        val cand = sigs.as("x").join(sigs.as("y"),
            col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
              col("x.label") === col("y.label") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.label").as("label"),
            col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
          .distinct()
        val hits = cand.join(rel, Seq("label", "id_a", "id_b"))
        val byLabel = emb.select(col("label")).distinct()
        def cnt(df: org.apache.spark.sql.DataFrame, name: String) =
          df.groupBy(col("label")).agg(count(lit(1)).as(name))
        byLabel
          .join(cnt(rel, "n_rel"), Seq("label"), "left")
          .join(cnt(cand, "n_cand"), Seq("label"), "left")
          .join(cnt(hits, "n_hit"), Seq("label"), "left")
          .select(col("label"),
            coalesce(col("n_rel"), lit(0L)).as("n_rel"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("recall_fp",
            when(col("n_rel") > 0, expr("n_hit * 1000 DIV n_rel")).otherwise(lit(-1L)))
          .withColumn("precision_fp",
            when(col("n_cand") > 0, expr("n_hit * 1000 DIV n_cand")).otherwise(lit(-1L)))
          .orderBy(col("label").asc)
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id % 4 = 0),
             |pl AS (
             |  SELECT t.t, p.p,
             |         list(CASE WHEN CAST(('0x'||substr(md5(CAST(t.t AS VARCHAR)||':'||CAST(p.p AS VARCHAR)||':'||CAST(dd.d AS VARCHAR)),1,2)) AS INT) % 2 = 1
             |                   THEN 1.0 ELSE -1.0 END ORDER BY dd.d) AS plist
             |  FROM range(0,4) t(t), range(0,4) p(p), range(0,64) dd(d)
             |  GROUP BY t.t, p.p),
             |sig AS (
             |  SELECT e.vec_id, e.label, pl.t,
             |         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.plist) >= 0
             |                  THEN 1 << CAST(pl.p AS INT) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM e CROSS JOIN pl GROUP BY e.vec_id, e.label, pl.t),
             |rel AS (
             |  SELECT a.label, a.vec_id AS ia, b.vec_id AS ib
             |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
             |  WHERE list_cosine_similarity(a.v, b.v) >= 0.15),
             |cand AS (
             |  SELECT DISTINCT x.label, x.vec_id AS ia, y.vec_id AS ib
             |  FROM sig x JOIN sig y ON x.t = y.t AND x.bucket = y.bucket
             |    AND x.label = y.label AND x.vec_id < y.vec_id),
             |hit AS (
             |  SELECT c.label, c.ia, c.ib
             |  FROM cand c JOIN rel r ON r.label = c.label AND r.ia = c.ia AND r.ib = c.ib),
             |lbl AS (SELECT DISTINCT label FROM e),
             |agg AS (
             |  SELECT l.label,
             |         COALESCE(nr.n, 0) AS n_rel, COALESCE(nc.n, 0) AS n_cand,
             |         COALESCE(nh.n, 0) AS n_hit
             |  FROM lbl l
             |  LEFT JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM rel GROUP BY 1) nr USING (label)
             |  LEFT JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM cand GROUP BY 1) nc USING (label)
             |  LEFT JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM hit GROUP BY 1) nh USING (label))
             |SELECT label, n_rel, n_cand, n_hit,
             |       CASE WHEN n_rel > 0 THEN n_hit * 1000 // n_rel ELSE -1 END AS recall_fp,
             |       CASE WHEN n_cand > 0 THEN n_hit * 1000 // n_cand ELSE -1 END AS precision_fp
             |FROM agg ORDER BY label ASC""".stripMargin),
      "LSH index audit: bucket-collision candidates vs exact cosine pairs, per-label recall/precision == full-pipeline DuckDB replay"),

    // ------------------------------------------------------------------
    // q256: STREAMING vector dedup by PQ code — the q244 encoder
    // composed with q172's watermark dedup through the REAL micro-batch
    // engine (EventStreams.streamPqGate): PqEncode is a pure projection
    // (codebook = plan constant), hence streaming-legal, and the dedup
    // state keys on the m-byte code signature instead of the 256-byte
    // vector — the 32× state cut that makes streaming near-dup admission
    // control feasible. Batch 0 presents each of the 100 formula vectors
    // exactly once (rowsPerBatch == keySpace); later batches are pure
    // duplicates and the state store must suppress every one. The oracle
    // replays vector → per-subspace argmin → signature → first-id
    // entirely relationally (the 100 signatures are distinct, so there
    // is no intra-batch first-arrival race to depend on).
    GQuery(
      "q256_stream_pq_dedup",
      (s, _) => graft.streaming.EventStreams.streamPqGate(s),
      Some("""WITH cb AS (
             |  SELECT mm.m, jj.j,
             |         list((CAST(('0x'||substr(md5('pq:'||mm.m||':'||jj.j||':'||dd.d),1,15)) AS BIGINT)
             |               % 2001 - 1000) / 1024.0 ORDER BY dd.d) AS cvec
             |  FROM (SELECT unnest(range(0, 8)) AS m) mm,
             |       (SELECT unnest(range(0, 16)) AS j) jj,
             |       (SELECT unnest(range(0, 8)) AS d) dd
             |  GROUP BY mm.m, jj.j),
             |vec AS (
             |  SELECT kk.k,
             |         list((CAST(('0x'||substr(md5('sv:'||kk.k||':'||dd.d),1,15)) AS BIGINT)
             |               % 2001 - 1000) / 1024.0 ORDER BY dd.d) AS v
             |  FROM (SELECT unnest(range(0, 100)) AS k) kk,
             |       (SELECT unnest(range(0, 64)) AS d) dd
             |  GROUP BY kk.k),
             |codes AS (
             |  SELECT k, m, j FROM (
             |    SELECT vec.k, cb.m, cb.j,
             |           row_number() OVER (PARTITION BY vec.k, cb.m ORDER BY
             |             list_distance(vec.v[cb.m*8+1 : cb.m*8+8], cb.cvec) ASC, cb.j ASC) AS rn
             |    FROM vec CROSS JOIN cb)
             |  WHERE rn = 1),
             |sig AS (
             |  SELECT k, string_agg(CAST(j AS VARCHAR), ',' ORDER BY m) AS code_sig
             |  FROM codes GROUP BY k)
             |SELECT code_sig, CAST(k AS BIGINT) AS first_id
             |FROM sig ORDER BY first_id ASC""".stripMargin),
      "streaming PQ-code dedup via the real micro-batch engine: m-byte state per vector == full encode replay"),

    // ------------------------------------------------------------------
    // q257: IVF-PQ — the PRODUCTION ANN shape (Jegou et al. TPAMI 2011,
    // the Faiss IVFPQ index): a coarse quantizer prunes which cells each
    // query scores (q54's IVF idea), and within the probed cells
    // candidates are scored from their PQ codes (q244's ADC), never the
    // raw vectors. Here BOTH quantizers are plan-time constants (16
    // formula coarse centroids as literal arrays, the PQ codebook inside
    // PqEncode), so cell assignment AND encode are map-side scan-speed
    // projection — fixed K=16 is the regime where the flat literal
    // argmax is correct (contrast q220, where K ∝ n forces the
    // hierarchical assign). Each query probes its nprobe=4 nearest
    // cells; the candidate join broadcasts the (query, cell) probe pairs
    // so pairwise work drops to Q·(N·nprobe/K) ADC lookups. Ties break
    // toward the lower cell/neighbor id; the oracle replays assignment,
    // probing, encode, reconstruction, and ranking relationally.
    GQuery(
      "q257_ivf_pq",
      (s, d) => {
        val (dims, m, ks, k, cells, nprobe) = (64, 8, 16, 5, 16, 4)
        val cb = (0 until cells).map { c =>
          (0 until dims).map { dd =>
            val h = java.lang.Long.parseLong(
              java.security.MessageDigest.getInstance("MD5")
                .digest(s"ivf:$c:$dd".getBytes("UTF-8"))
                .take(8).map(b => f"$b%02x").mkString.take(15), 16)
            ((h % 2001) - 1000).toDouble / 1024.0
          }
        }
        def centLit(c: Int) = array(cb(c).map(lit): _*).cast("array<float>")
        def cellCands(vec: org.apache.spark.sql.Column) =
          array((0 until cells).map { c =>
            struct(Similarity.cosine(vec, centLit(c)).as("csim"),
              lit(-c).as("nc"))
          }: _*)
        val emb = Tables.embeddings(s, d)
        val vd = transform(col("embedding"), x => x.cast("double"))
        val enc = Tables.spread(emb, col("vec_id"))
          .select(col("vec_id"),
            (-array_max(cellCands(col("embedding"))).getField("nc")).as("cell"),
            Similarity.pqEncode(vd, dims, m, ks).as("codes"))
          .select(col("vec_id"), col("cell"),
            Similarity.pqReconstruct(col("codes"), dims, m, ks).as("recon"))
        // per-query probe list: top-nprobe cells by centroid cosine —
        // sort the 16 (−csim, cell) structs ascending = csim descending
        val probeArr = slice(array_sort(
          array((0 until cells).map { c =>
            struct((-Similarity.cosine(col("embedding"), centLit(c))).as("ncs"),
              lit(c).as("c"))
          }: _*)), 1, nprobe)
        val q = emb.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("query_id"),
            transform(col("embedding"), x => x.cast("double")).as("qv"),
            explode(transform(probeArr, p => p.getField("c"))).as("cell"))
        val scored = enc.join(broadcast(q), Seq("cell"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            Similarity.dotFold(col("qv"), col("recon")).as("sim"))
        Similarity.topKPerQuery(scored, k)
          .withColumnRenamed("sim", "score")
          .orderBy(col("query_id").asc, col("rank").asc)
      },
      Some("""WITH cent AS (
             |  SELECT cc.c,
             |         list((CAST(('0x'||substr(md5('ivf:'||cc.c||':'||dd.d),1,15)) AS BIGINT)
             |               % 2001 - 1000) / 1024.0 ORDER BY dd.d) AS cvec
             |  FROM (SELECT unnest(range(0, 16)) AS c) cc,
             |       (SELECT unnest(range(0, 64)) AS d) dd
             |  GROUP BY cc.c),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |asg AS (
             |  SELECT vec_id, c AS cell FROM (
             |    SELECT e.vec_id, cent.c,
             |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             |             list_cosine_similarity(e.v, cent.cvec) DESC, cent.c ASC) AS rn
             |    FROM e CROSS JOIN cent)
             |  WHERE rn = 1),
             |cb AS (
             |  SELECT mm.m, jj.j,
             |         list((CAST(('0x'||substr(md5('pq:'||mm.m||':'||jj.j||':'||dd.d),1,15)) AS BIGINT)
             |               % 2001 - 1000) / 1024.0 ORDER BY dd.d) AS cvec
             |  FROM (SELECT unnest(range(0, 8)) AS m) mm,
             |       (SELECT unnest(range(0, 16)) AS j) jj,
             |       (SELECT unnest(range(0, 8)) AS d) dd
             |  GROUP BY mm.m, jj.j),
             |codes AS (
             |  SELECT vec_id, m, j FROM (
             |    SELECT e.vec_id, cb.m, cb.j,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.m ORDER BY
             |             list_distance(e.v[cb.m*8+1 : cb.m*8+8], cb.cvec) ASC, cb.j ASC) AS rn
             |    FROM e CROSS JOIN cb)
             |  WHERE rn = 1),
             |recon AS (
             |  SELECT c.vec_id, flatten(list(cb.cvec ORDER BY c.m)) AS r
             |  FROM codes c JOIN cb ON cb.m = c.m AND cb.j = c.j
             |  GROUP BY c.vec_id),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
             |probes AS (
             |  SELECT query_id, qv, c AS cell FROM (
             |    SELECT q.query_id, q.qv, cent.c,
             |           row_number() OVER (PARTITION BY q.query_id ORDER BY
             |             list_cosine_similarity(q.qv, cent.cvec) DESC, cent.c ASC) AS rn
             |    FROM q CROSS JOIN cent)
             |  WHERE rn <= 4),
             |scored AS (
             |  SELECT p.query_id, a.vec_id AS neighbor_id,
             |         list_dot_product(p.qv, r.r) AS score
             |  FROM probes p
             |  JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
             |  JOIN recon r ON r.vec_id = a.vec_id),
             |topk AS (
             |  SELECT query_id, neighbor_id, score,
             |         row_number() OVER (PARTITION BY query_id
             |           ORDER BY score DESC, neighbor_id ASC) AS rank
             |  FROM scored)
             |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, score
             |FROM topk WHERE rank <= 5
             |ORDER BY query_id ASC, rank ASC""".stripMargin),
      "IVF-PQ (the Faiss production shape): literal coarse quantizer prunes cells, ADC scores PQ codes in probed cells only == full DuckDB replay"),
  )
}
