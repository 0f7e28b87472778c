package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GQuery
import graft.functions.{Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Web-corpus curation tier, wave 3 (round 7): structured-markup
  * extraction via Spark 4's native XML parser, model-based quality
  * filtering (the fastText/DCLM-shaped hashed-linear scorer), hybrid
  * retrieval fusion (BM25-ish lexical + embedding cosine → reciprocal-
  * rank fusion), and crawl URL canonicalization + dedup election.
  *
  * Shared discipline of the tier: every gate synthesizes its messy
  * input IN THE PLAN from fixture columns (the q214 escape∘embed∘
  * extract rule), so the DuckDB oracle recomputes the expected output
  * from the generating formula without ever running the operator under
  * test — any divergence in parse order, entity table, weight hash, or
  * canonicalization rule is a hash mismatch, not a silent agreement.
  * All scores that cross engines are integer-exact (fixed-point or
  * integer division) — no float-summation hazard anywhere.
  */
object WebCurationQueries {

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    // q216: XML extraction — web corpora carry sitemaps/feeds/metadata as
    // XML; Spark 4 parses it natively (from_xml — the spark-xml source
    // merged upstream), no UDF and no extra jars. The gate wraps each
    // document in a synthetic <doc> record (id/lang/source as ATTRIBUTES
    // — the `_`-prefix mapping — body as escaped element text, n_chars
    // as a nested element), parses it back with an explicit schema, and
    // every 13th record is CORRUPTED (its closing tag cut) to exercise
    // PERMISSIVE-mode null-row degradation — the posture a 100 TB crawl
    // demands (one malformed feed must not kill the job). escape∘embed∘
    // parse cancels on the body, so the oracle is pure fixture columns
    // with a CASE for the corrupt stripe. 100 TB: a projected expression
    // — scan-speed, zero shuffle beyond the gate's ORDER BY.
    GQuery(
      "q216_xml_extract",
      (s, d) => {
        val xmlSchema = StructType(Seq(
          StructField("_id", LongType),
          StructField("_lang", StringType),
          StructField("_source", StringType),
          StructField("body", StringType),
          StructField("n", LongType)))
        val wellFormed = concat(
          lit("<doc id=\""), col("doc_id").cast("string"),
          lit("\" lang=\""), col("lang"),
          lit("\" source=\""), col("source"),
          lit("\"><body>"), TF.xmlEscape(col("text")),
          lit("</body><n>"), col("n_chars").cast("string"),
          lit("</n></doc>"))
        // corrupt stripe: the record is cut mid-way through </body> — a
        // truncated fetch, the commonest real-world malformation
        val xml = when(col("doc_id") % 13 === 0,
          regexp_replace(wellFormed, "</body>.*$", "</bo")).otherwise(wellFormed)
        Tables.documents(s, d)
          .select(col("doc_id"), from_xml(xml, xmlSchema).as("p"))
          .select(col("doc_id"),
            col("p._id").as("xid"),
            col("p._lang").as("xlang"),
            col("p._source").as("xsource"),
            col("p.body").as("body"),
            col("p.n").as("xn"),
            col("p._id").isNotNull.as("parse_ok"))
          .orderBy(col("doc_id").asc)
      },
      Some("""SELECT doc_id,
             |       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE doc_id END AS xid,
             |       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS xlang,
             |       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE source END AS xsource,
             |       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS body,
             |       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE n_chars END AS xn,
             |       doc_id % 13 <> 0 AS parse_ok
             |FROM documents ORDER BY doc_id ASC""".stripMargin),
      "native XML parse: escape∘embed∘from_xml == identity on fixture columns; corrupt stripe degrades to null rows, never throws"),

    // ------------------------------------------------------------------
    // q217: model-based quality filtering — the classifier step every
    // modern curation pipeline runs (CCNet/DCLM/fineweb: a fastText-shaped
    // linear model over hashed n-grams decides keep/drop). Score = Σ
    // weight(gram) over unigrams+bigrams, keep iff positive. A production
    // model ships its weight table as a broadcast array indexed by hash
    // bucket; here the bucket weight is DERIVED from the bucket hash
    // itself (md5-based, ±1000 milli-units) so the DuckDB oracle can
    // replay the exact model without a side-channel artifact — the
    // execution shape (hash → weight → sum inside one projected
    // expression) is identical either way. Integer weights summed as
    // BIGINT: exact on both engines, no float-order hazard. 100 TB:
    // pure map-side, runs at scan speed inside WholeStageCodegen; the
    // only shuffle in the gate is its ORDER BY.
    GQuery(
      "q217_quality_classifier",
      (s, d) => {
        // native GramScore kernel since r9 (the q223/CdcChunks lesson:
        // the aggregate-HOF form ran md5-per-gram on the shared
        // interpreted eval path); n_grams = t + max(t-1, 0) is the exact
        // size of unigrams ++ adjacent bigrams for t >= 1 tokens
        val t = size(TF.tokens(col("text"))).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"),
            (t + greatest(t - 1, lit(0L))).as("n_grams"),
            graft.expressions.GramScore(col("text")).as("raw_score"))
          .withColumn("keep", col("raw_score") > 0)
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |g AS (
             |  SELECT doc_id, unnest(ws) AS gram FROM toks
             |  UNION ALL
             |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
             |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks)),
             |s AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             |         CAST(SUM(CAST(('0x'||substr(md5('w:'||gram),1,15)) AS BIGINT) % 2001
             |                  - 1000) AS BIGINT) AS raw_score
             |  FROM g GROUP BY doc_id)
             |SELECT doc_id, n_grams, raw_score, raw_score > 0 AS keep
             |FROM s ORDER BY doc_id ASC""".stripMargin),
      "hashed-linear quality classifier (fastText shape): integer-exact gram-weight sum == DuckDB md5 replay; keep = sign"),

    // ------------------------------------------------------------------
    // q218: hybrid retrieval via reciprocal-rank fusion — the standard
    // two-tower retrieval merge (RRF, Cormack et al.): a lexical ranking
    // (query-term frequency, map-side — the BM25 machinery is gated at
    // q148; the fusion is what is under test here) and a semantic ranking
    // (exact cosine against a fixed query vector, the q39 custom codegen
    // expression) each produce a top-100 list; a doc's fused score is
    // Σ 1/(60+rank) over the lists it appears in. Contributions are
    // integer fixed-point (1e9 DIV (60+rank)) so the fused ordering is
    // exact on both engines. Execution shape at 100 TB: both rankings
    // are top-k window passes (map-side partial TakeOrdered); the fusion
    // joins two 100-row artifacts — broadcast-trivial, corpus never
    // re-shuffles.
    GQuery(
      "q218_rrf_fusion",
      (s, d) => {
        val terms = Seq("customer", "join", "data")
        val lexScore = size(filter(TF.tokens(col("text")),
          w => w.isin(terms.map(x => x: Any): _*))).cast("long")
        val lexW = Window.orderBy(col("lex_score").desc, col("id").asc)
        val lex = Tables.documents(s, d)
          .select(col("doc_id").as("id"), lexScore.as("lex_score"))
          .withColumn("lex_rank", row_number().over(lexW).cast("long"))
          .filter(col("lex_rank") <= 100)
        val emb = Tables.embeddings(s, d)
        val sem = Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 100)
          .select(col("neighbor_id").as("id"), col("rank").cast("long").as("sem_rank"))
        val fused = lex.select(col("id"), col("lex_rank"))
          .join(sem, Seq("id"), "full_outer")
          .select(col("id"),
            col("lex_rank"), col("sem_rank"),
            (coalesce(expr("1000000000 DIV (60 + lex_rank)"), lit(0L)) +
              coalesce(expr("1000000000 DIV (60 + sem_rank)"), lit(0L))).as("rrf_fp"))
        val w = Window.orderBy(col("rrf_fp").desc, col("id").asc)
        fused.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 20)
          .select(col("rank"), col("id"), col("rrf_fp"), col("lex_rank"), col("sem_rank"))
          .orderBy(col("rank").asc)
      },
      Some("""WITH lex AS (
             |  SELECT id, lex_rank FROM (
             |    SELECT doc_id AS id,
             |           row_number() OVER (ORDER BY len(list_filter(string_split(text, ' '),
             |             t -> t IN ('customer','join','data'))) DESC, doc_id ASC) AS lex_rank
             |    FROM documents)
             |  WHERE lex_rank <= 100),
             |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
             |sem AS (
             |  SELECT id, sem_rank FROM (
             |    SELECT e.vec_id AS id,
             |           row_number() OVER (ORDER BY
             |             list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
             |                                    CAST(e.embedding AS DOUBLE[])) DESC,
             |             e.vec_id ASC) AS sem_rank
             |    FROM embeddings e CROSS JOIN q
             |    WHERE e.vec_id <> 0)
             |  WHERE sem_rank <= 100),
             |fused AS (
             |  SELECT COALESCE(l.id, s.id) AS id, l.lex_rank, s.sem_rank,
             |         COALESCE(1000000000 // (60 + l.lex_rank), 0) +
             |         COALESCE(1000000000 // (60 + s.sem_rank), 0) AS rrf_fp
             |  FROM lex l FULL OUTER JOIN sem s ON l.id = s.id)
             |SELECT rank, id, rrf_fp, lex_rank, sem_rank FROM (
             |  SELECT id, lex_rank, sem_rank, CAST(rrf_fp AS BIGINT) AS rrf_fp,
             |         row_number() OVER (ORDER BY rrf_fp DESC, id ASC) AS rank
             |  FROM fused)
             |WHERE rank <= 20 ORDER BY rank ASC""".stripMargin),
      "reciprocal-rank fusion of lexical + cosine top-100 lists: integer fixed-point contributions, artifact-sized join"),

    // ------------------------------------------------------------------
    // q219: crawl URL canonicalization + dedup election — the dedup key
    // every crawler derives before content even downloads. The gate
    // synthesizes MESSY variants from fixture columns (case-mangled
    // scheme/host, www. prefix, explicit default port, trailing slash,
    // tracking params in noise order, fragments) and canonicalizes with
    // pure builtin composition (regexp pieces + higher-order filter/sort
    // — codegen'd, no UDF, no parse_url dependence): lowercase scheme+
    // host, strip www./root-dot, drop scheme-default ports, strip one
    // trailing path slash, drop utm_* params, sort the rest, drop the
    // fragment. Dedup is ONE hash groupBy on the canonical key (min-id
    // election + occurrence count) — the exact-dedup shape, linear at
    // 100 TB. The oracle never canonicalizes: it constructs the expected
    // canonical form directly from the generating formula, so every rule
    // above is independently checked.
    GQuery(
      "q219_url_canonicalize",
      (s, d) => {
        val messy = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
          lit("://"),
          when(col("doc_id") % 5 === 0, lit("WWW.")).otherwise(lit("www.")),
          col("source"), lit(".Example.COM"),
          when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
          lit("/Articles/"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&id="), (col("doc_id") % 50).cast("string"),
          lit("&utm_campaign=x&b=2&a=1"),
          when(col("doc_id") % 7 === 0, lit("#section-3")).otherwise(lit("")))
        Tables.documents(s, d)
          .select(col("doc_id"), messy.as("url"))
          .select(col("doc_id"), TF.canonicalizeUrl(col("url")).as("canonical_url"))
          .groupBy(col("canonical_url"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("canonical_url").asc)
      },
      Some("""SELECT 'https://' || source || '.example.com/Articles/' ||
             |         CAST(doc_id % 50 AS VARCHAR) || '?a=1&b=2&id=' ||
             |         CAST(doc_id % 50 AS VARCHAR) AS canonical_url,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       MIN(doc_id) AS first_doc
             |FROM documents
             |GROUP BY 1 ORDER BY canonical_url ASC""".stripMargin),
      "URL canonicalization + dedup election: builtin-composed canonical key == oracle's formula-built ground truth"),

    // ------------------------------------------------------------------
    // q263 (r9): IPv6 host canonicalization — the last URL-key gap the
    // r8 verdict listed. The gate synthesizes a fully-EXPANDED messy
    // literal per doc (4-digit zero-padded groups, case-mangled by
    // parity, explicit :443) with EXACTLY one planted zero run of length
    // 2–4 at a formula-chosen offset (r = id%5, so runs at the very
    // start — leading "::" — and reaching the very end — trailing "::"
    // — both occur), wraps it in an authority, and canonicalizes with
    // [[TF.canonicalizeUrl]] whose bracketed-host leg is the codegen'd
    // RFC 5952 Ipv6Normalize expression. The oracle never normalizes: it
    // EMITS the canonical form directly from the generating formula
    // (lowercase hex without leading zeros via printf, the planted run
    // as "::"), so compression-site choice, zero-stripping, lowercasing,
    // and the port/bracket rules are all independently checked. Dedup
    // shape: map-side expression, one final order — linear at 100 TB.
    GQuery(
      "q263_ipv6_hosts",
      (s, d) => {
        val i = col("doc_id")
        val r = i % 5
        val len = lit(2) + i % 3
        def grp(j: Int) =
          when(lit(j) >= r && lit(j) < r + len, lit(0L))
            .otherwise((i * 7 + lit(j) * 13) % 65535 + 1)
        val messy = concat_ws(":",
          (0 until 8).map(j => lpad(hex(grp(j)), 4, "0")): _*)
        val cased = when(i % 2 === 0, upper(messy)).otherwise(lower(messy))
        val url = concat(lit("https://["), cased, lit("]:443/x/"),
          (i % 9).cast("string"))
        Tables.documents(s, d)
          .select(i.as("doc_id"), TF.canonicalizeUrl(url).as("canonical_url"))
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH g AS (
             |  SELECT doc_id, j.j AS j,
             |         CASE WHEN j.j >= doc_id % 5
             |               AND j.j < doc_id % 5 + 2 + doc_id % 3
             |              THEN 0
             |              ELSE (doc_id * 7 + j.j * 13) % 65535 + 1 END AS v
             |  FROM documents, range(0, 8) j(j)),
             |parts AS (
             |  SELECT doc_id,
             |         string_agg(printf('%x', v), ':' ORDER BY j)
             |           FILTER (WHERE j < doc_id % 5) AS lhs,
             |         string_agg(printf('%x', v), ':' ORDER BY j)
             |           FILTER (WHERE j >= doc_id % 5 + 2 + doc_id % 3) AS rhs
             |  FROM g GROUP BY doc_id)
             |SELECT doc_id,
             |       'https://[' || COALESCE(lhs, '') || '::' || COALESCE(rhs, '')
             |         || ']/x/' || CAST(doc_id % 9 AS VARCHAR) AS canonical_url
             |FROM parts ORDER BY doc_id ASC""".stripMargin),
      "RFC 5952 IPv6 host canonicalization inside the URL key: codegen'd normalizer == oracle's formula-emitted canonical form"),
  )
}
