package graft.queries

import org.apache.spark.sql.functions._

import graft.GQuery
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Curation tier, wave 5 (round 7): data-governance and retrieval-depth
  * operators — k-anonymity suppression (the release gate for any
  * quasi-identifiable corpus slice), positional phrase search (the
  * inverted-index upgrade every retrieval stack needs beyond bag-of-words
  * BM25), and link-graph extraction (anchor hrefs → canonical host edges,
  * the web-graph step feeding PageRank-style quality priors).
  */
object GovernanceQueries {

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    // q224: k-anonymity suppression — before a corpus slice ships, rows
    // whose quasi-identifier combination (here lang × source × a coarse
    // length bucket) identifies fewer than k=5 individuals are SUPPRESSED
    // (Sweeney's k-anonymity, the standard release gate). Shape: one
    // groupBy on the QI tuple for class sizes + the per-class release
    // verdict — the audit artifact a governance pipeline logs. The
    // row-level application is a broadcast join of this artifact back to
    // the corpus (class_size already IS the released/suppressed row
    // count per class, so the gate stops at the artifact). 100 TB: class
    // table is artifact-sized (|QI| ≪ corpus), corpus passes map-side
    // except the one class-size groupBy.
    GQuery(
      "q224_k_anonymity",
      (s, d) => {
        val qi = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"),
            (col("n_chars") - col("n_chars") % 500).as("len_bucket"))
        qi.groupBy(col("lang"), col("source"), col("len_bucket"))
          .agg(count(lit(1)).as("class_size"))
          .withColumn("released", col("class_size") >= 5)
          .orderBy(col("lang").asc, col("source").asc, col("len_bucket").asc)
      },
      Some("""SELECT lang, source, n_chars - n_chars % 500 AS len_bucket,
             |       CAST(COUNT(*) AS BIGINT) AS class_size,
             |       COUNT(*) >= 5 AS released
             |FROM documents
             |GROUP BY 1, 2, 3
             |ORDER BY lang ASC, source ASC, len_bucket ASC""".stripMargin),
      "k-anonymity: quasi-identifier class sizes + k=5 suppression verdicts"),

    // ------------------------------------------------------------------
    // q225: positional phrase search — bag-of-words retrieval (BM25,
    // q148) cannot distinguish "customer data" from "data customer"; a
    // phrase query needs POSITIONAL postings: term → sorted position
    // list per doc, phrase match at p iff every term i sits at p+i. The
    // postings build is one explode + groupBy (the inverted-index
    // shuffle, narrow rows); the phrase probe joins the artifact-sized
    // per-term posting slices for the query terms and counts adjacency
    // via higher-order array ops (no per-position join). Output: docs
    // containing the 2-term phrase "window join" with match counts. 100 TB: postings
    // shuffle is the index build (amortized in production); the probe
    // touches only the query terms' postings.
    GQuery(
      "q225_phrase_search",
      (s, d) => {
        val Seq(w1, w2) = Seq("window", "join")
        val pos = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(TF.tokens(col("text"))).as(Seq("p", "tok")))
          .filter(col("tok") === w1 || col("tok") === w2)
        val postings = pos.groupBy(col("doc_id"), col("tok"))
          .agg(array_sort(collect_list(col("p"))).as("ps"))
        val p1 = postings.filter(col("tok") === w1)
          .select(col("doc_id"), col("ps").as("ps1"))
        val p2 = postings.filter(col("tok") === w2)
          .select(col("doc_id"), col("ps").as("ps2"))
        p1.join(p2, Seq("doc_id"))
          .select(col("doc_id"),
            size(filter(col("ps1"), x => array_contains(col("ps2"), x + 1)))
              .cast("long").as("n_matches"))
          .filter(col("n_matches") > 0)
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH pos AS (
             |  SELECT doc_id, CAST(i - 1 AS INT) AS p, ws[i] AS tok
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |       unnest(range(1, len(ws) + 1)) t(i)
             |  WHERE ws[i] IN ('window', 'join')),
             |p1 AS (SELECT doc_id, list(p ORDER BY p) AS ps1 FROM pos WHERE tok = 'window' GROUP BY doc_id),
             |p2 AS (SELECT doc_id, list(p ORDER BY p) AS ps2 FROM pos WHERE tok = 'join' GROUP BY doc_id)
             |SELECT p1.doc_id,
             |       CAST(len(list_filter(ps1, x -> list_contains(ps2, x + 1))) AS BIGINT) AS n_matches
             |FROM p1 JOIN p2 USING (doc_id)
             |WHERE len(list_filter(ps1, x -> list_contains(ps2, x + 1))) > 0
             |ORDER BY p1.doc_id ASC""".stripMargin),
      "positional phrase search: per-term posting lists + adjacency via array ops == DuckDB list replay"),

    // ------------------------------------------------------------------
    // q226: link-graph extraction — the web-graph step (anchor hrefs →
    // canonical host-level edges → in-degree priors à la PageRank/
    // harmonic centrality; the quality signal CC-derived corpora weight
    // by). Anchors are synthesized INTO markup in-plan (the q214 rule),
    // extracted with regexp_extract_all (codegen, no UDF), canonicalized
    // with the q219 key ([[TF.canonicalizeUrl]] — one definition for
    // dedup AND graph identity), deduped per (src,dst), and aggregated
    // to per-target in-degrees. 100 TB: extraction is scan-speed; the
    // edge dedup + in-degree are two narrow groupBys on host strings.
    GQuery(
      "q226_link_graph",
      (s, d) => {
        val targetHost = concat(lit("Host"), (col("doc_id") % 7).cast("string"),
          lit(".Example.org"))
        val html = concat(
          lit("<p>see <a href=\"https://www."), targetHost,
          lit("/page/"), (col("doc_id") % 3).cast("string"),
          lit("?utm_source=x&ref=1\">link</a> and <a href='https://"),
          lit("static.cdn.net/lib.js'>asset</a></p>"))
        val srcHost = concat(col("source"), lit(".example.com"))
        val hrefs = regexp_extract_all(html,
          lit("href=[\"']([^\"']+)[\"']"), lit(1))
        val edges = Tables.documents(s, d)
          .select(srcHost.as("src_host"), explode(hrefs).as("href"))
          .select(col("src_host"),
            // canonical host of the link target = graph node identity
            regexp_extract(TF.canonicalizeUrl(col("href")), "^https?://([^/]+)", 1)
              .as("dst_host"))
          .groupBy(col("src_host"), col("dst_host"))
          .agg(count(lit(1)).as("n_links"))
        edges.groupBy(col("dst_host"))
          .agg(countDistinct(col("src_host")).as("in_degree"),
            sum(col("n_links")).as("n_links"))
          .orderBy(col("dst_host").asc)
      },
      Some("""WITH e AS (
             |  SELECT source || '.example.com' AS src_host,
             |         'host' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS dst_host
             |  FROM documents
             |  UNION ALL
             |  SELECT source || '.example.com', 'static.cdn.net' FROM documents),
             |g AS (SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
             |      FROM e GROUP BY 1, 2)
             |SELECT dst_host, CAST(COUNT(DISTINCT src_host) AS BIGINT) AS in_degree,
             |       CAST(SUM(n_links) AS BIGINT) AS n_links
             |FROM g GROUP BY dst_host
             |ORDER BY dst_host ASC""".stripMargin),
      "link graph: href extraction ∘ URL canonicalization → host edges + in-degrees == formula oracle"),
  )
}
