package graft.queries

import org.apache.spark.sql.functions._

import graft.GQuery
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Corpus-hygiene tier, round 8c: paragraph-grain exact dedup with
  * document reassembly (the RefinedWeb/MassiveText step between
  * document-exact q34 and substring-span q175), and the Gopher quality
  * rule set (Rae et al. 2021, appendix A1.1) as one integer-exact
  * map-side filter. House discipline throughout: messy structure
  * (paragraph breaks, bullet/ellipsis lines, numeric tokens) is
  * synthesized in-plan from fixture columns, the operator then PARSES
  * what was built, and every score is integer fixed-point so the DuckDB
  * replay is exact.
  */
object CorpusOpsQueries {

  private val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    // q245: paragraph-level exact dedup + reassembly (Penedo et al.,
    // RefinedWeb: repeated boilerplate paragraphs — headers, footers,
    // cookie banners — are removed at PARAGRAPH grain across the corpus,
    // keeping only the first occurrence, then documents are stitched
    // back together from their surviving paragraphs). Paragraph breaks
    // are synthesized in-plan: every doc becomes header-para ‖ own text
    // ‖ footer-para with the header/footer shared across doc_id%17 /
    // doc_id%23 classes, so ~94% of headers and footers are corpus
    // duplicates while own text stays (mostly) unique — both dedup
    // outcomes exercised, including docs whose every paragraph loses.
    //
    // Election: first occurrence by (doc_id, pos) via one min-struct agg
    // per distinct paragraph (map-side partial agg); occurrences then
    // join back on the md5 key. 100 TB: the shuffle carries (16-byte
    // hash, ids) for the agg and the paragraphs once for the join-back —
    // the exact-dedup shape at paragraph grain; reassembly is the one
    // per-doc shuffle a reconstruction inherently needs.
    GQuery(
      "q245_paragraph_dedup",
      (s, d) => {
        val t = Tables.spread(Tables.documents(s, d), col("doc_id")).select(col("doc_id"),
          concat(lit("shared header "), (col("doc_id") % 17).cast("string"),
            lit("\n\n"), col("text"), lit("\n\n"),
            lit("shared footer "), (col("doc_id") % 23).cast("string")).as("text2"))
        val paras = t
          .select(col("doc_id"),
            posexplode(split(col("text2"), "\n\n")).as(Seq("pos", "para")))
          .select(col("doc_id"), col("pos"), col("para"), md5(col("para")).as("h"))
        val winners = paras.groupBy(col("h"))
          .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
        paras.join(winners, Seq("h"))
          .select(col("doc_id"), col("pos"), col("para"),
            (col("w.doc_id") === col("doc_id") && col("w.pos") === col("pos")).as("kept"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_paras"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            md5(concat_ws("\u0001",
              transform(array_sort(collect_list(
                when(col("kept"), struct(col("pos"), col("para"))))),
                x => x.getField("para")))).as("sig"))
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         'shared header ' || CAST(doc_id % 17 AS VARCHAR) || chr(10) || chr(10) ||
             |         text || chr(10) || chr(10) ||
             |         'shared footer ' || CAST(doc_id % 23 AS VARCHAR) AS text2
             |  FROM documents),
             |p0 AS (
             |  SELECT doc_id,
             |         unnest(string_split(text2, chr(10) || chr(10))) AS para,
             |         unnest(range(0, len(string_split(text2, chr(10) || chr(10))))) AS pos
             |  FROM t),
             |p AS (SELECT doc_id, CAST(pos AS INT) AS pos, para, md5(para) AS h FROM p0),
             |w AS (
             |  SELECT h, doc_id AS wdoc, pos AS wpos FROM (
             |    SELECT h, doc_id, pos,
             |           row_number() OVER (PARTITION BY h ORDER BY doc_id ASC, pos ASC) AS rn
             |    FROM p)
             |  WHERE rn = 1),
             |k AS (
             |  SELECT p.doc_id, p.pos, p.para,
             |         (p.doc_id = w.wdoc AND p.pos = w.wpos) AS kept
             |  FROM p JOIN w USING (h))
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
             |       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |       md5(COALESCE(string_agg(CASE WHEN kept THEN para END, chr(1) ORDER BY pos), '')) AS sig
             |FROM k GROUP BY doc_id ORDER BY doc_id ASC""".stripMargin),
      "paragraph-grain exact dedup: first-occurrence election on the md5 key + order-exact reassembly == DuckDB replay"),

    // ------------------------------------------------------------------
    // q246: the Gopher quality rule set (Rae et al. 2021, A1.1) — the
    // standard pre-filter every LLM corpus passes before dedup: word
    // count in [50, 100000], mean word length in [3, 10], symbol-to-word
    // ratio ('#'/'...') below 10%, at most 10% bullet-started and 30%
    // ellipsis-ended lines, ≥80% of words containing an alphabetic
    // character, and ≥2 distinct required stop words. The fixture text
    // has no line structure, so lines are synthesized in-plan (7-word
    // lines; formula-selected lines get a numeric token, a "- " bullet
    // prefix, or a "..." suffix) and the operator then PARSES the built
    // text — every metric is computed from text2 alone, in integer
    // fixed-point (×1000, DIV), so the replay is exact and the word-count
    // rule splits the real corpus (~55% of fixture docs reach 50 words).
    //
    // 100 TB: pure map-side projection per doc (higher-order builtins,
    // no explode — nothing shuffles but the final order), the shape a
    // quality gate must have to run inline with the ingest scan.
    GQuery(
      "q246_gopher_rules",
      (s, d) => {
        val toks = TF.tokens(col("text"))
        val nLines = ceil(size(toks) / lit(7.0)).cast("int")
        // per-doc failure modes: most docs get artifacts at below-threshold
        // rates (every 12th line a bullet, every 10th a numeric token,
        // every 8th an ellipsis end), while formula-selected HEAVY docs
        // cross their rule's threshold (%7: bullet every 3rd line; %11:
        // two numeric tokens on EVERY line, pushing alpha below 80%;
        // %13: ellipsis on every 2nd line); docs with doc_id%3==0 get no
        // stop-word line and fail the required-words rule (the fixture
        // vocabulary carries only "the" of Gopher's eight)
        val lines = transform(sequence(lit(0), nLines - 1), i => {
          val base = array_join(slice(toks, i * 7 + 1, lit(7)), " ")
          val bulSel = when(col("doc_id") % 7 === 0, (col("doc_id") + i) % 3 === 0)
            .otherwise((col("doc_id") + i) % 12 === 0)
          val ellSel = when(col("doc_id") % 13 === 0, (col("doc_id") + i) % 2 === 0)
            .otherwise((col("doc_id") + i) % 8 === 0)
          val withNum = when(col("doc_id") % 11 === 0, concat(lit("12345 67890 "), base))
            .otherwise(when((col("doc_id") + i) % 10 === 0,
              concat(lit("12345 "), base)).otherwise(base))
          val withBullet = when(bulSel, concat(lit("- "), withNum)).otherwise(withNum)
          when(ellSel, concat(withBullet, lit("..."))).otherwise(withBullet)
        })
        val linesAll = concat(lines,
          when(col("doc_id") % 3 =!= 0, array(lit("to of and that have")))
            .otherwise(array().cast("array<string>")))
        val built = Tables.spread(Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"), array_join(linesAll, "\n").as("text2"))
        // ---- operator proper: parse text2 ----
        val lines2 = split(col("text2"), "\n")
        val words2 = TF.tokens(regexp_replace(col("text2"), "\n", " "))
        val parsed = built.select(col("doc_id"), col("text2"),
          lines2.as("ls"), words2.as("ws"))
          .select(col("doc_id"),
            size(col("ws")).cast("long").as("n_words"),
            aggregate(transform(col("ws"), w => length(w).cast("long")),
              lit(0L), (a, v) => a + v).as("chars"),
            size(filter(col("ws"), w => w.rlike("[a-z]"))).cast("long").as("n_alpha"),
            size(array_intersect(array_distinct(col("ws")),
              array(GopherStops.map(lit): _*))).cast("long").as("n_stop"),
            ((length(col("text2")) - length(regexp_replace(col("text2"), "\\.\\.\\.", "")))
              .cast("long") / 3).cast("long").as("n_ell"),
            (length(col("text2")) - length(regexp_replace(col("text2"), "#", "")))
              .cast("long").as("n_hash"),
            size(col("ls")).cast("long").as("n_lines"),
            size(filter(col("ls"), l => l.startsWith("- "))).cast("long").as("n_bullet"),
            size(filter(col("ls"), l => l.endsWith("..."))).cast("long").as("n_ell_end"))
        parsed.select(col("doc_id"), col("n_words"),
          expr("chars * 1000 DIV n_words").as("mean_wlen_fp"),
          expr("(n_hash + n_ell) * 1000 DIV n_words").as("sym_fp"),
          expr("n_bullet * 1000 DIV n_lines").as("bullet_fp"),
          expr("n_ell_end * 1000 DIV n_lines").as("ellipsis_fp"),
          expr("n_alpha * 1000 DIV n_words").as("alpha_fp"),
          col("n_stop"))
          .withColumn("passes",
            col("n_words") >= 50 && col("n_words") <= 100000 &&
              col("mean_wlen_fp") >= 3000 && col("mean_wlen_fp") <= 10000 &&
              col("sym_fp") < 100 &&
              col("bullet_fp") <= 100 && col("ellipsis_fp") <= 300 &&
              col("alpha_fp") >= 800 && col("n_stop") >= 2)
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |ix AS (
             |  SELECT doc_id, toks,
             |         unnest(range(0, CAST(ceil(len(toks) / 7.0) AS INT))) AS i
             |  FROM d),
             |ln0 AS (
             |  SELECT doc_id, i,
             |         (CASE WHEN (CASE WHEN doc_id % 13 = 0 THEN (doc_id + i) % 2 = 0
             |                          ELSE (doc_id + i) % 8 = 0 END)
             |               THEN x || '...' ELSE x END) AS line
             |  FROM (
             |    SELECT doc_id, i,
             |           (CASE WHEN (CASE WHEN doc_id % 7 = 0 THEN (doc_id + i) % 3 = 0
             |                            ELSE (doc_id + i) % 12 = 0 END)
             |                 THEN '- ' || y ELSE y END) AS x
             |    FROM (
             |      SELECT doc_id, i,
             |             (CASE WHEN doc_id % 11 = 0 THEN '12345 67890 ' || b
             |                   WHEN (doc_id + i) % 10 = 0 THEN '12345 ' || b
             |                   ELSE b END) AS y
             |      FROM (
             |        SELECT doc_id, i,
             |               array_to_string(toks[CAST(i*7+1 AS INT) : CAST(i*7+7 AS INT)], ' ') AS b
             |        FROM ix)))),
             |ln AS (
             |  SELECT doc_id, i, line FROM ln0
             |  UNION ALL
             |  SELECT doc_id, CAST(ceil(len(toks) / 7.0) AS INT) AS i,
             |         'to of and that have' AS line
             |  FROM d WHERE doc_id % 3 <> 0),
             |t2 AS (
             |  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text2
             |  FROM ln GROUP BY doc_id),
             |m AS (
             |  SELECT doc_id,
             |         string_split(replace(text2, chr(10), ' '), ' ') AS ws,
             |         string_split(text2, chr(10)) AS ls,
             |         text2
             |  FROM t2),
             |f AS (
             |  SELECT doc_id,
             |         CAST(len(ws) AS BIGINT) AS n_words,
             |         CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS chars,
             |         CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
             |         CAST(len(list_intersect(list_distinct(ws),
             |           ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop,
             |         CAST((len(text2) - len(replace(text2, '...', ''))) // 3 AS BIGINT) AS n_ell,
             |         CAST(len(text2) - len(replace(text2, '#', '')) AS BIGINT) AS n_hash,
             |         CAST(len(ls) AS BIGINT) AS n_lines,
             |         CAST(len(list_filter(ls, l -> l LIKE '- %')) AS BIGINT) AS n_bullet,
             |         CAST(len(list_filter(ls, l -> l LIKE '%...')) AS BIGINT) AS n_ell_end
             |  FROM m),
             |g AS (
             |  SELECT doc_id, n_words,
             |         chars * 1000 // n_words AS mean_wlen_fp,
             |         (n_hash + n_ell) * 1000 // n_words AS sym_fp,
             |         n_bullet * 1000 // n_lines AS bullet_fp,
             |         n_ell_end * 1000 // n_lines AS ellipsis_fp,
             |         n_alpha * 1000 // n_words AS alpha_fp,
             |         n_stop
             |  FROM f)
             |SELECT doc_id, n_words, mean_wlen_fp, sym_fp, bullet_fp,
             |       ellipsis_fp, alpha_fp, n_stop,
             |       (n_words >= 50 AND n_words <= 100000
             |        AND mean_wlen_fp >= 3000 AND mean_wlen_fp <= 10000
             |        AND sym_fp < 100
             |        AND bullet_fp <= 100 AND ellipsis_fp <= 300
             |        AND alpha_fp >= 800 AND n_stop >= 2) AS passes
             |FROM g ORDER BY doc_id ASC""".stripMargin),
      "Gopher A1.1 rule set: synthesized line structure parsed back, integer fixed-point metrics + verdict == DuckDB replay"),

    // ------------------------------------------------------------------
    // q247: rendezvous (highest-random-weight) hashing — the shard/node
    // assignment law a 100 TB corpus store lives by (Thaler & Ravishankar
    // 1996; the consistent-assignment scheme behind Ceph CRUSH and most
    // object stores): key k goes to argmax over nodes of h(node, k).
    // Its defining property — adding a node moves ONLY the keys that the
    // new node now wins, ~1/(n+1) of them, and nothing else — is gated
    // directly: assignments computed under 8 and under 9 nodes, per-key
    // moved flag, and the law verdict (moved ⇒ new owner IS the added
    // node). h is the shared md5Hash60 formula, so the argmax replays
    // exactly; ties break toward the lower node id (never hit at 60
    // bits, pinned anyway). 100 TB: pure map-side projection — the
    // argmax over n nodes is an in-row expression, no join, no shuffle;
    // n is node-count-sized, not corpus-sized.
    GQuery(
      "q247_rendezvous_hash",
      (s, d) => {
        def owner(n: Int) = {
          val cands = array((0 until n).map { k =>
            struct(TF.md5Hash60(concat(lit(s"node$k:"),
              col("doc_id").cast("string"))).as("h"),
              lit(-k).as("nk"))
          }: _*)
          -array_max(cands).getField("nk")
        }
        Tables.spread(Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"), owner(8).as("node_a"), owner(9).as("node_b"))
          .withColumn("moved", col("node_a") =!= col("node_b"))
          .withColumn("law_ok", !col("moved") || col("node_b") === 8)
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH ks AS (SELECT CAST(unnest(range(0, 9)) AS INT) AS k),
             |h AS (
             |  SELECT d.doc_id, ks.k,
             |         CAST(('0x'||substr(md5('node'||CAST(ks.k AS VARCHAR)||':'||CAST(d.doc_id AS VARCHAR)),1,15)) AS BIGINT) AS h
             |  FROM documents d CROSS JOIN ks),
             |a AS (
             |  SELECT doc_id, k AS node_a FROM (
             |    SELECT doc_id, k, row_number() OVER (PARTITION BY doc_id
             |      ORDER BY h DESC, k ASC) AS rn FROM h WHERE k < 8)
             |  WHERE rn = 1),
             |b AS (
             |  SELECT doc_id, k AS node_b FROM (
             |    SELECT doc_id, k, row_number() OVER (PARTITION BY doc_id
             |      ORDER BY h DESC, k ASC) AS rn FROM h)
             |  WHERE rn = 1)
             |SELECT a.doc_id, a.node_a, b.node_b,
             |       a.node_a <> b.node_b AS moved,
             |       (a.node_a = b.node_b OR b.node_b = 8) AS law_ok
             |FROM a JOIN b USING (doc_id)
             |ORDER BY a.doc_id ASC""".stripMargin),
      "rendezvous hashing: argmax-h(node,key) ownership, add-a-node moves only the new node's wins == DuckDB replay"),

    // ------------------------------------------------------------------
    // q251: the Gopher/MassiveText REPETITION filters (Rae et al. 2021,
    // table A1 — the within-doc complement of q246's global rules):
    // duplicate-line fraction (≤30%), duplicate-line CHARACTER fraction
    // (≤20%), and the fraction of characters covered by the single most
    // frequent word 2-gram (≤20%) and 3-gram (≤18%). Line structure is
    // synthesized in-plan (5-word lines; dup-heavy docs — doc_id%4==0 —
    // get every 3rd line REPLACED by a copy of line 0, the loop-generated
    // boilerplate shape this filter exists to catch). All fractions are
    // integer fixed-point over the same denominator (total line chars),
    // so the replay is exact; tie-break for "the" top gram is (count
    // desc, gram asc) in both engines.
    //
    // 100 TB: two narrow shuffles — (doc, line-hash) and (doc, gram) —
    // both with map-side partial counts; the top-1-per-doc window runs on
    // the already-aggregated gram counts. The within-doc grain keeps
    // every group bounded by document length, so no skew class exists.
    GQuery(
      "q251_repetition_rules",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = TF.tokens(col("text"))
        val nLines = ceil(size(toks) / lit(5.0)).cast("int")
        val line0 = array_join(slice(toks, 1, 5), " ")
        val lines = transform(sequence(lit(0), nLines - 1), i => {
          val base = array_join(slice(toks, i * 5 + 1, lit(5)), " ")
          when(col("doc_id") % 4 === 0 && i % 3 === 2, line0).otherwise(base)
        })
        val t = Tables.spread(Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"), lines.as("ls"))
        val lineCnt = t.select(col("doc_id"), explode(col("ls")).as("line"))
          .groupBy(col("doc_id"), col("line")).agg(count(lit(1)).as("c"))
        val lineM = lineCnt.groupBy(col("doc_id")).agg(
          sum(col("c")).as("n_lines"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_lines"),
          sum(col("c") * length(col("line"))).as("total_chars"),
          sum(when(col("c") > 1, col("c") * length(col("line"))).otherwise(0L))
            .as("dup_chars"))
        def topGram(n: Int, name: String) = {
          val w = Window.partitionBy(col("doc_id"))
            .orderBy(col("c").desc, col("g").asc)
          t.select(col("doc_id"),
            explode(TF.wordShinglesAll(array_join(col("ls"), " "), n)).as("g"))
            .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("doc_id"), (col("c") * length(col("g"))).as(name))
        }
        lineM
          .join(topGram(2, "top2_chars"), Seq("doc_id"))
          .join(topGram(3, "top3_chars"), Seq("doc_id"))
          .select(col("doc_id"), col("n_lines"),
            expr("dup_lines * 1000 DIV n_lines").as("dup_line_fp"),
            expr("dup_chars * 1000 DIV total_chars").as("dup_char_fp"),
            expr("top2_chars * 1000 DIV total_chars").as("top2_fp"),
            expr("top3_chars * 1000 DIV total_chars").as("top3_fp"))
          .withColumn("passes",
            col("dup_line_fp") <= 300 && col("dup_char_fp") <= 200 &&
              col("top2_fp") <= 200 && col("top3_fp") <= 180)
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |ix AS (
             |  SELECT doc_id, toks,
             |         array_to_string(toks[1:5], ' ') AS line0,
             |         unnest(range(0, CAST(ceil(len(toks) / 5.0) AS INT))) AS i
             |  FROM d),
             |ln AS (
             |  SELECT doc_id, i,
             |         CASE WHEN doc_id % 4 = 0 AND i % 3 = 2 THEN line0
             |              ELSE array_to_string(toks[CAST(i*5+1 AS INT) : CAST(i*5+5 AS INT)], ' ')
             |         END AS line
             |  FROM ix),
             |lc AS (SELECT doc_id, line, COUNT(*) AS c FROM ln GROUP BY doc_id, line),
             |lm AS (
             |  SELECT doc_id,
             |         CAST(SUM(c) AS BIGINT) AS n_lines,
             |         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_lines,
             |         CAST(SUM(c * len(line)) AS BIGINT) AS total_chars,
             |         CAST(SUM(CASE WHEN c > 1 THEN c * len(line) ELSE 0 END) AS BIGINT) AS dup_chars
             |  FROM lc GROUP BY doc_id),
             |st AS (
             |  SELECT doc_id, string_split(string_agg(line, ' ' ORDER BY i), ' ') AS ws
             |  FROM ln GROUP BY doc_id),
             |g2 AS (
             |  SELECT doc_id, w1 || ' ' || w2 AS g FROM (
             |    SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
             |    FROM st)),
             |t2 AS (
             |  SELECT doc_id, CAST(c * len(g) AS BIGINT) AS top2_chars FROM (
             |    SELECT doc_id, g, COUNT(*) AS c,
             |           row_number() OVER (PARTITION BY doc_id
             |             ORDER BY COUNT(*) DESC, g ASC) AS rn
             |    FROM g2 GROUP BY doc_id, g)
             |  WHERE rn = 1),
             |g3 AS (
             |  SELECT doc_id, w1 || ' ' || w2 || ' ' || w3 AS g FROM (
             |    SELECT doc_id, unnest(ws[1:len(ws)-2]) AS w1,
             |           unnest(ws[2:len(ws)-1]) AS w2, unnest(ws[3:len(ws)]) AS w3
             |    FROM st)),
             |t3 AS (
             |  SELECT doc_id, CAST(c * len(g) AS BIGINT) AS top3_chars FROM (
             |    SELECT doc_id, g, COUNT(*) AS c,
             |           row_number() OVER (PARTITION BY doc_id
             |             ORDER BY COUNT(*) DESC, g ASC) AS rn
             |    FROM g3 GROUP BY doc_id, g)
             |  WHERE rn = 1)
             |SELECT lm.doc_id, lm.n_lines,
             |       dup_lines * 1000 // n_lines AS dup_line_fp,
             |       dup_chars * 1000 // total_chars AS dup_char_fp,
             |       top2_chars * 1000 // total_chars AS top2_fp,
             |       top3_chars * 1000 // total_chars AS top3_fp,
             |       (dup_lines * 1000 // n_lines <= 300
             |        AND dup_chars * 1000 // total_chars <= 200
             |        AND top2_chars * 1000 // total_chars <= 200
             |        AND top3_chars * 1000 // total_chars <= 180) AS passes
             |FROM lm JOIN t2 ON t2.doc_id = lm.doc_id
             |        JOIN t3 ON t3.doc_id = lm.doc_id
             |ORDER BY lm.doc_id ASC""".stripMargin),
      "Gopher repetition filters: dup-line / dup-line-char / top 2-3-gram char fractions, integer fixed-point == DuckDB replay"),
  )
}
