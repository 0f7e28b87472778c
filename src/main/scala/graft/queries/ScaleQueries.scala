package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.GQuery
import graft.sources.Tables

/** Scale-shape gates: the salted skew join promoted from test-only to a
  * gated query (VERDICT r1 item 8), and TPC-H-shaped composite pipelines
  * (Q7/Q12/Q19 adapted to the fixture columns) that densify the macro-bench
  * signal (item 10). All oracle-gated.
  */
object ScaleQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    // q75: salted equi-join on a deliberately hot key. l_returnflag has 3
    // values over 60k rows — the canonical single-hot-key shape AQE's
    // partition splitting cannot always fix when the key itself is hot.
    // Salting spreads each key across 8 reducers; the oracle is the plain
    // unsalted join, so the gate IS the salted==unsalted equality proof.
    // PlanShapeSpec asserts the shuffle actually includes the salt column.
    GQuery(
      "q75_skew_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val fact = li.select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_quantity"))
          .withColumn("_uid",
            concat_ws("#", col("l_orderkey"), col("l_linenumber")))
        // shuffle_hash hint: Spark would otherwise broadcast the tiny dim,
        // and a broadcast join has no skew to mitigate — the gate exists to
        // prove the salted SHUFFLE shape (the 100 TB case where the dim
        // outgrows the broadcast threshold and the hot key melts a reducer).
        val dim = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_linestatus")).as("n_status"))
          .hint("shuffle_hash")
        graft.ops.Skew.saltedEquiJoin(fact, dim, "l_returnflag", "_uid", salts = 8)
          .groupBy(col("l_returnflag").as("flag"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
            max(col("n_status")).as("n_status"))
          .orderBy(col("flag").asc)
      },
      Some("""WITH dim AS (
             |  SELECT l_returnflag, CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS n_status
             |  FROM lineitem GROUP BY 1)
             |SELECT f.l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
             |       SUM(f.l_quantity) AS sum_qty, MAX(d.n_status) AS n_status
             |FROM lineitem f JOIN dim d ON f.l_returnflag = d.l_returnflag
             |GROUP BY 1 ORDER BY flag ASC""".stripMargin),
      "salted hot-key join == unsalted join (oracle-proven equality)"),

    // ------------------------------------------------------------------
    // q76 ~ TPC-H Q12: late-shipment priority counts. Fact-fact shuffle
    // join + conditional aggregation; the priority CASE folds into the
    // single aggregation pass (no second scan).
    GQuery(
      "q76_late_priority",
      (s, d) => {
        val hi = Seq("1-URGENT", "2-HIGH")
        Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate"))
          .groupBy(col("l_linestatus").as("status"))
          .agg(
            sum(when(col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L)).as("high_count"),
            sum(when(col("o_orderpriority").isin(hi: _*), 0L).otherwise(1L)).as("low_count"))
          .orderBy(col("status").asc)
      },
      Some("""SELECT l_linestatus AS status,
             |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
             |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate > o_orderdate
             |GROUP BY 1 ORDER BY status ASC""".stripMargin),
      "TPC-H Q12 shape: fact-fact join + conditional agg"),

    // ------------------------------------------------------------------
    // q77 ~ TPC-H Q19: discounted revenue under an OR-of-ANDs predicate.
    // The disjunction references BOTH sides, so it cannot become a join
    // key — the planner broadcasts the dim and evaluates the residual
    // post-join; per-side conjuncts (p_size lower bounds, quantity ranges)
    // still push into the scans.
    GQuery(
      "q77_disjunct_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        val m = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30)))
        m.agg(
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
             |       CAST(COUNT(*) AS BIGINT) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      "TPC-H Q19 shape: broadcast join + OR-of-ANDs residual predicate"),

    // ------------------------------------------------------------------
    // q78 ~ TPC-H Q7: bilateral shipping volume between two nations by
    // year. Two fact shuffle joins (lineitem⋈orders⋈customer) + three
    // broadcast dims (supplier, nation ×2); the nation-pair filter prunes
    // before aggregation.
    GQuery(
      "q78_nation_volume",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val sup = Tables.supplier(s, d)
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(dec(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("volume"))
          .orderBy(col("supp_nation").asc, col("cust_nation").asc, col("l_year").asc)
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
             |GROUP BY 1, 2, 3 ORDER BY supp_nation ASC, cust_nation ASC, l_year ASC""".stripMargin),
      "TPC-H Q7 shape: two shuffle joins + three broadcast dims + pair filter"),

    // ------------------------------------------------------------------
    // q79: bucketed co-located join. Both sides are written bucketed (and
    // sorted) on the join key, so the sort-merge join consumes the bucket
    // layout directly — NO shuffle exchange on either join side
    // (PlanShapeSpec asserts it). At 100 TB this is the first-order join
    // optimization for repeated fact-fact joins: pay the shuffle once at
    // write time, never at query time. The merge hint pins SMJ (Spark
    // would broadcast the small fixture dim, hiding the bucketing story).
    GQuery(
      "q79_bucketed_join",
      (s, d) => {
        // pid-suffixed EXTERNAL tables under /tmp (same scratch pattern as
        // q58/q59): a fresh JVM's in-memory catalog forgets managed tables
        // but their warehouse directories survive, and re-creating a
        // managed table over an existing location is LOCATION_ALREADY_EXISTS
        val tag = d.replaceAll("[^0-9]", "") + "_" + ProcessHandle.current.pid
        val base = s"/tmp/graft_bkt_$tag"
        val ot = s"g_orders_bkt_$tag"
        val ct = s"g_cust_bkt_$tag"
        // write the bucketed tables once per session: the gate (and the
        // bench's warm timed pass) measures the co-located JOIN, not the
        // pay-once write-side shuffle the layout amortizes
        if (!s.catalog.tableExists(ot)) {
          Tables.orders(s, d).write.mode("overwrite")
            .option("path", s"$base/orders")
            .bucketBy(8, "o_custkey").sortBy("o_custkey")
            .format("parquet").saveAsTable(ot)
          Tables.customer(s, d).write.mode("overwrite")
            .option("path", s"$base/customer")
            .bucketBy(8, "c_custkey").sortBy("c_custkey")
            .format("parquet").saveAsTable(ct)
        }
        s.table(ot).hint("merge")
          .join(s.table(ct), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("total"))
          .orderBy(col("segment").asc)
      },
      Some("""SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY segment ASC""".stripMargin),
      "bucketed co-located sort-merge join: zero join-side exchanges"),

    // ------------------------------------------------------------------
    // q80: deterministic train/val/test split assignment — the sharding
    // primitive of a training-data pipeline. The split is a pure function
    // of the stable document id via the cross-engine 60-bit md5 hash
    // (identical in Spark and DuckDB), so shards are reproducible across
    // engines, runs, and cluster sizes — never rand()-based (retried tasks
    // would re-roll rows between splits). Map-side only; scales trivially.
    GQuery(
      "q80_split_assign",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            pmod(graft.functions.TextFunctions.md5Hash60(col("doc_id").cast("string")),
              lit(100L)).cast("int").as("bucket"))
          .select(col("doc_id"), col("bucket"),
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val")
              .otherwise("test").as("split"))
          .orderBy(col("doc_id").asc)
      },
      Some("""SELECT doc_id,
             |       CAST(CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS INT) AS bucket,
             |       CASE WHEN CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 80 THEN 'train'
             |            WHEN CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 90 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id ASC""".stripMargin),
      "deterministic hash-sharded train/val/test split (cross-engine md5)"),

    // ------------------------------------------------------------------
    // q81: near-dup cluster assignment — connected components over the
    // MinHash near-dup pair graph (the step that turns PAIRS into GROUPS
    // so dedup can keep one representative per group). The oracle builds
    // the same edge set from exact 3-gram Jaccard (== the LSH output on
    // this fixture, proven by q36) and closes it with a recursive CTE.
    GQuery(
      "q81_dedup_clusters",
      (s, d) => {
        val pairs = graft.functions.MinHash.nearDuplicatePairs(
          Tables.documents(s, d), "doc_id", "text", shingleSize = 3, threshold = 0.5)
        graft.functions.Components.connectedComponents(pairs, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("comp").as("cluster"))
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id,
             |         list_distinct(list_transform(range(1, len(ws)-1),
             |           i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS sset
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
             |  WHERE len(ws) >= 3),
             |edges AS (
             |  SELECT a.doc_id AS src, b.doc_id AS dst
             |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
             |  WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
             |        len(list_distinct(list_concat(a.sset, b.sset))) >= 0.5),
             |reach(a, b) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
             |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
             |FROM reach GROUP BY a ORDER BY doc_id ASC""".stripMargin),
      "near-dup pairs -> duplicate groups (connected components, oracle=recursive CTE)"),

    // ------------------------------------------------------------------
    // q82: int8 embedding quantization — round-trip contract. Emits the
    // per-vector scale, max reconstruction error, and clip count, all from
    // ORDER-FREE arithmetic (max over dims, integer count) so the values
    // are bit-identical cross-engine; err_ok pins |err| ≤ scale/2.
    GQuery(
      "q82_quantize_int8",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = graft.functions.Similarity.quantizeInt8(emb, "vec_id", "embedding")
        q.join(emb.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("vd")), "vec_id")
          .select(col("vec_id"), col("scale"),
            array_max(zip_with(col("vd"), col("qvec"),
              (x, qq) => abs(x - qq * col("scale")))).as("max_abs_err"),
            aggregate(col("qvec"), lit(0),
              (acc, qq) => acc + when(abs(qq) > 127.0, 1).otherwise(0)).as("n_clipped"))
          .select(col("vec_id"), col("scale"), col("max_abs_err"), col("n_clipped"),
            (col("max_abs_err") <= col("scale") * 0.500001).as("err_ok"))
          .orderBy(col("vec_id").asc)
      },
      Some("""WITH q AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd,
             |         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))/127.0 AS scale
             |  FROM embeddings),
             |m AS (
             |  -- scale = 0 (all-zero vector) quantizes to all zeros on the Spark
             |  -- side; guard the division identically here
             |  SELECT vec_id, scale,
             |         CASE WHEN scale = 0 THEN 0.0 ELSE
             |           list_max(list_transform(vd, x -> abs(x - floor(x/scale + 0.5)*scale)))
             |         END AS max_abs_err,
             |         CASE WHEN scale = 0 THEN 0 ELSE
             |           CAST(len(list_filter(vd, x -> abs(floor(x/scale + 0.5)) > 127)) AS INT)
             |         END AS n_clipped
             |  FROM q)
             |SELECT vec_id, scale, max_abs_err, n_clipped,
             |       max_abs_err <= scale*0.500001 AS err_ok
             |FROM m ORDER BY vec_id ASC""".stripMargin),
      "int8 embedding quantization: scale/error/clip contract (bit-exact oracle)"),

    // ------------------------------------------------------------------
    // q177: Bloom-filter semi-join reduction — the 100 TB shuffle-cut
    // technique Spark's own InjectRuntimeFilter automates for shuffle
    // joins, spelled explicitly so it composes anywhere (pre-shuffle
    // probe pruning, multi-stage reuse of one filter, cross-job reuse).
    // Build side: the SELECTIVE orders subset's keys fold RELATIONALLY
    // into a 2048-word bitset (groupBy-bit_or — no driver collect,
    // treeAggregate-equivalent); the 16 KB word array broadcasts via a
    // 1-row crossJoin. Probe side: 3 hash bit-tests evaluate MAP-SIDE
    // (codegen arithmetic over element_at — no explode, no shuffle, no
    // UDF) BEFORE lineitem reaches the join shuffle, cutting shuffled
    // probe volume to ~|match| + FPR·|probe| (m=65536, k=3, n≈1.5k keys
    // → FPR ≈ 3e-4). The exact join then removes false positives, which
    // is why the oracle is the PLAIN join — bloom correctness shows up
    // as result invariance, and PlanShapeSpec pins the reduction + the
    // no-false-negative guarantee via observe() telemetry.
    GQuery(
      "q177_bloom_semijoin",
      (s, d) => {
        import graft.functions.{TextFunctions => TF}
        val mBits = 65536L
        val nWords = (mBits / 32L).toInt
        val kHash = 3
        // the filter's bit layout is ENGINE-INTERNAL (the oracle is the
        // plain join — bloom correctness is result invariance), so the
        // index hash needs no oracle-replayable md5: xxhash64 over the
        // (key, round) pair is one codegen'd mix per probe instead of a
        // digest + hex + base-conversion chain (r9; was 3 md5s per
        // lineitem row — the probe side's dominant cost)
        def idx(key: org.apache.spark.sql.Column, r: Int) =
          pmod(xxhash64(key, lit(r)), lit(mBits))
        val sel = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .localCheckpoint(false) // consumed by the build AND the exact join
        val rs = explode(array((0 until kHash).map(lit(_)): _*)).as("r")
        val cells = sel.select(col("o_orderkey"), rs)
          .select(pmod(xxhash64(col("o_orderkey"), col("r")), lit(mBits)).as("idx"))
          .select((col("idx") / 32).cast("long").as("word_id"),
            expr("shiftleft(1L, CAST(idx % 32 AS INT))").as("contrib"))
        val words = cells.groupBy(col("word_id"))
          .agg(expr("bit_or(contrib)").as("w"))
        val bf = s.range(nWords).select(col("id").as("word_id"))
          .join(words, Seq("word_id"), "left")
          .select(col("word_id"), coalesce(col("w"), lit(0L)).as("w"))
          .agg(expr("transform(array_sort(collect_list(struct(word_id, w))), x -> x.w)")
            .as("bf"))
        val probe = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
          .observe("bloom_probe_in", count(lit(1)).as("rows_in"))
          .crossJoin(broadcast(bf)) // 1-row side
        val hit = (0 until kHash).map { r =>
          expr(s"(shiftright(element_at(bf, CAST(idx_$r / 32 AS INT) + 1)," +
            s" CAST(idx_$r % 32 AS INT)) & 1L) = 1L")
        }.reduce(_ && _)
        val filtered = (0 until kHash)
          .foldLeft(probe)((df, r) => df.withColumn(s"idx_$r", idx(col("l_orderkey"), r)))
          .filter(hit)
          .drop((0 until kHash).map(r => s"idx_$r") :+ "bf": _*)
          .observe("bloom_probe_out", count(lit(1)).as("rows_out"))
        filtered.join(sel, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact
            sum(dec(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
              .cast("double").as("revenue"))
          .orderBy(col("o_orderpriority").asc)
      },
      Some("""SELECT o_orderpriority,
             |       CAST(COUNT(*) AS BIGINT) AS n_items,
             |       SUM(l_quantity) AS sum_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_totalprice > 450000.0
             |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""".stripMargin),
      "bloom-filter semi-join reduction: relational bitset build, map-side probe prefilter"),

    // ------------------------------------------------------------------
    // q185: canonical-document selection — the dedup APPLICATION step
    // that q81 (pairs → clusters) feeds: within each near-dup cluster
    // keep the single best member by a deterministic integer quality key
    // (distinct-token count, then n_chars, then lowest doc_id — exact
    // cross-engine, no float score). This is document survivorship: the
    // q129 rule-cascade shape specialized to corpus curation, where
    // "best" means richest text rather than freshest record. Scale: the
    // cluster assignment is q81's O(log²n) star pipeline; the election
    // adds ONE window over clusters (partitioned by cluster — never
    // global) and an aggregation, both on the cluster-sized (tiny
    // relative to corpus) membership table.
    GQuery(
      "q185_canonical_docs",
      (s, d) => {
        val pairs = graft.functions.MinHash.nearDuplicatePairs(
          Tables.documents(s, d), "doc_id", "text", shingleSize = 3, threshold = 0.5)
        val comp = graft.functions.Components.connectedComponents(pairs, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("comp").as("cluster"))
        val scored = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct_tokens"))
        val w = Window.partitionBy(col("cluster")).orderBy(
          col("n_distinct_tokens").desc, col("n_chars").desc, col("doc_id").asc)
        comp.join(scored, "doc_id")
          .withColumn("rk", row_number().over(w))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_members"),
            min(when(col("rk") === 1, col("doc_id"))).as("keep_doc"),
            sum(when(col("rk") =!= 1, col("n_chars")).otherwise(0L)).as("dropped_chars"))
          .orderBy(col("cluster").asc)
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id,
             |         list_distinct(list_transform(range(1, len(ws)-1),
             |           i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS sset
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
             |  WHERE len(ws) >= 3),
             |edges AS (
             |  SELECT a.doc_id AS src, b.doc_id AS dst
             |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
             |  WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
             |        len(list_distinct(list_concat(a.sset, b.sset))) >= 0.5),
             |reach(a, b) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
             |comp AS (
             |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
             |  FROM reach GROUP BY a),
             |scored AS (
             |  SELECT c.cluster, d.doc_id, d.n_chars,
             |         CAST(len(list_distinct(string_split(d.text, ' '))) AS BIGINT)
             |           AS n_distinct_tokens
             |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
             |ranked AS (
             |  SELECT cluster, doc_id, n_chars,
             |         ROW_NUMBER() OVER (PARTITION BY cluster
             |           ORDER BY n_distinct_tokens DESC, n_chars DESC, doc_id ASC) AS rk
             |  FROM scored)
             |SELECT cluster,
             |       CAST(COUNT(*) AS BIGINT) AS n_members,
             |       MIN(CASE WHEN rk = 1 THEN doc_id END) AS keep_doc,
             |       CAST(SUM(CASE WHEN rk <> 1 THEN n_chars ELSE 0 END) AS BIGINT)
             |         AS dropped_chars
             |FROM ranked GROUP BY cluster ORDER BY cluster ASC""".stripMargin),
      "canonical doc per near-dup cluster: integer quality election, survivorship for corpora"),

    // ------------------------------------------------------------------
    // q255 (r8c): key-skew AUDIT — the diagnostic a 100 TB job runs
    // BEFORE choosing between a plain shuffle join, salting (q75), and
    // an AQE skew split: exact group-size distribution of a join key,
    // reduced to the numbers that drive the decision — hot-key share,
    // exact p50/p99 group sizes, and the salt factor that would level
    // the hottest key to the average (ceil(max/avg)). The fixture key is
    // synthesized skewed (30% of rows collapse onto key 0, the rest
    // spread over 997 keys). Exact percentiles run as a row_number over
    // the ALREADY-AGGREGATED (key, size) relation — keys-cardinality
    // rows, not corpus rows; that single-partition sort is the honest
    // price of exactness and is what production would swap for
    // approx_percentile at extreme key cardinalities (documented, not
    // hidden). One corpus shuffle (the groupBy), artifact-sized output.
    GQuery(
      "q255_skew_audit",
      (s, d) => {
        val keyed = Tables.lineitem(s, d)
          .select(when(col("l_orderkey") % 10 < 3, lit(0L))
            .otherwise(pmod(col("l_partkey"), lit(997L))).as("key"))
        // the one corpus shuffle, materialized once — every downstream
        // consumer (stats + both percentile probes) reads the
        // keys-cardinality result, not the corpus
        val sizes = keyed.groupBy(col("key")).agg(count(lit(1)).as("sz"))
          .localCheckpoint(false)
        val stats = sizes.agg(
          count(lit(1)).as("n_keys"),
          sum(col("sz")).as("total_rows"),
          max(col("sz")).as("max_size"))
          .localCheckpoint(false)
        // single ranked pass serves BOTH percentiles (the global sort is
        // the acknowledged exactness price — pay it once)
        val pct = sizes.withColumn("rn",
            row_number().over(Window.orderBy(col("sz").asc, col("key").asc)))
          .crossJoin(broadcast(stats.select(col("n_keys").as("nk"))))
          .filter(col("rn") === expr("(nk + 1) DIV 2") ||
            col("rn") === expr("(nk * 99 + 99) DIV 100"))
          .agg(
            min(when(col("rn") === expr("(nk + 1) DIV 2"), col("sz"))).as("p50_size"),
            min(when(col("rn") === expr("(nk * 99 + 99) DIV 100"), col("sz"))).as("p99_size"))
        stats.crossJoin(broadcast(pct))
          .select(col("n_keys"), col("total_rows"), col("max_size"),
            col("p50_size"), col("p99_size"),
            expr("max_size * 1000 DIV total_rows").as("hot_share_fp"),
            expr("(max_size * n_keys + total_rows - 1) DIV total_rows").as("suggested_salt"))
          .withColumn("skewed", col("hot_share_fp") > 100)
          .orderBy(col("n_keys").asc)
      },
      Some("""WITH keyed AS (
             |  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0
             |              ELSE l_partkey % 997 END AS key
             |  FROM lineitem),
             |sizes AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS sz FROM keyed GROUP BY key),
             |ranked AS (
             |  SELECT sz, row_number() OVER (ORDER BY sz ASC, key ASC) AS rn FROM sizes),
             |st AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             |         CAST(SUM(sz) AS BIGINT) AS total_rows,
             |         CAST(MAX(sz) AS BIGINT) AS max_size
             |  FROM sizes),
             |p50 AS (SELECT r.sz AS p50_size FROM ranked r, st
             |        WHERE r.rn = (st.n_keys + 1) // 2),
             |p99 AS (SELECT r.sz AS p99_size FROM ranked r, st
             |        WHERE r.rn = (st.n_keys * 99 + 99) // 100)
             |SELECT st.n_keys, st.total_rows, st.max_size, p50.p50_size, p99.p99_size,
             |       max_size * 1000 // total_rows AS hot_share_fp,
             |       (max_size * n_keys + total_rows - 1) // total_rows AS suggested_salt,
             |       max_size * 1000 // total_rows > 100 AS skewed
             |FROM st, p50, p99
             |ORDER BY st.n_keys ASC""".stripMargin),
      "key-skew audit: exact group-size distribution -> hot share, p50/p99, salt factor == DuckDB replay"),
  )
}
