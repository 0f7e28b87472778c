package graft

import org.apache.spark.sql.functions._

/** Specs for the engine-depth family (q109–q112): plan locks and the
  * invariants the oracle equality doesn't spell out.
  */
class DepthSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def formatted(name: String): String =
    q(name).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q109 null-safe join: stays a hash join, NULL keys really match") {
    val plan = formatted("q109_nullsafe_join")
    assert(plan.contains("HashJoin"), "null-safe equality fell off the hash-join path")
    assert(!plan.contains("BroadcastNestedLoop"))
    val rows = q("q109_nullsafe_join").collect()
    // nations in region 2 have nk=NULL and must match exactly the nulled
    // region row — they'd silently vanish under plain equality
    val nulled = rows.filter(_.isNullAt(2))
    assert(nulled.nonEmpty, "no NULL-keyed matches — the null-safe path is untested")
    // every nation appears exactly once (region keys are unique even nulled)
    assert(rows.map(_.getInt(0)).distinct.length == rows.length)
  }

  test("q110 trailing window: self always in frame, revenue >= own price") {
    val rows = q("q110_trailing_window")
      .join(graft.sources.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_totalprice")), Seq("o_orderkey"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1, s"current row missing from its own frame: $r")
      assert(r.getDouble(4) >= r.getDouble(5) - 0.005,
        s"trailing revenue below the row's own price: $r")
    }
  }

  test("q111 l2 normalize: full vectors are unit-norm; gate digest is stable") {
    // the gate emits scalar proofs (OutputPolicy) — the full-vector check
    // lives here: recompute the normalization and assert |unit| == 1
    val v = col("embedding").cast("array<double>")
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), norm.as("norm"),
        transform(v, x => x / norm).as("unit"))
      .collect().foreach { r =>
        assert(r.getDouble(1) > 0, "fixture gained a zero vector — guard untested")
        val ss = r.getSeq[Double](2).map(x => x * x).sum
        assert(math.abs(ss - 1.0) < 1e-9, s"vec ${r.getLong(0)}: |unit|^2 = $ss")
      }
    val rows = q("q111_l2_normalize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0)
      assert(r.getInt(2) > 0, s"dim must be positive: $r")
      assert(r.getString(3).matches("[0-9a-f]{32}"), s"not an md5 digest: $r")
    }
    // digest is deterministic across executions (restart-safe gate)
    assert(q("q111_l2_normalize").collect().sameElements(rows))
  }

  test("q113 custom source: pushdown narrows the range, skips partitions, keeps residual") {
    val plan = formatted("q113_custom_source")
    assert(plan.contains("range=[150000,160000) partitions=2/32"),
      s"id bounds not pushed into the connector:\n$plan")
    assert(plan.contains("% 7"), "residual sq filter vanished — wrongly claimed as pushed")
    // pushed id predicates must NOT remain as Spark-side filters
    assert(!plan.contains("id#") || !plan.split("Condition :").drop(1).exists(_.takeWhile(_ != '\n').contains("id#")),
      "pushed id bounds still filtered Spark-side")
    // value parity vs the built-in range source
    val got = q("q113_custom_source").collect()(0)
    val want = spark.range(150000, 160000).toDF("id")
      .withColumn("sq", col("id") * col("id"))
      .filter(col("sq") % 7 === 0)
      .agg(count(lit(1)), sum(col("id")), sum(col("sq"))).collect()(0)
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1)
      && got.getLong(2) == want.getLong(2), s"got $got want $want")
  }

  test("custom source prunes columns: id-only projection never materializes sq") {
    val df = spark.read.format("graft.sources.GraftRangeSource")
      .option("start", 0).option("end", 1000).option("slices", 4)
      .load().select(col("id"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("cols=id") && !plan.contains("cols=id,sq"),
      s"sq not pruned from the custom scan:\n$plan")
    assert(df.count() == 1000)
    // pushed-bound saturation: a Long.MaxValue bound must not wrap — the
    // pushed filter is gone from the Spark plan, so a wrap would return
    // every row instead of none (and the dual would return none for all)
    def src = spark.read.format("graft.sources.GraftRangeSource")
      .option("start", 0).option("end", 1000).option("slices", 4).load()
    assert(src.filter(col("id") > Long.MaxValue).count() == 0)
    assert(src.filter(col("id") <= Long.MaxValue).count() == 1000)
    assert(src.filter(col("id") === Long.MaxValue).count() == 0)
  }

  test("q114 z-order: sorting by zval bounds BOTH dims per chunk, single-key sort does not") {
    // the data-skipping claim, measured: chunk the table into 16 "files"
    // under each layout and compare the average per-chunk span of p_size.
    // A p_partkey-sorted layout leaves p_size spanning ~the full domain in
    // every chunk (no skipping possible on p_size); the z-ordered layout
    // must bound it materially tighter.
    val rows = q("q114_zorder").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val chunks = 16
    def avgSizeSpan(sorted: Seq[(Long, Int, Long)]): Double = {
      val per = sorted.grouped(math.ceil(sorted.size / chunks.toDouble).toInt).toSeq
      per.map(c => (c.map(_._2).max - c.map(_._2).min).toDouble).sum / per.size
    }
    val byKey = avgSizeSpan(rows.sortBy(_._1).toSeq)
    val byZ = avgSizeSpan(rows.sortBy(_._3).toSeq)
    assert(byZ < byKey / 2,
      s"z-order span $byZ not materially tighter than key-sorted span $byKey")
    // morton bits really interleave: zval reconstructs both inputs
    rows.foreach { case (pk, size, z) =>
      def unspread(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
        x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
        x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
        x
      }
      assert(unspread(z) == ((size - 1L) * 1337 & 0xFFFF), s"x lane wrong for $pk")
      assert(unspread(z >> 1) == (pk % 65536), s"y lane wrong for $pk")
    }
  }

  test("q115 pagerank: ranks bounded below by the teleport term, mass conserved, deterministic") {
    val rows = q("q115_pagerank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 100)
    rows.foreach { case (n, r) => assert(r >= 150000L, s"node $n below teleport floor") }
    assert(rows.map(_._2).distinct.length > 1, "all ranks identical — iteration inert")
    // total mass stays within the damping envelope: <= n·1e6 (integer
    // truncation only loses mass, never creates it)
    val total = rows.map(_._2).sum
    assert(total <= 100L * 1000000 && total > 100L * 150000, s"mass out of envelope: $total")
    assert(q("q115_pagerank").collect().map(r => (r.getLong(0), r.getLong(1))).sameElements(rows))
  }

  test("q116 feature hashing: per-doc bucket counts conserve token mass") {
    val rows = q("q116_feature_hashing").collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 64, s"bucket out of range: $r")
      assert(r.getLong(2) >= 1)
    }
    // Σ cnt over buckets == token count of the doc (hashing never drops)
    val perDoc = rows.groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(2)).sum }
    val truth = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (d, n) => assert(n == truth(d), s"doc $d token mass $n != ${truth(d)}") }
  }

  test("observe() collects data-quality metrics on the main pass, no second scan") {
    // the pipeline-hygiene primitive at 100 TB: row/null/range counters
    // piggyback on the write job instead of paying a second full scan
    val obs = new org.apache.spark.sql.Observation("dq")
    val docs = graft.sources.Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"),
        min(col("n_chars")).as("min_chars"))
    val n = docs.count()
    val m = obs.get
    assert(m("rows") == n)
    assert(m("null_texts") == 0L)
    assert(m("min_chars").asInstanceOf[Long] >= 0L)
  }

  test("q112 mixture sample: deterministic, kept counts bounded by source size") {
    val rows = q("q112_mixture_sample").collect()
    assert(rows.nonEmpty)
    val totals = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= totals(r.getString(0)))
      assert(r.getInt(1) >= 200 && r.getInt(1) <= 1000, s"rate out of range: $r")
    }
    assert(q("q112_mixture_sample").collect().sameElements(rows), "not reproducible")
  }

  test("q145: the split partitions the FULL corpus and conserves clusters") {
    val rows = q("q145_leakage_free_split").collect()
    assert(rows.nonEmpty)
    // every document lands in exactly one split (a singleton-dropping
    // inner join or a cluster in two splits would break conservation)
    val totalDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == totalDocs, "docs lost or duplicated")
    // cluster count conservation: Σ per-split clusters == distinct
    // clusters globally — a cluster spanning two splits would be counted
    // twice on the left side only
    val ids = graft.sources.Tables.documents(spark, sf).select(col("doc_id"))
    val e1 = ids.filter(pmod(col("doc_id"), lit(50L)) =!= 49)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
    val e7 = ids.filter(pmod(col("doc_id"), lit(50L)) < 43)
      .select(col("doc_id").as("src"), (col("doc_id") + 7).as("dst"))
    val edges = e1.union(e7).join(ids.select(col("doc_id").as("dst")), Seq("dst"))
    val comp = graft.functions.Components.connectedComponents(edges, "src", "dst")
    val nClusters = ids.join(comp, col("doc_id") === col("id"), "left")
      .select(coalesce(col("comp"), col("doc_id")).as("cluster"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum == nClusters,
      "a cluster appears in more than one split (leakage)")
  }
}
