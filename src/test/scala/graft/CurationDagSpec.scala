package graft

/** The q229 composite's structural contracts beyond the oracle: monotone
  * per-stage shrink, bucket/survivor reconciliation, and per-lang tertile
  * balance (the properties that make the DAG a pipeline rather than six
  * unrelated queries).
  */
class CurationDagSpec extends SparkTestBase {

  private lazy val rows =
    SparkEntry.queries("q229_curation_dag")(spark, sf).collect()

  test("q229: stage counts shrink monotonically and never to zero") {
    val stages = rows.filter(_.getString(0) == "stage")
      .map(r => r.getString(1) -> r.getLong(3)).sortBy(_._1)
    assert(stages.map(_._1).toSeq == Seq("0_input", "1_url_dedup",
      "2_denylist", "3_quality", "4_chunk_dedup", "5_semdedup"))
    val ns = stages.map(_._2)
    ns.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"stage grew: $a -> $b in ${stages.mkString(", ")}")
    case _ => ()
    }
    assert(ns.last > 0, "pipeline drained the corpus completely")
    // stage 1 groups at most 2 ids per canonical key (ids 40m+r and
    // 40m+20+r share one): a real shrink, bounded below by half — exact
    // halving only when the corpus size is a multiple of 40 (a trailing
    // partial block yields singletons)
    assert(ns(1) < ns(0), s"url dedup was a no-op: ${ns.toSeq}")
    assert(ns(1) * 2 >= ns(0), s"url dedup over-deduped: ${ns.toSeq}")
  }

  test("q229: bucket histogram reconciles with the final survivor count") {
    val buckets = rows.filter(_.getString(0) == "bucket")
    val nFinal = rows.filter(r => r.getString(0) == "stage" &&
      r.getString(1) == "5_semdedup").head.getLong(3)
    assert(buckets.map(_.getLong(3)).sum === nFinal)
    // exact NTILE(3): within each lang the tertile sizes differ by <= 1
    buckets.groupBy(_.getString(1)).foreach { case (lang, bs) =>
      assert(bs.length === 3, s"$lang must have 3 buckets")
      val sizes = bs.map(_.getLong(3))
      assert(sizes.max - sizes.min <= 1, s"$lang tertiles unbalanced: ${sizes.toSeq}")
    }
  }
}
