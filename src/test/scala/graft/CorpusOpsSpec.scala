package graft

import org.apache.spark.sql.functions._

/** Structural laws of the round-8c corpus-hygiene tier (q245 paragraph
  * dedup, q246 Gopher rules) — the properties the oracle equality alone
  * doesn't spell out.
  */
class CorpusOpsSpec extends SparkTestBase {

  private def run(name: String) =
    QueryRegistry.queries(name)(spark, sf)

  test("q245: exactly one winner per shared header/footer class; counts reconcile") {
    val rows = run("q245_paragraph_dedup").collect()
    val n = rows.length
    assert(rows.forall(_.getLong(1) == 3L), "every doc splits into 3 paragraphs")
    // winners: the minimal doc_id of each %17 class keeps its header, of
    // each %23 class its footer; every doc keeps its (unique) own text.
    // total kept = n (own) + #header classes + #footer classes
    val docIds = rows.map(_.getLong(0))
    val headerClasses = docIds.map(_ % 17).distinct.length
    val footerClasses = docIds.map(_ % 23).distinct.length
    val totalKept = rows.map(_.getLong(2)).sum
    assert(totalKept === n + headerClasses + footerClasses,
      s"kept=$totalKept docs=$n hdr=$headerClasses ftr=$footerClasses")
    // the class-minimum doc keeps all 3; a doc winning neither keeps 1
    val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hdrWinners = docIds.groupBy(_ % 17).values.map(_.min).toSet
    val ftrWinners = docIds.groupBy(_ % 23).values.map(_.min).toSet
    docIds.foreach { id =>
      val expected = 1L + (if (hdrWinners(id)) 1L else 0L) + (if (ftrWinners(id)) 1L else 0L)
      assert(byId(id) === expected, s"doc $id kept ${byId(id)}, expected $expected")
    }
  }

  test("q245: a sole-survivor doc reassembles to exactly its own text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("own_md5"))
    val joined = run("q245_paragraph_dedup")
      .filter(col("n_kept") === 1)
      .join(docs, Seq("doc_id"))
      .select((col("sig") === col("own_md5")).as("ok"))
      .collect()
    assert(joined.nonEmpty, "fixture must contain sole-survivor docs")
    assert(joined.forall(_.getBoolean(0)),
      "reassembly of a 1-para survivor must be the original text")
  }

  test("q246: verdict is non-trivial and each heavy class fails its own rule") {
    val rows = run("q246_gopher_rules").collect()
    val passed = rows.count(_.getBoolean(8))
    assert(passed > 0 && passed < rows.length, s"verdict trivial: $passed/${rows.length}")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    byId.foreach { case (id, r) =>
      val nWords = r.getLong(1)
      val bulletFp = r.getLong(4)
      val alphaFp = r.getLong(6)
      val nStop = r.getLong(7)
      // line-rate rules need enough lines to manifest — a 2-line doc can
      // miss every 3rd-line slot entirely, so gate on the Gopher word
      // floor (which such docs fail anyway)
      if (id % 7 == 0 && nWords >= 50)
        assert(bulletFp > 100, s"doc $id bullet-heavy but fp=$bulletFp")
      if (id % 11 == 0 && nWords >= 50)
        assert(alphaFp < 800, s"doc $id numeric-heavy but alpha=$alphaFp")
      if (id % 3 == 0) assert(nStop <= 1, s"doc $id has no stops line but n_stop=$nStop")
      else assert(nStop >= 4, s"doc $id has the stops line but n_stop=$nStop")
    }
  }

  test("q246: metrics are internally consistent fixed-point ratios") {
    val rows = run("q246_gopher_rules").collect()
    rows.foreach { r =>
      val nWords = r.getLong(1)
      assert(nWords > 0)
      Seq(3, 4, 5, 6).map(r.getLong).foreach(fp =>
        assert(fp >= 0 && fp <= 1000, s"ratio fp out of range: $fp"))
      // mean word length in plausible char bounds for space-split tokens
      val mean = r.getLong(2)
      assert(mean >= 1000 && mean <= 12000, s"mean_wlen_fp=$mean")
    }
  }
}
