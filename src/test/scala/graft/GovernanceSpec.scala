package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the wave-5 tier (q224–q226): k-anonymity release
  * accounting, positional phrase adjacency on hand-built postings, and
  * link-graph canonical-host identity.
  */
class GovernanceSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String) =
    QueryRegistry.queries(name)(spark, sf)

  test("q224: class sizes partition the corpus; released iff size >= 5") {
    val rows = run("q224_k_anonymity").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(3)).sum === docs)
    rows.foreach(r => assert(r.getBoolean(4) === (r.getLong(3) >= 5)))
    assert(rows.exists(!_.getBoolean(4)), "fixture must exercise suppression")
    assert(rows.exists(_.getBoolean(4)), "fixture must exercise release")
  }

  test("q225: adjacency counting on hand-built position lists") {
    // "w j w j j" → windows at 0,2; joins at 1,3,4 → matches at 0→1, 2→3
    val got = Seq(("w j w j j", 1L)).toDF("text", "id")
      .select(posexplode(graft.functions.TextFunctions.tokens(col("text")))
        .as(Seq("p", "tok")))
      .groupBy(col("tok")).agg(array_sort(collect_list(col("p"))).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(got("w") === Seq(0, 2) && got("j") === Seq(1, 3, 4))
    val n = Seq((got("w"), got("j"))).toDF("ps1", "ps2")
      .select(size(filter(col("ps1"), x => array_contains(col("ps2"), x + 1))))
      .head().getInt(0)
    assert(n === 2)
  }

  test("q225: every gated match is a true adjacency in the raw text") {
    val matches = run("q225_phrase_search").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(matches.nonEmpty)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    matches.foreach { case (id, n) =>
      val toks = texts(id).split(" ", -1)
      val truth = toks.sliding(2).count(a => a.length == 2 && a(0) == "window" && a(1) == "join")
      assert(n === truth.toLong, s"doc $id")
    }
    // and no doc with a match is missing
    val missing = texts.filter { case (id, t) =>
      t.split(" ", -1).sliding(2).exists(a => a.length == 2 && a(0) == "window" && a(1) == "join") &&
        !matches.contains(id)
    }
    assert(missing.isEmpty, s"missed docs: ${missing.keys.take(3)}")
  }

  test("q226: canonical host identity folds case/www/params into one node") {
    val hosts = run("q226_link_graph").collect().map(_.getString(0))
    // 7 target hosts (lowercased, www-stripped) + the asset CDN
    assert(hosts.length === 8)
    assert(hosts.contains("static.cdn.net"))
    (0 until 7).foreach(k => assert(hosts.contains(s"host$k.example.org")))
    assert(hosts.forall(h => h == h.toLowerCase && !h.startsWith("www.")))
  }
}
