package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.functions.{TextFunctions => TF}

/** Property-based algebraic laws (SURVEY.md §5.3): projection idempotence,
  * filter composition, cast round-trips, null propagation, and set-algebra
  * invariants of the similarity primitives.
  */
class LawsSpec extends SparkTestBase {

  import spark.implicits._

  /** Minimal ScalaCheck runner (scalatest-scalacheck bridge isn't a dep). */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  private val rows = Gen.listOfN(30,
    for {
      a <- Gen.chooseNum(-1000L, 1000L)
      b <- Gen.chooseNum(-50, 50)
      s <- Gen.alphaStr.map(_.take(8))
    } yield (a, b, s))

  test("projection is idempotent: π(π(df)) == π(df)") {
    check(Prop.forAll(rows) { data =>
      val df = data.toDF("a", "b", "s")
      val once = df.select(col("a"), col("s"))
      val twice = once.select(col("a"), col("s"))
      once.collect().toSeq == twice.collect().toSeq
    })
  }

  test("filter composes: σp(σq(df)) == σ(p∧q)(df)") {
    check(Prop.forAll(rows) { data =>
      val df = data.toDF("a", "b", "s")
      val chained = df.filter(col("a") > 0).filter(col("b") < 10)
      val combined = df.filter(col("a") > 0 && col("b") < 10)
      chained.collect().toSeq == combined.collect().toSeq
    })
  }

  test("widening cast round-trips: int → long → int is identity") {
    check(Prop.forAll(rows) { data =>
      val df = data.toDF("a", "b", "s")
      df.select((col("b").cast("long").cast("int") === col("b")).as("ok"))
        .collect().forall(_.getBoolean(0))
    })
  }

  test("null propagation: f(null) is null for scalar functions") {
    val df = Seq[(java.lang.Long, String)]((null, null)).toDF("x", "s")
    val r = df.select(
      (col("x") + 1).as("a"), upper(col("s")).as("b"),
      (col("x") === 5).as("c"), length(col("s")).as("d")).collect().head
    (0 until 4).foreach(i => assert(r.isNullAt(i)))
  }

  test("jaccard laws: j(a,a)=1, symmetry, bounds") {
    val texts = Gen.listOfN(8, Gen.nonEmptyListOf(
      Gen.oneOf("red", "green", "blue", "cyan", "teal", "plum"))
      .map(_.mkString(" ")))
    check(Prop.forAll(texts, texts) { (ta, tb) =>
      val df = ta.zip(tb).toDF("a", "b")
        .filter(size(split(col("a"), " ")) >= 2 && size(split(col("b"), " ")) >= 2)
        .select(
          TF.jaccard(TF.wordShingles(col("a"), 2), TF.wordShingles(col("b"), 2)).as("jab"),
          TF.jaccard(TF.wordShingles(col("b"), 2), TF.wordShingles(col("a"), 2)).as("jba"),
          TF.jaccard(TF.wordShingles(col("a"), 2), TF.wordShingles(col("a"), 2)).as("jaa"))
      df.collect().forall { r =>
        val (jab, jba, jaa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        jab == jba && jaa == 1.0 && jab >= 0.0 && jab <= 1.0
      }
    })
  }

  test("minhash signature similarity approximates jaccard identity case") {
    import graft.functions.MinHash
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), TF.wordShingles(col("text"), 3).as("sset"))
    val sigs = MinHash.signatures(sh, "doc_id", "sset")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L)) // identical sets → identical signatures
  }
}
