package graft

import org.apache.spark.sql.functions._

class GraftInstallSpec extends SparkTestBase {

  test("install registers cosine_sim for SQL and the as-of strategy") {
    Graft.install(spark)
    graft.sources.Tables.embeddings(spark, sf).createOrReplaceTempView("g_emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS s
        |FROM g_emb a JOIN g_emb b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5 ORDER BY a.vec_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaApi = {
      val e = graft.sources.Tables.embeddings(spark, sf)
      val a = e.select(col("vec_id"), col("embedding").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
      a.join(b, "vec_id").filter(col("vec_id") < 5)
        .select(col("vec_id"), graft.functions.Similarity.cosine(col("ea"), col("eb")).as("s"))
        .orderBy(col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    assert(viaSql.toSeq == viaApi.toSeq)
    assert(viaSql.nonEmpty)
  }

  test("install registers misra_gries as a SQL aggregate") {
    Graft.install(spark)
    graft.sources.Tables.documents(spark, sf).createOrReplaceTempView("g_docs")
    // k=64 >= fixture vocab -> sketch is exact: compare against plain counts
    val viaSql = spark.sql(
      """SELECT misra_gries(term, 64) AS m FROM
        |  (SELECT explode(split(text, ' ')) AS term FROM g_docs)""".stripMargin)
      .collect()(0).getMap[String, Long](0)
    val exact = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == exact)
    // non-literal k must fail cleanly at resolution
    val err = intercept[Exception] {
      spark.sql("SELECT misra_gries(term, length(term)) FROM (SELECT 'x' AS term)").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("install is idempotent") {
    Graft.install(spark)
    Graft.install(spark)
    assert(spark.experimental.extraStrategies.count(_ == graft.plans.AsOfStrategy) == 1)
  }

  test("cosine_sim SQL arity error is clean") {
    Graft.install(spark)
    val e = intercept[Exception] { spark.sql("SELECT cosine_sim(array(1.0F))") }
    assert(e.getMessage.contains("two array<float>") || e.getMessage.toLowerCase.contains("argument"))
  }
}
