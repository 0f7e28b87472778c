package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: cross-engine floating-point probe for the PQ tier. Computes
  * left-to-right double-fold dot products and squared-L2 over adjacent
  * embedding pairs and dumps the raw IEEE-754 bits, for comparison against
  * DuckDB's list_dot_product / list_distance on the same rows (see
  * tools/dotcheck.py). The q39 cosine law already proves the sequential
  * double fold matches; this pins the two remaining kernels before the
  * q244 gate depends on them.
  */
object DotCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select((col("vec_id") - 1).as("ida"), col("embedding").as("vb"))
    def fold(x: org.apache.spark.sql.Column) =
      aggregate(x, lit(0.0), (acc, v) => acc + v)
    val dot = fold(zip_with(col("va"), col("vb"),
      (p, q) => p.cast("double") * q.cast("double")))
    val l2 = sqrt(fold(zip_with(col("va"), col("vb"),
      (p, q) => (p.cast("double") - q.cast("double")) * (p.cast("double") - q.cast("double")))))
    val out = a.join(b, Seq("ida"))
      .select(col("ida"), dot.as("dot"), l2.as("l2"))
      .orderBy(col("ida"))
      .limit(50)
      .collect()
    out.foreach { r =>
      println(s"${r.getLong(0)},${java.lang.Double.doubleToLongBits(r.getDouble(1))}," +
        s"${java.lang.Double.doubleToLongBits(r.getDouble(2))}")
    }
    spark.stop()
  }
}
