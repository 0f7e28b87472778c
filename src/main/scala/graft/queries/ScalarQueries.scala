package graft.queries

import org.apache.spark.sql.functions._
import graft.GQuery
import graft.sources.Tables

/** Scalar function surface (SURVEY.md §2.8): string / date / math / JSON /
  * array families. All composed from `org.apache.spark.sql.functions._`
  * (whole-stage-codegen'd); no UDFs anywhere on this path.
  */
object ScalarQueries {

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    GQuery(
      "q26_string_funcs",
      (s, d) => {
        Tables.customer(s, d)
          .select(
            col("c_custkey").as("custkey"),
            upper(col("c_name")).as("uname"),
            lower(col("c_mktsegment")).as("lseg"),
            substring(col("c_name"), 1, 8).as("name8"),
            concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"),
            length(col("c_name")).as("name_len"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
            lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
            trim(lit("  x  ")).as("trimmed"))
          .orderBy(col("custkey").asc)
      },
      Some("""SELECT c_custkey AS custkey,
             |       UPPER(c_name) AS uname, LOWER(c_mktsegment) AS lseg,
             |       SUBSTRING(c_name, 1, 8) AS name8,
             |       CONCAT_WS('-', c_mktsegment, c_name) AS seg_name,
             |       CAST(LENGTH(c_name) AS INTEGER) AS name_len,
             |       REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
             |       LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
             |       TRIM('  x  ') AS trimmed
             |FROM customer ORDER BY custkey ASC""".stripMargin),
      "string functions: case/substr/concat/length/regexp/pad/trim"),

    // ------------------------------------------------------------------
    GQuery(
      "q27_date_funcs",
      (s, d) => {
        Tables.orders(s, d)
          .select(
            col("o_orderkey").as("okey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("dd"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            (col("o_orderdate") + expr("INTERVAL 5 DAYS")).as("plus5d"),
            datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
              .cast("long").as("days_since_95"))
          .orderBy(col("okey").asc)
      },
      Some("""SELECT o_orderkey AS okey,
             |       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
             |       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
             |       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dd,
             |       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |       o_orderdate + INTERVAL 5 DAY AS plus5d,
             |       CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
             |         AS days_since_95
             |FROM orders ORDER BY okey ASC""".stripMargin),
      "date functions: extract/trunc/interval arithmetic/datediff"),

    // ------------------------------------------------------------------
    GQuery(
      "q28_math_funcs",
      (s, d) => {
        Tables.part(s, d)
          .select(
            col("p_partkey").as("pk"),
            abs(col("p_retailprice") - 1000.0).as("abs_delta"),
            floor(col("p_retailprice")).as("fl"),
            ceil(col("p_retailprice")).as("ce"),
            sqrt(col("p_retailprice")).as("sq"),
            pow(col("p_size").cast("double"), 2.0).as("size_sq"),
            pmod(col("p_partkey"), lit(7L)).as("pk_mod7"),
            greatest(col("p_size"), lit(25)).as("gmax"),
            least(col("p_size"), lit(25)).as("lmin"))
          .orderBy(col("pk").asc)
      },
      // Output-type alignment (driver hash is physical-type-strict):
      // Spark floor/ceil(double) -> BIGINT while DuckDB returns DOUBLE, and
      // DuckDB GREATEST/LEAST(int32,int32) widens to int64 while Spark stays
      // int32 — cast the oracle to Spark's output types (values identical).
      Some("""SELECT p_partkey AS pk,
             |       ABS(p_retailprice - 1000.0) AS abs_delta,
             |       CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
             |       CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
             |       SQRT(p_retailprice) AS sq,
             |       POW(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
             |       p_partkey % 7 AS pk_mod7,
             |       CAST(GREATEST(p_size, 25) AS INTEGER) AS gmax,
             |       CAST(LEAST(p_size, 25) AS INTEGER) AS lmin
             |FROM part ORDER BY pk ASC""".stripMargin),
      "math functions: abs/floor/ceil/sqrt/pow/mod/greatest/least"),

    // ------------------------------------------------------------------
    GQuery(
      "q29_json_funcs",
      (s, d) => {
        Tables.events(s, d)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
          .orderBy(col("event_id").asc)
      },
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
             |FROM events ORDER BY event_id ASC""".stripMargin),
      "JSON extraction from events.props"),

    // ------------------------------------------------------------------
    GQuery(
      "q30_array_funcs",
      (s, d) => {
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).as("n_dims"),
            element_at(col("embedding"), 1).cast("double").as("first_elem"),
            element_at(col("embedding"), -1).cast("double").as("last_elem"),
            array_min(col("embedding")).cast("double").as("min_elem"),
            array_max(col("embedding")).cast("double").as("max_elem"))
          .orderBy(col("vec_id").asc)
      },
      Some("""SELECT vec_id,
             |       CAST(len(embedding) AS INT) AS n_dims,
             |       CAST(embedding[1] AS DOUBLE) AS first_elem,
             |       CAST(embedding[-1] AS DOUBLE) AS last_elem,
             |       CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_elem,
             |       CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_elem
             |FROM embeddings ORDER BY vec_id ASC""".stripMargin),
      "array functions over the embedding column"),
  )
}
