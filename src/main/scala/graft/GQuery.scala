package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** One gated engine capability: a named Spark query over the fixture tables
  * plus (when ANSI-SQL-expressible) a DuckDB oracle the driver hash-compares
  * against (SURVEY.md §5). Queries without an oracle get the driver's weaker
  * rows-only check and are covered by ScalaTest instead.
  *
  * Determinism contract: every gated query's output is fully ordered by an
  * explicit ORDER BY forming a TOTAL order over the output (beware: fixture
  * lineitem is not unique on (l_orderkey, l_linenumber) — extend the key
  * until total). Whenever a sort key can be null, the oracle must spell
  * `ASC NULLS FIRST` (Spark's ascending default; DuckDB defaults to NULLS
  * LAST); keys that are provably non-null may use bare ASC.
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

object QueryRegistry {
  def all: Seq[GQuery] =
    graft.queries.RelationalQueries.all ++
      graft.queries.ScalarQueries.all ++
      graft.queries.StreamQueries.all ++
      graft.queries.NorthStarQueries.all ++
      graft.queries.ExtraQueries.all ++
      graft.queries.InvariantQueries.all ++
      graft.queries.ScaleQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.CurationQueries.all ++
      graft.queries.SqlFeatureQueries.all ++
      graft.queries.DepthQueries.all ++
      graft.queries.GraphTemporalQueries.all ++
      graft.queries.TpchShapeQueries.all ++
      graft.queries.TypeAndStateQueries.all ++
      graft.queries.RetrievalQueries.all ++
      graft.queries.IndexStatsQueries.all ++
      graft.queries.LmQueries.all ++
      graft.queries.MiningQueries.all ++
      graft.queries.MatrixQueries.all ++
      graft.queries.IncrementalStatsQueries.all ++
      graft.queries.RecsAndInfoQueries.all ++
      graft.queries.SpanDedupQueries.all ++
      graft.queries.LayoutQueries.all ++
      graft.queries.WebCurationQueries.all ++
      graft.queries.SemanticCurationQueries.all ++
      graft.queries.GovernanceQueries.all ++
      graft.queries.CurationDagQueries.all ++
      graft.queries.FormatDepthQueries.all ++
      graft.queries.VectorIndexQueries.all ++
      graft.queries.CorpusOpsQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(all.map(q => q.name -> q.fn): _*)

  def oracleSql: Map[String, String] =
    ListMap(all.collect { case GQuery(n, _, Some(sql), _) => n -> sql }: _*)
}
