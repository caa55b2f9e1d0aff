package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable query: a DataFrame builder over a testdata dir plus
  * (optionally) the equivalent DuckDB SQL. Queries without an oracle get the
  * driver's weaker rows-only check.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

trait QueryGroup {
  def defs: Map[String, QueryDef]
}

object Registry {
  /** All query groups in the library; SparkEntry flattens this. */
  def groups: Seq[QueryGroup] = Seq(
    AnalyticsQueries,
    HashDbQueries,
    DedupQueries,
    TextQueries,
    SimilarityQueries,
    EventQueries,
    MultimodalQueries,
    PipelineQueries
  )

  lazy val all: Map[String, QueryDef] =
    groups.flatMap(_.defs).toMap
}
