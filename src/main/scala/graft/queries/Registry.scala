package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle that must
  * hash-match it on the same parquet tables. Oracle-less entries get the
  * driver's weaker rows-only check (SURVEY.md §5).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  def all: Seq[Q] =
    CoreTemplates.qs ++ ReshapeOps.qs ++ TextOps.qs ++ DedupOps.qs ++
      VectorOps.qs ++ GeoOps.qs ++ IngestOps.qs ++ MultimodalOps.qs ++
      ScalarOps.qs ++ WindowOps.qs ++ PipelineOps.qs ++ StreamQueries.qs ++
      SourceOps.qs ++ CorpusOps.qs ++ AnalyticsOps.qs ++ StatsOps.qs ++
      EnergyOps.qs ++ EvalOps.qs ++ TrainOps.qs ++ CurateOps.qs ++
      WebOps.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
