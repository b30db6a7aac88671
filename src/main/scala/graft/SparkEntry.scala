package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Cohort.queries ++ Panels.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      Temporal.queries ++ Pipeline.queries ++ Security.queries ++
      QueryStatus.queries ++ ReportDelivery.queries ++
      graft.sources.RoundTrip.queries ++ graft.streaming.EventStreams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Cohort.oracle ++ Panels.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ TextAnalysis.oracle ++ Multimodal.oracle ++
      Temporal.oracle ++ Pipeline.oracle ++ Security.oracle ++
      QueryStatus.oracle ++ ReportDelivery.oracle ++
      graft.sources.RoundTrip.oracle ++ graft.streaming.EventStreams.oracle
}
