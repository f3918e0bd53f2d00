package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family's query
  * inventory; `oracleSql` carries the DuckDB-equivalent SQL for each
  * (omitted for RNG-dependent / non-SQL-expressible ops, which get a
  * rows-only check PLUS a statistical envelope verdict emitted by
  * [[Verify]] into `envelope.json` — see [[graft.tools.Envelopes]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q12Join(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Extended.queries ++
      graft.queries.Mining.queries ++
      graft.llm.TextAnalysis.queries ++
      graft.llm.Dedup.queries ++
      graft.llm.Similarity.queries ++
      graft.llm.Curation.queries ++
      graft.llm.LanguageModel.queries ++
      graft.llm.Multimodal.queries ++
      graft.ops.Maintenance.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.Extended.oracleSql ++
      graft.queries.Mining.oracleSql ++
      graft.llm.TextAnalysis.oracleSql ++
      graft.llm.Dedup.oracleSql ++
      graft.llm.Similarity.oracleSql ++
      graft.llm.Curation.oracleSql ++
      graft.llm.LanguageModel.oracleSql ++
      graft.llm.Multimodal.oracleSql ++
      graft.ops.Maintenance.oracleSql
}
