package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family's query
  * inventory; `oracleSql` carries the DuckDB-equivalent SQL for each.
  * RNG-dependent / non-SQL-expressible ops register envelope VERDICT
  * faces (deterministic bounds + 0/1 pass flags, hash-gated like any
  * other oracle row — see [[graft.tools.Envelopes]]); their measured
  * values additionally land in `envelope.json` via [[Verify]].
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
      graft.ops.Maintenance.oracleSql ++
      // r13: the five formerly rows-only queries now register envelope
      // VERDICT faces with real DuckDB oracles (no `no_oracle` rows)
      graft.tools.Envelopes.oracleSql
}
