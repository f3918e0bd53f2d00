package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.Dedup

/** Continuous-corpus ingest dedup — the streaming twin of the batch d6
  * flow (`Dedup.incrementalDedup` / `incrementalDedupIndexed`): a
  * document stream is fingerprinted per micro-batch, anti-joined
  * against the persisted fingerprint index ([[graft.llm.Dedup.writeFpIndex]]'s
  * bucketed table), deduped within the batch, and the survivors are
  * written out while their fingerprints are appended to the index — so
  * later micro-batches (and later runs, via the checkpoint) never
  * re-accept a duplicate.
  *
  * Scale shape: identical to d6 — both join sides reduce to
  * (fp, doc_id), the text never shuffles, the index side reads its
  * bucket layout in place, and per-trigger cost is O(batch).
  *
  * Exactly-once reasoning (two sinks can't commit atomically):
  *  - the accepted-docs write goes FIRST, into a batch-id-scoped
  *    directory with overwrite — a replayed micro-batch recomputes the
  *    same anti-join (the index gains this batch's fps only AFTER the
  *    accepted write succeeds) and overwrites the same directory, so
  *    the accepted table is exactly-once;
  *  - the index append goes SECOND and is at-least-once: a replay
  *    after an append-then-crash re-appends the same fps. Duplicate
  *    fps in the index are HARMLESS for correctness (anti-join
  *    semantics ignore multiplicity) and only cost index bytes —
  *    reclaimed by periodically rewriting the index with
  *    [[graft.llm.Dedup.writeFpIndex]]'s distinct build.
  *  Writing in the opposite order would lose documents: fps landing
  *  before the accepted write means a replay's anti-join drops the
  *  whole batch.
  */
object IngestDedup {

  /** Starts the ingest query. `docs` is a streaming (doc_id, text)
    * frame; `indexTable` must exist with the [[Dedup.writeFpIndex]]
    * layout (bucketed by fp, `buckets` must match it). Accepted docs
    * land under `acceptedPath/batch_id=N/` (readable as one
    * partitioned parquet table with ingest provenance).
    */
  def run(docs: DataFrame, indexTable: String, acceptedPath: String,
      checkpoint: String, buckets: Int = 8): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val s = batch.sparkSession
        val w = Window.partitionBy("fp").orderBy("doc_id")
        // one materialization feeds both sinks: the accepted semi-join
        // and the index append must see the SAME survivor set
        val fresh = Dedup.fingerprintsOf(batch)
          .join(s.table(indexTable), Seq("fp"), "left_anti")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("fp"))
          .persist()
        try {
          batch.join(fresh.select("doc_id"), Seq("doc_id"), "left_semi")
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$acceptedPath/batch_id=$id")
          fresh.select("fp")
            .write.mode(SaveMode.Append).format("parquet")
            .bucketBy(buckets, "fp").sortBy("fp")
            .saveAsTable(indexTable)
        } finally fresh.unpersist()
      }
      .start()
}
