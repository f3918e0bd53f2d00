package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous SCD Type-2 maintenance — the incremental twin of
  * [[graft.ops.Maintenance.scdType2]] (which versions a complete
  * change log in one pass): a change stream is applied to a versioned
  * dimension table per micro-batch, CLOSING each affected key's open
  * interval at the batch's first change for that key and APPENDING
  * the batch's new versions chained among themselves. The table is
  * always a valid SCD2 dimension — gapless per-key interval chains
  * with exactly one open (current) version — ready for the as-of
  * joins (q30/q42) that read such dimensions.
  *
  * Layout and write discipline are [[IngestUpsert]]'s: the table is
  * hash-bucket-partitioned on the key (count persisted as table
  * metadata), a batch rewrites only the buckets its keys hash into,
  * and the merge materializes through an eager checkpoint before
  * overwriting the files it read.
  *
  * Replay idempotence (the sink is convergent, not just
  * at-least-once): a version is identified by (key, valid_from) —
  * re-applying a committed batch finds each of its versions already
  * present and deduplicates them (greatest valid_to wins, the closed
  * form), and the close step only fires when the batch's first change
  * is strictly LATER than the open interval's start, so the last
  * version the batch itself opened is not re-closed by its own
  * replay. Contract: per-key timestamps arrive monotonically
  * non-decreasing across batches (the CDC ordering guarantee);
  * late-arriving history belongs in the batch rebuild
  * ([[graft.ops.Maintenance.scdType2]] over the full log).
  */
object IngestScd2 {

  /** Starts the maintenance query: `changes` is a streaming frame of
    * (keys..., ts, attrs...).
    */
  def run(changes: DataFrame, tablePath: String, keys: Seq[String],
      ts: String, checkpoint: String, buckets: Int = 16): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), tablePath, keys, ts, buckets)
      }
      .start()

  /** One micro-batch apply — public so replay convergence is directly
    * testable.
    */
  def processBatch(batch: DataFrame, tablePath: String, keys: Seq[String],
      ts: String, buckets: Int = 16): Unit = {
    val s = batch.sparkSession
    if (batch.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val bootstrap = !fs.exists(new org.apache.hadoop.fs.Path(tablePath))
    val metaPath = new org.apache.hadoop.fs.Path(s"$tablePath/_graft_buckets")
    val effBuckets =
      if (bootstrap) buckets
      else if (fs.exists(metaPath)) {
        val in = fs.open(metaPath)
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim.toInt
        finally in.close()
      } else buckets
    // the batch's rows become versions chained among themselves (the
    // one-shot scdType2 rule, remaining columns breaking ts ties)
    val tieCols = batch.columns.filterNot(c => keys.contains(c) || c == ts)
    val newVersions = graft.ops.Maintenance
      .scdType2(batch, keys, ts, tieCols)
      .drop(ts)
      .withColumn("__bucket",
        IngestUpsert.bucketOf(keys, effBuckets))
      .persist()
    try {
      val touched = newVersions.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSeq
      // each affected key's FIRST change this batch closes its open row
      val firstChange = newVersions.groupBy(keys.map(col): _*)
        .agg(min(col("valid_from")).as("__new_t0"))
      val merged =
        if (bootstrap) newVersions
        else {
          val tbl = s.read.parquet(tablePath)
            .filter(col("__bucket").isin(touched: _*))
          val rewritten = tbl.join(firstChange, keys, "left")
            .withColumn("valid_to",
              when(col("is_current") === 1 && col("__new_t0").isNotNull &&
                  col("__new_t0") > col("valid_from"), col("__new_t0"))
                .otherwise(col("valid_to")))
            .withColumn("is_current",
              when(col("valid_to").isNotNull, 0).otherwise(col("is_current"))
                .cast("int"))
            .drop("__new_t0")
          // replay convergence: dedup versions by (key, valid_from),
          // the CLOSED form (non-null, greatest valid_to) winning
          val w = Window.partitionBy((keys :+ "valid_from").map(col): _*)
            .orderBy(col("valid_to").desc_nulls_last)
          rewritten.unionByName(newVersions)
            .withColumn("__rk", row_number().over(w))
            .filter(col("__rk") === 1).drop("__rk")
            .localCheckpoint(true)
        }
      try {
        val prevMode = s.conf.get("spark.sql.sources.partitionOverwriteMode")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try merged.write.mode(SaveMode.Overwrite)
          .partitionBy("__bucket").parquet(tablePath)
        finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
      } finally if (!bootstrap) graft.llm.Dedup.releaseCheckpoint(merged)
      if (bootstrap) {
        val outStream = fs.create(metaPath, true)
        try outStream.write(s"$effBuckets\n".getBytes("UTF-8"))
        finally outStream.close()
      }
    } finally newVersions.unpersist()
  }

  /** The dimension's rows without the routing column. */
  def readTable(s: org.apache.spark.sql.SparkSession,
      tablePath: String): DataFrame =
    s.read.parquet(tablePath).drop("__bucket")
}
