package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB posture: bucketing for
  * shuffle-free co-located joins, and salting for skewed keys.
  */
object Partitioning {

  /** Writes a table bucketed (and sorted) by the join key. Two tables
    * bucketed the same way join with ZERO exchange — the join becomes
    * a per-bucket sort-merge, the layout every repeatedly-joined
    * 100 TB fact table should have.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    dropManaged(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Drops a managed table AND its warehouse directory. `DROP TABLE IF
    * EXISTS` alone is a no-op in a fresh JVM (the default catalog is
    * in-memory), but the previous JVM's directory persists on disk and
    * blocks the next managed-table creation with
    * LOCATION_ALREADY_EXISTS — every managed-table writer must clear
    * both.
    */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  /** True iff the physical plan of `df` contains no SHUFFLE exchange —
    * the assertion that a bucketed join is actually co-located.
    * (BroadcastExchange is not a shuffle and doesn't count.)
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("ShuffleExchange")

  /** Compacted write targeting a file size: partition count =
    * ceil(optimizer size estimate / targetBytes), floor 1. The cure
    * for the small-files problem — a filtered 100 TB table naively
    * written keeps its pre-filter partition count and emits thousands
    * of KB-scale files that poison every later scan's task scheduling.
    * Uses the cost-based estimate (no extra job); exact-size needs are
    * better served by adaptive `spark.sql.files.maxRecordsPerFile`.
    */
  def writeCompacted(df: DataFrame, path: String,
      targetBytes: Long = 128L << 20): Unit = {
    // Clamp in BigInt space BEFORE narrowing: when plan stats are
    // unavailable the estimate is defaultSizeInBytes (Long.MaxValue),
    // and a naive .toInt truncates that to -1 — collapsing the write
    // to ONE giant partition, the exact failure this helper prevents.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxParts = BigInt(df.sparkSession.sparkContext.defaultParallelism * 64)
    val parts = ((bytes + targetBytes - 1) / targetBytes)
      .min(maxParts).max(1).toInt
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Hive-style partitioned layout: one directory per distinct value
    * of `cols`. The foundation of partition pruning at 100 TB — a
    * filter on the partition column skips whole directories at
    * PLANNING time (static pruning), and a join against a filtered
    * dimension skips them at RUNTIME (dynamic partition pruning) —
    * either way the pruned data is never listed, opened, or read.
    * Partition columns must be low-cardinality (date, type, source);
    * high-cardinality keys belong in [[writeBucketed]] buckets instead.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Range-clustered, sorted-within-file parquet layout — the
    * data-skipping write. `repartitionByRange` gives each output file
    * a disjoint key range, and the within-partition sort tightens
    * every parquet row group's min/max footer stats; a later range
    * filter then prunes whole row groups (and effectively whole files)
    * inside the reader instead of scanning them. On an unsorted layout
    * the same filter touches every row group because each one's
    * [min, max] spans the whole domain. This is the layout for the
    * one-or-two columns a 100 TB table is most often range-filtered on
    * (event time, score thresholds).
    */
  def writeSorted(df: DataFrame, path: String, numFiles: Int,
      cols: String*): Unit =
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Morton (Z-order) key over `cols`: each column is coded into a
    * `bits`-bit equi-width bucket of its global [min, max], and the
    * codes' bits are interleaved so z-adjacent rows are close in EVERY
    * clustering dimension at once. Runs one tiny min/max agg job, then
    * the key itself is pure shift/and/add arithmetic — fully codegen,
    * no UDF. Equi-width codes are the right default for roughly
    * uniform keys (ids, timestamps); heavily skewed columns should be
    * pre-transformed (e.g. log) before clustering. Nulls and constant
    * columns code to 0.
    */
  def zOrderKey(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one clustering column")
    require(bits * cols.size <= 62,
      s"bits($bits) * cols(${cols.size}) must fit a signed long")
    val n = 1 << bits
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val codes = cols.zipWithIndex.map { case (c, i) =>
      if (row.isNullAt(2 * i) || row.getDouble(2 * i) >= row.getDouble(2 * i + 1))
        lit(0L)
      else {
        val (lo, hi) = (row.getDouble(2 * i), row.getDouble(2 * i + 1))
        // width_bucket yields 1..n in range (0 / n+1 outside); shift
        // to 0-based and clamp so max lands in the top bucket
        val b = width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(n))
        coalesce(least(greatest(b - 1, lit(0L)), lit((n - 1).toLong)), lit(0L))
      }
    }
    (for { b <- 0 until bits; i <- codes.indices } yield
      shiftleft(shiftright(codes(i), b).bitwiseAND(lit(1L)),
        b * codes.size + i)).reduce(_ + _)
  }

  /** Z-order-clustered parquet layout — [[writeSorted]] for MORE THAN
    * ONE filter column. Range-partitioning on the interleaved key
    * gives each file a z-contiguous region, i.e. a tight hyper-
    * rectangle in every clustering dimension, so each file's parquet
    * min/max footer stats are narrow on ALL of `cols` and a
    * multi-dimensional box filter prunes row groups on every
    * dimension at once. A 1-D sorted layout only ever prunes on its
    * leading column; at 100 TB this is the layout for tables filtered
    * on 2-3 independent columns (time × tenant, key × score). The key
    * is dropped before the write — it exists only to place rows.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
      cols: Seq[String], bits: Int = 8): Unit =
    df.withColumn("_z", zOrderKey(df, cols, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Writes a FILE-LEVEL min/max manifest for `cols` of a parquet
    * table — the Iceberg/Delta zone-map posture: one row per data
    * file with each column's [min, max]. Parquet footers already
    * carry these stats, but the reader must OPEN every file to see
    * them; the manifest lifts them into one tiny table consulted at
    * PLANNING time, so a range filter never lists, opens, or
    * schedules the files it excludes. Composes with [[writeSorted]] /
    * [[writeZOrdered]], whose layouts are what make per-file ranges
    * tight (an unsorted layout's manifest prunes nothing — every
    * file spans the domain).
    */
  def writeManifest(spark: SparkSession, path: String,
      manifestPath: String, cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(manifestPath)
  }

  /** Reads only the files whose manifest ranges intersect every
    * `(column, lo, hi)` bound — planning-time file pruning — then
    * applies the exact predicate to the surviving rows, so the result
    * equals the full-scan filter by construction (a manifest range
    * check can only over-admit, never exclude a matching row's file).
    * The driver materializes the pruned FILE LIST (pruning metadata,
    * like bucket-id lists — bounded by file count, never data).
    */
  def manifestPrunedRead(spark: SparkSession, path: String,
      manifestPath: String, bounds: Seq[(String, Column, Column)]): DataFrame = {
    val admitted = bounds.map { case (c, lo, hi) =>
      col(s"${c}_min") <= hi && col(s"${c}_max") >= lo
    }.reduce(_ && _)
    val files = spark.read.parquet(manifestPath)
      .filter(admitted).select("file")
      .collect().map(_.getString(0))
    val exact = bounds.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(path).filter(exact).limit(0)
    else spark.read.parquet(files: _*).filter(exact)
  }

  /** Rows the parquet reader actually decoded for `df`'s scan (the
    * scan operator's numOutputRows after row-group/page pruning) —
    * the observable that proves a data-skipping layout works.
    *
    * AQE-wrapped plans are unwrapped: `AdaptiveSparkPlanExec` is a
    * LEAF node to `collect`, so a naive traversal over a query with an
    * exchange/subquery finds no Scan and would silently report 0 —
    * falsely satisfying any `scanned <= bound` assertion. Throws if no
    * scan with the metric exists at all, for the same reason.
    */
  def scannedRows(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def scanMetrics(p: SparkPlan): Seq[Long] = p match {
      case a: AdaptiveSparkPlanExec => scanMetrics(a.executedPlan)
      // materialized AQE stages are leaves too; the scan lives inside
      case q: QueryStageExec => scanMetrics(q.plan)
      case _ =>
        val here =
          if (p.nodeName.contains("Scan"))
            p.metrics.get("numOutputRows").map(_.value).toSeq
          else Seq.empty
        here ++ p.children.flatMap(scanMetrics)
    }
    val found = scanMetrics(df.queryExecution.executedPlan)
    require(found.nonEmpty, "no Scan node with a numOutputRows metric found")
    found.sum
  }

  /** Salted join for skewed keys: the skewed (large) side gets a
    * deterministic salt in [0, salts) derived from a high-cardinality
    * disambiguator column; the small side is exploded ×salts so every
    * (key, salt) bucket still matches. Turns one hot key's single
    * reducer into `salts` reducers at the cost of replicating the
    * small side. (AQE's skew-join split handles moderate skew
    * automatically; salting is the explicit form for extreme keys.)
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      disambiguator: String, salts: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(col(disambiguator)), lit(salts)).cast("int"))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
