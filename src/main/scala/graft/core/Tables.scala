package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Parquet star-schema table access (FIXTURES.md §A).
  *
  * All engine queries read the driver-provided parquet directly —
  * explicit-path reads keep partition pruning and column pruning in
  * Catalyst's hands (scan → `PushedFilters`/`ReadSchema` visible in
  * `.explain("formatted")`).
  *
  * At 100 TB these would be partitioned/bucketed parquet directories
  * rather than single files; the read path is identical
  * (`spark.read.parquet(dir)` takes directories), so nothing here
  * changes at cluster scale.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet timestamp[ns], readable only via
    // spark.sql.legacy.parquet.nanosAsLong (set in every session
    // factory here). Convert to a proper microsecond timestamp so
    // downstream ops see TimestampType; oracle queries derive only
    // second-or-coarser values from it, so ns-vs-µs precision never
    // reaches a compared result. Integer `div` keeps the truncation
    // exact for any ns value (double division rounds ulp-close cases).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", nsToMicros(F.col("ts")))
    // timezone-naive parquet timestamps (timestamp[us] without
    // isAdjustedToUTC — what pandas writes by default) load as
    // TimestampNTZType; reinterpret in the session timezone (pinned
    // UTC in every session factory) so the contract above holds for
    // either writer flavor and downstream ops always see TimestampType
    else if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts",
        F.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    else df
  }

  /** Long nanoseconds → microsecond timestamp via integer `div`
    * (IntegralDivide): exact for every representable ns value, where
    * double division loses ulps past 2^53 (≈ epoch + 104 days in ns).
    */
  def nsToMicros(c: Column): Column =
    F.timestamp_micros(F.call_function("div", c, F.lit(1000L)))

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
