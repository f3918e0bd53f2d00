package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory (SURVEY §7.1 core/Session).
  *
  * Defaults match the driver contract: UTC session timezone, AQE on,
  * shuffle partitions pinned to the local core count (32 partitions on
  * local[32], NOT the 200 default — at cluster scale this becomes a
  * per-job setting sized to input volume), and the nanos-as-long
  * legacy flag required to scan events.parquet (timestamp[ns]).
  *
  * `spark.sql.extensions` installs [[graft.functions.GraftExtensions]]
  * so every session — including pure-SQL users — has `vec_dot` from
  * construction, no programmatic register call needed.
  */
object Session {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
}
