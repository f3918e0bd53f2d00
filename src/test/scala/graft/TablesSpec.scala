package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Core table-access invariants. */
class TablesSpec extends SparkSpec {

  test("nsToMicros is integer-exact for ns values past the double mantissa") {
    import spark.implicits._
    // 2025-01-01T00:00:00 + 1 ns and - 1 ns: truncation must land exactly
    // on / just before the second boundary. Both values exceed 2^53, where
    // double division can no longer represent the quotient exactly.
    val secs = 1735689600L
    val ns = Seq(secs * 1000000000L + 1L, secs * 1000000000L - 1L)
    val out = ns.toDF("ts")
      .select(unix_micros(Tables.nsToMicros(col("ts"))).as("us"))
      .collect().map(_.getLong(0))
    assert(out(0) == secs * 1000000L)      // +1 ns truncates down to the boundary
    assert(out(1) == secs * 1000000L - 1L) // -1 ns lands one µs before it
  }

  test("events table loads with microsecond timestamps") {
    val df = Tables.load(spark, sfDir, "events")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(df.count() > 0)
  }
}
