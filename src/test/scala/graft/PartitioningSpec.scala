package graft

import org.apache.spark.sql.functions._
import graft.ops.Partitioning

/** Bucketed co-located joins (no Exchange) and salted-join
  * correctness.
  */
class PartitioningSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchange") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Partitioning.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Partitioning.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)
    // force the sort-merge path (auto-broadcast would win on test-size
    // tables and hide the bucket co-location we're asserting)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      assert(Partitioning.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString)
      // and it still returns the right rows
      val plain = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("salted join returns exactly the plain join's rows") {
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val salted = Partitioning.saltedJoin(l, o, "l_orderkey", "l_linenumber", 4)
    val plain = l.join(o, "l_orderkey")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("l_quantity")).head.getDouble(0)
      == plain.agg(sum("l_quantity")).head.getDouble(0))
  }
}
