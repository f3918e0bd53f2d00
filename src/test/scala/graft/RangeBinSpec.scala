package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoinApi

/** The automatic range-join binning rule: rewrite fires on marked
  * interval joins (plan becomes an equi-join), never changes results,
  * and degrades to the stock plan when the join shape is unsuitable.
  */
class RangeBinSpec extends SparkSpec {

  private def tiers = {
    import spark.implicits._
    (0L until 5L).map(t => (t, t * 100000.0, (t + 1) * 100000.0))
      .toDF("tier", "lo", "hi")
  }

  private def orders =
    graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))

  test("marked interval join plans as an equi-join and matches the " +
      "unmarked result") {
    val plain = orders.join(tiers,
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .select("o_orderkey", "tier")
    val binned = orders.join(RangeJoinApi.markBinned(tiers, 50000.0),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .select("o_orderkey", "tier")
    val p = binned.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"rewrite did not fire — nested-loop survived:\n$p")
    assert(p.contains("__graft_bin"), "bin key missing from the plan")
    val stock = plain.queryExecution.executedPlan.toString
    assert(stock.contains("BroadcastNestedLoopJoin"),
      "fixture no longer exercises the nested-loop baseline")
    assert(binned.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("property: binned equals plain on random intervals incl. empty, " +
      "inverted and null bounds, in both argument orders") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val ptsGen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 999L),
      Gen.choose(-50.0, 150.0)))
    val ivGen = Gen.listOfN(15, Gen.zip(Gen.choose(0L, 99L),
      Gen.option(Gen.choose(-40.0, 140.0)), Gen.option(Gen.choose(-40.0, 140.0))))
    val prop = Prop.forAll(ptsGen, ivGen) { (pts, ivs) =>
      val p = pts.toDF("pid", "x")
      val iv = ivs.toDF("iid", "lo", "hi")
      val cond = col("x") >= col("lo") && col("x") < col("hi")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("pid", "iid").collect().map(_.toSeq).toSet
      val expect = rows(p.join(iv, cond))
      rows(p.join(RangeJoinApi.markBinned(iv, 13.0), cond)) == expect &&
        // marker on the LEFT argument of the join
        rows(RangeJoinApi.markBinned(iv, 13.0).join(p, cond)) == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("a join stacked ABOVE a marked range join neither consumes nor " +
      "strips the inner marker — the inner join still rewrites") {
    import spark.implicits._
    val labels = (0L until 5L).map(t => (t, s"tier$t")).toDF("tier2", "name")
    val stacked = orders
      .join(RangeJoinApi.markBinned(tiers, 50000.0),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .join(labels, col("tier") === col("tier2"))
      .select("o_orderkey", "tier", "name")
    val p = stacked.queryExecution.executedPlan.toString
    assert(p.contains("__graft_bin"),
      s"inner marked join lost its rewrite under a stacked join:\n$p")
    val plain = orders
      .join(tiers,
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .join(labels, col("tier") === col("tier2"))
      .select("o_orderkey", "tier", "name")
    assert(stacked.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("unsuitable shapes degrade to the stock plan: extra conjunct, " +
      "non-inner type, marker without a join") {
    import spark.implicits._
    val iv = tiers
    // extra equi conjunct → rule must strip the marker and leave the
    // join alone (3 conjuncts); results still correct
    val lk = orders.withColumn("k", col("o_orderkey") % 5)
    val rk = iv.withColumn("k2", col("tier"))
    val cond3 = col("k") === col("k2") &&
      col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi")
    val extra = lk.join(RangeJoinApi.markBinned(rk, 50000.0), cond3)
    assert(!extra.queryExecution.optimizedPlan.toString.contains("RangeBinHint"))
    assert(extra.count() == lk.join(rk, cond3).count())
    // left-outer join type → untouched
    val outer = orders.join(RangeJoinApi.markBinned(iv, 50000.0),
      col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"),
      "left")
    assert(!outer.queryExecution.optimizedPlan.toString.contains("RangeBinHint"))
    assert(outer.count() == orders.join(iv,
      col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"),
      "left").count())
    // marker with no join above it at all → stripped, plan executes
    assert(RangeJoinApi.markBinned(iv, 10.0).count() == iv.count())
  }
}
