package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinApi
import graft.queries.Extended

/** Native as-of join (logical node → strategy → sort-merge exec):
  * micro-semantics on constructed frames, equivalence with the
  * composed q30 window form, and the plan shape that justifies the
  * operator.
  */
class AsOfJoinSpec extends SparkSpec {

  private def asof(lRows: Seq[(Long, Long, Long)],
      rRows: Seq[(Long, Long, Long)]): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = lRows.toDF("id", "k", "t")
    val r = rRows.toDF("ok", "rk", "rt")
    AsOfJoinApi.asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .toMap
  }

  test("backward match: latest right row at-or-before each left time") {
    val got = asof(
      lRows = Seq((1L, 7L, 10L), (2L, 7L, 25L), (3L, 7L, 5L)),
      rRows = Seq((100L, 7L, 8L), (101L, 7L, 20L), (102L, 7L, 30L)))
    assert(got == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None))
  }

  test("equal times match (inclusive); ties take the greatest tiebreak") {
    val got = asof(
      lRows = Seq((1L, 7L, 10L)),
      rRows = Seq((100L, 7L, 10L), (105L, 7L, 10L), (90L, 7L, 9L)))
    assert(got == Map(1L -> Some(105L)))
  }

  test("keys never cross-match; unmatched keys yield nulls") {
    val got = asof(
      lRows = Seq((1L, 7L, 10L), (2L, 8L, 10L), (3L, 9L, 10L)),
      rRows = Seq((100L, 7L, 5L), (101L, 8L, 20L)))
    assert(got == Map(1L -> Some(100L), 2L -> None, 3L -> None))
  }

  test("null keys and null times never match, on either side") {
    import spark.implicits._
    val l = Seq[(Long, java.lang.Long, java.lang.Long)](
      (1L, 7L, 10L), (2L, null, 10L), (3L, 7L, null))
      .toDF("id", "k", "t")
    val r = Seq[(Long, java.lang.Long, java.lang.Long)](
      (100L, 7L, 5L), (999L, null, 1L), (998L, 7L, null))
      .toDF("ok", "rk", "rt")
    val got = AsOfJoinApi.asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .toMap
    assert(got == Map(1L -> Some(100L), 2L -> None, 3L -> None))
  }

  test("inner mode drops exactly the rows left-outer null-pads") {
    import spark.implicits._
    val lRows = Seq((1L, 7L, 10L), (2L, 7L, 3L), (3L, 8L, 10L), (4L, 9L, 1L))
    val rRows = Seq((100L, 7L, 8L), (101L, 8L, 5L), (102L, 9L, 50L))
    val l = lRows.toDF("id", "k", "t")
    val r = rRows.toDF("ok", "rk", "rt")
    val outer = AsOfJoinApi
      .asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"))
    val inner = AsOfJoinApi
      .asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"), joinType = "inner")
    assert(inner.collect().map(_.toSeq).toSet ==
      outer.filter(col("ok").isNotNull).collect().map(_.toSeq).toSet)
    // rows 2 (key 7 before any order) and 4 (key 9 before its only
    // order) are gone; matched rows carry identical payloads
    assert(inner.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // null left keys/times are unmatched, so inner drops them too
    val lNull = Seq[(Long, java.lang.Long, java.lang.Long)](
      (1L, 7L, 10L), (2L, null, 10L), (3L, 7L, null)).toDF("id", "k", "t")
    val gotNull = AsOfJoinApi
      .asofJoin(lNull, r, ("k", "rk"), ("t", "rt"), Seq("ok"),
        joinType = "inner")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotNull == Set(1L))
    intercept[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"),
        joinType = "full")
    }
  }

  private def asofFwd(lRows: Seq[(Long, Long, Long)],
      rRows: Seq[(Long, Long, Long)]): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = lRows.toDF("id", "k", "t")
    val r = rRows.toDF("ok", "rk", "rt")
    AsOfJoinApi.asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"),
        direction = "forward")
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .toMap
  }

  test("forward match: earliest right row at-or-after each left time; " +
      "ties take the smallest tiebreak") {
    val got = asofFwd(
      lRows = Seq((1L, 7L, 10L), (2L, 7L, 25L), (3L, 7L, 35L)),
      rRows = Seq((100L, 7L, 8L), (101L, 7L, 20L), (102L, 7L, 30L)))
    assert(got == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None))
    // equal right times compete on the SMALLEST key; inclusive match
    val ties = asofFwd(
      lRows = Seq((1L, 7L, 10L)),
      rRows = Seq((105L, 7L, 10L), (100L, 7L, 10L), (90L, 7L, 12L)))
    assert(ties == Map(1L -> Some(100L)))
    // several left rows may share one right match (head is peeked,
    // never consumed)
    val shared = asofFwd(
      lRows = Seq((1L, 7L, 1L), (2L, 7L, 2L), (3L, 7L, 3L)),
      rRows = Seq((100L, 7L, 5L)))
    assert(shared == Map(1L -> Some(100L), 2L -> Some(100L), 3L -> Some(100L)))
  }

  test("property: forward as-of equals a brute-force oracle on random " +
      "keys/times/ties, in both join types") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rowGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 99L), Gen.choose(0L, 3L), Gen.choose(0L, 9L)))
    val prop = Prop.forAll(rowGen, rowGen) { (lRows, rRows) =>
      val expect = lRows.map { case (id, k, t) =>
        val cands = rRows.filter(r => r._2 == k && r._3 >= t)
        (id, k, t) -> (if (cands.isEmpty) None
                       else Some(cands.minBy(r => (r._3, r._1))._1))
      }.toMap
      val l = lRows.toDF("id", "k", "t")
      val r = rRows.toDF("ok", "rk", "rt")
      val outer = AsOfJoinApi.asofJoin(l, r, ("k", "rk"), ("t", "rt"),
          Seq("ok"), direction = "forward")
        .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)) ->
          (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
      val inner = AsOfJoinApi.asofJoin(l, r, ("k", "rk"), ("t", "rt"),
          Seq("ok"), joinType = "inner", direction = "forward")
        .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)) ->
          Some(row.getLong(3))).toMap
      // duplicate (id,k,t) left rows collapse identically in map form
      outer == expect.map { case (k2, v) => k2 -> v } &&
        inner == expect.collect { case (k2, Some(v)) => k2 -> Some(v) }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("result is partitioning-independent (shuffle provisioned by Exec)") {
    import spark.implicits._
    val lRows = (0L until 500L).map(i => (i, i % 13, i % 37))
    val rRows = (0L until 300L).map(i => (i + 1000L, i % 13, i % 31))
    val expected = lRows.map { case (id, k, t) =>
      val cands = rRows.filter(r => r._2 == k && r._3 <= t)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._3, r._1))._1))
    }.toMap
    Seq(1, 7).foreach { parts =>
      val l = lRows.toDF("id", "k", "t").repartition(parts, col("id"))
      val r = rRows.toDF("ok", "rk", "rt").repartition(parts + 1, col("ok"))
      val got = AsOfJoinApi.asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"))
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(3)) None else Some(row.getLong(3))))
        .toMap
      assert(got == expected, s"at $parts input partitions")
    }
  }

  test("q42 equals q30: native operator matches the composed window form") {
    val q30 = Extended.queries("q30_asof_join")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val q42 = Extended.queries("q42_asof_native")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(q42 == q30)
    assert(q42.nonEmpty)
  }

  test("property: native as-of equals the window form on random keys/times/ties") {
    // the fixture-pinned q42 ≡ q30 test can't cover the tie-edge
    // space (equal times left≡right, equal right times competing on
    // tiebreak, unmatched keys); a generator with TINY key/time
    // domains forces all of them constantly
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    import spark.implicits._
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 99L), Gen.choose(0L, 3L), Gen.choose(0L, 9L)))
    val prop = Prop.forAll(rowGen, rowGen) { (lRows, rRows) =>
      val l = lRows.toDF("id", "k", "t")
      val r = rRows.toDF("ok", "rk", "rt")
      val native = AsOfJoinApi
        .asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"))
        .select("id", "k", "t", "ok")
        .collect().map(_.toSeq.map(Option(_))).sortBy(_.toString)
      // the q30 union-window idiom, generically: right rows sort
      // before left at equal times (inclusive match), running
      // last(ok) under (tt, side, ok) ordering IS the greatest
      // tiebreak of the latest time
      val o = r.select(col("rk").as("k"), col("rt").as("tt"),
        lit(0).as("side"), col("ok"),
        lit(null).cast(LongType).as("id"), lit(null).cast(LongType).as("t"))
      val e = l.select(col("k"), col("t").as("tt"), lit(1).as("side"),
        lit(null).cast(LongType).as("ok"), col("id"), col("t"))
      val w = Window.partitionBy("k")
        .orderBy(col("tt"), col("side"), col("ok"), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val windowed = o.union(e)
        .withColumn("last", last(col("ok"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("id"), col("k"), col("t"), col("last"))
        .collect().map(_.toSeq.map(Option(_))).sortBy(_.toString)
      native.sameElements(windowed)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("c10 composed pipeline plans the native as-of node, no window") {
    // the operator must be exercised by the composed curation query,
    // not only its dedicated q42 — and via the custom exec, not a
    // window rewrite the optimizer could silently fall back to
    val qe = graft.llm.Curation
      .queries("c10_enrich_asof")(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    // the enrichment itself must not be a window rewrite: no Window
    // may print above the AsOfJoin node (the curation SUBTREE below
    // it legitimately windows for its fp dedup)
    assert(!plan.substring(0, plan.indexOf("AsOfJoin")).contains("Window"),
      "a Window sits above the native as-of node")
  }

  test("a key-bucketed right side as-of joins with no exchange on that side") {
    import spark.implicits._
    val lRows = (0L until 400L).map(i => (i, i % 11, i % 29))
    val rRows = (0L until 250L).map(i => (i + 500L, i % 11, i % 23))
    graft.ops.Partitioning.writeBucketed(
      rRows.toDF("ok", "rk", "rt"), "asof_right_b", "rk", 4)
    val l = lRows.toDF("id", "k", "t")
    val bucketed = AsOfJoinApi.asofJoin(l, spark.table("asof_right_b"),
      ("k", "rk"), ("t", "rt"), Seq("ok"))
    val plan = bucketed.queryExecution.executedPlan.toString
    // exactly ONE hash exchange: the left side routing to the right
    // side's bucket layout — the claim the q42 scaladoc makes for
    // pre-bucketed storage (impossible for the union+window form,
    // whose shuffle key is synthetic)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    // and the layout changes the plan only, not the relation
    val plain = AsOfJoinApi.asofJoin(l, rRows.toDF("ok", "rk", "rt"),
      ("k", "rk"), ("t", "rt"), Seq("ok"))
    assert(bucketed.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("left-side filters push through the custom node to the scan") {
    // without PushFilterThroughAsOfJoin, Catalyst stops at the unknown
    // binary node and the whole left table feeds the merge
    val base = Extended.queries("q42_asof_native")(spark, sfDir)
    val filtered = base.filter(col("user_id") < 100)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the Filter must sit BELOW AsOfJoin in the optimized plan
    // (printed after it), not above
    val joinAt = optimized.indexOf("AsOfJoin")
    val filterAt = optimized.indexOf("Filter")
    assert(joinAt >= 0 && filterAt > joinAt,
      s"filter not pushed below the as-of join:\n$optimized")
    // and it reaches the parquet scan as a pushed data filter
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out) { filtered.explain("formatted") }
    val pushed = out.toString.linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("LessThan(user_id,100)"), pushed)
    // semantics unchanged by the move
    val expected = base.collect().map(_.toSeq)
      .filter(r => r(1) != null && r(1).asInstanceOf[Long] < 100).toSet
    assert(filtered.collect().map(_.toSeq).toSet == expected)
  }

  test("right-referencing and nondeterministic predicates stay above") {
    import spark.implicits._
    val l = Seq((1L, 7L, 10L), (2L, 7L, 25L)).toDF("id", "k", "t")
    val r = Seq((100L, 7L, 8L), (101L, 7L, 20L)).toDF("ok", "rk", "rt")
    val joined = AsOfJoinApi.asofJoin(l, r, ("k", "rk"), ("t", "rt"), Seq("ok"))
    // mixed conjunction: the left conjunct moves, the right one stays
    val mixed = joined.filter(col("id") >= 1 && col("ok") === 101L)
    assert(mixed.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val opt = mixed.queryExecution.optimizedPlan.toString
    val joinAt = opt.indexOf("AsOfJoin")
    assert(opt.take(joinAt).contains("Filter"),
      s"right-side conjunct must remain above the join:\n$opt")
    // nondeterministic predicates never move (rand() below the join
    // would be evaluated under a different row stream)
    val nd = joined.filter(col("id") >= 0 && rand(7) >= 0)
    val ndOpt = nd.queryExecution.optimizedPlan.toString
    assert(!ndOpt.substring(ndOpt.indexOf("AsOfJoin")).contains("rand"),
      s"nondeterministic predicate pushed below the join:\n$ndOpt")
  }

  test("q42 plans through AsOfJoinExec with no Window stage") {
    val plan = Extended.queries("q42_asof_native")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Window"))
  }
}
