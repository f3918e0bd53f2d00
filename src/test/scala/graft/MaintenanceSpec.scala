package graft

import org.apache.spark.sql.functions._
import graft.ops.Maintenance

/** Behavioral tests for the table-maintenance operators: MERGE
  * semantics, erasure, snapshot diff labeling, algebraic agg merge,
  * and the salted join's skew spreading (the part the DuckDB oracle
  * can't see — q53 only proves result invariance).
  */
class MaintenanceSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "name", "v")
  }

  test("upsertByKey: updates win on collision, new keys insert, rest pass") {
    val base = df(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    val upd = df(Seq((2L, "b2", 21L), (9L, "i", 90L)))
    val got = Maintenance.upsertByKey(base, upd, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a", 10L), (2L, "b2", 21L), (3L, "c", 30L),
      (9L, "i", 90L)))
  }

  test("deleteByKeys: exactly the victim keys vanish") {
    val base = df(Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)))
    import spark.implicits._
    val victims = Seq(2L, 7L).toDF("id")
    val got = Maintenance.deleteByKeys(base, victims, Seq("id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("snapshotDiff labels added/removed/changed and suppresses unchanged") {
    val v1 = df(Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)))
    val v2 = df(Seq((1L, "a", 1L), (2L, "b", 99L), (4L, "d", 4L)))
    val got = Maintenance.snapshotDiff(v1, v2, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("snapshotDiff sees a value MOVING between columns through a NULL " +
      "— no cross-column hash aliasing") {
    import spark.implicits._
    // (x, NULL) → (NULL, x): a separator-joined concat hashes both to
    // 'x' and would label this unchanged
    val v1 = Seq((1L, Some("x"), None: Option[String]),
      (2L, Some(""), Some("y"))).toDF("id", "a", "b")
    val v2 = Seq((1L, None: Option[String], Some("x")),
      (2L, None: Option[String], Some("y"))).toDF("id", "a", "b")
    val got = Maintenance.snapshotDiff(v1, v2, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // row 2 also changes: empty string → NULL must not alias either
    assert(got == Set((1L, "changed"), (2L, "changed")))
  }

  test("incremental agg merge equals a from-scratch aggregate on any split") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val full = Maintenance.sourceStats(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    Seq(3L, 10L).foreach { m =>
      val merged = Maintenance.incrementalSourceStats(
          docs.filter(col("doc_id") % m =!= 0),
          docs.filter(col("doc_id") % m === 0))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(merged == full, s"merge identity failed for split mod $m")
    }
  }

  test("property: upsert/diff algebra on random tables — updates win, " +
      "diff(base, upsert(base, u)) labels exactly u's effect, " +
      "delete erases exactly the victims") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 99L)))
    val prop = Prop.forAll(rowGen, rowGen) { (baseRows, updRows) =>
      // distinct keys per table (keyed-table contract)
      val base = baseRows.distinctBy(_._1)
      val upd = updRows.distinctBy(_._1)
      val baseDf = base.toDF("id", "v")
      val updDf = upd.toDF("id", "v")
      val merged = Maintenance.upsertByKey(baseDf, updDf, Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = base.toMap ++ upd.toMap
      val diff = Maintenance.snapshotDiff(baseDf, merged.toSeq.toDF("id", "v"),
          Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val wantDiff = (
        upd.toMap.keySet.filterNot(base.toMap.contains).map(_ -> "added") ++
        upd.collect { case (k, v)
          if base.toMap.get(k).exists(_ != v) => k -> "changed" }).toMap
      val victims = base.take(5).map(_._1)
      val afterDelete = Maintenance.deleteByKeys(baseDf,
          victims.toDF("id"), Seq("id"))
        .collect().map(_.getLong(0)).toSet
      merged == want && diff == wantDiff &&
        afterDelete == base.map(_._1).toSet.diff(victims.toSet)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("scdType2: per-key intervals chain gaplessly, exactly one current " +
      "version, as-of lookup at any probe time returns the then-valid row") {
    val ev = graft.core.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
    val got = Maintenance.scdType2(ev, Seq("user_id"), "ts", Seq("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getInt(5)))
    val byUser = got.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._4.getTime, r._3))
      // exactly one open (current) interval per key — the last
      assert(sorted.count(_._5.isEmpty) == 1, s"user $u current count")
      assert(sorted.last._5.isEmpty && sorted.last._6 == 1)
      // each interval closes at the next one's start (gapless chain)
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._5.contains(b._4),
          s"user $u: interval of ${a._3} does not close at ${b._3}'s start")
      }
      // as-of probe: the row valid at a mid-chain instant is the one
      // whose interval contains it
      if (sorted.length >= 2) {
        val probe = sorted(sorted.length / 2)._4
        val valid = sorted.filter(r =>
          !r._4.after(probe) && r._5.forall(_.after(probe)))
        assert(valid.nonEmpty, s"user $u: no interval covers $probe")
      }
    }
  }

  test("property: scdType2 equals the brute-force per-key chain on random " +
      "keys/timestamps/ties") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rowGen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 7L),
      Gen.choose(0L, 9L), Gen.choose(0L, 99L)))
    val prop = Prop.forAll(rowGen) { rows0 =>
      // distinct (key, ts, tie) triples: duplicate full sort keys make
      // lead() order among them arbitrary BY CONTRACT (tie columns
      // must discriminate), so the generator dedups them
      val rows = rows0.distinctBy(r => (r._1, r._2, r._3))
      val got = Maintenance.scdType2(
          rows.toDF("k", "t", "tb"), Seq("k"), "t", Seq("tb"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5)))
        .toSet
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, ks) =>
        val sorted = ks.sortBy(r => (r._2, r._3))
        sorted.zip(sorted.drop(1).map(Some(_)) :+ None).map {
          case ((k, t, tb), next) =>
            (k, t, tb, next.map(_._2), if (next.isEmpty) 1 else 0)
        }
      }.toSet
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("q62 delta-join maintenance: three terms equal the full join; " +
      "dropping the delta-delta corner loses rows on this fixture") {
    import org.apache.spark.sql.functions._
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("o_custkey"))
    val oOld = o.filter(col("o_orderkey") % 10 =!= 0)
    val oNew = o.filter(col("o_orderkey") % 10 === 0)
    val cOld = c.filter(col("o_custkey") % 7 =!= 0)
    val cNew = c.filter(col("o_custkey") % 7 === 0)
    val full = o.join(c, "o_custkey").count()
    val threeTerm = oOld.join(cOld, "o_custkey")
      .unionByName(oNew.join(cOld, "o_custkey"))
      .unionByName(oOld.join(cNew, "o_custkey"))
      .unionByName(oNew.join(cNew, "o_custkey")).count()
    val twoTerm = oOld.join(cOld, "o_custkey")
      .unionByName(oNew.join(cOld, "o_custkey"))
      .unionByName(oOld.join(cNew, "o_custkey")).count()
    assert(threeTerm == full, s"decomposition lost rows: $threeTerm vs $full")
    // the corner matters: some new order belongs to a new customer, so
    // the naive two-term maintenance silently under-counts
    assert(twoTerm < full,
      s"fixture has no delta-delta matches — corner-term claim untested")
  }

  test("skew handling measured: AQE skew-join split vs explicit salting " +
      "on the hot-key fixture") {
    // Completes the "when to salt" story the q53 scaladoc tells with
    // NUMBERS: the same skewed join run three ways — AQE's runtime
    // skew split (thresholds lowered so it fires at test scale), the
    // unprotected sort-merge join, and the explicit salt. Correctness
    // is asserted (equal counts; the AQE plan really split); the
    // wall-times are reported via info() and recorded in the q53 doc,
    // not asserted — timing on a shared box is evidence, not a gate.
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val n = 2000000L
    // 95% of facts on ONE key; the rest match distinct dim keys
    val fact = spark.range(n)
      .select(when(col("id") % 20 < 19, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = spark.range(19, n, 20).select(col("id").as("k"))
      .union(Seq(1L).toDF("k"))
      .withColumn("attr", concat(lit("d"), col("k")))
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val c = f
      (c, (System.nanoTime() - t0) / 1e9)
    }
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // -- AQE skew split
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      val aqeDf = fact.join(dim, "k")
      val qe = aqeDf.queryExecution
      val (cAqe, tAqe) = timed {
        qe.toRdd.count() // execute THIS QueryExecution so AQE finalizes
      }
      val finalPlan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not fire:\n$finalPlan")
      // -- unprotected sort-merge join
      conf.set("spark.sql.adaptive.enabled", "false")
      val (cPlain, tPlain) = timed(fact.join(dim, "k").count())
      // -- explicit salt (AQE still off: salting is the form for
      // engines/modes without runtime re-planning)
      val (cSalt, tSalt) = timed(
        Maintenance.saltedJoin(fact, dim, "k", 8).count())
      assert(cAqe == cPlain && cSalt == cPlain && cPlain == n,
        s"row counts diverged: aqe=$cAqe plain=$cPlain salted=$cSalt")
      info(f"hot-key join (${n / 1000000}M facts, 95%% one key, local[4]): " +
        f"aqe-skew $tAqe%.2f s, unprotected $tPlain%.2f s, salted $tSalt%.2f s")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltedJoin: result equals the plain join and the hot key spreads " +
      "over multiple reduce partitions") {
    import spark.implicits._
    // 10k facts, 90% on ONE key — the shape that stalls a plain
    // shuffle join on its hot partition
    val fact = spark.range(10000)
      .select((when(col("id") % 10 < 9, 1L).otherwise(col("id")))
        .as("k"), col("id").as("payload"))
    val dim = (1L +: (10L to 9999L by 10).toSeq).map(k => (k, s"d$k"))
      .toDF("k", "attr")
    val plain = fact.join(dim, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Maintenance.saltedJoin(fact, dim, "k", 8)
    assert(salted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet == plain)
    // spreading: force a shuffle join (no broadcast, no AQE skew
    // rescue) and count reduce partitions holding the hot key
    val conf = spark.conf
    val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      def hotParts(j: org.apache.spark.sql.DataFrame): Long =
        j.filter(col("k") === 1L)
          .select(spark_partition_id().as("pid"))
          .distinct().count()
      val unsalted = hotParts(fact.join(dim, "k"))
      val spread = hotParts(Maintenance.saltedJoin(fact, dim, "k", 8))
      assert(unsalted == 1L, s"plain join should confine the hot key, got $unsalted")
      assert(spread > 1L, s"salted join should spread the hot key, got $spread")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }
}
