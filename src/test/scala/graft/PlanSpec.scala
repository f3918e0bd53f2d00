package graft

import graft.queries.{Extended, Relational}
import graft.llm.{Dedup, Similarity}

/** Physical-plan assertions — the 100 TB posture checks (SURVEY §4.2):
  * filters and projections must reach the parquet scan, small join
  * sides must broadcast, aggregates must partial-aggregate, and
  * nothing may plan a cartesian product.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }
  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out) { df.explain("formatted") }
    out.toString
  }

  test("q1: predicate pushdown and column pruning reach the scan") {
    val f = formatted(Relational.q1FilterProject(spark, sfDir))
    assert(f.contains("PushedFilters"), f)
    assert(f.contains("l_returnflag"), "filter not pushed")
    // pruned read schema: only the 5 referenced columns, not all 11
    val readSchema = f.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_suppkey"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("q12: dimension side broadcasts; no cartesian product") {
    val p = plan(Relational.q12Join(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q28: star join broadcasts all three dims") {
    val p = plan(Extended.q28StarJoin(spark, sfDir))
    assert(p.split("BroadcastHashJoin").length >= 4,
      "expected >=3 broadcast joins in the star shape")
    assert(!p.contains("CartesianProduct"))
  }

  test("q43: binned range join is an equi-join, result identical to q37") {
    val p = plan(Extended.q43RangeJoinBinned(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "binning must remove the nested-loop/cartesian range probe")
    assert(p.contains("bin"), p)
    val q37 = Extended.queries("q37_range_join")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val q43 = Extended.queries("q43_range_join_binned")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(q43 == q37)
  }

  test("q6: aggregate is partial (map-side combine before shuffle)") {
    val p = plan(Relational.q6GroupCount(spark, sfDir))
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert(p.split("HashAggregate").length >= 3, "no two-phase aggregate")
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    // codegen'd operators carry the "*(stageId)" marker in simpleString
    val p = plan(Relational.q4CastRange(spark, sfDir))
    assert(p.contains("*(1) Filter") && p.contains("*(1) Project"), p)
  }

  test("LSH candidates: equi-join/bucket shuffle only, no cartesian") {
    val p = plan(Dedup.minhashCandidates(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("embed dup pairs: hash join on the cell key, no cartesian") {
    val p = plan(Similarity.embedDupPairs(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("c1 curation: one scan, one exchange (fp dedup window), no join") {
    val p = plan(graft.llm.Curation.curate(spark, sfDir))
    assert(p.split("Exchange hashpartitioning").length == 2,
      s"expected exactly one hash exchange:\n$p")
    assert(p.split("Scan parquet").length == 2, "documents scanned more than once")
    assert(!p.contains("Join"), "curation must not plan a join")
  }

  test("s5 quantize: pure narrow projection, no exchange") {
    val p = plan(Similarity.quantizeInt8(spark, sfDir))
    assert(!p.contains("Exchange"), s"quantization must not shuffle:\n$p")
  }

  test("q54 pagerank: rank mass is conserved each pass, floor holds, " +
      "and the iterations plan equi-joins only") {
    val df = Extended.q54PageRank(spark, sfDir)
    assert(!plan(df).contains("CartesianProduct"))
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    // no dangling nodes (every node has out-edges), so total rank is
    // invariant: sum_new = 0.15·N + 0.85·sum_old = N from the 1.0 init
    val n = rows.length
    assert(math.abs(rows.map(_._2).sum - n) < 1e-3 * n,
      s"rank mass drifted: ${rows.map(_._2).sum} vs $n")
    // every rank carries at least the teleport floor
    assert(rows.forall(_._2 >= 0.15 - 1e-9))
    // both node families present (suppliers offset by 1e6)
    assert(rows.exists(_._1 >= 1000000L) && rows.exists(_._1 < 1000000L))
  }

  test("q48/q49 hash sampling: scan-side filter with no exchange; " +
      "selection identical under any repartitioning") {
    Seq(Extended.q48HashSample _, Extended.q49StratifiedHash _).foreach { q =>
      val df = q(spark, sfDir)
      assert(!plan(df).contains("Exchange"),
        s"hash sample must be a scan-side filter:\n${plan(df)}")
      // content-keyed selection — the property q11/q36's RNG forms
      // lack: each row's fate depends only on its own key, so the
      // kept set restricted to any subset equals the subset sampled
      // on its own (row independence ⇒ partitioning independence)
      val once = df.collect().map(_.toSeq).toSet
      assert(once.nonEmpty)
      val firstCol = df.columns.head
      val cut = df.agg(
        org.apache.spark.sql.functions.expr(s"approx_percentile($firstCol, 0.5)"))
        .collect()(0).get(0).toString.toDouble
      val sub = q(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col(firstCol) <= cut)
        .collect().map(_.toSeq).toSet
      assert(sub == once.filter(r =>
        r.head.asInstanceOf[Number].doubleValue <= cut),
        "subset sampling disagrees with restricted full sample")
    }
    // realized rates track the declared per-stratum thresholds
    val byStatus = Extended.q49StratifiedHash(spark, sfDir).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toDouble).toMap
    val totals = graft.core.Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    Map("O" -> 0.10, "F" -> 0.05, "P" -> 0.50).foreach { case (st, rate) =>
      val got = byStatus.getOrElse(st, 0.0) / totals(st)
      // binomial tolerance: 5 sigma at the smallest stratum size
      val tol = 5 * math.sqrt(rate * (1 - rate) / totals(st))
      assert(math.abs(got - rate) <= tol,
        s"stratum $st realized $got vs declared $rate (tol $tol)")
    }
  }

  test("c2 decontaminate: equi-join (broadcast or shuffle by size), no cartesian") {
    // no forced broadcast: AQE picks broadcast for a genuinely small
    // bench side and falls back to a shuffle join for a big one — both
    // are legitimate shapes, only a cartesian/nested-loop is not
    val p = plan(graft.llm.Curation.decontaminate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("d7 char-gram LSH: no cartesian, no nested-loop join") {
    val p = plan(SparkEntry.queries("d7_chargram_lsh")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q30 as-of join is a single shuffle (union + one window)") {
    val p = plan(Extended.q30AsofJoin(spark, sfDir))
    val shuffles = p.split("Exchange hashpartitioning").length - 1
    assert(shuffles == 1, s"expected exactly 1 shuffle, plan:\n$p")
    assert(!p.contains("Join"), "as-of must not plan a join")
  }

  test("knn brute: query side is the broadcast side") {
    val p = plan(Similarity.knnBrute(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "expected broadcast nested loop with tiny broadcast query set: " + p)
  }

  test("t8 tfidf: one corpus scan, df via window (no tf-df join), " +
      "corpus size broadcast, partial aggs") {
    val p = plan(graft.llm.TextAnalysis.tfidf(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    // df is a COUNT window over the tf rows — no join recomputing the
    // tf lineage; the only nested-loop join is the ONE-ROW corpus-size
    // broadcast, and only the corpus-size subtree re-scans the file
    assert(!p.contains("HashJoin") && !p.contains("SortMergeJoin"), p)
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1, p)
    assert(p.split("Scan parquet").length - 1 <= 2, p)
    // (doc,term) counts partial-aggregate before their exchange
    assert(p.contains("partial_count") || p.contains("partial count"), p)
  }

  test("shingle/simhash spread gates on actual splits: exchange only " +
      "for a narrow input, none for an already-parallel one") {
    import spark.implicits._
    val docs = (0 until 64).map(i => (i.toLong, s"alpha beta gamma $i"))
    // 1-split input (below defaultParallelism): the CPU-bound hash
    // work must spread, so ONE round-robin exchange appears
    val narrow = docs.toDF("doc_id", "text").coalesce(1)
    val pNarrow = plan(graft.llm.Dedup.simhashOf(narrow))
    assert(pNarrow.contains("RoundRobinPartitioning"), pNarrow)
    // already-parallel input (splits >= cores): the 100 TB shape —
    // NO exchange may carry the text column
    val cores = spark.sparkContext.defaultParallelism
    val wide = docs.toDF("doc_id", "text").repartition(cores * 2)
      .localCheckpoint(true)
    for (f <- Seq(
        graft.llm.Dedup.simhashOf _,
        graft.llm.Dedup.shingleSetsOf _,
        (d: org.apache.spark.sql.DataFrame) =>
          graft.llm.Dedup.charShingleHashesOf(d))) {
      val pw = plan(f(wide))
      assert(!pw.contains("RoundRobinPartitioning"),
        s"text-carrying spread exchange on a parallel input:\n$pw")
    }
  }

  test("q40 interval join: equi-join on user with range predicate, no cartesian") {
    val p = plan(graft.queries.Extended.q40IntervalJoin(spark, sfDir))
    // the user_id equality must be the join key (hash-partitionable at
    // any scale); the time range rides along as a join condition — a
    // cartesian or nested-loop plan would mean Spark lost the equi-key
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("Join"), p)
  }

  test("c4 pack: cumsum window partitioned by (source, bucket), offsets broadcast") {
    val p = plan(graft.llm.Curation.packShards(spark, sfDir))
    // the corpus-sized window must NOT partition by source alone — that
    // is one task per source, i.e. a single reducer sorting a dominant
    // source's entire data; the bucketed spec gives PackBuckets-way
    // parallelism within each source
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.exists(l => l.contains("source") && l.contains("bucket")),
      s"no (source,bucket)-partitioned window:\n$p")
    // the bucket key must be integral: a double key degenerates to one
    // bucket per doc and a corpus-sized offsets frame
    assert(!winLines.exists(_.contains("normalizenanandzero")),
      s"fractional bucket key:\n$p")
    // per-bucket offsets rejoin as a broadcast; the only nested-loop
    // joins are the ONE-ROW id-span broadcast (t8's corpus-size
    // pattern), which appears once under each of the two passes
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d9 dedup apply: anti-join, text column never read by the corpus scan") {
    val df = Dedup.dedupApply(spark, sfDir)
    val p = plan(df)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the surviving-corpus scan must prune to metadata; the drop-list
    // lineage is checkpointed (CC output), so any `text` in the final
    // plan would mean the anti-join is carrying document bodies
    assert(!p.contains("text"), s"text column leaked into the apply plan:\n$p")
  }

  test("q73: the bloom probe prunes the orders scan before the join") {
    val df = Extended.q73BloomJoin(spark, sfDir)
    val p = plan(df)
    // the probe must sit in a Filter on the fact side, not after the join
    assert(p.contains("bloom_might_contain"), p)
    val probeAt = p.indexOf("bloom_might_contain")
    val joinAt = p.indexOf("BroadcastHashJoin")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"probe above the join in the plan tree (probe@$probeAt join@$joinAt)")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q72: bounds broadcast back onto the row stream, no row-stream window") {
    val p = plan(Extended.q72Winsorize(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), s"clip must not window the row stream:\n$p")
  }

  test("d16: candidate stage is bucketed — no pair-enumerating join " +
      "anywhere in the plan") {
    val p = plan(Dedup.apssApprox(spark, sfDir))
    // the r11 shape was rv.join(broadcast(rv), da < db): an n²
    // enumeration planned as a nested-loop join. Banded candidates
    // come from groupBy(band) + in-bucket expansion, so the only joins
    // left are the exact-verify equi-joins.
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"`<`-only self-join (the n² candidate loop) is back:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("c17 length buckets: one scan, no window, no join — a single " +
      "two-phase aggregate keyed by the ~8-row bucket ladder") {
    val p = plan(graft.llm.Curation.lengthBuckets(spark, sfDir))
    assert(p.split("Scan parquet").length == 2, "documents scanned once")
    assert(!p.contains("Window"),
      s"c17 must not plan the low-cardinality bucket window:\n$p")
    assert(!p.contains("Join"), "c17 must not plan a join")
    assert(p.split("HashAggregate").length >= 3, "no two-phase aggregate")
  }

  test("s21 drift: partial aggregation collapses the posexplode before " +
      "the single 64-row exchange; no self-join on epoch") {
    val p = plan(Similarity.embeddingDrift(spark, sfDir))
    assert(!p.contains("Join"), s"epoch pivot must not plan a join:\n$p")
    assert(p.split("Exchange hashpartitioning").length == 2,
      s"expected exactly one hash exchange:\n$p")
    assert(p.split("HashAggregate").length >= 3, "no two-phase aggregate")
  }

  test("q57/q91 funnel: ONE events scan, no joins — the whole stage " +
      "chain is a single per-user pass") {
    // funnelUserTimes computes all three stage entry times from three
    // CHAINED window aggregates over one user_id partitioning (r15 —
    // bounded, spillable per-user state; the r14 collect_list buffer
    // was unbounded, ADVICE r14), so the r13 shape's 3 scans + 4
    // user-keyed joins (and the pre-r14 5× re-evaluation of the view
    // chain, VERDICT r13 ask #1) stay structurally gone: one parquet
    // scan of events, one hash exchange, zero joins.
    for (df <- Seq(Extended.q91FunnelTiming(spark, sfDir),
        Extended.q57Funnel(spark, sfDir))) {
      val p = plan(df)
      assert(p.split("Scan parquet").length - 1 == 1,
        s"funnel must scan events exactly once:\n$p")
      assert(!p.contains("Join"), s"funnel must not plan a join:\n$p")
      // ≤ 2 hash exchanges: the user_id aggregation plus (q91 only)
      // the 2-group transition aggregate, whose exchange carries two
      // partial-percentile rows — nothing event-sized reshuffles
      assert(p.split("Exchange hashpartitioning").length - 1 <= 2,
        s"funnel must shuffle only the user_id agg + the 2-group agg:\n$p")
      assert(!p.toLowerCase.contains("udf"), p)
    }
  }

  test("q83 zorder: extent row broadcasts; the 32-term Morton interleave " +
      "stays inside codegen; one exchange for the zone aggregate") {
    val p = plan(graft.ops.Maintenance.q83Zorder(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"min/max extents must broadcast onto the row stream:\n$p")
    assert(p.split("Exchange hashpartitioning").length == 2,
      s"expected exactly one hash exchange (the zone agg):\n$p")
    // the interleave is pure Column arithmetic — no UDF anywhere
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("udf"), p)
  }

  test("s2/s4/s11 ANN: coarse assignment, probe selection, and final " +
      "cuts all partial-aggregate through the bounded heap — no rank " +
      "Window anywhere (VERDICT r14 #2)") {
    // The r14 shape shuffled all n·k (vector, cell) rows through a
    // vec_id/q_id rank window before cutting to assign/nprobe — the
    // engine's one remaining avoidable full shuffle. The topk_by form
    // collapses the fanout MAP-SIDE (broadcast crossJoin emits every
    // cell row on the vector's own partition, so the partial
    // aggregate finishes each heap before the exchange, which then
    // carries n rows instead of n·k). s4's in-query form checkpoints
    // its result (plan opaque), so its plan is pinned through the
    // index path, which shares probeCells verbatim.
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfplan").toString
    Similarity.buildIvfIndex(spark, sfDir, idx, k = 4)
    for ((name, df) <- Seq(
        "s2" -> Similarity.knnIvf(spark, sfDir),
        "s4-index" -> Similarity.knnIvfFromIndex(spark, idx, nprobe = 2),
        "s11" -> Similarity.queries("s11_knn_ivfpq")(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("Window"), s"$name plans a rank window:\n$p")
      assert(p.contains("partial_topk_by"),
        s"$name heap must partial-aggregate map-side:\n$p")
    }
  }

  test("s1/s14/s15: brute ranking, RRF fusion, and the hard-negative " +
      "cut all rank through the bounded heap — no rank Window anywhere " +
      "(VERDICT r15 #6)") {
    // s1 was the last corpus-scale rank window in the ANN family (its
    // heap twin s9 proved the cheap shape); s14's global row_number
    // over the bounded BM25 list planned a single-partition WindowExec
    // (the "No Partition Defined" warning source); s15's q_id window
    // shuffled the banded negative stream. All three now rank through
    // topk_by with pinned-identical order/tie rules.
    for ((name, df) <- Seq(
        "s1" -> Similarity.knnBrute(spark, sfDir),
        "s14" -> Similarity.hybridRrf(spark, sfDir),
        "s15" -> Similarity.hardNegatives(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("Window"), s"$name plans a rank window:\n$p")
      assert(p.contains("partial_topk_by"),
        s"$name heap must partial-aggregate map-side:\n$p")
    }
  }
}
