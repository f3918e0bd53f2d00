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

  test("partitioned layout: filters prune partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "event_type")
    Partitioning.writePartitioned(events, dir, "event_type")
    val types = events.select("event_type").distinct().count()
    assert(types > 1, "fixture needs multiple event types")
    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory skip), not
    // PushedFilters (row-group skip after the file is already opened)
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      plan)
    val scanned = one.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.sum
    assert(scanned == 1, s"expected 1 of $types partitions scanned, got $scanned")
    assert(one.count() == events.filter(col("event_type") === "click").count())
  }

  test("dynamic partition pruning fires on a filtered-dimension join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "event_type")
    Partitioning.writePartitioned(events, dir, "event_type")
    val fact = spark.read.parquet(dir)
    val dim = events.select("event_type").distinct()
      .withColumn("kind",
        when(col("event_type").isin("click", "view"), "interactive")
          .otherwise("passive"))
    val q = fact.join(dim.filter(col("kind") === "interactive"), "event_type")
    // the partition filter on the fact scan must be the RUNTIME
    // dynamicpruning subquery fed by the dim side's filter — whole
    // directories skipped per the dimension predicate, at 100 TB the
    // difference between scanning two event types and all of them
    assert(q.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      q.queryExecution.executedPlan.toString)
    assert(q.count() ==
      events.filter(col("event_type").isin("click", "view")).count())
  }

  test("sorted layout: range filter decodes fewer rows than unsorted") {
    val base = java.nio.file.Files.createTempDirectory("graft_sort").toString
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    Partitioning.writeSorted(l, s"$base/sorted", 4, "l_quantity")
    l.repartition(4).write.parquet(s"$base/unsorted")
    // each sorted file owns a disjoint quantity range (the layout
    // property that makes row-group stats selective)
    val ranges = new java.io.File(s"$base/sorted").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("l_quantity"), max("l_quantity")).head
        (r.getDouble(0), r.getDouble(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB, ranges.toSeq)
      case _ =>
    }
    // and the reader proves it: a pushed range predicate decodes a
    // fraction of the table on the sorted layout, everything on the
    // unsorted one (every row group's [min,max] spans the domain)
    val cut = l.stat.approxQuantile("l_quantity", Array(0.1), 0.01).head
    def filtered(p: String) =
      spark.read.parquet(p).filter(col("l_quantity") <= cut)
    val plan = filtered(s"$base/sorted").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"), plan)
    val sortedRows = Partitioning.scannedRows(filtered(s"$base/sorted"))
    val unsortedRows = Partitioning.scannedRows(filtered(s"$base/unsorted"))
    val total = l.count()
    assert(unsortedRows == total, s"unsorted decoded $unsortedRows of $total")
    assert(sortedRows <= total / 2,
      s"sorted layout decoded $sortedRows of $total — row-group stats not pruning")
  }

  test("z-ordered layout: 2-D box filter prunes on both dimensions") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    // 32 files (not 16): pruning granularity is the file, and
    // repartitionByRange's sample seed derives from the GLOBAL rdd-id
    // counter, so range boundaries shift with suite order — at 16
    // files a noisy boundary could pull the z-corner's ideal 1 file up
    // to 4 (= the 1-D layout's 4/16), tying the comparison; at 32 the
    // corner's worst case stays well under the 1-D layout's 8 files
    Partitioning.writeZOrdered(l, s"$base/zorder", 32,
      Seq("l_orderkey", "l_partkey"))
    Partitioning.writeSorted(l, s"$base/sorted1d", 32, "l_orderkey")
    l.repartition(16).write.parquet(s"$base/unsorted")
    // bottom-quarter box on BOTH keys (~6% of rows). l_orderkey and
    // l_partkey are independent, so a 1-D layout can only prune on its
    // leading column (~25%); z-order prunes on both at once.
    val mx = l.agg(max("l_orderkey"), max("l_partkey")).head
    val (okCut, pkCut) = (mx.getLong(0) / 4, mx.getLong(1) / 4)
    def filtered(p: String) = spark.read.parquet(p)
      .filter(col("l_orderkey") <= okCut && col("l_partkey") <= pkCut)
    // the clustering write is a pure layout change — no rows lost
    val total = l.count()
    assert(spark.read.parquet(s"$base/zorder").count() == total)
    val expect =
      l.filter(col("l_orderkey") <= okCut && col("l_partkey") <= pkCut).count()
    assert(filtered(s"$base/zorder").count() == expect)
    val zRows = Partitioning.scannedRows(filtered(s"$base/zorder"))
    val sortedRows = Partitioning.scannedRows(filtered(s"$base/sorted1d"))
    val unsortedRows = Partitioning.scannedRows(filtered(s"$base/unsorted"))
    assert(unsortedRows == total, s"unsorted decoded $unsortedRows of $total")
    assert(sortedRows < unsortedRows,
      s"1-D sorted decoded $sortedRows of $total — leading-column stats dead")
    assert(zRows < sortedRows,
      s"z-order decoded $zRows vs 1-D sorted $sortedRows — " +
        "second dimension not pruning")
  }

  test("scannedRows sees through an AQE-wrapped plan") {
    // a groupBy forces an exchange, so the executed plan is an
    // AdaptiveSparkPlanExec LEAF — a naive collect over it finds no
    // Scan node and would silently report 0 decoded rows
    val agg = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
    assert(agg.queryExecution.executedPlan.toString.contains("AdaptiveSparkPlan"))
    val rows = Partitioning.scannedRows(agg)
    assert(rows == spark.read.parquet(s"$sfDir/lineitem.parquet").count(),
      s"AQE scan metric lost: $rows")
  }

  test("incremental dedup against the bucketed fp index is corpus-side shuffle-free") {
    graft.llm.Dedup.writeFpIndex(spark, sfDir, "fp_idx", buckets = 8)
    // force the sort-merge path: at test scale the index would win an
    // auto-broadcast, which hides the bucket co-location that matters
    // at 100 TB (a corpus-sized index is never broadcastable)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val indexed = graft.llm.Dedup.incrementalDedupIndexed(spark, sfDir, "fp_idx")
      val plan = indexed.queryExecution.executedPlan.toString
      // the corpus side reads its bucket layout straight off disk …
      assert(plan.contains("SelectedBucketsCount"), plan)
      // … and the ONLY shuffle is the fresh batch routed to those
      // buckets (the within-batch window reuses the same clustering)
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles == 1, plan)
      // same rows as the in-query d6 form
      val inQuery = graft.llm.Dedup.incrementalDedup(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val viaIndex = indexed.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(viaIndex == inQuery)
      assert(viaIndex.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("jaccard verify from the shingle index never touches text, matches d3") {
    graft.llm.Dedup.writeShingleIndex(spark, sfDir, "shingle_idx", buckets = 8)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaIndex = graft.llm.Dedup.jaccardVerifyIndexed(spark, "shingle_idx")
      val plan = viaIndex.queryExecution.executedPlan.toString
      // candidates + both verify sides read the bucketed index layout;
      // the raw documents table appears NOWHERE in the plan — the
      // exact-verify path no longer re-reads or re-shingles text
      assert("SelectedBucketsCount".r.findAllIn(plan).size >= 2, plan)
      assert(!plan.contains("documents"), plan)
      val exact = graft.llm.Dedup.jaccardVerify(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = viaIndex.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == exact)
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("persisted cluster index: indexed apply/split match inline, no CC in plan") {
    graft.llm.Dedup.writeClusterIndex(spark, sfDir, "cluster_idx", buckets = 8)
    val applyIdx = graft.llm.Dedup.dedupApplyIndexed(spark, sfDir, "cluster_idx")
    val splitIdx = graft.llm.Dedup.splitLeakfreeIndexed(spark, sfDir, "cluster_idx")
    for (df <- Seq(applyIdx, splitIdx)) {
      val plan = df.queryExecution.executedPlan.toString
      // the whole d8 pipeline is absent: no text column read anywhere
      // (column pruning proves it never re-shingles), no explode
      // (Generate) from gram/band construction, and no ExistingRDD —
      // the localCheckpoint snapshots that are the connected-components
      // loop's physical signature
      assert(!plan.contains("text"), plan)
      assert(!plan.toLowerCase.contains("generate"), plan)
      assert(!plan.contains("ExistingRDD"), plan)
      // the drop/cluster side reads the bucketed index layout
      assert(plan.contains("cluster_idx"), plan)
    }
    val inlineApply = graft.llm.Dedup.dedupApply(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val idxApply = applyIdx
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(idxApply == inlineApply)
    assert(idxApply.nonEmpty)
    val inlineSplit = graft.llm.Dedup.splitLeakfree(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val idxSplit = splitIdx
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(idxSplit == inlineSplit)
    assert(idxSplit.nonEmpty)
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

  test("manifest pruning: z-ordered layout + file-level min/max manifest " +
      "answers a 2-D box from a fraction of the files, result-exact") {
    import org.apache.spark.sql.functions.{col, lit}
    val base = java.nio.file.Files.createTempDirectory("graft_mani").toString
    val l = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    Partitioning.writeZOrdered(l, s"$base/t", 32,
      Seq("l_orderkey", "l_partkey"))
    Partitioning.writeManifest(spark, s"$base/t", s"$base/m",
      Seq("l_orderkey", "l_partkey"))
    val mani = spark.read.parquet(s"$base/m")
    assert(mani.count() == 32, "one manifest row per data file")
    // a box on both clustered dims: the z-layout makes per-file ranges
    // tight on each, so the manifest admits only a fraction of files
    val (okLo, okHi, pkLo, pkHi) = (100L, 300L, 20L, 60L)
    val admitted = mani.filter(
      col("l_orderkey_min") <= okHi && col("l_orderkey_max") >= okLo &&
      col("l_partkey_min") <= pkHi && col("l_partkey_max") >= pkLo).count()
    assert(admitted < 32 / 2, s"manifest admitted $admitted of 32 files")
    val pruned = Partitioning.manifestPrunedRead(spark, s"$base/t",
      s"$base/m", Seq(
        ("l_orderkey", lit(okLo), lit(okHi)),
        ("l_partkey", lit(pkLo), lit(pkHi))))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val full = l.filter(col("l_orderkey").between(okLo, okHi) &&
      col("l_partkey").between(pkLo, pkHi))
    assert(rows(pruned) == rows(full))
    assert(rows(full).nonEmpty, "fixture degenerate: empty box")
    // a box outside the domain admits zero files and returns empty
    // with the table's schema
    val none = Partitioning.manifestPrunedRead(spark, s"$base/t",
      s"$base/m", Seq(("l_orderkey", lit(-10L), lit(-1L))))
    assert(none.isEmpty && none.schema == pruned.schema)
  }

  test("bm25 from the inverted index: bucket-pruned postings, no " +
      "tokenization or text in the plan, matches inline t11") {
    graft.llm.TextAnalysis.writeBm25Index(spark, sfDir, "bm25_idx",
      buckets = 8)
    val viaIndex = graft.llm.TextAnalysis.bm25FromIndex(spark, "bm25_idx")
    val plan = viaIndex.queryExecution.executedPlan.toString
    // the query's IN-list prunes the postings scan to its terms'
    // buckets; the corpus text is never read, never tokenized
    assert(plan.contains("SelectedBucketsCount"), plan)
    assert(!plan.contains("documents"), plan)
    assert(!plan.toLowerCase.contains("generate"), plan)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val inline = rows(graft.llm.TextAnalysis.bm25(spark, sfDir))
    val got = rows(viaIndex)
    assert(got == inline, s"got $got want $inline")
    assert(got.nonEmpty)
  }

  test("bm25 index append: base index + ingest batch scores exactly " +
      "like an index built from everything") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    // base corpus = 4/5 of the docs, the ingest batch the remaining 1/5
    val base = java.nio.file.Files.createTempDirectory("graft_bm25a").toString
    docs.filter(col("doc_id") % 5 =!= 4)
      .write.parquet(s"$base/documents.parquet")
    graft.llm.TextAnalysis.writeBm25Index(spark, base, "bm25_app",
      buckets = 8)
    graft.llm.TextAnalysis.appendToBm25Index(spark,
      docs.filter(col("doc_id") % 5 === 4), "bm25_app")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val appended = rows(graft.llm.TextAnalysis.bm25FromIndex(spark, "bm25_app"))
    val full = rows(graft.llm.TextAnalysis.bm25(spark, sfDir))
    assert(appended == full, s"got $appended want $full")
  }
}
