package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, Similarity, TextAnalysis}
import graft.ops.Maintenance

/** Specs for the round-12 additions: c17 length-bucketed batching,
  * s21 embedding drift, q83 z-order zone maps + the physical
  * [[Maintenance.zorderBy]] layout. The CORRECTNESS rows gate
  * cross-engine value equality; these pin the semantic laws and the
  * layout's data-skipping claim the hash can't express.
  */
class LayoutOpsSpec extends SparkSpec {

  // ---- c17 length-bucketed batching --------------------------------------

  test("c17: every doc lands in the smallest ladder bucket that fits, " +
      "padding recomputes exactly, batch count is ceil(n/B)") {
    val rows = Curation.lengthBuckets(spark, sfDir).collect()
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long"))
      .collect().map(_.getLong(0))
    val ladder = Curation.LengthBuckets
    def bucketOf(n: Long): Long =
      ladder.find(n <= _).getOrElse(ladder.last)
    val expect = docs.groupBy(bucketOf)
    assert(rows.map(_.getLong(0)).toSet == expect.keySet)
    rows.foreach { r =>
      val (bucket, nDocs, sumToks, maxToks, nBatches, padFrac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))
      val ds = expect(bucket)
      assert(nDocs == ds.length && sumToks == ds.sum && maxToks == ds.max)
      assert(maxToks <= bucket || bucket == ladder.last,
        s"doc longer than its bucket edge in non-overflow bucket $bucket")
      assert(nBatches ==
        (nDocs + Curation.BatchDocs - 1) / Curation.BatchDocs)
      val want = BigDecimal(1.0 - ds.sum.toDouble / (ds.length * bucket))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(padFrac - want) < 1e-9, s"bucket $bucket pad_frac")
      assert(padFrac >= 0.0 && padFrac < 1.0)
    }
    assert(rows.map(_.getLong(1)).sum == docs.length, "every doc bucketed")
  }

  // ---- c18 training shuffle -----------------------------------------------

  test("c18: shards cover every doc exactly once with contiguous " +
      "positions, the order is reproducible, and each shard is an " +
      "unbiased sample of the source mix") {
    val run1 = Curation.shuffleShards(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val run2 = Curation.shuffleShards(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(run1.sorted.toSeq == run2.sorted.toSeq, "shuffle not reproducible")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run1.map(_._1).sorted.toSeq == docs.keys.toSeq.sorted,
      "shards must partition the corpus")
    run1.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // unbiasedness: every shard's majority-source share within a loose
    // binomial envelope of the global share (±4σ at the shard size)
    val global = docs.values.groupBy(identity).view.mapValues(_.size).toMap
    val top = global.maxBy(_._2)._1
    val p = global(top).toDouble / docs.size
    run1.groupBy(_._2).foreach { case (shard, rows) =>
      val q = rows.count(r => docs(r._1) == top).toDouble / rows.length
      val sigma = math.sqrt(p * (1 - p) / rows.length)
      assert(math.abs(q - p) <= 4 * sigma + 1e-9,
        s"shard $shard source share $q vs global $p (σ=$sigma)")
    }
  }

  // ---- s21 embedding drift ------------------------------------------------

  test("s21: per-dim epoch means recompute from the raw vectors; " +
      "shift is the absolute difference of the rounded means") {
    val rows = Similarity.embeddingDrift(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val raw = graft.core.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0) % 2, r.getSeq[Float](1).map(_.toDouble)))
    val dim = raw.head._2.length
    assert(rows.keySet == (1 to dim).map(_.toLong).toSet)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until dim).foreach { d =>
      val a = raw.filter(_._1 == 0).map(_._2(d))
      val b = raw.filter(_._1 == 1).map(_._2(d))
      val (ma, mb, sh) = rows(d + 1L)
      assert(math.abs(ma - r6(a.sum / a.length)) < 2e-6, s"dim ${d + 1} mean_a")
      assert(math.abs(mb - r6(b.sum / b.length)) < 2e-6, s"dim ${d + 1} mean_b")
      assert(math.abs(sh - r6(math.abs(ma - mb))) < 1e-9, s"dim ${d + 1} shift")
    }
  }

  // ---- s22 filtered-ANN recall eval ----------------------------------------

  test("s22: every query reports k=3 with recall = n_hit/k in [0,1]; " +
      "the filtered tier clears the 0.5 floor on average") {
    val rows = Similarity.recallFiltered(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(1) == 3L, s"q ${r.getLong(0)} truth size")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 3)
      assert(math.abs(r.getDouble(3) - r.getLong(2) / 3.0) < 1e-4)
    }
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.5, s"filtered-tier mean recall $mean below the floor")
  }

  // ---- q84 Welch t-test ------------------------------------------------------

  test("q84: t statistic and Welch df recompute from the raw samples") {
    val rows = graft.queries.Extended.q84WelchTtest(spark, sfDir).collect()
    val raw = graft.core.Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus").isin("O", "F"))
      .select("o_orderpriority", "o_orderstatus", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getString(0)
      val a = raw.filter(x => x._1 == g && x._2 == "O").map(_._3)
      val b = raw.filter(x => x._1 == g && x._2 == "F").map(_._3)
      assert(r.getLong(1) == a.length && r.getLong(2) == b.length)
      def stats(v: Array[Double]) = {
        val m = v.sum / v.length
        (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
      }
      val ((ma, va), (mb, vb)) = (stats(a), stats(b))
      val (ea, eb) = (va / a.length, vb / b.length)
      val tW = (ma - mb) / math.sqrt(ea + eb)
      val dfW = (ea + eb) * (ea + eb) /
        (ea * ea / (a.length - 1) + eb * eb / (b.length - 1))
      assert(math.abs(r.getDouble(3) - ma) < 1e-4, s"$g mean_a")
      assert(math.abs(r.getDouble(4) - mb) < 1e-4, s"$g mean_b")
      assert(math.abs(r.getDouble(5) - tW) < 1e-3, s"$g t")
      assert(math.abs(r.getDouble(6) - dfW) < math.abs(dfW) * 1e-3, s"$g df")
      // Welch df is bracketed by min-sample df and pooled df
      assert(r.getDouble(6) >= math.min(a.length, b.length) - 1 - 1e-6)
      assert(r.getDouble(6) <= a.length + b.length - 2 + 1e-6)
    }
  }

  // ---- q83 z-order ---------------------------------------------------------

  private def zRef(x: Long, y: Long): Long =
    (0 until Maintenance.ZBits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("q83: the zValue column equals the reference Morton interleave " +
      "over boundary and random inputs") {
    val mask = (1L << Maintenance.ZBits) - 1
    val rnd = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (mask, mask), (mask, 0L), (0L, mask),
      (1L, 2L), (21845L, 43690L)) ++
      Seq.fill(50)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = spark.createDataFrame(pts).toDF("x", "y")
      .select(col("x"), col("y"),
        Maintenance.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == zRef(x, y), s"zValue($x, $y)")
    }
  }

  test("q83: zone map partitions all rows and every zone's rectangle " +
      "contains its rows") {
    val rows = Maintenance.q83Zorder(spark, sfDir).collect()
    val total = graft.core.Tables.load(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val bin = r.getLong(0)
      Seq((r.getLong(2), r.getLong(3)), (r.getLong(4), r.getLong(5)))
        .foreach { case (lo, hi) => assert(lo <= hi, s"bin $bin extent") }
      // the zone's corners interleave back into the bin's z range
      assert(zRef(r.getLong(2), r.getLong(4)) >> (2 * Maintenance.ZBits - 6)
        <= bin)
      assert(zRef(r.getLong(3), r.getLong(5)) >> (2 * Maintenance.ZBits - 6)
        >= bin)
    }
  }

  test("q83: zone rectangles are tight in BOTH dims where a single-column " +
      "ordering leaves the second dim unprunable — the pruning claim the " +
      "write-side layout (PartitioningSpec's scanned-rows tests) relies on") {
    // q83's 64 zones over the scaled 16-bit domain: nearly all must be
    // small rectangles in BOTH dims. A range boundary straddling a
    // high-bit flip (the classic z-curve jump) can leave single zones
    // wide in the flipped dimension, so the guarantee asserted is
    // distributional, matching what footer pruning actually uses.
    val full = (1L << Maintenance.ZBits) - 1
    val zones = Maintenance.q83Zorder(spark, sfDir).collect()
      .map(r => (r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4)))
    val tight = zones.count { case (ex, ey) =>
      ex <= full / 4 && ey <= full / 4 }
    assert(tight >= (zones.length * 9) / 10,
      s"only $tight/${zones.length} zones tight: ${zones.sortBy(-_._1).take(4).toSeq}")
    // contrast: ordering by x alone gives zones that are x-slices —
    // each spans ~the FULL y range (computed from the same scaled
    // pairs, binned by x instead of z)
    val mask = full
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val ext = li.agg(min("l_partkey").as("mnp"), max("l_partkey").as("mxp"),
      min("l_suppkey").as("mns"), max("l_suppkey").as("mxs"))
    val scaledPairs = li.crossJoin(broadcast(ext))
      .select(
        floor((col("l_partkey") - col("mnp")) * mask /
          greatest(col("mxp") - col("mnp"), lit(1L))).cast("long").as("x"),
        floor((col("l_suppkey") - col("mns")) * mask /
          greatest(col("mxs") - col("mns"), lit(1L))).cast("long").as("y"))
    val xSlices = scaledPairs
      .groupBy(shiftright(col("x"), Maintenance.ZBits - 6).as("bin"))
      .agg((max("y") - min("y")).as("ey"))
      .collect().map(_.getLong(1))
    // ≥ half the range (vs the z-zones' ≤ quarter): suppkey has few
    // distinct values at this SF, so a thin slice can miss the extreme
    // scaled value — the contrast, not the exact span, is the claim
    assert(xSlices.forall(_ >= full / 2),
      s"x-slice zones unexpectedly pruned y: ${xSlices.min}")
  }
}
