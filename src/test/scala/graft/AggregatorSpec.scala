package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashAggregator
import graft.llm.Dedup

/** The typed MinHash Aggregator must agree exactly with the
  * DataFrame 32-column min() implementation, and the multimodal
  * resize/frame-sample stubs must hold their invariants.
  */
class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("MinHashAggregator matches the DataFrame signature implementation") {
    val viaAgg = Dedup.shingleSets(spark, sfDir)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"),
        (graft.llm.TextAnalysis.hash60(col("sh")) % Dedup.M).as("hv"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAggregator.toColumn.name("sig"))
      .collect().toMap

    val viaDf = Dedup.signatures(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (0 until Dedup.NumHashes).map(k => r.getLong(1 + k)))
      .toMap

    assert(viaAgg.keySet == viaDf.keySet)
    viaAgg.foreach { case (doc, sig) =>
      assert(sig == viaDf(doc), s"signature mismatch for doc $doc")
    }
  }

  test("resize stub preserves aspect clamp and frame sampling is deterministic") {
    val fs = graft.llm.Multimodal.processedFeatures(spark, sfDir).collect()
    assert(fs.nonEmpty)
    fs.foreach { case (f, frames) =>
      assert(f.width <= 32 && f.height <= 32 && f.width >= 1 && f.height >= 1)
      if (f.kind == "video") {
        assert(frames.headOption.contains(0))
        assert(frames == frames.sorted && frames.distinct == frames)
      } else assert(frames == Seq(0))
    }
  }

  test("CMS sketch: merge-order invariant, no false negatives, " +
      "collisions visible at high cardinality") {
    import graft.functions.CmsAggregator
    val cms = udaf(CmsAggregator, org.apache.spark.sql.Encoders.STRING)
    // high-cardinality synthetic stream: 20k distinct tokens (freq 1
    // or 2) + one genuine heavy hitter — every 1024-wide row averages
    // ~20 tokens/cell, so collisions MUST surface as overcounts
    val toks = ((0 until 20000).map(i => s"tok$i") ++
      (0 until 10000).map(i => s"tok${i * 2}") ++
      Seq.fill(500)("hh")).toDF("t")
    val g1 = toks.repartition(1).agg(cms(col("t"))).head.getSeq[Long](0)
    val g8 = toks.repartition(8, col("t")).agg(cms(col("t"))).head.getSeq[Long](0)
    assert(g1 == g8, "grid differs under repartitioning")
    assert(g1.sum == toks.count() * CmsAggregator.Depth)

    def est(tok: String): Long =
      (0 until CmsAggregator.Depth)
        .map(r => g1(r * CmsAggregator.Width + CmsAggregator.cell(r, tok))).min
    val exact = Map("hh" -> 500L) ++
      (0 until 20000).map(i => s"tok$i" -> (if (i % 2 == 0) 2L else 1L))
    // no false negatives, ever; and with 30.5k occurrences over 1024
    // cells per row, at least one probe must show a real overcount
    assert(exact.forall { case (t, c) => est(t) >= c })
    assert(exact.exists { case (t, c) => est(t) > c },
      "fixture too small to surface any collision")
    assert(est("hh") >= 500L && est("hh") <= 500L + 200L,
      s"hh estimate ${est("hh")} implausibly far from 500")
  }

  test("KMV sketch: merge-order invariant and equal to the brute " +
      "k-min distinct set") {
    import graft.functions.KmvAggregator
    import spark.implicits._
    val kmv = udaf(KmvAggregator, org.apache.spark.sql.Encoders.scalaLong)
    val rnd = new scala.util.Random(20L)
    val base = Seq.fill(20000)(rnd.nextLong() & ((1L << 60) - 1))
    val vals = base ++ base.take(5000) // duplicates must not double-insert
    val df = vals.toDF("h")
    val g1 = df.repartition(1).agg(kmv(col("h"))).head.getSeq[Long](0)
    val g8 = df.repartition(8, col("h")).agg(kmv(col("h"))).head.getSeq[Long](0)
    assert(g1 == g8, "sketch differs under repartitioning")
    assert(g1 == base.distinct.sorted.take(KmvAggregator.K),
      "sketch is not the k smallest distinct hashes")
    assert(g1.size == KmvAggregator.K)
  }

  test("KMV estimator: exact below K, within 4 sigma above (t20), and " +
      "the rollup row is the shard union") {
    import graft.functions.KmvAggregator
    val rows = graft.llm.TextAnalysis.kmvDistinct(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(-1L, 0L, 1L, 2L, 3L))
    rows.foreach { case (shard, (nExact, nSk, est)) =>
      if (nExact < KmvAggregator.K) {
        assert(nSk == nExact && est == nExact.toDouble,
          s"shard $shard: below-K sketch must be exact")
      } else {
        assert(nSk == KmvAggregator.K)
        // sigma ~ n/sqrt(K-2) ~ 6.3% at K=256; 4 sigma = 25%
        assert(math.abs(est - nExact) <= 0.25 * nExact,
          s"shard $shard: est $est vs exact $nExact")
      }
    }
    val (totExact, _, _) = rows(-1L)
    assert(totExact >= rows.filter(_._1 >= 0).values.map(_._1).max)
  }

  test("t21: AKMV set-algebra estimates bracket the exact counts") {
    val r = graft.llm.TextAnalysis.kmvSetOps(spark, sfDir).head()
    val (na, nb, nu, ni) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (estA, estB, estU, estI, jac) = (r.getDouble(4), r.getDouble(5),
      r.getDouble(6), r.getDouble(7), r.getDouble(8))
    assert(ni <= math.min(na, nb) && nu >= math.max(na, nb))
    assert(nu + ni == na + nb, "inclusion-exclusion broken on exacts")
    assert(jac >= 0.0 && jac <= 1.0)
    for ((est, exact) <- Seq((estA, na), (estB, nb), (estU, nu)))
      assert(math.abs(est - exact) <= 0.25 * exact, s"$est vs $exact")
    assert(math.abs(estI - ni) <= 0.30 * ni, s"intersect $estI vs $ni")
    assert(math.abs(jac - ni.toDouble / nu) <= 0.15,
      s"jaccard $jac vs ${ni.toDouble / nu}")
  }

  test("HLL sketch: merge-order invariant and equal to the brute " +
      "per-register max-rank computation") {
    import graft.functions.HllAggregator
    val hll = udaf(HllAggregator, org.apache.spark.sql.Encoders.scalaLong)
    val rnd = new scala.util.Random(21L)
    val base = Seq.fill(30000)(rnd.nextLong() & ((1L << 60) - 1))
    val vals = base ++ base.take(8000) // duplicates must not move any register
    val df = vals.toDF("h")
    val g1 = df.repartition(1).agg(hll(col("h"))).head.getSeq[Byte](0)
    val g8 = df.repartition(8, col("h")).agg(hll(col("h"))).head.getSeq[Byte](0)
    assert(g1 == g8, "registers differ under repartitioning")
    val brute = new Array[Byte](HllAggregator.M)
    base.foreach { h =>
      val idx = (h % HllAggregator.M).toInt
      val w = h / HllAggregator.M
      val rank =
        if (w == 0L) HllAggregator.MaxRank
        else HllAggregator.MaxRank -
          (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > brute(idx)) brute(idx) = rank.toByte
    }
    assert(g1 == brute.toSeq, "registers differ from brute-force")
  }

  test("HLL estimator: linear counting near-exact at tiny n, harmonic " +
      "within 5 sigma at 100k, and t22 rows hold the error bound") {
    import graft.functions.HllAggregator
    val hll = udaf(HllAggregator, org.apache.spark.sql.Encoders.scalaLong)
    val m = HllAggregator.M
    def estOf(n: Int, seed: Long): Double = {
      val rnd = new scala.util.Random(seed)
      val sk = Seq.fill(n)(rnd.nextLong() & ((1L << 60) - 1)).toDF("h")
        .agg(hll(col("h"))).head.getSeq[Byte](0)
      val sInt = sk.map(r => 1L << (52 - r)).sum
      val v = sk.count(_ == 0)
      val raw = HllAggregator.Alpha * m.toDouble * m *
        math.pow(2, 52) / sInt.toDouble
      if (v > 0 && raw <= 2.5 * m) m * math.log(m.toDouble / v) else raw
    }
    // tiny n: the occupancy estimator is near-exact (64 distinct in
    // 512 registers — MLE error ~ a few percent)
    assert(math.abs(estOf(64, 7L) - 64) <= 8.0)
    // 100k distinct: harmonic regime; 5 sigma = 5 * 1.04/sqrt(512)
    assert(math.abs(estOf(100000, 9L) - 100000) <= 0.23 * 100000)
    // t22 itself: every shard (and the rollup) within the same bound,
    // and the rollup exact is at least each shard's
    val rows = graft.llm.TextAnalysis.hllDistinct(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.keySet == Set(-1L, 0L, 1L, 2L, 3L))
    rows.foreach { case (shard, (nExact, vZero, est)) =>
      assert(vZero >= 0 && vZero <= m)
      assert(math.abs(est - nExact) <= 0.23 * nExact,
        s"shard $shard: est $est vs exact $nExact")
    }
    assert(rows(-1L)._1 >= rows.filter(_._1 >= 0).values.map(_._1).max)
  }

  test("t19: overcount never negative and is_hh matches the 1% rule") {
    val rows = graft.llm.TextAnalysis.cmsHeavyHitters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = graft.core.Tables.load(spark, sfDir, "documents")
      .select(explode(graft.llm.TextAnalysis.tokens(lower(col("text"))))
        .as("t")).count()
    rows.foreach { r =>
      val (tf, est, over, hh) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(over == est - tf && over >= 0)
      assert(hh == (if (est * 100 >= total) 1L else 0L))
    }
  }
}
