package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Behavioral tests for the llm/ operator families on sf0.001
  * (50 documents / 50 embeddings) — properties the DuckDB oracle
  * can't express: candidate-set soundness, hamming behavior, stub
  * plumbing types.
  */
class LlmSpec extends SparkSpec {

  test("minhash LSH candidates are sound: every high-Jaccard pair is found") {
    // ground truth: all pairs with shingle-Jaccard >= 0.9 (small data)
    val sh = Dedup.shingleSets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val truth = for {
      a <- sh.keys.toSeq; b <- sh.keys.toSeq if a < b
      j = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if j >= 0.9
    } yield (a, b)
    val cands = Dedup.minhashCandidates(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    truth.foreach(p => assert(cands.contains(p), s"missed near-dup pair $p"))
  }

  test("IVF index append: literal-centroid assignment matches KMeans.transform; all-cell probe stays exact") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivfappend").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // parity: re-appending vectors the build already assigned must
    // give every one the SAME cell MLlib's transform chose
    Similarity.buildIvfIndexFrom(all, s"$base/dup", k = 8)
    val builtCells = spark.read.parquet(s"$base/dup/cells")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val re = all.filter(col("vec_id") >= 30)
    Similarity.appendToIvfIndex(spark, re, s"$base/dup")
    spark.read.parquet(s"$base/dup/cells").filter(col("vec_id") >= 30)
      .collect().groupBy(_.getLong(0)).foreach { case (id, rows) =>
        assert(rows.length == 2, s"vec $id expected build+append rows")
        assert(rows.map(_.getInt(3)).toSet == Set(builtCells(id)),
          s"vec $id appended into a different cell than the build chose")
      }
    // exactness: a slice-built + appended index probed on ALL cells is
    // brute-force over the union corpus — s1's rows exactly
    Similarity.buildIvfIndexFrom(all.filter(col("vec_id") < 30),
      s"$base/inc", k = 8)
    Similarity.appendToIvfIndex(spark, all.filter(col("vec_id") >= 30),
      s"$base/inc")
    val inc = Similarity.knnIvfFromIndex(spark, s"$base/inc",
      nprobe = 8, topK = 5).collect().map(_.toSeq).toSet
    val brute = Similarity.queries("s1_knn_brute")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(inc == brute)
  }

  test("PQ index: raw ADC equals dot(query, reconstruction); rerank tier is exact over the ADC candidates") {
    val base = java.nio.file.Files.createTempDirectory("graft_pq").toString
    // small fitted geometry (8×16) keeps the 8 KMeans fits fast; the
    // production defaults (16×64) are exercised by s10/s11
    Similarity.buildPqIndex(spark, sfDir, s"$base/pq", m = 8, k = 16)
    val res = Similarity.knnPqFromIndex(spark, sfDir, s"$base/pq",
        m = 8, k = 16, rerank = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.nonEmpty)
    // independent reconstruction: raw ADC must equal the dot of the
    // unit query against the concatenated subspace centroids — the
    // decomposition identity PQ rests on
    val cb = spark.read.parquet(s"$base/pq/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codes = spark.read.parquet(s"$base/pq/codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val unit = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect().map { r =>
        val v = r.getSeq[Double](1)
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(_ / n)
      }.toMap
    assert(codes.values.forall(_.size == 8))
    assert(cb.size == 8 * 16)
    res.take(20).foreach { case (qid, vid, sim) =>
      val recon = codes(vid).zipWithIndex.flatMap { case (c, sub) => cb((sub, c)) }
      val expected = unit(qid).zip(recon).map { case (a, b) => a * b }.sum
      assert(math.abs(sim - expected) < 1e-5,
        s"ADC $sim != reconstruction dot $expected for ($qid, $vid)")
    }
    // rerank tier: every returned sim must be the EXACT unit-dot of
    // the pair (not an ADC estimate), and the default path must beat
    // the raw-ADC ranking's recall vs brute
    val brute = Similarity.queries("s1_knn_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = Similarity.knnPqFromIndex(spark, sfDir, s"$base/pq",
        m = 8, k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rr.foreach { case (qid, vid, sim) =>
      val exact = unit(qid).zip(unit(vid)).map { case (a, b) => a * b }.sum
      // sim is exact rounded to 6 dp, so it sits within half a grid
      // step of the recomputed dot (no rounding-mode sensitivity)
      assert(math.abs(sim - exact) <= 5.000001e-7,
        s"rerank sim $sim is not the exact cosine for ($qid, $vid)")
    }
    val rawRecall = res.map(x => (x._1, x._2)).toSet.intersect(brute).size
    val rrRecall = rr.map(x => (x._1, x._2)).toSet.intersect(brute).size
    assert(rrRecall >= rawRecall,
      s"rerank recall $rrRecall fell below raw ADC $rawRecall")
    assert(rrRecall.toDouble / brute.size >= 0.2,
      s"fitted-PQ rerank recall too low: $rrRecall/${brute.size}")
  }

  test("s10: recall@5 vs brute holds the bench floor on the fixture corpus") {
    val brute = Similarity.queries("s1_knn_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.knnPqInline(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.8, s"s10 recall vs brute too low: $recall")
  }

  test("s10 inline-PQ plans the ADC kernel and the bounded heap, not a pair-set window") {
    val qe = Similarity.knnPqInline(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("pq_adc"), "ADC kernel missing from plan")
    assert(plan.contains("topk_by"), "bounded-heap ranking missing")
    // the one Window is the per-(vec, sub) encode argmax (128 rows per
    // vec), a child subtree of the scoring join; the SCORING pair set
    // (|corpus| × |q|) must heap, not sort — so no Window may print
    // above the topk_by aggregate in the top-down plan text
    val firstWindow = plan.indexOf("Window")
    assert(firstWindow == -1 || firstWindow > plan.indexOf("topk_by"),
      "a Window sits above the heap ranking")
  }

  test("LSH index append: build+append equals build-from-scratch; untouched buckets keep their files") {
    val base = java.nio.file.Files.createTempDirectory("graft_annappend").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // full build (truth) vs slice build + batch append
    Similarity.buildLshIndexFrom(all, s"$base/full")
    Similarity.buildLshIndexFrom(all.filter(col("vec_id") < 40), s"$base/inc")
    val batch = all.filter(col("vec_id") >= 40)
    // bucket dirs the batch does NOT touch must keep their exact files
    def files(p: String) = new java.io.File(p).listFiles().toSeq
      .filter(_.getName.startsWith("bucket="))
      .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val before = files(s"$base/inc/buckets")
    Similarity.appendToLshIndex(spark, batch, s"$base/inc")
    val after = files(s"$base/inc/buckets")
    val batchBuckets = after.keySet.filter(k =>
      before.get(k) != after.get(k)) ++ (after.keySet -- before.keySet)
    before.keySet.diff(batchBuckets).foreach { b =>
      assert(before(b) == after(b), s"untouched bucket $b rewritten")
    }
    // search from the appended index = search from the one-shot index
    val inc = Similarity.knnLshFromIndex(spark, s"$base/inc")
      .collect().map(_.toSeq).toSet
    val full = Similarity.knnLshFromIndex(spark, s"$base/full")
      .collect().map(_.toSeq).toSet
    assert(inc == full)
    assert(inc.nonEmpty)
  }

  test("LSH index migration: a pre-r14 layout (no sig2) and a mixed " +
      "layout (r14 append into it) both search identically to a rebuild") {
    import graft.ops.Partitioning
    val base = java.nio.file.Files.createTempDirectory("graft_annmig").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // truth: full r14 build
    Similarity.buildLshIndexFrom(all, s"$base/full")
    val full = Similarity.knnLshFromIndex(spark, s"$base/full")
      .collect().map(_.toSeq).toSet
    // pre-r14 layout: the same build WITHOUT the sig2 column
    Similarity.buildLshIndexFrom(all, s"$base/old")
    val oldFrame = spark.read.parquet(s"$base/old/buckets")
      .drop("sig2")
    val oldDir = s"$base/oldstyle"
    Partitioning.writePartitioned(oldFrame, s"$oldDir/buckets", "bucket")
    val fromOld = Similarity.knnLshFromIndex(spark, oldDir)
      .collect().map(_.toSeq).toSet
    assert(fromOld == full,
      "sig2 backfill over a pre-r14 layout must equal a rebuild")
    // mixed layout: pre-r14 slice + r14 append of the rest
    val mixDir = s"$base/mixed"
    Partitioning.writePartitioned(
      spark.read.parquet(s"$base/old/buckets").drop("sig2")
        .filter(col("vec_id") < 40),
      s"$mixDir/buckets", "bucket")
    Similarity.appendToLshIndex(spark,
      all.filter(col("vec_id") >= 40), mixDir)
    val fromMixed = Similarity.knnLshFromIndex(spark, mixDir)
      .collect().map(_.toSeq).toSet
    assert(fromMixed == full,
      "null-sig2 rows in a mixed layout must backfill, not null-rank")
    // Layout-marker accounting (ADVICE r15): the full build recorded
    // the all-rows-carry-sig2 invariant as metadata; the append into
    // the markerless pre-r14 slice left a MIXED layout, so no marker
    // may appear there (column presence can't prove non-nullness)
    def marked(d: String) =
      new java.io.File(s"$d/buckets/_graft_siglayout").exists
    assert(marked(s"$base/full"), "full v2 build must write the marker")
    assert(!marked(mixDir), "mixed layout must stay unmarked")
    assert(!marked(oldDir), "pre-r14 layout must stay unmarked")
  }

  test("LSH index layout marker drives the plan: a marked v2 layout's " +
      "stage-1 scan reads stored signatures only (no per-row backfill " +
      "arithmetic); unmarked layouts keep the coalesce backfill") {
    val base = java.nio.file.Files.createTempDirectory("graft_annfast").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Similarity.buildLshIndexFrom(all, s"$base/v2")
    val fastPlan = Similarity.knnLshFromIndex(spark, s"$base/v2")
      .queryExecution.executedPlan.toString
    // the documented ~20 B/vector index-scan posture: the candidate
    // stage must plan NO signature arithmetic (the 8192-literal
    // simhash64 projection) and no null-guard coalesce over sig2 —
    // both forced the scan to read the full 64-dim vector column
    assert(!fastPlan.contains("simhash64"),
      s"v2 fast path recomputes signatures:\n$fastPlan")
    assert(!fastPlan.contains("coalesce(sig2"),
      s"v2 fast path plans the mixed-layout backfill:\n$fastPlan")
    // a mixed layout (v2 append into a markerless slice) must keep it
    val mixDir = s"$base/mixed"
    graft.ops.Partitioning.writePartitioned(
      spark.read.parquet(s"$base/v2/buckets").drop("sig2")
        .filter(col("vec_id") < 40),
      s"$mixDir/buckets", "bucket")
    Similarity.appendToLshIndex(spark, all.filter(col("vec_id") >= 40), mixDir)
    val mixedPlan = Similarity.knnLshFromIndex(spark, mixDir)
      .queryExecution.executedPlan.toString
    assert(mixedPlan.contains("simhash64"),
      s"mixed layout must backfill null sig2 from the vector:\n$mixedPlan")
    // an append into an EMPTY dir creates a fully-v2 layout: marked
    val freshDir = s"$base/fresh"
    Similarity.appendToLshIndex(spark, all, freshDir)
    assert(new java.io.File(s"$freshDir/buckets/_graft_siglayout").exists,
      "append-bootstrap must mark the fully-v2 layout")
    val freshGot = Similarity.knnLshFromIndex(spark, freshDir)
      .collect().map(_.toSeq).toSet
    val v2Got = Similarity.knnLshFromIndex(spark, s"$base/v2")
      .collect().map(_.toSeq).toSet
    assert(freshGot == v2Got)
  }

  test("IVFPQ index: all-cell probe + corpus-sized rerank is exact; " +
      "append composes the stored quantizers identically to the build; " +
      "every ranking heap-aggregates") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Similarity.buildIvfPqIndex(spark, sfDir, s"$base/a", k = 8)
    // exactness escape hatch: probing every cell feeds the whole
    // corpus to ADC, and a corpus-sized rerank keeps every candidate
    // for exact scoring — the composed index must then equal brute
    val brute = Similarity.knnBrute(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allCell = Similarity
      .knnIvfPqFromIndex(spark, sfDir, s"$base/a", nprobe = 8, rerank = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(allCell == brute,
      "all-cell IVFPQ probe with full rerank must equal exact brute")
    // default probe budget: a full result set (topK rows per query)
    val dflt = Similarity.knnIvfPqFromIndex(spark, sfDir, s"$base/a")
    assert(dflt.count() == 100, "5 rows per each of the 20 queries")
    val plan = dflt.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"IVFPQ search plans a window:\n$plan")
    assert(plan.contains("partial_topk_by"), plan)
    assert(plan.contains("pq_adc"), plan)
    // append parity: rebuild index B = A's quantizers + A's cells
    // restricted to vec_id < 40, then append the rest THROUGH THE
    // LITERAL-FOLDED projection — cells/codes must equal A's exactly
    // (pins least(struct) == KMeans.transform and the CASE-residual +
    // pq_encode == the build's join-residual encode), so search too
    def cp(sub: String) = {
      val from = new org.apache.hadoop.fs.Path(s"$base/a/$sub")
      val to = new org.apache.hadoop.fs.Path(s"$base/b/$sub")
      org.apache.hadoop.fs.FileUtil.copy(
        from.getFileSystem(spark.sparkContext.hadoopConfiguration), from,
        to.getFileSystem(spark.sparkContext.hadoopConfiguration), to,
        false, spark.sparkContext.hadoopConfiguration)
    }
    cp("centroids"); cp("codebooks")
    graft.ops.Partitioning.writePartitioned(
      spark.read.parquet(s"$base/a/cells").filter(col("vec_id") < 40),
      s"$base/b/cells", "cell")
    graft.index.Indexes.append(spark, "ivfpq",
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .filter(col("vec_id") >= 40),
      s"$base/b")
    def cells(d: String) = spark.read.parquet(s"$d/cells")
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Int]]("codes").toList,
        r.getAs[Number]("cell").intValue)).toSet
    assert(cells(s"$base/b") == cells(s"$base/a"),
      "append must route/encode exactly like the build's own transform")
    val viaB = Similarity
      .knnIvfPqFromIndex(spark, sfDir, s"$base/b", nprobe = 8, rerank = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaB == brute)
  }

  test("filtered ANN: recall holds at low and high predicate " +
      "selectivity, and below the budget floor the search is EXACT " +
      "(the r14 sweep promoted to a spec law — VERDICT r14 #3)") {
    // selectivity 1/2 (high) and 1/4: the s20 discipline must hold
    // the sweep's floor; selectivity 1/20 leaves ≤ FilteredBudgetFloor
    // candidates, so the stage-1 heap keeps EVERY subset vector and
    // the search degenerates to exact — recall must be 1.0 exactly
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(n / 20 <= Similarity.FilteredBudgetFloor,
      s"fixture drifted: subset ${n / 20} no longer under the floor")
    assert(Similarity.filteredRecallAt(spark, sfDir, 20) == 1.0,
      "below the budget floor the filtered search must be exact")
    for (m <- Seq(2, 4)) {
      val r = Similarity.filteredRecallAt(spark, sfDir, m)
      assert(r >= 0.8, s"filtered recall at selectivity 1/$m: $r < 0.8")
    }
  }

  test("set-similarity join is exact: equals brute-force Jaccard >= t") {
    // ground truth by enumeration (small data): ALL pairs >= 0.8 —
    // exactness means d11 finds every one (LSH may not), no extras
    val sh = Dedup.shingleSets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val truth = (for {
      a <- sh.keys.toSeq; b <- sh.keys.toSeq if a < b
      j = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if (math.rint(j * 10000) / 10000) >= 0.8
    } yield (a, b)).toSet
    val got = Dedup.setSimJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth,
      s"missed=${truth -- got} extra=${got -- truth}")
    assert(truth.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("skew guard: oversized boilerplate bucket is star-linked, real pairs survive") {
    import spark.implicits._
    // 200 byte-identical boilerplate docs (one LSH bucket per band) plus
    // one genuine near-dup pair with its own distinct shingle set
    val boiler = (1L to 200L).map(i => (i, Seq("a b c", "b c d", "c d e")))
    val real   = Seq((1001L, Seq("x y z", "y z w", "z w v")),
                     (1002L, Seq("x y z", "y z w", "z w v")))
    val shingles = (boiler ++ real).toDF("doc_id", "shingles")
    val pairs = Dedup.minhashCandidatesFrom(shingles, maxBucket = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // capped bucket → star edges from the min doc only: O(B) not O(B²)
    val starEdges = (2L to 200L).map(i => (1L, i)).toSet
    assert(pairs.contains((1001L, 1002L)), "non-degenerate pair lost by the guard")
    assert((pairs - ((1001L, 1002L))) == starEdges,
      s"expected ${starEdges.size} star edges, got ${pairs.size - 1} other pairs")
    // the duplicate cluster stays connected: every boiler doc reachable from 1
    assert(starEdges.map(_._2).toSet == (2L to 200L).toSet)
  }

  test("skew guard at bench scale: oversized bucket stays O(B), not O(B²)") {
    import spark.implicits._
    // one 3000-member boilerplate bucket — the shape of templated web
    // text. Guard-off enumerates every pair (the quadratic blowup that
    // sinks a 100 TB dedup on its worst bucket); guard-on emits only
    // the star edges. Counts are the deterministic proxy for the
    // wall-time gap; times are reported for the bench note.
    val b = 3000L
    val shingles = (1L to b).map(i => (i, Seq("a b c", "b c d", "c d e")))
      .toDF("doc_id", "shingles").repartition(8)
    def timed(maxBucket: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Dedup.minhashCandidatesFrom(shingles, maxBucket = maxBucket).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (nOff, tOff) = timed(Int.MaxValue)
    val (nOn, tOn) = timed(100)
    assert(nOn == b - 1, s"guard-on should star-link: $nOn edges")
    assert(nOff == b * (b - 1) / 2, s"guard-off should all-pairs: $nOff")
    info(f"guard-on $tOn%.2fs (${nOn} edges) vs guard-off $tOff%.2fs (${nOff} pairs)")
    // and the O(B) edge set still resolves the whole bucket to one
    // cluster — the guard trades no correctness for the 1500× cut
    val clusters = Dedup.connectedComponents(
        Dedup.minhashCandidatesFrom(shingles, maxBucket = 100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == (1L to b).map(_ -> 1L).toMap)
  }

  test("jaccard verify only keeps pairs above threshold") {
    Dedup.jaccardVerify(spark, sfDir).collect()
      .foreach(r => assert(r.getDouble(2) >= 0.8))
  }

  test("jaccard verify and kmeans IVF release their caches after materializing") {
    spark.catalog.clearCache()
    Dedup.jaccardVerify(spark, sfDir)
    assert(spark.sharedState.cacheManager.isEmpty,
      "jaccardVerify left a corpus-sized shingle cache pinned")
    Similarity.knnIvfKmeans(spark, sfDir)
    assert(spark.sharedState.cacheManager.isEmpty,
      "knnIvfKmeans left the cell-assignment cache pinned")
  }

  test("simhash of identical texts collide; hamming distance is small for near-dups") {
    val sims = Dedup.simhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // verified near-dups should have close simhashes (weak bound)
    val nearDups = Dedup.jaccardVerify(spark, sfDir).collect()
    nearDups.foreach { r =>
      val d = java.lang.Long.bitCount(sims(r.getLong(0)) ^ sims(r.getLong(1)))
      assert(d <= 16, s"hamming $d for jaccard ${r.getDouble(2)}")
    }
  }

  test("simhash band blocking is sound: every pair within hamming 3 is found") {
    val sims = Dedup.simhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val truth = for {
      (a, sa) <- sims.toSeq; (b, sb) <- sims.toSeq if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)
    val found = Dedup.simhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    truth.foreach(p => assert(found.contains(p), s"missed simhash pair $p"))
    assert(found.size == truth.size)
  }

  test("knn brute: k results per query, sims sorted desc, self excluded") {
    val rows = Similarity.knnBrute(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(rs.forall(_.getLong(1) != q))
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivf probe results are a subset of the same-label corpus") {
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    Similarity.knnIvf(spark, sfDir).collect().foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)))
    }
  }

  test("kmeans IVF at default (k=16, nprobe=12): recall >= 0.9 vs brute top-5") {
    // sf0.01 (500 vectors) so cells are populated enough to be meaningful.
    // The synthetic embeddings are near-random in cosine (no recoverable
    // cluster structure — see Similarity.knnIvfKmeans scaladoc), so the
    // honest operating point for a regen-robust 0.9 recall is
    // nprobe/k = 0.75; the clustered-corpus test below exercises the
    // sub-linear regime.
    val dir = "/root/testdata/sf0.01"
    val truth = Similarity.knnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvfKmeans(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(ivf).size.toDouble / truth.size
    assert(recall >= 0.9, s"IVF default recall $recall vs brute top-5")
  }

  test("kmeans IVF on a clustered corpus: recall >= 0.9 probing 4 of 16 cells") {
    // 16 tight clusters in 64-dim — the structure a real embedding corpus
    // has and the quantizer exists to exploit. Probing 4/16 cells (25% of
    // the corpus) must still recover >= 0.9 of the brute top-5.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0L until 480L).map { i =>
      val c = centers((i % 16).toInt)
      (i, c.map(_ + 0.15 * rnd.nextGaussian()))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (j <- a.indices) { d += a(j)*b(j); na += a(j)*a(j); nb += b(j)*b(j) }
      d / math.sqrt(na * nb)
    }
    val truth = (for {
      (qi, qv) <- vecs.filter(_._1 < 20)
      (ni, _) <- vecs.filter(p => p._1 != qi)
        .sortBy(p => (-cos(qv, p._2), p._1)).take(5)
    } yield (qi, ni)).toSet
    val df = vecs.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val ivf = Similarity.knnIvfOn(df, k = 16, nprobe = 4, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(ivf).size.toDouble / truth.size
    assert(recall >= 0.9, s"IVF@nprobe=4/k=16 clustered recall $recall")
  }

  test("kmeans IVF cells: deterministic assignment, k cells max") {
    val cells = Similarity.kmeansCells(spark, sfDir, k = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells.values.toSet.size <= 4)
    val again = Similarity.kmeansCells(spark, sfDir, k = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells == again)
  }

  test("token stats and quality are consistent") {
    Similarity // touch
    TextAnalysis.qualityScore(spark, sfDir).collect().foreach { r =>
      val q = r.getDouble(4)
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0) // stop_ratio
    }
  }

  test("lsh ann: results share the query's hyperplane bucket, ranked desc") {
    val buckets = Similarity.queries("s6_knn_lsh")(spark, sfDir)
    val rows = buckets.collect()
    assert(rows.nonEmpty)
    // per query: ranks contiguous from 1, sims non-increasing, no self
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length).toSeq)
      val sims = sorted.map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse, s"q=$q sims not desc: $sims")
      assert(!rs.exists(_.getLong(1) == q))
    }
  }

  test("curation keeps only quality/length/lang-agreeing docs, deduped on fp") {
    import graft.llm.Curation
    val out = Curation.curate(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(3) >= Curation.MinQuality)   // quality
      assert(r.getLong(2) >= Curation.MinTokens)      // n_tokens
    }
    // dedup invariant: canonical fingerprints of survivors are distinct
    val ids = out.map(_.getLong(0)).toSet
    val fps = TextAnalysis.fingerprint(spark, sfDir).collect()
      .filter(r => ids(r.getLong(0))).map(_.getString(1))
    assert(fps.length == fps.distinct.length, "duplicate fp survived curation")
  }

  test("int8 quantization: values bounded, dequantization error within half-step") {
    val rows = Similarity.quantizeInt8(spark, sfDir).collect()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val (id, i, q, scale) =
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
      assert(q >= -127 && q <= 127, s"q out of int8 range: $q")
      // scale is rounded to 6dp in the output → allow that slack too
      val err = math.abs(q / scale - emb(id)(i.toInt))
      assert(err <= 0.5 / scale + 1e-4, s"vec $id dim $i err $err")
    }
  }

  test("redaction removes every URL, email, and long digit run") {
    val rows = TextAnalysis.redact(spark, sfDir).collect()
    rows.foreach { r =>
      val red = r.getString(1)
      assert(!red.matches(".*https?://[^\\s<]+.*"), red)
      assert(!red.matches(s".*${TextAnalysis.emailRe}.*"), red)
      assert(!red.matches(s".*${TextAnalysis.numRe}.*"), red)
      assert(r.getLong(2) >= 0)
    }
  }

  test("vocabulary: df <= corpus size, tf >= df, deterministic ordering") {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val rows = TextAnalysis.vocabulary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= nDocs)              // df <= |docs|
      assert(r.getLong(1) >= r.getLong(2))        // tf >= df
    }
    val key = rows.map(r => (-r.getLong(2), -r.getLong(1), r.getString(0)))
    assert(key.toSeq == key.sortBy(identity).toSeq, "not (df,tf,token)-ordered")
  }

  test("incremental dedup emits only new-slice docs with unseen fingerprints") {
    val out = Dedup.incrementalDedup(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % 5 == 4), "non-new-batch doc emitted")
    val fps = out.map(_.getString(1))
    assert(fps.length == fps.distinct.length, "duplicate fp within batch output")
    val knownFps = TextAnalysis.fingerprint(spark, sfDir).collect()
      .filter(_.getLong(0) % 5 != 4).map(_.getString(1)).toSet
    assert(fps.forall(!knownFps(_)), "known fp leaked through the anti-join")
  }

  test("mix weights sum to 1 and scale with source volume") {
    import graft.llm.Curation
    val rows = Curation.mixWeights(spark, sfDir).collect()
    assert(rows.length > 1)
    val total = rows.map(_.getDouble(3)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"weights sum $total")
    // weight is monotone in n_chars (power with alpha > 0)
    val byVolume = rows.sortBy(_.getLong(2))
    assert(byVolume.map(_.getDouble(3)).toSeq ==
      byVolume.map(_.getDouble(3)).sortBy(identity).toSeq)
  }

  test("shard packing: per-source shards contiguous, within budget") {
    import graft.llm.Curation
    val budget = 50000L
    val rows = Curation.packShards(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val shards = rs.map(_._4).distinct.sorted
      assert(shards.toSeq == (0L until shards.length).toSeq,
        s"$src shards not contiguous: ${shards.toSeq}")
      rs.groupBy(_._4).foreach { case (shard, docs) =>
        // cum-based assignment: a shard holds at most budget chars
        // plus the doc that crossed into it
        val chars = docs.map(_._3).sum
        val maxDoc = docs.map(_._3).max
        assert(chars <= budget + maxDoc,
          s"$src shard $shard overflows: $chars chars (max doc $maxDoc)")
      }
    }
  }

  test("hierarchical pack equals the flat per-source cumsum exactly") {
    import graft.llm.Curation
    import org.apache.spark.sql.expressions.Window
    // the two-pass (source,bucket) cumsum + offset add must reproduce
    // the flat single-window-per-source assignment bit for bit
    val got = Curation.packShards(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy("source").orderBy("doc_id")
    val flat = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("shard",
        floor((col("cum") - 1).cast("double") / 50000L).cast("long"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("shard"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == flat)
  }

  test("cluster resolution: star-linked bucket collapses to its min doc_id") {
    import spark.implicits._
    // 5 docs with identical shingle sets land in one LSH bucket; with
    // maxBucket = 2 the guard emits only star edges (1, i) — union-find
    // over those stars must still elect one cluster under doc 1
    val shingles = (1L to 5L).map(i => (i, Seq("a b c", "b c d", "c d e")))
      .toDF("doc_id", "shingles")
    val edges = Dedup.minhashCandidatesFrom(shingles, maxBucket = 2)
    val stars = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stars == (2L to 5L).map(i => (1L, i)).toSet, s"expected stars, got $stars")
    val clusters = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == (1L to 5L).map(_ -> 1L).toMap)
  }

  test("connected components: chains, multiple components, singleton-free") {
    import spark.implicits._
    // component A: a 6-node chain (stresses pointer jumping — label
    // must travel 5 hops); component B: a triangle; ids deliberately
    // unsorted so min-election isn't positional
    val edges = Seq((12L, 11L), (11L, 10L), (10L, 9L), (9L, 8L), (8L, 7L),
      (30L, 20L), (20L, 25L), (25L, 30L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (7L to 12L).map(_ -> 7L).toMap ++
      Seq(20L, 25L, 30L).map(_ -> 20L).toMap
    assert(got == want)
    // empty edge set → empty result, no crash
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).collect().isEmpty)
  }

  test("connected components: a 300-node path converges under the " +
      "iteration cap on the DISTRIBUTED tier (star rounds must compound)") {
    import spark.implicits._
    // worst case for one-hop propagation: one long path. Forced onto
    // the distributed tier (driverMaxEdges = 0) so large-star/
    // small-star itself is what converges — if the edge restructuring
    // regresses to min-crawling, this trips the 25-round cap and
    // labels come back wrong.
    val edges = (1L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(edges, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 300 && got.values.forall(_ == 1L),
      s"path labels wrong: ${got.toSeq.sortBy(_._1).filter(_._2 != 1L).take(5)}")
  }

  test("connected components: both tiers agree on the REAL dedup " +
      "candidate graph (production edge shape, not a synthetic one)") {
    val edges = Dedup.dedupEdgesOf(
      graft.core.Tables.load(spark, sfDir, "documents"))
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = asMap(Dedup.connectedComponents(edges))
    val dist = asMap(Dedup.connectedComponents(edges, driverMaxEdges = 0L))
    assert(driver.nonEmpty && driver == dist,
      s"tier disagreement on the d8 graph: " +
        s"${(driver.toSet -- dist.toSet).take(5)} / " +
        s"${(dist.toSet -- driver.toSet).take(5)}")
  }

  test("connected components: driver union-find and distributed " +
      "star rounds label identically") {
    import spark.implicits._
    // a mixed fixture: chains, a triangle, star buckets, duplicate and
    // self edges — seeded random unions so the check isn't shape-lucky
    val rnd = new scala.util.Random(12L)
    val edges = ((1L to 200L).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)) ++
      (200L until 230L).map(i => (i, i + 1)) ++
      Seq((300L, 300L))).toDF("doc_a", "doc_b")
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = asMap(Dedup.connectedComponents(edges))
    val dist = asMap(Dedup.connectedComponents(edges, driverMaxEdges = 0L))
    assert(driver == dist,
      s"tier disagreement: ${(driver.toSet -- dist.toSet).take(5)} vs " +
        s"${(dist.toSet -- driver.toSet).take(5)}")
  }

  test("char-gram shingles are character-based on multi-byte text (d7 oracle parity)") {
    import spark.implicits._
    // the d7 oracle counts CHARACTERS (DuckDB length/substr); a
    // byte-counting regression (strlen semantics) diverges on exactly
    // this corpus — CJK (3 bytes/char) and accented latin (2 bytes)
    val fixture = Seq(
      (1L, "Héllo wörld"),
      (2L, "日本語のテキストです"),
      (3L, "短い")) // 2 chars < k → whole-text fallback
    val dir = java.nio.file.Files.createTempDirectory("graft_cjk").toString
    fixture.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.charShingleHashes(spark, dir, k = 5).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    // reference: char-based 5-grams + the md5-fold hash, in plain Scala
    def h60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % Dedup.M
    }
    def grams(t: String, k: Int = 5): Seq[String] = {
      val s = t.trim.replaceAll("\\s+", " ").toLowerCase
      if (s.length >= k) (0 to s.length - k).map(i => s.substring(i, i + k))
      else Seq(s)
    }
    fixture.foreach { case (id, txt) =>
      assert(got(id) == grams(txt).map(h60).toSet, s"doc $id ($txt)")
    }
  }

  test("int8 ADC search: bounded quantization error, high agreement with fp IVF") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val i8 = Similarity.knnIvfInt8(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(i8.nonEmpty)
    // ADC sim within 1e-2 of the exact fp cosine for every scored pair
    i8.foreach { case (q, v, sim) =>
      assert(math.abs(sim - cos(emb(q), emb(v))) < 1e-2, s"pair ($q,$v)")
    }
    // top-3 agreement with the fp IVF over the same cells: int8 noise
    // may flip near-ties but must not reorder the neighborhood
    val fpTop = Similarity.knnIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val i8Top = i8.map(t => (t._1, t._2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = fpTop.keys.toSeq.map { q =>
      val denom = fpTop(q).size.toDouble
      fpTop(q).intersect(i8Top.getOrElse(q, Set.empty)).size / denom
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean fp-agreement $mean")
  }

  test("SimHash-rerank ANN recall floor vs brute top-3 (regression gate)") {
    // signature scan + exact rerank at a 15% candidate budget: the
    // floor pins the production operating point (the bench artifact
    // gates the same ≥ 0.7 at sf0.1). The old bucket-multi-probe form
    // measured 0.35-0.43 at a similar budget — Hamming RANK over 64
    // bits survives the near-random-corpus degradation that bucket
    // equality does not.
    val truth = Similarity.knnBrute(spark, sfDir).collect()
      .filter(_.getLong(3) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.knnLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(lsh).size.toDouble / truth.size
    assert(recall >= 0.7, s"SimHash-rerank recall $recall vs brute top-3")
  }

  test("IVF index persists to disk; search-from-index equals in-query s4") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
    Similarity.buildIvfIndex(spark, sfDir, idx)
    // the layout is Hive-partitioned by cell: a p-cell probe reads only
    // those directories
    val cellDirs = new java.io.File(s"$idx/cells").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.length == 16, cellDirs.mkString(","))
    val fromIndex = Similarity.knnIvfFromIndex(spark, idx)
    // the loaded path plans scans + joins only — no estimator ran, and
    // the corpus side reads the written index files
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains(idx), plan.take(2000))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    // same fit inputs + same seed + same scoring core → identical
    // results to the fit-in-query s4 path
    assert(canon(fromIndex) == canon(Similarity.knnIvfKmeans(spark, sfDir)))
  }

  test("LSH index persists to disk; search-from-index equals in-query s6") {
    val idx = java.nio.file.Files.createTempDirectory("graft_lshidx").toString
    Similarity.buildLshIndex(spark, sfDir, idx)
    // the layout is Hive-partitioned by the signature's low 8 bits:
    // append locality + optional bucket-restricted probing
    val bucketDirs = new java.io.File(s"$idx/buckets").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(bucketDirs.nonEmpty && bucketDirs.length <= 256,
      s"${bucketDirs.length} bucket dirs")
    val fromIndex = Similarity.knnLshFromIndex(spark, idx)
    // the loaded path reads the written index files, and the corpus
    // side plans NO signature arithmetic — the 64 hyperplane dots ran
    // once at build time; the stored sig column feeds the Hamming
    // scan directly
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains(idx), plan.take(2000))
    def sigs(p: String) = "simhash64".r.findAllIn(p).size
    val inQuery = Similarity.knnLsh(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(sigs(plan) < sigs(inQuery),
      s"index plan simhash64 ${sigs(plan)} !< in-query ${sigs(inQuery)}")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(canon(fromIndex) == canon(Similarity.knnLsh(spark, sfDir)))
  }

  test("decontaminate against an external benchmark table") {
    import spark.implicits._
    import graft.llm.Curation
    val passage = (1 to 12).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (100L, s"prefix $passage suffix tokens here"), // contaminated
      (101L, "a completely different document about something else entirely" +
        " with many more words than eight")).toDF("doc_id", "text")
    val bench = Seq((7L, passage)).toDF("doc_id", "text")
    val hits = Curation.decontaminateAgainst(corpus, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq == Seq((100L, 7L, 5L)), hits.toSeq.toString)
    // id collision with an external bench must NOT mask contamination
    val collidingBench = Seq((100L, passage)).toDF("doc_id", "text")
    val collided = Curation.decontaminateAgainst(corpus, collidingBench).collect()
    assert(collided.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((100L, 100L)))
  }

  test("jaccard estimate: exact 1.0 on identical docs, tracks exact jaccard") {
    val est = Dedup.jaccardEstimate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Dedup.jaccardVerify(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    spark.catalog.clearCache()
    assert(est.nonEmpty)
    est.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // every exact-verified pair (J >= 0.8) is a candidate with a high
    // estimate: 32 permutations @ J=0.8 put P(est < 0.5) below 1e-4
    exact.foreach { case (pair, j) =>
      assert(est.contains(pair), s"verified pair $pair missing from estimates")
      assert(est(pair) >= 0.5, s"pair $pair exact=$j est=${est(pair)}")
    }
    // identical-text duplicates estimate at exactly 1.0
    val identicalPairs = exact.filter(_._2 == 1.0).keySet
    identicalPairs.foreach(p => assert(est(p) == 1.0, s"$p: ${est(p)}"))
  }

  test("dedup apply: drops exactly the non-representative cluster members") {
    val clusters = Dedup.dedupClusters(spark, sfDir).collect()
    val dropped = clusters.filter(_.getInt(2) == 0).map(_.getLong(0)).toSet
    val kept = clusters.filter(_.getInt(2) == 1).map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "fixture corpus should contain near-dups")
    assert((dropped & kept).isEmpty)
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val surviving = Dedup.dedupApply(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(surviving == all -- dropped)
    assert(kept.subsetOf(surviving)) // every cluster keeps its representative
  }

  test("embed clusters: every near-dup pair lands in one cluster, min elected") {
    val pairs = Similarity.embedDupPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val lbl = Similarity.embedClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    pairs.foreach { case (a, b) =>
      assert(lbl(a)._1 == lbl(b)._1, s"pair ($a,$b) split across clusters")
    }
    lbl.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keySet.min == cid, s"cluster $cid label isn't the min id")
      val keeps = members.filter(_._2._2 == 1).keySet
      assert(keeps == Set(cid), s"cluster $cid keep flags: $keeps")
    }
  }

  test("d17: containment resolves a hand-built subsumption fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"),              // ⊂ 2, ⊂ 3
      (2L, "alpha beta gamma"),        // ⊂ 3
      (3L, "alpha beta gamma delta"),
      (4L, "epsilon zeta"),            // unique vocab — contained nowhere
      (5L, "beta alpha")               // same set as 1 → mutual containment
    ).toDF("doc_id", "text")
    val got = Dedup.containmentJoinOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 1 ⊆ {2,3,5} (5 has the identical set); 2 ⊆ {3}; 5 ⊆ {1,2,3}
    assert(got(1L) == ((3L, 2L)))
    assert(got(2L) == ((1L, 3L)))
    assert(got(5L) == ((3L, 1L)))
    assert(!got.contains(3L) && !got.contains(4L))
  }

  test("d17: dense and sparse regimes agree with each other and with a " +
      "brute subset check on a >64-token corpus (sparse dispatch), and " +
      "the tiny-vocab corpus dispatches dense") {
    import spark.implicits._
    // 80-word vocabulary → past ContainDenseVocabMax, so the public
    // entry point takes the SPARSE path; nested suffix chains + shared
    // rare tails exercise blocking, signature, and verify stages
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 80).map(i => s"w$i")
    val docs = (0 until 120).map { i =>
      val k = 2 + rnd.nextInt(10)
      val base = rnd.shuffle(vocab).take(k)
      (i.toLong, base.mkString(" "))
    } ++ Seq(
      (200L, "w0 w1 w2 w3 w4 w5"),
      (201L, "w0 w1 w2"), // ⊂ 200
      (202L, "w2 w1 w0")) // same set as 201
    val df = docs.toDF("doc_id", "text")
    def brute(ds: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
      val sets = ds.map { case (id, t) =>
        id -> t.toLowerCase.trim.split("\\s+").toSet }.toMap
      sets.keys.flatMap { a =>
        val cs = sets.keys.filter(b => b != a && sets(a).subsetOf(sets(b)))
        if (cs.isEmpty) None
        else Some(a -> ((cs.size.toLong, cs.min)))
      }.toMap
    }
    val expect = brute(docs)
    def collectMap(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    // 80 > ContainDenseVocabMax → the public dispatch takes the
    // posting plan (the bitset plan would alias bits past 64 and is
    // correctly not chosen)
    assert(collectMap(Dedup.containmentJoinOf(df)) == expect)
    // the two regime plans, called directly, agree with the brute
    // check on corpora inside their own domains: sparse here, dense on
    // the ≤64-token slice of the same fixture (drop the w64+ docs)
    def toksOf(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"),
          array_distinct(transform(
            graft.llm.TextAnalysis.tokens(lower(col("text"))),
            t => xxhash64(t))).as("hs"))
        .withColumn("n", size(col("hs")))
    assert(collectMap(Dedup.containSparse(toksOf(df))) == expect)
    val small = docs.filter { case (_, t) =>
      t.split(" ").forall(w => w.drop(1).toInt < 64) }
    assert(small.size >= 20, "fixture degenerate: too few ≤64-vocab docs")
    assert(collectMap(Dedup.containDense(toksOf(
      small.toDF("doc_id", "text")))) == brute(small))
    // the sparse plan's fingerprint is the array verify; the dense
    // plan has none (pure bitset algebra)
    assert(Dedup.containSparse(toksOf(df)).queryExecution.optimizedPlan
      .toString.contains("array_except"))
    assert(!Dedup.containDense(toksOf(df)).queryExecution.optimizedPlan
      .toString.contains("array_except"))
    // the shipped corpus sits in the dense regime (the dispatch probe's
    // precondition — containmentJoin on it runs the bitset plan)
    val realVocab = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    assert(realVocab <= Dedup.ContainDenseVocabMax)
  }

  test("s15: negatives sit in the semi-hard band and never share the " +
      "query's label") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.hardNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, n, sim, maxPos) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(e(q) != e(n), s"negative $n shares query $q's label")
      assert(sim < maxPos, s"($q,$n) sim $sim not below positive ceiling")
    }
    // at most K per query, ranks contiguous from 1
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      val rks = g.map(_.getLong(4)).sorted.toSeq
      assert(rks.length <= Similarity.HardNegK)
      assert(rks == (1L to rks.length).toSeq,
        s"query $q ranks: ${rks.mkString(",")}")
    }
  }

  test("s16: drop decision matches the s3 pair stream exactly") {
    val pairs = Similarity.embedDupPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minPartner = pairs.groupBy(_._2).map { case (b, g) =>
      b -> g.map(_._1).min
    }
    val got = Similarity.semDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    // dropped iff a smaller qualifying partner exists; dup_of is its min
    got.foreach { case (id, (keep, dupOf)) =>
      assert((keep == 0) == minPartner.contains(id))
      assert(dupOf == minPartner.get(id))
    }
    assert(got.values.exists(_._1 == 0), "fixture should drop something")
    assert(got.values.exists(_._1 == 1))
  }

  test("tfidf: top-3 per doc, scores ranked desc, rare terms beat stopwords") {
    val rows = TextAnalysis.tfidf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._6)
      assert(byRank.map(_._6).toSeq == (1L to byRank.length).toSeq)
      assert(byRank.length <= 3)
      // scores non-increasing in rank
      assert(byRank.map(_._5).toSeq == byRank.map(_._5).sortBy(-_).toSeq, s"doc $doc")
    }
    rows.foreach { case (_, _, tf, df, tfidf, _) =>
      assert(tf >= 1 && df >= 1 && df <= nDocs && tfidf > 0)
    }
    // a corpus-wide term can't out-rank an equally-frequent rarer term:
    // spot-check idf monotonicity on the collected (df -> score/tf) pairs
    val perOcc = rows.groupBy(_._4).view.mapValues(_.head).toMap
    for ((d1, r1) <- perOcc; (d2, r2) <- perOcc if d1 < d2)
      assert(r1._5 / r1._3 > r2._5 / r2._3,
        s"idf(df=$d1) should exceed idf(df=$d2)")
  }

  test("quality rules: each Gopher rule flags its own violation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rules").toString
    val docs = Seq(
      (1L, "a normal paragraph of sensible prose that any filter should keep fine"),
      (2L, "### ## # lots # of # hashes # here #"), // hash_ratio > 0.1
      (3L, "- one\n- two\n- three\n- four"), // bullet_frac 1.0 > 0.9
      (4L, "same line\nsame line\nsame line\nunique"), // dup_line_frac 0.5
      (5L, "wait... for... it... more... dots..."), // ellipsis_ratio 1.0
      (6L, "supercalifragilisticexpialidocious anotherextraordinarilylongword"),
      (7L, "aa bb cc")) // mean_word_len 2 < 3
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.qualityRules(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(6) == 1, s"clean doc failed: ${got(1L)}")
    Seq(2L, 3L, 4L, 5L, 6L, 7L).foreach(i =>
      assert(got(i).getInt(6) == 0, s"doc $i should fail: ${got(i)}"))
    assert(got(4L).getDouble(5) == 0.5) // 2 distinct of 4 lines
    assert(got(5L).getDouble(4) == 1.0) // one ellipsis per word
  }

  test("curateFull: each stage drops exactly its own victim, survivors packed") {
    import spark.implicits._
    import graft.llm.Curation
    val dir = java.nio.file.Files.createTempDirectory("graft_cfull").toString
    // the benchmark stand-in doc (doc_id % 7 == 0): fails stage A's
    // language agreement (no en markers), but must STILL act as the
    // external benchmark for stage B — bench is carved from the full
    // corpus, not from stage-A survivors
    val benchText =
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    // near-dup pair: 72 distinct words differing only in the last one —
    // word-shingle Jaccard ~0.96, caught by the LSH detectors at C
    val base = "the " + (1 to 70).map(i => s"word$i").mkString(" ") + " and"
    val docs = Seq(
      (0L, benchText),                                       // A: lang und
      (1L, s"the $benchText and extras here"),               // B: contaminated
      (2L, base + " ending"),                                // C: dup keeper
      (3L, base + " finale"),                                // C: dup loser
      (4L, "the ### stuff #### and more #### things"),       // A: hash_ratio
      (5L, "the quick brown foxes jumped over seventeen lazy dogs and waited"),
      // A: repetition — "buy now" claims 4/9 2-gram occurrences > 0.2
      // ceiling, while every OTHER stage-A check passes (mean word len
      // exactly 3.0, quality 0.56, en markers present)
      (6L, "the buy now buy now buy now buy now and"))
      .map { case (id, txt) => (id, txt, "web", "en", txt.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val packed = Curation.curateFull(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(packed.map(_._1).toSet == Set(2L, 5L), packed.mkString(","))
    // single source, weight 1.0 → stage D keeps everything; default
    // 2000-token budget → both land in shard 0 of source "web"
    packed.foreach { case (id, src, nTok, shard) =>
      assert(src == "web" && nTok > 0 && shard == 0L, s"doc $id")
    }
  }

  test("cross-lingual near-dups resolve into one cluster via char-gram edges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cjkdedup").toString
    // unsegmented CJK: the whole doc is ONE whitespace token, so the
    // word-shingle and token-simhash detectors are structurally blind
    // to this pair — only the char-5-gram path can link them
    val base = "日本語の自然言語処理は分かち書きがないため単語分割が難しい。" * 6
    Seq(
      (1L, base + "終"), // near-dup pair: one char differs in ~190
      (2L, base + "了"),
      (3L, "a completely different english document with plenty of words here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Dedup.minhashCandidates(spark, dir).collect().isEmpty,
      "word MinHash should not see the CJK pair")
    assert(Dedup.simhashPairs(spark, dir).collect().isEmpty,
      "token SimHash should not see the CJK pair")
    val clusters = Dedup.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(clusters.map(t => (t._1, t._2)).toSet == Set((1L, 1L), (2L, 1L)),
      clusters.mkString(","))
    val keep = clusters.map(t => t._1 -> t._3).toMap
    assert(keep == Map(1L -> 1, 2L -> 0)) // min doc_id elected, dup dropped
    // and the terminal artifact actually drops the CJK duplicate
    val surviving = Dedup.dedupApply(spark,
      { // dedupApply projects source/lang/n_chars: rewrite with metadata
        Seq((1L, base + "終", "web", "ja", 190L), (2L, base + "了", "web", "ja", 190L),
          (3L, "a completely different english document with plenty of words here",
            "web", "en", 65L))
          .toDF("doc_id", "text", "source", "lang", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        dir
      }).collect().map(_.getLong(0)).toSet
    assert(surviving == Set(1L, 3L), surviving)
  }

  test("connected components: superseded checkpoints released, result-only cache") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val labels = Dedup.connectedComponents(edges)
    assert(labels.count() == 6)
    // every per-round edge snapshot, the raw-edge/node checkpoints and
    // the final round frame must be gone; only the materialized label
    // table (which the returned plan reads) may remain cached
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.size <= 1, s"lingering cached RDDs: $after")
  }

  test("decontaminate apply: drops exactly the flagged docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dapply").toString
    // 12 tokens → 5 distinct 8-grams, all shared with the bench doc
    // (doc_id % 7 == 0): exactly the minShared=5 threshold
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    Seq(
      (0L, base, "web", "en", 72L),            // the benchmark doc itself
      (1L, base + " extra", "web", "en", 78L), // shares 5 grams: dropped
      (2L, "one two three four five six seven eight nine ten eleven twelve",
        "web", "en", 60L))                     // disjoint grams: kept
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.llm.Curation.decontaminateApply(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L), kept)
  }

  test("repetition stats: templated text scores high, varied text low") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    Seq(
      (1L, "buy now buy now buy now buy now"),      // one 2-gram dominates
      (2L, "the quick brown fox jumps over dogs"),  // all grams unique
      (3L, "ab"))                                    // 1 token: no grams
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.repetitionStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    // doc 1, n=2: grams = [buy now]*4 ++ [now buy]*3 → top 4/7, all dup
    assert(got((1L, 2)).getLong(2) == 7)
    assert(got((1L, 2)).getDouble(3) == math.rint(4.0 / 7 * 1e4) / 1e4)
    assert(got((1L, 2)).getDouble(4) == 1.0)
    // doc 2: every gram unique at both sizes
    assert(got((2L, 2)).getDouble(3) == math.rint(1.0 / 6 * 1e4) / 1e4)
    assert(got((2L, 2)).getDouble(4) == 0.0)
    assert(got((2L, 3)).getDouble(4) == 0.0)
    // doc 3 emits no rows (no 2-grams exist)
    assert(!got.keySet.exists(_._1 == 3L))
  }

  test("d14 leakage-free splits: every near-dup cluster routes to ONE " +
      "split, assignment is deterministic, singleton mix tracks 8/1/1") {
    val out = Dedup.splitLeakfree(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val clusters = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val splitOf = out.map(r => r._1 -> r._3).toMap
    // invariant: two docs in the same cluster share a split — a
    // doc-id-hash split would scatter them (leakage)
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      val splits = members.keys.map(splitOf).toSet
      assert(splits.size == 1,
        s"cluster $cid straddles splits: $splits")
    }
    // assigned cluster matches d8 for clustered docs, self for the rest
    out.foreach { case (doc, cid, _) =>
      assert(cid == clusters.getOrElse(doc, doc)) }
    // the singleton population is hash-uniform: 8/1/1 within binomial
    // tolerance (the clustered mass follows a few cluster coin flips
    // by design — see the operator scaladoc)
    val singles = out.filter(r => !clusters.contains(r._1))
    if (singles.length >= 30) {
      val frac = singles.count(_._3 == "train").toDouble / singles.length
      val tol = 5 * math.sqrt(0.8 * 0.2 / singles.length)
      assert(math.abs(frac - 0.8) <= tol,
        s"singleton train fraction $frac off 0.8 (n=${singles.length})")
    }
    // determinism: a second evaluation reproduces the assignment
    assert(Dedup.splitLeakfree(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap == splitOf)
  }

  test("m4 chunk dedup: identical payloads score all chunks, a half-" +
      "replaced payload scores the intact half, disjoint payloads none") {
    import spark.implicits._
    val base = "a" * 64 + "b" * 64     // 128 chars, 8 chunks of 16
    val halfNew = "a" * 64 + "z" * 64  // first 4 chunks intact
    val docs = Seq((1L, base), (2L, base), (3L, halfNew),
      (4L, "q" * 128)).toDF("doc_id", "text")
    val got = Multimodal.mediaChunkDedupOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // NOTE: all-'a' chunks collide across positions too, but the join
    // is position-keyed, so per-pair counts stay per-position
    assert(got((1L, 2L)) == 8L, s"exact dup must share all 8: $got")
    assert(got((1L, 3L)) == 4L && got((2L, 3L)) == 4L,
      s"half-replaced must share exactly the intact half: $got")
    assert(!got.contains((1L, 4L)) && !got.contains((3L, 4L)),
      s"disjoint payloads must not pair: $got")
  }

  test("bpe trainer: learns the textbook merges with deterministic ties") {
    import spark.implicits._
    // the Sennrich et al. 2016 worked example's shape: low ×5,
    // lower ×2, newest ×6, widest ×3. Hand-computed first merges:
    //   step 1: 'es' 9 ties 'st' 9 → lexicographic ⇒ (e, s)
    //   step 2: (es, t) 9
    //   step 3: 'lo' 7 ties 'ow' 7 → lexicographic ⇒ (l, o)
    val docs = Seq((1L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeFrom(
      TextAnalysis.bpeWordTableOf(docs), k = 3)
    assert(merges.map(m => (m.lhs, m.rhs, m.merged, m.n)) == Seq(
      ("e", "s", "es", 9L), ("es", "t", "est", 9L), ("l", "o", "lo", 7L)),
      merges.toString)
    // determinism: a refit reproduces the table exactly
    assert(TextAnalysis.trainBpeFrom(
      TextAnalysis.bpeWordTableOf(docs.repartition(3)), k = 3) == merges)
    // tier equality (the CC-cutover discipline): the driver trainer —
    // the path the fixture takes — and the distributed merge loop,
    // forced via a cutover of -1, learn the identical merge table,
    // including the two lexicographic tie-breaks above
    assert(TextAnalysis.trainBpeFrom(
      TextAnalysis.bpeWordTableOf(docs), k = 3,
      driverMaxVocab = -1L) == merges)
    // exhaustion: a corpus with fewer mergeable pairs than k stops
    // early instead of looping
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val few = TextAnalysis.trainBpeFrom(
      TextAnalysis.bpeWordTableOf(tiny), k = 5)
    assert(few.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")), few.toString)
  }

  test("bpe persisted model: counts from the stored merge table equal " +
      "the inline t16, via the per-distinct-word apply") {
    val model = java.nio.file.Files
      .createTempDirectory("bpe_model").toString
    TextAnalysis.writeBpeModel(spark, sfDir, model)
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val fromModel = TextAnalysis.bpeCountsFromModel(spark, model, docs)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(fromModel) ==
      rows(TextAnalysis.bpeTokenCounts(spark, sfDir)))
    // the scoring plan folds merges per DISTINCT word and joins back —
    // the word-table collapse, visible as the join on the word key
    val plan = fromModel.queryExecution.optimizedPlan.toString()
    assert(plan.contains("Join"),
      s"per-distinct-word apply shape missing (no join):\n$plan")
  }

  test("multimodal: typed dataset plumbing with stub decode") {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val feats = Multimodal.decodeFeatures(spark, sfDir).collect()
    assert(feats.length == nDocs)
    feats.foreach { f =>
      assert(Set("image", "audio", "video").contains(f.kind))
      assert(f.width >= 16 && f.height >= 16)
      assert(f.checksum.length == 32)
      if (f.kind != "video") assert(f.n_frames == 1)
    }
  }

  test("multimodal: real javax.imageio decode — true geometry and pixel " +
      "stats for PNG/BMP payloads, stub fallback for everything else") {
    import spark.implicits._
    // deterministic fixtures encoded in-memory: an 8x8 solid-color PNG,
    // a 4x6 two-band BMP, and an undecodable text payload
    def encodeImg(w: Int, h: Int, fmt: String)
        (pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val solid = encodeImg(8, 8, "png")((_, _) => 0x204060)       // r=32 g=64 b=96
    val bands = encodeImg(4, 6, "bmp")((_, y) =>
      if (y < 3) 0xff0000 else 0x0000ff)                         // half red, half blue
    val textBytes = "not an image at all".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", solid, solid.length.toLong),
      Multimodal.MediaRow(2L, "image", bands, bands.length.toLong),
      Multimodal.MediaRow(3L, "image", textBytes, textBytes.length.toLong),
      Multimodal.MediaRow(4L, "audio", solid, solid.length.toLong))
    val got = Multimodal.decodeImageFeatures(rows.toDS().repartition(2))
      .collect().map(f => f.media_id -> f).toMap
    // the PNG decodes to its REAL geometry and exact channel means
    val png = got(1L)
    assert(png.decoded && png.width == 8 && png.height == 8 && png.n_frames == 1)
    assert(png.mean_r == 32.0 && png.mean_g == 64.0 && png.mean_b == 96.0,
      s"png means ${(png.mean_r, png.mean_g, png.mean_b)}")
    // the BMP: 4x6, top half pure red + bottom half pure blue
    val bmp = got(2L)
    assert(bmp.decoded && bmp.width == 4 && bmp.height == 6)
    assert(bmp.mean_r == 127.5 && bmp.mean_g == 0.0 && bmp.mean_b == 127.5,
      s"bmp means ${(bmp.mean_r, bmp.mean_g, bmp.mean_b)}")
    // undecodable image payload and non-image kinds take the stub path
    for (id <- Seq(3L, 4L)) {
      val f = got(id)
      assert(!f.decoded && f.mean_r == 0.0)
      val stub = Multimodal.stubDecode(rows.find(_.media_id == id).get)
      assert(f.width == stub.width && f.height == stub.height &&
        f.checksum == stub.checksum)
    }
    // and the relational m1/m2 path agrees with the real kernel's
    // fallback on the text-payload corpus (no schema or value drift)
    val viaReal = Multimodal.decodeFeatures(spark, sfDir).collect()
      .map(f => f.media_id -> ((f.width, f.height, f.checksum))).toMap
    val viaStub = Multimodal.mediaTable(spark, sfDir).collect()
      .map(Multimodal.stubDecode)
      .map(f => f.media_id -> ((f.width, f.height, f.checksum))).toMap
    assert(viaReal == viaStub)
  }

  test("m2 pipeline on a real PNG: true decoded geometry flows through " +
      "resize + frame-sample") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(100, 60,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 60; x <- 0 until 100) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val rows = Seq(Multimodal.MediaRow(7L, "image", png, png.length.toLong))
    val (f, frames) = Multimodal
      .processedFeaturesOf(rows.toDS(), maxSide = 32, everyK = 5)
      .collect().head
    // real geometry 100x60 → scale 0.32 → 32x19 (aspect preserved)
    assert(f.width == 32 && f.height == 19,
      s"resized real geometry ${(f.width, f.height)}")
    assert(frames == Seq(0), "image rows sample their single frame")
  }

  test("m5: real pixel aHash — a one-cell patch edit lands at hamming 1 " +
      "and is paired through the banded join; the inverted image is not") {
    import spark.implicits._
    def encode(pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(80, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 80) img.setRGB(x, y, pixel(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    // grid cells are exactly 8×8 px (80/10 × 48/6); left half dark,
    // right half bright keeps every cell far from the grid mean, so
    // whitening ONE top-left cell flips exactly one bit
    def halves(x: Int, y: Int): Int = if (x < 40) 0x101010 else 0xf0f0f0
    val base = encode(halves)
    val twin = encode((x, y) =>
      if (x < 8 && y < 8) 0xffffff else halves(x, y))
    val inverted = encode((x, y) => if (x < 40) 0xf0f0f0 else 0x101010)
    def ah(p: Array[Byte]): Long = Multimodal.pixelAHash60(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
    assert(java.lang.Long.bitCount(ah(base) ^ ah(twin)) == 1)
    assert(java.lang.Long.bitCount(ah(base) ^ ah(inverted)) == 60)
    // through the full m5 pipeline on a mixed real + fallback frame:
    // the patched twin pairs with the base, the inverted image doesn't,
    // and the text-payload rows pair only among their own near-dups
    val txtA = "alpha beta gamma delta".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", base, base.length.toLong),
      Multimodal.MediaRow(2L, "image", twin, twin.length.toLong),
      Multimodal.MediaRow(3L, "image", inverted, inverted.length.toLong),
      Multimodal.MediaRow(4L, "audio", txtA, txtA.length.toLong),
      Multimodal.MediaRow(5L, "audio", txtA, txtA.length.toLong))
    val pairs = Multimodal.mediaPhashPairsOf(rows.toDS().repartition(2))
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getInt(3)).toMap
    assert(pairs.get((1L, 2L)).contains(1), s"pairs: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    assert(pairs.get((4L, 5L)).contains(0), "identical fallback payloads " +
      "must pair at hamming 0")
    assert(!pairs.keys.exists(k => Set(1L, 2L, 3L).contains(k._1) ^
      Set(1L, 2L, 3L).contains(k._2)), "cross-kind pair leaked")
  }

  test("m5: persisted phash index — a new batch's check against the stored " +
      "signatures equals the brute new-vs-stored pair set") {
    import spark.implicits._
    val table = "phash_idx_spec"
    graft.ops.Partitioning.dropManaged(spark, table)
    Multimodal.writePhashIndex(spark, sfDir, table)
    // batch: one verbatim copy of a stored doc's payload (same kind →
    // guaranteed hamming-0 hit), one perturbed copy, one noise row
    val src = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 1 && col("text").isNotNull)
      .select("doc_id", "text").head()
    val (srcId, srcText) = (src.getLong(0), src.getString(1))
    def row(id: Long, text: String) = {
      val b = text.getBytes("UTF-8")
      Multimodal.MediaRow(id, "audio", b, b.length.toLong)
    }
    val batch = Seq(
      row(900001L, srcText),
      row(900002L, srcText.replaceFirst("\\S+", "zzz")),
      row(900003L, "totally unrelated noise payload qqq"))
    val got = Multimodal.phashPairsFromIndex(spark, table, batch.toDS())
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getInt(3)).toMap
    assert(got.get((900001L, srcId)).contains(0), s"verbatim copy: $got")
    // brute cross-check from the driver-side signatures
    val stored = Multimodal.mediaPhashOf(Multimodal.mediaTable(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fresh = Multimodal.mediaPhashOf(batch.toDS())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = (for {
      (ni, nk, ns) <- fresh; (oi, ok, os) <- stored
      if nk == ok && ni != oi &&
        java.lang.Long.bitCount(ns ^ os) <= Multimodal.PhashMaxHamming
    } yield (ni, oi) -> java.lang.Long.bitCount(ns ^ os)).toMap
    assert(got == brute)
  }

  test("s19/s20 filtered search: every neighbor inside the predicate, " +
      "pre-filter recall floor, and the post-filter starvation it avoids") {
    import graft.llm.Similarity
    val labels = graft.core.Tables.load(spark, sfDir, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val exact = rows(Similarity.knnFiltered(spark, sfDir))
    val approx = rows(Similarity.knnFilteredLsh(spark, sfDir))
    assert(exact.nonEmpty && approx.nonEmpty)
    // the filtered-search contract: results never leave the predicate
    (exact ++ approx).foreach { case (q, n, _) =>
      assert(labels(n) == labels(q), s"query $q got out-of-label $n")
    }
    // every query with >= 3 label-mates gets a FULL top-3 from s20 —
    // the property post-filtering an unfiltered top-k cannot give
    val mates = labels.groupBy(_._2).view.mapValues(_.size).toMap
    val perQ = approx.groupBy(_._1).view.mapValues(_.size).toMap
    labels.filter(_._1 < 20).foreach { case (q, l) =>
      if (mates(l) - 1 >= 3)
        assert(perQ.getOrElse(q, 0) == 3, s"query $q: ${perQ.get(q)} of 3")
    }
    // post-filtering s6's unfiltered top-3 by label, by contrast,
    // starves most queries (label share ~1/10 of any top list)
    val post = rows(Similarity.knnLsh(spark, sfDir))
      .filter { case (q, n, _) => labels(n) == labels(q) }
    assert(post.size < approx.size / 2,
      s"post-filter kept ${post.size} vs pre-filter ${approx.size} — " +
        "fixture no longer demonstrates the starvation")
    // MEASURED recall of the budgeted pre-filter tier vs filtered brute
    val truth = exact.filter(_._3 <= 3).map(t => (t._1, t._2)).toSet
    val got = approx.map(t => (t._1, t._2)).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    info(f"s20 filtered recall@3 = $recall%.3f over ${truth.size} truths")
    assert(recall >= 0.5, s"filtered ANN recall $recall below floor")
  }
}
