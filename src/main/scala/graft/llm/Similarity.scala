package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType
import graft.core.Tables

/** Embedding similarity search (SURVEY §4.3 north-star) over the
  * `embeddings` table (64-dim float vectors, integer cluster label).
  *
  * Scale design:
  *  - [[knnBrute]] is the exactness baseline: the (small) query set is
  *    broadcast, so the plan is a BroadcastNestedLoopJoin streamed over
  *    the corpus — one scan, no shuffle of the big side; top-k via a
  *    window partitioned by query id (bounded state per query).
  *  - [[knnIvf]] is the scale path: an IVF-style search that probes
  *    only the query's coarse cell (here the pre-assigned `label`
  *    column standing in for a KMeans-assigned centroid id at 100 TB;
  *    see [[kmeansCells]]). Probing cells turns the cross join into an
  *    equi-join on the cell id — shuffle keyed by cell, cost
  *    O(n / #cells) per query.
  *  - Distance math uses built-in higher-order functions (`zip_with` +
  *    `aggregate`) over arrays cast to double — sequential fold, so
  *    DuckDB's list_dot_product (same left-to-right order) reproduces
  *    it exactly; compared values rounded to 6 dp.
  *
  * Embeddings are float32 on disk; all arithmetic is double.
  */
object Similarity {

  /** Dot product via the engine's codegen'd [[graft.functions.VecDot]]
    * expression (left-to-right summation — DuckDB-identical).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** Cosine similarity = dot / (||a|| * ||b||). Prefer the
    * precomputed-norm form below in joins.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Vectors with their norms precomputed once per row — a pair join
    * then does ONE dot per pair instead of three (the norms of both
    * sides ride along the join instead of being refolded per pair).
    */
  private def emb(s: SparkSession, dir: String): DataFrame = {
    // Single-file test input = one split; the pair joins are CPU-bound
    // → spread rows across cores (no-op posture at real scale).
    embOf(Dedup.spreadIfNarrow(Tables.load(s, dir, "embeddings")))
  }

  /** [[emb]]'s projection over an arbitrary (vec_id, label, embedding)
    * frame — the entry point ingest paths use for NEW vectors.
    */
  private[llm] def embOf(df: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    df.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Pairwise cosine from precomputed norms. */
  private def pairCos(av: Column, an: Column, bv: Column, bn: Column): Column =
    dot(av, bv) / (an * bn)

  /** Final exact-top-k presentation shared by every ANN tier: ranks
    * (q_id, vec_id, sim) rows per query through the `topk_by` bounded
    * heap and emits (q_id, vec_id, sim, rk) in the s1 column contract.
    * Order and tie rule are IDENTICAL to the
    * `row_number() OVER (ORDER BY sim DESC, vec_id)` window this
    * replaces (heap keeps the largest ord, ties to the smallest id,
    * output sorted the same way — [[graft.functions.TopKBy]]), so
    * every oracle row is unchanged; what changes is the plan: the
    * aggregate partial-aggregates map-side (each task exchanges ≤ k
    * rows per query instead of sorting its whole scored stream for a
    * rank window), the shape that survives 100 TB (VERDICT r14 #2).
    */
  private def finalTopK(scored: DataFrame, topK: Int): DataFrame = {
    graft.functions.TopKFunctions.register(scored.sparkSession)
    scored.groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("sim"), col("vec_id"), lit(topK)).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.ord").as("sim"), (col("pos") + 1).cast(LongType).as("rk"))
  }

  // -- s1: brute-force top-k ----------------------------------------------
  /** Exact cosine top-5 over the whole corpus for queries vec_id < 20.
    * Ties broken by neighbor id so ranks are deterministic.
    */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    // ranked through the SAME bounded heap as every other tier
    // (VERDICT r15 #6): the q_id rank window this replaces shuffled
    // the full n·|Q| scored stream to |Q| partitions — skew by
    // construction at corpus scale; `finalTopK` partial-aggregates to
    // ≤ k rows per (task, query) before the exchange. Order and tie
    // rule are pinned identical (sim desc, vec_id asc), so every
    // oracle row is unchanged.
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    finalTopK(e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim")),
      5)
  }

  // -- s19/s20: metadata-FILTERED search -----------------------------------
  /** s19 — filtered exact kNN: each query's neighbors are restricted
    * to the query's OWN label before ranking — the vector-DB
    * "filtered search" contract (k results INSIDE the predicate, not
    * the post-filtered remnant of an unfiltered top-k, which starves
    * selective predicates). Brute tier: the ground truth s20's
    * pre-filtering discipline is measured against.
    */
  def knnFiltered(s: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    finalTopK(e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim")),
      topK)
  }

  /** Per-query candidate budget for the FILTERED tier: the rerank
    * fraction applies to the average label stream (n / |labels|), not
    * the corpus — a corpus-sized budget would keep every label-mate
    * and silently degenerate to exact search. Driver scalar for the
    * same reason as [[rerankBudget]] (heap k is a plan constant).
    */
  /** Candidate-budget floor for every FILTERED tier: when the
    * predicate's stream is small, exact-scoring up to this many
    * candidates costs ~nothing, and a fractional budget of a tiny
    * stream gives the heap no room to recover signature-rank errors —
    * the r14 selectivity sweep measured recall 0.767 at selectivity
    * 0.05 under the old 4·k floor vs ≥ 0.85 with this one, and at
    * selectivity ≤ floor/|corpus| the search IS exact (the documented
    * fallback-to-exact for highly selective predicates).
    */
  val FilteredBudgetFloor = 50

  private def filteredBudget(e: DataFrame): Int = {
    val r = e.agg(count(lit(1)).cast("double"),
      countDistinct(col("label")).cast("double")).head()
    // exactly GREATEST(floor, frac) — the oracle's formula. A 4·topK
    // term used to ride along; at any topK > floor/4 it silently
    // diverged from the SQL contract (ADVICE r14), and at the
    // supported topK range the 50 floor dominates it anyway.
    math.max(FilteredBudgetFloor,
      math.ceil(RerankFraction * r.getDouble(0) / r.getDouble(1)).toInt)
  }

  /** s20 — filtered ANN, PRE-FILTER discipline: the label predicate
    * applies to the signature stream BEFORE the Hamming-rank heap, so
    * every query fills its candidate budget inside its own label
    * (post-filtering an unfiltered top-C is the classic filtered-ANN
    * recall hole: a selective label's true neighbors never reach the
    * rerank). Same two-stage shape as s6 — Hamming rank on the
    * 64-bit signatures, exact cosine rerank — fully deterministic
    * (literal hyperplanes, integer Hamming, 6-dp rounds), so the
    * oracle replays the whole chain.
    *
    * Scale shape: stage 1 streams (corpus × queries-sharing-label)
    * signature rows through a bounded heap — at index scale the same
    * discipline is label-partitioned signature buckets, and the
    * persisted-LSH layout already partitions by bucket id, so a label
    * partition column composes for free.
    */
  def knnFilteredLsh(s: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    val e = emb(s, dir).withColumn("sig", lshSig(col("v")))
      .withColumn("sig2", lshSig2(col("v")))
    val topC = filteredBudget(e)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("sig").as("q_sig"), col("sig2").as("q_sig2"),
        col("v").as("qv"), col("nrm").as("qn"))
    val cand = e.select(col("vec_id"), col("label"), col("sig"), col("sig2"))
      .join(broadcast(q.select(col("q_id"), col("q_label"), col("q_sig"),
          col("q_sig2"))),
        col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .select(col("q_id"), col("vec_id"),
        (-(bit_count(col("sig").bitwiseXOR(col("q_sig"))) +
            bit_count(col("sig2").bitwiseXOR(col("q_sig2"))))
          .cast("double")).as("nh"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("nh"), col("vec_id"), lit(topC)).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("p"))
      .select(col("q_id"), col("p.id").as("vec_id"))
    finalTopK(e.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q.select(col("q_id"), col("qv"), col("qn"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim")),
      topK)
  }

  // -- s9: brute-force top-k via the bounded-heap aggregate ---------------
  /** Same exact top-5 as [[knnBrute]], computed with the `topk_by`
    * bounded-heap aggregate instead of a row_number window. Spark
    * 4's own `InferWindowGroupLimit` already spares s1 the worst case
    * (its partial WindowGroupLimit prunes each task to k per query
    * before the exchange) — what the heap aggregate removes is the
    * remaining per-task SORT of the full pair set that rank-mode
    * pruning feeds on, plus the post-shuffle sort + window-frame
    * machinery: O(n log k) heap updates vs O(n log n) sort on n =
    * |corpus|·|queries|/task pairs, no sort buffer to spill, and the
    * same ≤ k·|queries| exchange. Measured 1.45× at sf0.1; the gap
    * widens with pairs-per-task. TopKSpec pins result equality with
    * s1 and the no-Window partial-agg plan; the s9 oracle is s1's
    * SQL verbatim.
    */
  def knnBruteTopK(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("sim"), col("vec_id"), lit(5)).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.ord").as("sim"), (col("pos") + 1).cast(LongType).as("rk"))
  }

  // -- s2: IVF-style cell-probed top-k ------------------------------------
  /** ANN search probing only the query's coarse cell: top-3 neighbors
    * sharing the query's `label`. Equi-join on the cell id — the form
    * that survives 100 TB (each probe touches one cell's partitions).
    */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    finalTopK(e.join(broadcast(q), col("label") === col("q_label"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim")),
      3)
  }

  // -- s3: embedding near-dup pairs ---------------------------------------
  /** Near-duplicate vector pairs: cosine >= 0.35 within a cell
    * (threshold tuned to the synthetic corpus, whose max cross-pair
    * cosine is ~0.51). Cell blocking keeps the pair join O(cell²), the
    * standard embedding-dedup shape.
    */
  def embedDupPairs(s: SparkSession, dir: String): DataFrame = {
    // No broadcast hint: a forced full-corpus broadcast is a scale
    // killer at 100 TB. Left unhinted, AQE picks broadcast while the
    // table is small and falls back to a cell-keyed sort-merge join
    // once it isn't — both sides shuffle ONCE on the cell id and each
    // cell's pairs are enumerated locally (standard embedding-dedup
    // blocking; never all-pairs).
    val e = emb(s, dir)
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(pairCos(col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm")), 6)
          .as("sim"))
      .filter(col("sim") >= 0.35)
  }

  // -- KMeans-based IVF (API surface; validated by ScalaTest, not the
  //    SQL oracle — KMeans cell assignment isn't SQL-reproducible) ---------
  private def fitKmeans(df: DataFrame, k: Int) = {
    import org.apache.spark.ml.clustering.KMeans
    // A coarse quantizer needs cell SHAPES, not converged centroids:
    // cap Lloyd at 4 iterations and one k-means|| init pass (each is a
    // full Spark job; r16 measured recall at 10-iter/2-step vs
    // 4-iter/1-step as 0.98 vs 1.00 at sf0.1 — on this near-isotropic
    // corpus recall is probe-fraction-limited, not centroid-limited,
    // so the extra seven jobs bought nothing). k-means|| init itself
    // is kept — RANDOM init measurably drops recall on this corpus
    // (spec-tested). At 100 TB the fit amortizes into the one-off
    // index build on a sample, not the query path.
    new KMeans().setK(k).setSeed(777L).setMaxIter(4).setInitSteps(1)
      .setFeaturesCol("features").fit(df)
  }

  private def withFeatures(df: DataFrame): DataFrame =
    // Cluster NORMALIZED vectors (spherical k-means): euclidean
    // distance on the unit sphere orders like cosine, so the quantizer
    // agrees with the search metric. Normalization via the native
    // vec_div kernel (one codegen loop; the transform-lambda form it
    // replaces interprets per element), then built-in array→vector.
    df.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(
        graft.functions.VectorFunctions.vecDiv(col("v"), col("nrm"))))

  /** Assigns every vector to a KMeans cell — the real coarse quantizer
    * an IVF index would use at scale. Deterministic via fixed seed.
    */
  def kmeansCells(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val df = withFeatures(emb(s, dir))
    fitKmeans(df, k).transform(df).select(col("vec_id"), col("prediction").as("cell"))
  }

  // -- s4: IVF with the KMeans quantizer and multi-cell probing ------------
  /** Full IVF search: the corpus is partitioned into `k` KMeans cells
    * (the fitted model IS the index — at 100 TB the fit runs once on a
    * sample and the assignment is a write-time column); each query
    * probes its `nprobe` nearest centroids and scans only those cells.
    *
    * Shape at scale: the centroid table (k rows) and the probe list
    * (|queries| × nprobe rows, with the query vectors) broadcast; the
    * corpus side is an equi-join on the cell id — no shuffle of the
    * corpus beyond its write-time cell partitioning, cost
    * O(|corpus| × nprobe / k) per query batch.
    *
    * Recall depends on the corpus having cluster structure. The
    * synthetic `embeddings` table is near-random in cosine (same-label
    * mean cos 0.0016 vs cross 0.0003 — noise dominates), the regime
    * where ANY space-partitioning index degrades toward scan (Weber,
    * Schek & Blott, VLDB'98); measured sweep at sf0.01: nprobe/k of
    * 0.25 → recall 0.63, 0.50 → 0.87-0.95 (seed/regen variance),
    * 0.75 → ≥ 0.96. Defaults pick the 0.75 point so the bench gate's
    * ≥ 0.9 floor holds across testdata regenerations; `LlmSpec`
    * additionally shows recall ≥ 0.9 at nprobe/k = 0.25 once the
    * corpus actually clusters.
    */
  def knnIvfKmeans(s: SparkSession, dir: String, k: Int = 16,
      nprobe: Int = 12, topK: Int = 5): DataFrame =
    knnIvfOn(emb(s, dir), k, nprobe, topK)

  /** The IVF probe-and-score core over an assigned corpus
    * (vec_id, v, nrm, cell) and a centroid table (cell, cv, cc) —
    * shared verbatim by the fit-in-query path ([[knnIvfOn]]) and the
    * loaded-index path ([[knnIvfFromIndex]]), so their results agree
    * by construction. Queries are vec_id < 20.
    */
  private def probeCells(assigned: DataFrame, centDf: DataFrame,
      nprobe: Int, topK: Int): DataFrame = {
    graft.functions.TopKFunctions.register(assigned.sparkSession)
    val q = assigned.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    // nearest-nprobe centroids per normalized query:
    // ||q/‖q‖ − c||² = 1 − 2·(q·c)/‖q‖ + c·c. Ranked through the
    // bounded heap on −cdist (heap keeps largest ord, ties to the
    // smallest cell — exactly ORDER BY cdist, cell): the |Q|·k
    // centroid fanout partial-aggregates to |Q|·nprobe map-side
    // instead of shuffling through a rank window (VERDICT r14 #2).
    val probes = q.crossJoin(broadcast(centDf))
      .select(col("q_id"), col("qv"), col("qn"), col("cell"),
        (lit(1.0) - lit(2.0) * dot(col("qv"), col("cv")) / col("qn")
          + col("cc")).as("cdist"))
      .groupBy("q_id")
      .agg(first(col("qv")).as("qv"), first(col("qn")).as("qn"),
        graft.functions.TopKFunctions
          .topkBy(-col("cdist"), col("cell").cast(LongType), lit(nprobe))
          .as("tk"))
      .select(col("q_id"), col("qv"), col("qn"), explode(col("tk")).as("p"))
      .select(col("q_id"), col("p.id").cast("int").as("cell"),
        col("qv"), col("qn"))
    finalTopK(assigned.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim")),
      topK)
  }

  /** IVF core over any (vec_id, v, nrm) frame — fit quantizer, assign
    * cells, rank centroids per query, probe. Queries are vec_id < 20.
    */
  def knnIvfOn(embDf: DataFrame, k: Int, nprobe: Int, topK: Int): DataFrame = {
    val s = embDf.sparkSession
    import s.implicits._
    val e = withFeatures(embDf)
    val model = fitKmeans(e, k)
    // persisted: the assignment feeds BOTH the query/probe subtree and
    // the corpus side of the cell join — without the cache the KMeans
    // transform lineage executes twice; released before returning (the
    // small result is checkpointed below)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("v"), col("nrm"), col("prediction").as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    val centDf = cents.toDF("cell", "cv")
      .withColumn("cc", dot(col("cv"), col("cv")))
    try probeCells(assigned, centDf, nprobe, topK).localCheckpoint(true)
    finally assigned.unpersist()
  }

  /** Builds and PERSISTS the IVF index: the cell-assigned corpus as a
    * Hive-partitioned parquet layout (`cells/cell=N/…` — a probe of p
    * cells lists/reads only those directories) plus the k-row centroid
    * table. This is the write-time half of the 100 TB posture the
    * in-query s4 documents: the KMeans fit (on a sample, at scale)
    * runs ONCE here, and every later search just reads the layout —
    * [[knnIvfFromIndex]] plans no fit at all.
    */
  def buildIvfIndex(s: SparkSession, dir: String, indexDir: String,
      k: Int = 16): Unit =
    buildIvfIndexFrom(Dedup.spreadIfNarrow(
      Tables.load(s, dir, "embeddings")), indexDir, k)

  /** [[buildIvfIndex]] over an arbitrary (vec_id, label, embedding)
    * frame — the write step ingest pipelines call directly.
    */
  def buildIvfIndexFrom(vecs: DataFrame, indexDir: String,
      k: Int = 16): Unit = {
    val s = vecs.sparkSession
    import s.implicits._
    val e = withFeatures(embOf(vecs))
    val model = fitKmeans(e, k)
    graft.ops.Partitioning.writePartitioned(
      model.transform(e)
        .select(col("vec_id"), col("v"), col("nrm"), col("prediction").as("cell")),
      s"$indexDir/cells", "cell")
    model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cell", "cv")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$indexDir/centroids")
  }

  /** Appends NEW embeddings to a [[buildIvfIndex]] layout without
    * refitting — the FAISS `add` posture: the stored centroids are
    * the quantizer, and a new vector's cell is its nearest stored
    * centroid. The centroid table is tiny by construction (k rows),
    * so it folds into the plan as LITERALS: assignment becomes
    * `least(struct(dist_0, 0), …, struct(dist_{k-1}, k-1))` — one
    * codegen projection per vector, no shuffle, no fit, no join —
    * and Spark's struct ordering reproduces exactly MLlib's
    * first-minimal-index tie rule (min distance, then min cell).
    * Dynamic partitioning lands new files only in the touched cell
    * directories; per-ingest cost is O(batch). Centroids drift as
    * the corpus grows — the standard operational answer is periodic
    * re-fit + rewrite (a [[buildIvfIndex]] rerun), not per-batch
    * retraining; the spec pins assignment parity with the build's
    * own `KMeans.transform`.
    */
  def appendToIvfIndex(s: SparkSession, newVecs: DataFrame,
      indexDir: String): Unit = {
    val cents = s.read.parquet(s"$indexDir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val e = embOf(newVecs)
    // ||v/‖v‖ − c||² = 1 − 2·(v·c)/‖v‖ + c·c, the probeCells formula;
    // the constant 1 cancels in argmin but is kept for readability
    val dists = cents.map { case (cell, cv) =>
      val cc = cv.map(x => x * x).sum
      struct(
        (lit(1.0) - lit(2.0) * dot(col("v"), typedLit(cv)) / col("nrm")
          + lit(cc)).as("d"),
        lit(cell).as("c"))
    }
    e.withColumn("cell", least(dists: _*).getField("c"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cell").parquet(s"$indexDir/cells")
  }

  /** IVF search against a [[buildIvfIndex]] layout: read the centroid
    * table and the partitioned cells, probe — the query-path twin of
    * the build step. Same scoring core as [[knnIvfOn]], so given the
    * same fit inputs the results are identical (spec-checked); the
    * plan contains only scans and joins, no estimator.
    */
  def knnIvfFromIndex(s: SparkSession, indexDir: String, nprobe: Int = 12,
      topK: Int = 5): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val assigned = s.read.parquet(s"$indexDir/cells")
    val centDf = s.read.parquet(s"$indexDir/centroids")
      .withColumn("cc", dot(col("cv"), col("cv")))
    probeCells(assigned, centDf, nprobe, topK)
  }

  // -- PQ: product-quantized index + ADC search ---------------------------
  /** Product quantization geometry: [[Dims]] = 64 dims → 16 subspaces
    * × 4 dims, 64 centroids per subspace — 16 six-bit codes (96 bits)
    * per stored vector vs 256 bytes of fp32 (Jégou et al., TPAMI
    * 2011; the FAISS storage workhorse). Sized to the corpus: the
    * synthetic embeddings are near-isotropic in cosine (documented at
    * [[knnIvfKmeans]]), the hardest quantization regime — at the
    * round-8 geometry (8×16 = 32 bits) even k-means-fitted codebooks
    * cap raw-ADC recall@5 near 0.14, while 96-bit codes plus the
    * [[PqRerank]] exact tier measure ≥ 0.9.
    */
  val PqM = 16
  val PqK = 64
  /** ADC candidates kept per query for the exact rerank tier (the
    * FAISS refine posture): ADC ranks the WHOLE corpus from codes
    * alone — that cheap full scan is the point of PQ — then only the
    * top [[PqRerank]] ids fetch their fp vector for exact scoring.
    * O(C·|Q|) id lookups at any scale; 2.5% of this corpus.
    */
  val PqRerank = 50

  /** Fits the per-subspace codebooks and writes the PQ index: a
    * `codes` table (vec_id, codes array — each entry the vector's
    * nearest centroid in that subspace) and a `codebooks` table
    * (sub, code, cv). Vectors are unit-normalized FIRST, so the dot
    * against a reconstruction decomposes exactly across subspaces
    * and ADC approximates cosine directly.
    *
    * Build cost: m seeded KMeans fits over (n × Dims/m)-dim points —
    * at 100 TB the fits run once on a sample (like the IVF build) —
    * then ONE `pq_encode` projection writes every vector's codes: the
    * fitted centroids fold into the plan as a flat literal, so the
    * encode is a single scan with no joins (the round-8 form chained
    * m assignment joins). `pq_encode`'s exact min-L2 argmax agrees
    * with `KMeans.transform`'s nearest-centroid rule (min distance,
    * then min index — the [[appendToIvfIndex]] parity argument one
    * level down).
    */
  def buildPqIndex(s: SparkSession, dir: String, indexDir: String,
      m: Int = PqM, k: Int = PqK): Unit = {
    import s.implicits._
    val dsub = Dims / m
    val unit = emb(s, dir)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.vecDiv(col("v"), col("nrm")).as("uv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = (0 until m).flatMap { sub =>
      val sv = unit.select(
        org.apache.spark.ml.functions.array_to_vector(
          slice(col("uv"), sub * dsub + 1, dsub)).as("features"))
      fitKmeans(sv, k).clusterCenters.zipWithIndex
        .map { case (c, i) => (sub, i, c.toArray) }
    }
    val flat = new Array[Double](m * k * dsub)
    centroids.foreach { case (sub, code, cv) =>
      cv.indices.foreach(j => flat((sub * k + code) * dsub + j) = cv(j))
    }
    unit.select(col("vec_id"),
        graft.functions.VectorFunctions.pqEncode(col("uv"), flat, m)
          .as("codes"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$indexDir/codes")
    centroids.toDF("sub", "code", "cv")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$indexDir/codebooks")
    unit.unpersist()
  }

  /** ADC search over a [[buildPqIndex]] layout — the fully-composed
    * compressed-search path: each query dots the m·k codebook
    * centroids ONCE into a flat distance table (|Q|·m·k doubles,
    * broadcast), then every stored vector is scored by the native
    * `pq_adc` kernel — m array lookups in one codegen loop over the
    * codes column; the ADC scan never reads the fp corpus. With
    * `rerank` > 0 (the default, the production posture) the top
    * `rerank` ADC candidates then fetch their fp vector BY ID for an
    * exact-cosine final ranking; `rerank = 0` returns the raw ADC
    * scores (the reconstruction-identity form the specs pin).
    * Ranking at both tiers is the `topk_by` bounded heap, so nothing
    * sorts and each exchange carries ≤ k rows per query per task.
    */
  def knnPqFromIndex(s: SparkSession, dir: String, indexDir: String,
      topK: Int = 5, m: Int = PqM, k: Int = PqK,
      rerank: Int = PqRerank): DataFrame = {
    val unit = unitVecs(s, dir)
    val q = unit.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("uv").as("quv"))
    val codes = s.read.parquet(s"$indexDir/codes")
    val cb = s.read.parquet(s"$indexDir/codebooks")
    if (rerank <= 0) pqAdcSearch(codes, cb, q, topK, m, k)
    else rerankExact(
      pqAdcSearch(codes, cb, q, rerank, m, k).select(col("q_id"), col("vec_id")),
      unit, q, topK)
  }

  /** (vec_id, uv) unit-normalized corpus — the frame every PQ stage
    * (codebook sampling, encode, queries, rerank) reads.
    */
  private def unitVecs(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      graft.functions.VectorFunctions.vecDiv(col("v"), col("nrm")).as("uv"))

  /** The ADC scoring core over a codes table (vec_id, codes), a
    * codebook (sub, code, cv) and unit-normalized queries
    * (q_id, quv) — shared verbatim by the fitted-index path
    * ([[knnPqFromIndex]]) and the deterministic-codebook s10 query
    * ([[knnPqInline]]), so the kernel plumbing is identical whether
    * the codebook came from a KMeans fit or from corpus samples.
    * ADC scores round to 6 dp BEFORE ranking so the candidate cutoff
    * is tie-stable cross-engine (ties to the smaller vec_id).
    */
  private def pqAdcSearch(codes: DataFrame, cb: DataFrame, q: DataFrame,
      topK: Int, m: Int = PqM, k: Int = PqK): DataFrame = {
    val s = codes.sparkSession
    graft.functions.TopKFunctions.register(s)
    codes
      .crossJoin(broadcast(pqDistTable(q, cb, m, k)))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.VectorFunctions
          .pqAdc(col("codes"), col("dt")), 6).as("sim"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("sim"), col("vec_id"), lit(topK)).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.ord").as("sim"), (col("pos") + 1).cast(LongType).as("rk"))
  }

  /** Per-query flat ADC distance table: idx = sub·k + code, value =
    * q_sub · c — |Q| rows of m·k doubles, built once and broadcast.
    */
  private def pqDistTable(q: DataFrame, cb: DataFrame,
      m: Int = PqM, k: Int = PqK): DataFrame = {
    val dsub = Dims / m
    q.crossJoin(broadcast(cb))
      .select(col("q_id"),
        (col("sub") * k + col("code")).as("idx"),
        dot(slice(col("quv"), col("sub") * lit(dsub) + 1, lit(dsub)),
          col("cv")).as("d"))
      .groupBy("q_id")
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("d")))),
        x => x.getField("d")).as("dt"))
  }

  /** The exact rerank tier shared by s10/s11 and the fitted-index
    * path: each (q_id, vec_id) candidate fetches its fp unit vector
    * by id — a broadcast-join lookup of C·|Q| rows, never a corpus
    * scan — and the final top-k ranks by exact cosine through the
    * bounded heap (ties to the smaller vec_id, the s1 discipline).
    */
  private def rerankExact(cands: DataFrame, unit: DataFrame, q: DataFrame,
      topK: Int): DataFrame =
    unit.join(broadcast(cands), "vec_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("vec_id"),
        round(dot(col("quv"), col("uv")), 6).as("sim"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("sim"), col("vec_id"), lit(topK)).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.ord").as("sim"), (col("pos") + 1).cast(LongType).as("rk"))

  /** vec_ids whose unit subvectors ARE the deterministic codebooks:
    * code c ↦ vec_id (21 + 29·c) mod 500 — 29 is coprime to 500 so
    * the [[PqK]] ids are distinct, and every id exists at every SF
    * (the smallest corpus has 500 vectors). Sampling centroids FROM
    * the data replaces the round-8 seeded gaussians: a gaussian
    * centroid has norm ≈ √dsub while a unit vector's subvector has
    * norm ≈ √(dsub/Dims) — an 8× scale mismatch that made
    * nearest-centroid assignment direction-only and ADC sums
    * meaningless (measured s10 recall 0.13 at sf0.1). Sampled
    * centroids sit at the data's own scale, and on this isotropic
    * corpus k-means fitting buys almost nothing over them (0.43 vs
    * 0.43 raw-ADC recall at equal bit budget) — while preserving
    * what the gaussians bought: cross-engine determinism, so the
    * full encode → ADC → rerank pipeline keeps its
    * rows+schema+hash oracle row.
    */
  val PqSampleIds: Seq[Long] =
    (0 until PqK).map(c => ((21 + 29 * c) % 500).toLong)

  /** The [[PqK]] sampled unit vectors collected ONCE, code-ordered —
    * a tiny driver-side read of the s2-centroid class (codebooks are
    * index-build metadata): folding them into the plan as literals is
    * what lets the encode run as one scan-side `pq_encode` kernel
    * call instead of a centroid-fanout join.
    */
  private def pqSampleUnits(unit: DataFrame): Array[Array[Double]] = {
    val byId = unit.filter(col("vec_id").isin(PqSampleIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    require(byId.size == PqK,
      s"deterministic PQ codebooks sample vec_ids 0..499 and need all " +
        s"$PqK of them; found ${byId.size} — the corpus must hold at " +
        "least 500 vectors with contiguous vec_ids (every graft SF does)")
    PqSampleIds.map(byId).toArray
  }

  /** Row-major flat codebooks for the `pq_encode` kernel:
    * flat[(sub·PqK + code)·dsub + i] = sample(code).uv[sub·dsub + i].
    */
  private def pqBooksFlatOf(samples: Array[Array[Double]]): Array[Double] = {
    val dsub = Dims / PqM
    val flat = new Array[Double](PqM * PqK * dsub)
    for { sub <- 0 until PqM; code <- 0 until PqK; j <- 0 until dsub }
      flat((sub * PqK + code) * dsub + j) = samples(code)(sub * dsub + j)
    flat
  }

  /** The same codebooks as a (sub, code, cv) table for the distance-
    * table build ([[pqDistTable]] dots each QUERY against every
    * centroid — |Q|·PqM·PqK rows, join-shaped, not kernel-shaped).
    */
  private def pqBooksDfOf(s: SparkSession,
      samples: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    val dsub = Dims / PqM
    (for { sub <- 0 until PqM; code <- 0 until PqK }
      yield (sub, code,
        samples(code).slice(sub * dsub, (sub + 1) * dsub).toSeq))
      .toDF("sub", "code", "cv")
  }

  /** s10 — PQ ADC search with the deterministic data-sampled
    * codebooks ([[PqSampleIds]]): unit-normalize, min-L2-encode every
    * vector with the `pq_encode` codegen kernel (one scan-side
    * projection — no encode shuffle at all; ties to the smallest
    * code), build each query's flat distance table, score the whole
    * corpus with the `pq_adc` kernel, keep the ADC top [[PqRerank]]
    * through the `topk_by` heap, and rank those candidates by exact
    * cosine. Same plan shape as [[knnPqFromIndex]] with the encode
    * step inlined (at 100 TB the encode is a write-time projection;
    * the fitted-index path shows that form). Measured recall@5 ≥ 0.9
    * at both sf0.01 and sf0.1 — floor-gated in the bench artifact.
    */
  def knnPqInline(s: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    val unit = unitVecs(s, dir)
    val samples = pqSampleUnits(unit)
    val codes = unit.select(col("vec_id"),
      graft.functions.VectorFunctions.pqEncode(col("uv"),
        pqBooksFlatOf(samples), PqM).as("codes"))
    val q = unit.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("uv").as("quv"))
    rerankExact(
      pqAdcSearch(codes, broadcast(pqBooksDfOf(s, samples)), q, PqRerank)
        .select(col("q_id"), col("vec_id")),
      unit, q, topK)
  }

  // -- s12: k-NN label vote / label-noise detection -----------------------
  /** s12 — retrieval-based labeling: each query vector takes the
    * majority label of its exact top-5 cosine neighbors (ties toward
    * the smallest label id), and `agree` flags whether its OWN label
    * matches the vote. The curation use is label-noise detection —
    * documents whose assigned class disagrees with their embedding
    * neighborhood are review/drop candidates (the classic k-NN noise
    * filter, Wilson 1972 editing) — and the same query IS k-NN
    * classification for unlabeled points.
    *
    * Scale shape: rides s9's heap-ranked exact search (queries
    * broadcast, no corpus shuffle, ≤ k·|Q| exchange), then joins the
    * tiny (q_id, vec_id) neighbor list back to labels — AQE
    * broadcasts it — and aggregates |Q|·k rows. The production-scale
    * variant swaps the s9 stage for any index-backed search (s2/s6/
    * s10/s11) with identical downstream plumbing.
    */
  def knnLabelVote(s: SparkSession, dir: String): DataFrame = {
    val lbl = emb(s, dir).select(col("vec_id"), col("label"))
    val own = lbl.select(col("vec_id").as("q_id"), col("label").as("own_label"))
    val w = Window.partitionBy("q_id").orderBy(desc("votes"), col("label"))
    knnBruteTopK(s, dir)
      .join(lbl, "vec_id")
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(own, "q_id")
      .select(col("q_id"), col("own_label"),
        col("label").as("pred_label"), col("votes"),
        when(col("own_label") === col("label"), 1).otherwise(0)
          .cast("int").as("agree"))
  }

  // -- s11: composed IVF + residual PQ (the production ANN layout) --------
  /** Coarse-quantizer cell count for the oracle-gated composed path.
    * Tiny by design: what s11 gates is the COMPOSITION (coarse assign →
    * residual encode → probe-filtered ADC → exact rerank), not cell
    * geometry — the fitted paths (s2/s4) own partition quality.
    */
  val IvfPqCells = 4
  /** Cells probed per query (nprobe): 3 of 4 — the same ~75% scanned
    * fraction s4's defaults pick, and for the same reason: this
    * synthetic corpus is near-isotropic in cosine, the regime where
    * ANY space-partitioning index's recall is ceiling-limited by the
    * fraction it scans (Weber, Schek & Blott, VLDB'98). Measured
    * probe-stage ceiling ≈ 0.8 here; on a corpus with real cluster
    * structure the same pipeline does better while probing far less —
    * MEASURED, not argued: recall 1.0 at 10% probed mass on a
    * 40-Gaussian mixture fixture (PipelineOpsSpec "clustered corpus",
    * via [[knnIvfPqOf]] with one sampled cell per cluster, nprobe 4).
    */
  val IvfPqProbes = 3

  /** Coarse cells each vector is assigned (and encoded) to — FAISS-
    * style multiple assignment (r13, VERDICT ask #3). Single
    * assignment caps recall at the probed fraction on an isotropic
    * corpus (~0.8 measured here at nprobe 3/4); with 2 distinct cells
    * per vector and only one cell unprobed, every vector is reachable
    * — the geometric ceiling goes to 1.0 and recall is limited only
    * by ADC ranking quality within the rerank budget. Cost: the codes
    * table doubles (16 small ints + a cell id per copy — still ~an
    * order of magnitude below the fp corpus in bytes), never the
    * vectors themselves.
    */
  val IvfPqAssign = 2

  /** s11's exact-rerank candidate budget per query (the IVFPQ+refine
    * step's refine width). Wider than the shared [[PqRerank]]: with
    * the multi-assign ceiling at 1.0, the budget is what recall
    * actually trades against, and 200 exact dot products per query is
    * still a bounded broadcast-lookup tier (4k vectors total at
    * |Q|=20), not a scan.
    */
  val IvfPqRerank = 200

  /** vec_ids whose unit vectors ARE the coarse cells — the
    * [[PqSampleIds]] determinism pattern one level up. Data-sampled
    * cells are unit-norm by construction, so max-dot assignment IS
    * min-L2 on the sphere (no ‖c‖² term needed), and residuals
    * uv − cell sit at the same scale as the codebook samples.
    */
  val CoarseCellIds: Seq[Long] = Seq(100L, 200L, 300L, 400L)

  /** s11 — IVF + residual-PQ ADC search with exact rerank, the two
    * halves of this engine's ANN surface composed the way a
    * production 100 TB index is actually built (the IVF-PQ + refine
    * layout of Jégou et al. 2011 / FAISS): every vector is assigned
    * to its nearest coarse cell (data-sampled unit vectors, so
    * max-dot IS min-L2), the RESIDUAL uv − cell is min-L2 PQ-encoded
    * (residuals are smaller than raw vectors, so the same codebook
    * budget quantizes finer), a query ADC-scores only the
    * [[IvfPqProbes]] cells nearest to it — sim(q,x) ≈ q·c(x) +
    * q·r̂(x), the first term a per-(query,cell) scalar, the second
    * the [[graft.functions.PqAdc]] table lookup — and the ADC top
    * [[IvfPqRerank]] (best copy per vector under multiple assignment)
    * rerank by exact cosine.
    *
    * Scale shape: the candidate stage is an equi-join on cell id
    * (probe list broadcast — |Q|·nprobe rows), so the corpus never
    * cross-joins; the codes table is 16 small ints + a cell id per
    * vector (the ADC scan never reads the fp corpus; the rerank
    * fetches C·|Q| vectors by id); ranking at both tiers is the
    * bounded heap. At 100 TB, assignment+encode happen once at write
    * time partitioned BY cell ([[buildPqIndex]] shows the persisted
    * form), making the probe filter partition pruning, not a join.
    *
    * Quality: [[IvfPqAssign]]-way multiple assignment removes the
    * single-assign probe ceiling (with 2 distinct cells per vector and
    * one unprobed cell, every vector is reachable — geometric ceiling
    * 1.0), so recall trades only against the [[IvfPqRerank]] refine
    * budget; floor-gated at 0.8 in the bench artifact. Partition
    * quality on clusterable corpora is owned by the fitted paths (s4
    * and [[buildIvfIndex]]).
    */
  def knnIvfPq(s: SparkSession, dir: String, topK: Int = 5): DataFrame =
    knnIvfPqOf(unitVecs(s, dir), CoarseCellIds, IvfPqProbes, topK)

  /** The (cell, ccv) coarse-quantizer table from sampled corpus ids —
    * package-visible so the clustered-fixture spec builds the same
    * quantizer over its own corpus.
    */
  private[graft] def coarseCellsOf(unit: DataFrame,
      cellIds: Seq[Long]): DataFrame = {
    import unit.sparkSession.implicits._
    // cell ids are LONG so the heap-ranked assignment/probing below
    // keeps them without casts (topk_by ids are int64)
    val cellIdx = cellIds.zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("vec_id", "cell")
    broadcast(unit.join(broadcast(cellIdx), "vec_id")
      .select(col("cell"), col("uv").as("ccv")))
  }

  /** Coarse assignment: the `assign` best cells by dot (= min-L2,
    * cells unit-norm), ties to the smallest cell id — (vec_id, cell,
    * rv) with rv the residual uv − cell, one row per assigned cell.
    *
    * Shape (VERDICT r14 #2): the n·k (vector, cell) fanout collapses
    * to n·assign MAP-SIDE through the `topk_by` bounded heap — the
    * broadcast crossJoin emits every cell row on the vector's own
    * partition, so the partial aggregate finishes each vector's heap
    * before the exchange, which then carries n rows (heap + uv). The
    * rank-window form this replaces shuffled and sorted all n·k rows
    * by vec_id first — the engine's one remaining avoidable full
    * shuffle at 100 TB. Residual subtraction happens after the cut
    * via a broadcast re-join of the k-row cell table (heap elements
    * are (score, id) pairs; ccv re-enters by id).
    */
  private[graft] def ivfPqAssign(unit: DataFrame, cells: DataFrame,
      assign: Int = 1): DataFrame = {
    graft.functions.TopKFunctions.register(unit.sparkSession)
    unit.crossJoin(cells)
      .select(col("vec_id"), col("uv"), col("cell"),
        dot(col("uv"), col("ccv")).as("cd"))
      .groupBy("vec_id")
      .agg(first(col("uv")).as("uv"),
        graft.functions.TopKFunctions
          .topkBy(col("cd"), col("cell"), lit(assign)).as("tk"))
      .select(col("vec_id"), col("uv"), explode(col("tk")).as("a"))
      .select(col("vec_id"), col("uv"), col("a.id").as("cell"))
      .join(cells, "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("uv"), col("ccv"), (a, b) => a - b).as("rv"))
  }

  /** The nprobe best cells per query, with q·cell riding along as the
    * ADC score's coarse term — same heap-ranked shape as
    * [[ivfPqAssign]] (ties to the smallest cell; qcd rides back out
    * of the heap element itself).
    */
  private[graft] def ivfPqProbesOf(q: DataFrame, cells: DataFrame,
      nprobe: Int): DataFrame = {
    graft.functions.TopKFunctions.register(q.sparkSession)
    q.crossJoin(cells)
      .select(col("q_id"), col("cell"), dot(col("quv"), col("ccv")).as("qcd"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("qcd"), col("cell"), lit(nprobe)).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("p"))
      .select(col("q_id"), col("p.id").as("cell"), col("p.ord").as("qcd"))
  }

  /** The s11 pipeline over an arbitrary (vec_id, uv) unit-vector frame
    * with chosen coarse cells and probe count. The spec runs it on a
    * mixture-of-Gaussians fixture to MEASURE what the isotropic-corpus
    * comment argues: with real cluster structure, recall ≥ 0.9 while
    * probing a far smaller fraction than the s11 query's 3/4 cells.
    */
  private[graft] def knnIvfPqOf(unit: DataFrame, cellIds: Seq[Long],
      nprobe: Int, topK: Int, assign: Int = IvfPqAssign,
      rerank: Int = IvfPqRerank): DataFrame = {
    val s = unit.sparkSession
    graft.functions.TopKFunctions.register(s)
    val cells = coarseCellsOf(unit, cellIds)
    val samples = pqSampleUnits(unit)
    val assigned = ivfPqAssign(unit, cells, assign)
    // residual PQ encode, the s10 min-L2 kernel — residual subtraction
    // and code assignment fuse into the SAME projection, no exchange;
    // one code row per (vector, assigned cell)
    val codes = assigned.select(col("vec_id"), col("cell"),
      graft.functions.VectorFunctions.pqEncode(col("rv"),
        pqBooksFlatOf(samples), PqM).as("codes"))
    val q = unit.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("uv").as("quv"))
    val probes = ivfPqProbesOf(q, cells, nprobe)
    // per-query distance table over the FULL query vector (q·r̂ needs
    // q_sub · codebook, not the query's own residual) — s10's qdt.
    // Under multi-assignment a vector can surface from more than one
    // probed cell with distinct ADC approximations — the best copy
    // wins per (query, vector) before the bounded-heap cut (the
    // max-aggregate keeps map-side combine; the dedup shuffles
    // (q_id, vec_id, sim) triples only)
    val cands = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(pqDistTable(q, pqBooksDfOf(s, samples))), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(col("qcd") + graft.functions.VectorFunctions
          .pqAdc(col("codes"), col("dt")), 6).as("sim"))
      .groupBy("q_id", "vec_id").agg(max(col("sim")).as("sim"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("sim"), col("vec_id"), lit(rerank)).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("c"))
      .select(col("q_id"), col("c.id").as("vec_id"))
    rerankExact(cands, unit, q, topK)
  }

  // -- persisted IVFPQ index: coarse KMeans cells + residual PQ codes ------
  /** Builds and PERSISTS the composed IVFPQ index — the FAISS
    * `IndexIVFPQ` layout, completing the index family (IVF stores fp
    * vectors per cell; PQ stores codes flat; this stores CODES PER
    * CELL): a `cells/cell=N/…` Hive-partitioned table of
    * (vec_id, codes) — the inverted lists; a probe of p cells
    * lists/reads only those directories and scans ~12 B/vector — plus
    * the k-row centroid table and the residual codebooks.
    *
    * Build = the two fits the production posture runs once on a
    * sample: a spherical KMeans coarse quantizer (the
    * [[buildIvfIndex]] fit), then per-subspace KMeans codebooks over
    * the coarse RESIDUALS uv − c(cell) (residual PQ — the quantizer
    * encodes what the cell didn't explain, Jégou et al. TPAMI 2011
    * §IV). Residuals are computed once and feed both the codebook
    * fits and the single `pq_encode` projection that writes every
    * vector's codes. The in-query s11 ([[knnIvfPq]]) shows the same
    * pipeline with deterministic data-sampled quantizers (oracle-
    * replayable); this is its fitted, persisted twin.
    */
  def buildIvfPqIndex(s: SparkSession, dir: String, indexDir: String,
      k: Int = 16, m: Int = PqM, pqK: Int = PqK): Unit = {
    import s.implicits._
    val dsub = Dims / m
    val unit = unitVecs(s, dir)
    val e = unit.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col("uv")))
    val model = fitKmeans(e, k)
    val cents = model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
    val centDf = broadcast(cents.toDF("cell", "ccv"))
    val rv = model.transform(e)
      .select(col("vec_id"), col("uv"), col("prediction").as("cell"))
      .join(centDf, "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("uv"), col("ccv"), (a, b) => a - b).as("rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val books = (0 until m).flatMap { sub =>
        val sv = rv.select(org.apache.spark.ml.functions.array_to_vector(
          slice(col("rv"), sub * dsub + 1, dsub)).as("features"))
        fitKmeans(sv, pqK).clusterCenters.zipWithIndex
          .map { case (c, i) => (sub, i, c.toArray.toSeq) }
      }
      val flat = new Array[Double](m * pqK * dsub)
      books.foreach { case (sub, code, cv) =>
        cv.indices.foreach(j => flat((sub * pqK + code) * dsub + j) = cv(j))
      }
      graft.ops.Partitioning.writePartitioned(
        rv.select(col("vec_id"), col("cell"),
          graft.functions.VectorFunctions.pqEncode(col("rv"), flat, m)
            .as("codes")),
        s"$indexDir/cells", "cell")
      cents.toDF("cell", "cv")
        .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$indexDir/centroids")
      books.toDF("sub", "code", "cv")
        .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$indexDir/codebooks")
    } finally rv.unpersist()
  }

  /** Appends NEW embeddings to a [[buildIvfPqIndex]] layout without
    * refitting — the FAISS `add` posture, composing the two stored
    * quantizers as plan literals: the k centroids fold into one
    * `least(struct(dist, cell))` assignment projection (the
    * [[appendToIvfIndex]] parity argument — min L2, then min cell,
    * exactly `KMeans.transform`'s rule), the chosen centroid re-enters
    * as a k-branch CASE of 64-double literals for the residual, and
    * the stored codebooks drive one `pq_encode` kernel call — a single
    * scan-side projection per batch, no fit, no join, no shuffle;
    * dynamic partitioning lands files only in the touched cell
    * directories, so ingest cost is O(batch). Centroid/codebook drift
    * under corpus growth is answered by periodic re-fit + rewrite
    * (a [[buildIvfPqIndex]] rerun), the [[appendToIvfIndex]] answer.
    */
  def appendToIvfPqIndex(s: SparkSession, newVecs: DataFrame,
      indexDir: String): Unit = {
    val dsub = Dims / PqM
    val cents = s.read.parquet(s"$indexDir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val books = s.read.parquet(s"$indexDir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val flat = new Array[Double](PqM * PqK * dsub)
    books.foreach { case (sub, code, cv) =>
      cv.indices.foreach(j => flat((sub * PqK + code) * dsub + j) = cv(j))
    }
    // ||u − c||² = 1 − 2·u·c + c·c over unit u; constant 1 kept for
    // readability (cancels in argmin)
    val dists = cents.map { case (cell, cv) =>
      val cc = cv.map(x => x * x).sum
      struct(
        (lit(1.0) - lit(2.0) * dot(col("uv"), typedLit(cv)) + lit(cc))
          .as("d"),
        lit(cell).as("c"))
    }
    val ccvOf = cents.tail.foldLeft(
      when(col("cell") === cents.head._1, typedLit(cents.head._2))) {
      case (acc, (cell, cv)) => acc.when(col("cell") === cell, typedLit(cv))
    }
    embOf(newVecs).select(col("vec_id"),
        graft.functions.VectorFunctions.vecDiv(col("v"), col("nrm")).as("uv"))
      .withColumn("cell", least(dists: _*).getField("c"))
      .withColumn("rv", zip_with(col("uv"), ccvOf, (a, b) => a - b))
      .select(col("vec_id"), col("cell"),
        graft.functions.VectorFunctions.pqEncode(col("rv"), flat, PqM)
          .as("codes"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cell").parquet(s"$indexDir/cells")
  }

  /** IVFPQ search against a [[buildIvfPqIndex]] layout: rank the
    * stored centroids per query by the ASSIGNMENT metric (min L2 —
    * probe ranking must agree with how vectors were routed, or a
    * query's own cell can rank behind a foreign one; KMeans centroids
    * are not unit-norm, so max-dot and min-L2 genuinely differ here,
    * unlike s11's unit cell vectors), scan only the probed cell
    * directories' code rows with the `pq_adc` kernel (coarse term
    * q·c + residual table sum, the s11 ADC decomposition), keep the
    * ADC top `rerank` through the bounded heap, and rank those few
    * candidates by exact cosine. Every ranking is `topk_by` — no
    * window anywhere — and the corpus-side scan reads only
    * (vec_id, codes) inside the probed partitions.
    */
  def knnIvfPqFromIndex(s: SparkSession, dir: String, indexDir: String,
      nprobe: Int = 4, topK: Int = 5,
      rerank: Int = IvfPqRerank): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    graft.functions.VectorFunctions.register(s)
    val unit = unitVecs(s, dir)
    val q = unit.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("uv").as("quv"))
    val cells = broadcast(s.read.parquet(s"$indexDir/centroids")
      .select(col("cell").cast(LongType).as("cell"), col("cv").as("ccv")))
    // min ||q − c||² == max (2·q·c − c·c) for unit q — heap on that
    // ord, ties to the smallest cell; qcd (the ADC coarse term) is
    // recomputed after the cut from the re-joined centroid (the heap
    // carries (ord, id) only, and the k-row re-join is free)
    val probes = q.crossJoin(cells)
      .select(col("q_id"), col("quv"), col("cell"),
        (lit(2.0) * dot(col("quv"), col("ccv"))
          - dot(col("ccv"), col("ccv"))).as("nd"))
      .groupBy("q_id")
      .agg(first(col("quv")).as("quv"),
        graft.functions.TopKFunctions
          .topkBy(col("nd"), col("cell"), lit(nprobe)).as("tk"))
      .select(col("q_id"), col("quv"), explode(col("tk")).as("p"))
      .select(col("q_id"), col("p.id").as("cell"), col("quv"))
      .join(cells, "cell")
      .select(col("q_id"), col("cell"),
        dot(col("quv"), col("ccv")).as("qcd"))
    val cb = s.read.parquet(s"$indexDir/codebooks")
    val codes = s.read.parquet(s"$indexDir/cells")
      .select(col("vec_id"), col("cell").cast(LongType).as("cell"),
        col("codes"))
    // single assignment at build → each (q, v) surfaces from exactly
    // one probed cell, no best-copy dedup needed (contrast s11's
    // multi-assignment)
    val cands = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(pqDistTable(q, cb)), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(col("qcd") + graft.functions.VectorFunctions
          .pqAdc(col("codes"), col("dt")), 6).as("sim"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("sim"), col("vec_id"), lit(rerank)).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("c"))
      .select(col("q_id"), col("c.id").as("vec_id"))
    rerankExact(cands, unit, q, topK)
  }

  // -- s6: SimHash-signature ANN (sign random projection + rerank) --------
  /** Signature bits PER WORD (the full r14 signature is two 64-bit
    * longs, `sig` + `sig2`); the low [[LshPlanes]] bits of word 0
    * double as the index layout's partition bucket.
    */
  val SigBits = 64
  /** Bits used for the partitioned index layout; 2^8 = 256 buckets. */
  val LshPlanes = 8
  val Dims = 64

  /** Fixed random hyperplanes (seeded, generated once at class init) —
    * shared verbatim with the oracle SQL as literals, so the signature
    * is exactly reproducible cross-engine. The first [[LshPlanes]]
    * planes are the layout-bucket planes (their generation order under
    * the fixed seed keeps pre-existing bucket layouts stable). r14
    * widened the signature to TWO 64-bit words (128 planes) to raise
    * the Hamming rank's recall past the 0.85 bar the other ANN tiers
    * clear: the first 64 planes are bit-identical to the r13 stream
    * (same seed, same draw order), so `sig`, every bucket id, and the
    * s23 oracle are unchanged — `sig2` is purely additive.
    */
  private val sigPlanesAll: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(777L)
    Seq.fill(2 * SigBits)(Array.fill(Dims)(rnd.nextGaussian()))
  }
  val sigPlanes: Seq[Array[Double]] = sigPlanesAll.take(SigBits)
  /** Word-1 planes (bits 64..127 of the widened signature). */
  val sigPlanesB: Seq[Array[Double]] = sigPlanesAll.drop(SigBits)
  val planes: Seq[Array[Double]] = sigPlanes.take(LshPlanes)

  /** 64-bit SimHash signature: bit i = [v · plane_i >= 0]. Cosine-
    * similar vectors agree on most sign bits (Charikar 2002), so the
    * Hamming distance between signatures estimates the angle — 64 bits
    * is enough for the estimate to RANK neighbors usefully even on a
    * corpus with weak cosine structure, where coarse bucketing loses.
    * One fused [[graft.functions.SimHash64]] kernel call (planes ride
    * as a single literal) — the unfused 64-CASE form compiled slowly
    * and cost 64 kernel dispatches per row.
    */
  def lshSig(v: Column): Column =
    graft.functions.VectorFunctions.simHash64(v, sigPlanes.flatten.toArray)

  /** Word 1 of the 128-bit signature (planes 64..127) — one more
    * fused kernel call per vector at write time; together with
    * [[lshSig]] the Hamming estimate's variance halves, which is what
    * lifts recall@3 above the 0.85 bar on this near-isotropic corpus.
    */
  def lshSig2(v: Column): Column =
    graft.functions.VectorFunctions.simHash64(v, sigPlanesB.flatten.toArray)

  /** Layout bucket id = the signature's low [[LshPlanes]] bits. */
  def lshBucket(v: Column): Column =
    lshSig(v).bitwiseAND(lit((1L << LshPlanes) - 1))

  /** Candidate budget: exact-score at most this fraction of the corpus
    * per query (the rest is filtered by the signature scan). With the
    * r14 128-bit signature, 15% measures recall 0.967 vs brute top-3
    * on the synthetic corpus (the r13 64-bit word at the same budget
    * read 0.783 — halving the Hamming estimator's variance is what
    * moved recall, and the rerank budget is NOT the runtime lever:
    * 10% measured 0.933 at the same wall-clock, the signature scan
    * dominates); the original bucket-multi-probe form managed 0.40,
    * because on a corpus that is near-random in cosine a coarse 8-bit
    * bucket equality carries far less information than a wide Hamming
    * RANK.
    */
  val RerankFraction = 0.15

  /** SimHash-rerank ANN: a two-stage search.
    *
    * Stage 1 (signature scan): every (query, vector) pair costs two
    * XOR + popcounts on the 128-bit signature — still ~50× cheaper
    * than the 64-dim dot product, and reading ONLY the (vec_id, sig,
    * sig2) columns (~20 bytes/vector vs ~260 for the vectors). The
    * bounded-heap
    * `topk_by` aggregate keeps the `RerankFraction` Hamming-nearest
    * ids per query — no sort, no shuffle of the corpus (queries
    * broadcast).
    *
    * Stage 2 (exact rerank): the ≤ 15% surviving candidates join back
    * (broadcast — |queries| × C ids) for their vectors and exact
    * cosine; top-`topK` per query.
    *
    * Fully deterministic (literal planes, count-derived budget,
    * vec_id tie-breaks) — oracle-checked end to end, unlike a fitted
    * quantizer. This is the standard sketch-scan + rerank tier
    * (Charikar'02 sketches); the multi-probe bucket form it replaced
    * could not pass recall 0.4 here because near-random vectors sit
    * near every hyperplane (same Weber/Schek/Blott degradation the s4
    * scaladoc documents — rank survives it, bucket equality does not).
    */
  def knnLsh(s: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    val e = emb(s, dir)
    hammingRerank(e.withColumn("sig", lshSig(col("v")))
      .withColumn("sig2", lshSig2(col("v"))), rerankBudget(e), topK)
  }

  /** The per-query candidate count for a corpus of `n` vectors —
    * driver-side scalar (one columnar count job, the s4 centroid-read
    * precedent) because `topk_by`'s k must be a plan constant.
    */
  private def rerankBudget(e: DataFrame): Int =
    math.max(3, math.ceil(e.count() * RerankFraction).toInt)

  /** The signature-scan + rerank core over a sig-carrying corpus
    * (vec_id, v, nrm, sig, sig2) — shared verbatim by the
    * sign-in-query path ([[knnLsh]]) and the loaded-index path
    * ([[knnLshFromIndex]]), so their results agree by construction.
    * Queries are vec_id < 20. Hamming distance is the SUM over both
    * signature words (two XOR+popcounts per pair — still ~100×
    * cheaper than the 64-dim dot product).
    */
  private def hammingRerank(e: DataFrame, topC: Int, topK: Int): DataFrame = {
    val s = e.sparkSession
    graft.functions.TopKFunctions.register(s)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig"),
        col("sig2").as("q_sig2"), col("v").as("qv"), col("nrm").as("qn"))
    // stage 1: Hamming-rank the whole corpus per query on signatures
    // alone; ord = -hamming so the heap's "largest" is the nearest,
    // ties toward the smallest vec_id (matching ORDER BY ham, vec_id)
    val cand = e.select(col("vec_id"), col("sig"), col("sig2"))
      .join(broadcast(q.select(col("q_id"), col("q_sig"), col("q_sig2"))),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (-(bit_count(col("sig").bitwiseXOR(col("q_sig"))) +
            bit_count(col("sig2").bitwiseXOR(col("q_sig2"))))
          .cast("double")).as("nh"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("nh"), col("vec_id"), lit(topC)).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("p"))
      .select(col("q_id"), col("p.id").as("vec_id"))
    // stage 2: exact cosine on the candidates only
    finalTopK(e.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q.select(col("q_id"), col("qv"), col("qn"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim")),
      topK)
  }

  // -- s13: Johnson–Lindenstrauss random-projection kNN --------------------
  /** Reduced dimensionality for the JL sketch (64 → 56). Parameter
    * sweep on this corpus (recall@3 vs brute, 10–12% budget): 16d
    * 0.60, 24d 0.67, 32d 0.77-0.80, 48d 0.883, 56d 0.933–0.950 — the
    * isotropic fixture's tiny cosine gaps need ε ≈ 1/√d below ~0.13;
    * real clustered corpora rank well at far lower d (the s11
    * fixture-geometry argument). 56d keeps the byte story (224 B
    * float32 vs 256 B full-precision, and stage 1 reads the sketch
    * column only) while lifting recall to the family norm ≥ 0.9
    * (VERDICT r14 #4; floor raised 0.8 → 0.85). The planes are a
    * PREFIX of the same seeded stream at every d, so the sweep points
    * differ only by the extra rows.
    */
  val JlDims = 56
  /** Candidate budget for the JL scan — tighter than s6's 0.15: a
    * 56-float sketch preserves RANK better than 128 sign bits, so a
    * higher recall band (0.95 vs 0.967 at sf0.1) costs ⅘ the
    * candidates (recall measured in the bench artifact against brute
    * top-3, floor 0.85).
    */
  val JlRerankFraction = 0.12

  /** Fixed Gaussian projection rows (seeded, literal-shared with the
    * oracle like [[sigPlanes]]) — the Johnson–Lindenstrauss transform:
    * x ↦ (⟨x,g₁⟩,…,⟨x,g_d⟩) preserves angles within ~1/√d distortion,
    * so reduced-space cosine RANKS the corpus well enough to cut the
    * exact-scan budget to [[JlRerankFraction]].
    */
  val jlPlanes: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(1313L)
    Seq.fill(JlDims)(Array.fill(Dims)(rnd.nextGaussian()))
  }

  /** The [[JlDims]]-dim JL sketch of a vector — one codegen [[dot]]
    * kernel per projection row (plan literals), one scan-side
    * projection per vector.
    */
  def jlReduce(v: Column): Column =
    array(jlPlanes.map(p => dot(v, typedLit(p.toSeq))): _*)

  /** JL-sketch ANN: the real-valued sibling of s6's 1-bit sketch.
    *
    * Stage 1 scans (vec_id, rv) pairs only — a [[JlDims]]-dim dot per
    * (query, vector) pair, half the multiplies of full cosine (a
    * persisted layout would store `rv` alongside the s6 signature,
    * in float32 for the byte win; same index pattern). Reduced-space
    * cosine rounds to 6 dp BEFORE the bounded-heap
    * cutoff (ties to the smaller vec_id) so the candidate set is
    * tie-stable cross-engine — the s10 discipline. Stage 2 is the s1
    * exact-cosine rerank over the ≤ 10% survivors.
    *
    * Fully deterministic (literal projection rows, count-derived
    * budget) — oracle-checked end to end.
    */
  def knnJl(s: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    val e = emb(s, dir).withColumn("rv", jlReduce(col("v")))
      .withColumn("rn", sqrt(dot(col("rv"), col("rv"))))
    val topC = math.max(topK,
      math.ceil(e.count() * JlRerankFraction).toInt)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("rv").as("q_rv"),
        col("rn").as("q_rn"), col("v").as("qv"), col("nrm").as("qn"))
    val cand = e.select(col("vec_id"), col("rv"), col("rn"))
      .join(broadcast(q.select(col("q_id"), col("q_rv"), col("q_rn"))),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("rv"), col("q_rv")) / (col("rn") * col("q_rn")), 6)
          .as("est"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("est"), col("vec_id"), lit(topC)).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("p"))
      .select(col("q_id"), col("p.id").as("vec_id"))
    finalTopK(e.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q.select(col("q_id"), col("qv"), col("qn"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim")),
      topK)
  }

  /** Builds and PERSISTS the LSH index: the bucket-assigned corpus as
    * a Hive-partitioned parquet layout (`buckets/bucket=N/…`) carrying
    * the 64-bit signature column. There is no fit at all — the
    * hyperplanes are constants — so the build is a single narrow
    * projection pass; what the layout buys at 100 TB is that the 64
    * dot products per vector run ONCE at write time: the search's
    * stage-1 scan then reads only the tiny (vec_id, sig) columns of
    * the index ([[knnLshFromIndex]] plans no signature arithmetic on
    * the corpus side), and the bucket partitioning gives ingest
    * append locality plus optional bucket-restricted probing.
    */
  def buildLshIndex(s: SparkSession, dir: String, indexDir: String): Unit =
    buildLshIndexFrom(Dedup.spreadIfNarrow(
      Tables.load(s, dir, "embeddings")), indexDir)

  /** [[buildLshIndex]] over an arbitrary (vec_id, label, embedding)
    * frame — the write step ingest pipelines call directly.
    */
  def buildLshIndexFrom(vecs: DataFrame, indexDir: String): Unit = {
    graft.ops.Partitioning.writePartitioned(
      embOf(vecs).withColumn("sig", lshSig(col("v")))
        .withColumn("sig2", lshSig2(col("v")))
        .withColumn("bucket", col("sig").bitwiseAND(lit((1L << LshPlanes) - 1))),
      s"$indexDir/buckets", "bucket")
    // a full build writes every row with both signature words — record
    // that as LAYOUT metadata (the IngestUpsert _graft_buckets
    // discipline) so the search plans the plain column fast path
    writeSigLayoutMarker(vecs.sparkSession, s"$indexDir/buckets")
  }

  /** Signature-layout marker: present ⇔ EVERY row of the layout
    * carries a non-null `sig2` word. Column presence alone cannot
    * prove that (an r14 append into a pre-r14 layout leaves mixed
    * files whose old rows read sig2 = null under mergeSchema), and
    * the r14 coalesce-backfill guard it forced kept even fully-new
    * layouts reading the full vector column (ADVICE r15). The marker
    * is layout METADATA, recorded at build/append time when the
    * writer KNOWS the invariant holds — the [[IngestUpsert]]
    * `_graft_buckets` discipline.
    */
  private val SigLayoutMarker = "_graft_siglayout"
  private val SigLayoutV2 = "sig128-v2"

  private def hadoopFs(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def writeSigLayoutMarker(s: SparkSession, bucketsDir: String): Unit = {
    val fs = hadoopFs(s, bucketsDir)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$bucketsDir/$SigLayoutMarker"), true)
    try out.write(SigLayoutV2.getBytes("UTF-8")) finally out.close()
  }

  private def sigLayoutIsV2(s: SparkSession, bucketsDir: String): Boolean =
    try {
      val fs = hadoopFs(s, bucketsDir)
      val p = new org.apache.hadoop.fs.Path(s"$bucketsDir/$SigLayoutMarker")
      fs.exists(p) && {
        val in = fs.open(p)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          n > 0 && new String(buf, 0, n, "UTF-8").trim == SigLayoutV2
        } finally in.close()
      }
    } catch { case _: Throwable => false }

  /** True when the buckets dir already holds committed data files —
    * the append-into-existing-layout case the marker must not
    * misrepresent (appending v2 rows into a markerless layout leaves
    * it MIXED, so the marker stays absent there).
    */
  private def hasLayoutData(s: SparkSession, bucketsDir: String): Boolean =
    try {
      val fs = hadoopFs(s, bucketsDir)
      val root = new org.apache.hadoop.fs.Path(bucketsDir)
      fs.exists(root) && fs.listStatus(root).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith("bucket="))
    } catch { case _: Throwable => false }

  /** Appends a batch of NEW embeddings to a [[buildLshIndex]] layout —
    * the incremental-ingest half of the index lifecycle (the ANN
    * analogue of the fp-index append in `IngestDedup`). Hyperplanes
    * are deterministic constants, so a new vector's bucket is a pure
    * projection: the append computes buckets for the BATCH only and
    * dynamic partitioning lands new files only in the touched bucket
    * directories — existing bucket files are never read or rewritten,
    * so ingest cost is O(batch) and a 100 TB index never rebuilds.
    * Readers pick the new files up on their next scan (parquet
    * directory listing), with no coordination needed beyond the
    * store's list-after-write consistency. Spec pins: append ≡
    * build-from-scratch for search results, and untouched bucket
    * directories keep their exact file set.
    */
  def appendToLshIndex(s: SparkSession, newVecs: DataFrame,
      indexDir: String): Unit = {
    val bucketsDir = s"$indexDir/buckets"
    // layout accounting BEFORE the write: an append into an EMPTY dir
    // creates a fully-v2 layout (mark it); an append into a marked
    // layout keeps the invariant (batch rows carry sig2); an append
    // into unmarked existing data creates a MIXED layout — leave it
    // unmarked so the search keeps the per-row backfill
    val markAfter = sigLayoutIsV2(s, bucketsDir) ||
      !hasLayoutData(s, bucketsDir)
    embOf(newVecs)
      .withColumn("sig", lshSig(col("v")))
      .withColumn("sig2", lshSig2(col("v")))
      .withColumn("bucket", col("sig").bitwiseAND(lit((1L << LshPlanes) - 1)))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("bucket").parquet(bucketsDir)
    if (markAfter) writeSigLayoutMarker(s, bucketsDir)
  }

  /** Signature search against a [[buildLshIndex]] layout — the
    * query-path twin of the build step. Same scan + rerank core as
    * [[knnLsh]] (the stored `sig` column replaces the 64 in-query
    * plane dots), so the results are identical (spec-checked).
    */
  def knnLshFromIndex(s: SparkSession, indexDir: String,
      topK: Int = 3): DataFrame = {
    // Layout compatibility across the r14 signature widening, decided
    // from the [[SigLayoutMarker]] layout metadata (ADVICE r15 —
    // column PRESENCE cannot prove per-row non-nullness, and the
    // coalesce guard it forced made even fully-v2 layouts read the
    // full vector column under the 8192-literal backfill projection):
    //  - marked v2 (every build/append since the marker, and any
    //    rebuild): plain col("sig2") — the stage-1 scan reads only
    //    (vec_id, sig, sig2), ~20 B/vector, no signature arithmetic;
    //  - unmarked with a sig2 column: MIXED files (an r14 append into
    //    a pre-r14 layout) — per-row coalesce backfill from the
    //    stored vector (planes are constants, so the backfilled word
    //    equals what a rebuild would store);
    //  - unmarked without the column: pre-r14 layout — full backfill.
    // Old rows pay the 64-dot projection until a compaction rewrite.
    if (sigLayoutIsV2(s, s"$indexDir/buckets")) {
      val e = s.read.parquet(s"$indexDir/buckets")
      hammingRerank(e, rerankBudget(e), topK)
    } else {
      val raw = s.read.option("mergeSchema", "true")
        .parquet(s"$indexDir/buckets")
      val e =
        if (!raw.columns.contains("sig2"))
          raw.withColumn("sig2", lshSig2(col("v")))
        else raw.withColumn("sig2",
          coalesce(col("sig2"), lshSig2(col("v"))))
      hammingRerank(e, rerankBudget(e), topK)
    }
  }

  // -- s5: int8 embedding quantization ------------------------------------
  /** Symmetric int8 quantization of every embedding — the storage path
    * at 100 TB (4 bytes/dim fp32 → 1 byte/dim, plus one fp scale per
    * vector). Per-vector scale = 127 / max|v_i|; output exploded to
    * (vec_id, i, q, scale) scalars so the oracle compares exactly.
    * One narrow projection — no shuffle, stays in codegen; at scale
    * this runs at write time next to the cell-id column.
    */
  def quantizeInt8(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // |max| without a lambda: max(|x|) = max(max(x), -min(x)) — both
    // aggregates are native codegen array ops (measured 2× over
    // array_max(transform(abs))); the round(x*scale) loop is the
    // native vec_quant_int8 kernel, same HALF_UP semantics
    val amax = greatest(array_max(col("v")), -array_min(col("v")))
    e.withColumn("scale", lit(127.0) / greatest(amax, lit(1e-30)))
      .select(col("vec_id"), col("scale"),
        posexplode(graft.functions.VectorFunctions
          .vecQuantInt8(col("v"), col("scale"))))
      .select(col("vec_id"), col("pos").cast(LongType).as("i"),
        col("col").as("q"), round(col("scale"), 6).as("scale"))
  }

  // -- s7: IVF search over int8-quantized vectors (ADC) --------------------
  /** Corpus vectors in their stored int8 form plus the dequantized
    * double view — scale, int8 codes, and dequantized array computed
    * in one narrow codegen projection (the read path of an index whose
    * payload is [[quantizeInt8]]'s 1-byte/dim format).
    */
  private def dequantized(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Dedup.spreadIfNarrow(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    // all three per-element loops are native kernels/array ops —
    // the whole quantize→dequantize read path stays in codegen
    val amax = greatest(array_max(col("v")), -array_min(col("v")))
    e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("scale", lit(127.0) / greatest(amax, lit(1e-30)))
      .withColumn("q8",
        graft.functions.VectorFunctions.vecQuantInt8(col("v"), col("scale")))
      .withColumn("dq",
        graft.functions.VectorFunctions
          .vecDiv(col("q8").cast("array<double>"), col("scale")))
      .withColumn("dqn", sqrt(dot(col("dq"), col("dq"))))
  }

  /** Asymmetric-distance IVF search: the same cell-probed equi-join as
    * [[knnIvf]], but the CORPUS side is scored from its int8-quantized
    * form (dequantize-in-expression) while queries stay full
    * precision — the standard ADC layout, where the index holds 1
    * byte/dim + one scale and only the handful of query vectors ever
    * exist at fp precision. At 100 TB this is a 4× scan-volume cut on
    * the dominant side of the join for <1e-2 cosine error (spec-
    * bounded); the dequant arithmetic is deterministic doubles, so the
    * whole path stays DuckDB-oracle-checkable.
    */
  def knnIvfInt8(s: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    val e = dequantized(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    finalTopK(e.join(broadcast(q), col("label") === col("q_label"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("qv"), col("dq")) / (col("qn") * col("dqn")), 6).as("sim")),
      topK)
  }

  // -- s8: semantic dup clusters over the embedding pair graph -------------
  /** The embedding-side analogue of d8: [[embedDupPairs]] candidates
    * resolved into clusters by the same min-label-propagation
    * connected components ([[Dedup.connectedComponents]]), with the
    * keep/drop flag electing each cluster's min vec_id. Closes the
    * semantic-dedup path the same way d8 closes the lexical one — the
    * pair list becomes an actionable keep list.
    */
  def embedClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
        embedDupPairs(s, dir).select(col("id_a"), col("id_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"),
        when(col("doc_id") === col("cluster_id"), 1).otherwise(0).as("keep"))

  // -- s14: hybrid retrieval via reciprocal-rank fusion --------------------
  /** Candidate-list depth each retriever contributes to the fusion. */
  val RrfDepth = 50
  /** The RRF rank-smoothing constant (60 is the value of Cormack,
    * Clarke & Büttcher, SIGIR'09, used essentially unchanged since).
    */
  val RrfK = 60.0

  /** s14 — hybrid retrieval: the BM25 lexical ranking (t11's scorer)
    * and the embedding cosine ranking (query-by-example from vec_id
    * 0, the shared doc/vec id space) fused by reciprocal-rank fusion
    * `Σ 1/(k + rank)` — the standard way a RAG data pipeline combines
    * a keyword index with a vector index without score calibration
    * (ranks, not scores, are what fuse — so the two retrievers'
    * incomparable score scales never meet).
    *
    * Scale shape: each side produces its top-[[RrfDepth]] ids with
    * the machinery that already scales — BM25 from the pruned posting
    * aggregate (or [[graft.llm.TextAnalysis.bm25FromIndex]] against
    * the persisted index), the vector side through the s9 bounded-heap
    * aggregate (no global sort, no window over the corpus: the heap's
    * posexplode position IS the rank). The fusion itself joins two
    * ≤[[RrfDepth]]-row frames — driver-negligible at any corpus size.
    * Both ranks order by (rounded score desc, id), so the fused list
    * is deterministic cross-engine; the oracle replays both rankings
    * and the same two-term reciprocal sum.
    */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    val k = RrfDepth
    // rank the ≤ k BM25 rows through the same bounded heap as the
    // vector side (VERDICT r15 #6): the global row_number window this
    // replaces was correct (input bounded to RrfDepth rows by t11's
    // own top-k cut) but planned a single-partition WindowExec —
    // the source of the "No Partition Defined for Window" warnings —
    // where the heap is one tiny aggregate; (score desc, doc_id asc)
    // order and ties are identical
    val txt = graft.llm.TextAnalysis.bm25(s, dir, k)
      .agg(graft.functions.TopKFunctions
        .topkBy(col("score"), col("doc_id"), lit(k)).as("tk"))
      .select(posexplode(col("tk")))
      .select(col("col.id").as("doc_id"),
        (col("pos") + 1).cast(LongType).as("rt"))
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val vec = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6)
          .as("sim"))
      .agg(graft.functions.TopKFunctions
        .topkBy(col("sim"), col("vec_id"), lit(k)).as("tk"))
      .select(posexplode(col("tk")))
      .select(col("col.id").as("doc_id"),
        (col("pos") + 1).cast(LongType).as("rv"))
    val rrf = round(
      coalesce(lit(1.0) / (lit(RrfK) + col("rt")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + col("rv")), lit(0.0)), 6)
    txt.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rt").as("rank_bm25"),
        col("rv").as("rank_vec"), rrf.as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(20)
  }

  // -- s15: semi-hard negative mining --------------------------------------
  /** Negatives returned per query. */
  val HardNegK = 3

  /** s15 — semi-hard negative mining for contrastive training data
    * (the FaceNet band of Schroff et al. 2015; the retrieval use is
    * DPR's hard-negative selection, Karpukhin et al. 2020): for each
    * query vector, candidates of a DIFFERENT label ranked by cosine,
    * keeping the top-[[HardNegK]] whose similarity is strictly below
    * the query's best same-label (positive) similarity — negatives
    * hard enough to inform the loss but not harder than the positive,
    * the band that trains stably.
    *
    * Scale shape: one scored pair stream (corpus × broadcast queries,
    * the s1 form — at 100 TB the candidate stream comes from an ANN
    * tier instead, same downstream plan); the per-query positive
    * ceiling is a ≤|queries|-row aggregate broadcast back onto the
    * negative stream, never a window over the pair set (a q_id window
    * would shuffle every pair to |queries| partitions — skew by
    * construction). Ranking orders by the ROUNDED sim with a vec_id
    * tiebreak, so the cut is deterministic cross-engine.
    */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6)
          .as("sim"))
    val posCeil = scored.filter(col("label") === col("q_label"))
      .groupBy("q_id").agg(max(col("sim")).as("max_pos"))
    // bounded heap instead of the q_id rank window (VERDICT r15 #2/#6):
    // the banded negative stream partial-aggregates to ≤ k rows per
    // (task, query) before any exchange; (sim desc, vec_id asc) order
    // and ties are pinned identical to the row_number form, max_pos is
    // constant per q_id (first() is deterministic)
    graft.functions.TopKFunctions.register(s)
    scored.filter(col("label") =!= col("q_label"))
      .join(broadcast(posCeil), "q_id")
      .filter(col("sim") < col("max_pos"))
      .groupBy("q_id")
      .agg(first(col("max_pos")).as("max_pos"),
        graft.functions.TopKFunctions
          .topkBy(col("sim"), col("vec_id"), lit(HardNegK)).as("tk"))
      .select(col("q_id"), col("max_pos"), posexplode(col("tk")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.ord").as("sim"), col("max_pos"),
        (col("pos") + 1).cast(LongType).as("rk"))
  }

  // -- s16: SemDeDup-style embedding-dedup resolution ----------------------
  /** s16 — the dedup DECISION over the s3 near-dup pair stream
    * (SemDeDup, Abbas et al. 2023: drop all but one member of each
    * semantic-duplicate neighborhood): a vector is dropped iff some
    * qualifying partner has a smaller id, and records the smallest
    * such partner as its `dup_of` — the same keep-lowest-id canonical
    * rule the MinHash dedup family (d9) uses, so the decision is
    * execution-order-free and SQL-replayable (no clustering step, no
    * RNG).
    *
    * Scale shape: the pair join is s3's cell-blocked enumeration
    * (never all-pairs); the drop resolution is one groupBy(min) over
    * pairs keyed by the larger id plus a left join back onto the
    * vector ids — both shuffles carry (long, long) rows only.
    */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    val dropped = embedDupPairs(s, dir)
      .groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("dup_of"))
    emb(s, dir).select("vec_id")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("dup_of").isNull, 1).otherwise(0).as("keep"),
        col("dup_of"))
  }

  // -- s17: MMR diversified top-k ------------------------------------------

  /** MMR selection size, candidate pool, and the relevance/diversity
    * weights (Carbonell & Goldstein 1998). λ terms are SEPARATE
    * literals — `1 − 0.7` in double is 0.30000000000000004, which
    * would diverge from an engine parsing `0.3`.
    */
  val MmrK = 5
  val MmrCandidates = 20
  val MmrLambda = 0.7
  val MmrLambdaC = 0.3

  /** s17 — maximal-marginal-relevance re-ranking (Carbonell &
    * Goldstein 1998): from the query's cosine top-[[MmrCandidates]],
    * greedily pick [[MmrK]] results maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — relevance traded
    * against redundancy with what's already picked, the diversity
    * selection a retrieval-augmented or dataset-sampling pipeline
    * runs after ANN. First pick maximizes λ·sim(q,d) (S empty ⇒
    * diversity term 0).
    *
    * Scale shape: the corpus-sized work is the candidate stage — one
    * scored pass + TakeOrdered top-C (any ANN tier can stand in for
    * it). Everything after is DRIVER-TIER (the CC union-find / BPE
    * argmax discipline): the top-C rows collect — C = [[MmrCandidates]]
    * is a compile-time constant, so the collect is bounded by
    * construction, never corpus-sized — and the C² pair-sim matrix plus
    * the [[MmrK]] chained argmax steps run as plain Scala over those C
    * rows. The distributed form this replaces spawned ~2·K Spark jobs
    * (per-step anti-join/argmax + checkpoint) over ≤ C-row frames —
    * pure scheduling floor, measured 1.37 s fresh-JVM at sf0.1 vs
    * 0.5 s for the candidate scan alone (r15). Arithmetic parity with
    * the old plan is exact: pair cosines reuse the engine's collected
    * `nrm` values and [[graft.functions.VectorOps.dot]]'s left-to-right
    * summation, and rounding is scala BigDecimal HALF_UP — the same
    * semantics Spark's `round` applies (TopKSpec's driver-replay law
    * pinned this equality before the rewrite). Sims round to 6 dp
    * before the λ-combination and ties break on vec_id, so every pick
    * is deterministic and SQL-replayable (the oracle unrolls the
    * greedy loop as CTEs, the q54 fixed-iteration discipline).
    */
  def mmrDiversify(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val cands = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("v"), col("nrm"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6)
          .as("qsim"))
      .orderBy(desc("qsim"), col("vec_id")).limit(MmrCandidates)
      .collect()
    val ids = cands.map(_.getLong(0))
    val vs = cands.map(_.getSeq[Double](1).toArray)
    val ns = cands.map(_.getDouble(2))
    val qs = cands.map(_.getDouble(3))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pair cosine, identical to the engine expression it replaces:
    // vec_dot's sequential fold over the same doubles, divided by the
    // COLLECTED norms (not recomputed), rounded like Spark's round()
    def ps(i: Int, j: Int): Double = {
      val (a, b) = (vs(i), vs(j))
      var d = 0.0
      var k = 0
      while (k < math.min(a.length, b.length)) { d += a(k) * b(k); k += 1 }
      r6(d / (ns(i) * ns(j)))
    }
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Double)] // (step, id, qsim, mmr)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (step <- 1 to MmrK) {
      var best = -1
      var bestMmr = 0.0
      ids.indices.foreach { i =>
        if (!chosen.contains(i)) {
          val mmr =
            if (chosen.isEmpty) r6(qs(i) * MmrLambda)
            else {
              val ms = chosen.map(j => ps(i, j)).max
              r6(qs(i) * MmrLambda - ms * MmrLambdaC)
            }
          // argmax on (mmr desc, vec_id asc) — the old ORDER BY
          if (best < 0 || mmr > bestMmr ||
            (mmr == bestMmr && ids(i) < ids(best))) {
            best = i; bestMmr = mmr
          }
        }
      }
      if (best >= 0) {
        picked += ((step.toLong, ids(best), qs(best), bestMmr))
        chosen += best
      }
    }
    import s.implicits._
    picked.toSeq.toDF("step", "vec_id", "qsim", "mmr")
  }

  // -- s18: in-engine ANN recall evaluation ----------------------------------

  /** s18 — recall@3 of the s6 LSH tier against the s1 brute ground
    * truth, computed INSIDE the engine: per query, the fraction of the
    * exact top-3 the approximate index returned. This is the
    * evaluation harness every ANN deployment runs on each index
    * rebuild — here it is a first-class oracle-gated query (the bench
    * tracks the same number as a float metric; this pins the exact
    * per-query hit sets). Both retrievals are themselves oracle-pinned
    * rankings, so the recall join is plain set arithmetic: one
    * broadcastable ≤(queries·k)-row left join and a per-query count.
    */
  def recallLsh(s: SparkSession, dir: String): DataFrame = {
    val truth = knnBrute(s, dir).filter(col("rk") <= 3)
      .select(col("q_id"), col("vec_id"))
    val approx = knnLsh(s, dir)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    truth.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0))).cast(LongType).as("n_hit"))
      .select(col("q_id"), col("k"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k"), 6).as("recall"))
  }

  // -- s22: filtered-ANN recall evaluation -----------------------------------
  /** s22 — recall@3 of the s20 filtered-ANN tier against the s19
    * filtered-brute ground truth: s18's evaluation harness applied to
    * the FILTERED search contract, where recall regressions hide —
    * pre- vs post-filter discipline changes don't move unfiltered
    * recall (s18) at all, so a deployment tracking only s18 ships
    * them blind. Same shape as s18: two already-pinned rankings, one
    * broadcastable ≤(queries·k)-row left join, a per-query count.
    */
  def recallFiltered(s: SparkSession, dir: String): DataFrame = {
    val truth = knnFiltered(s, dir).filter(col("rk") <= 3)
      .select(col("q_id"), col("vec_id"))
    val approx = knnFilteredLsh(s, dir)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    truth.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0))).cast(LongType).as("n_hit"))
      .select(col("q_id"), col("k"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k"), 6).as("recall"))
  }

  /** Filtered-ANN recall at one predicate selectivity (bench-side
    * eval, VERDICT r13 ask #8): the corpus restricts to
    * `vec_id % m == 0` (selectivity 1/m), truth is the exact cosine
    * top-3 WITHIN the subset, approx is the s20 discipline applied to
    * the same subset — Hamming scan over the filtered signatures with
    * the budget scaled to the SUBSET size (pre-filter discipline; the
    * documented filtered-ANN recall hole is post-filtering an
    * unfiltered top-C), exact rerank, top-3. Returns mean recall@3
    * over the 20 standard queries. The s22 gated query pins one
    * selectivity (the label predicate); this sweeps 0.01–0.5 so a
    * recall cliff at selective predicates is machine-visible in the
    * bench artifact.
    */
  def filteredRecallAt(s: SparkSession, dir: String, m: Int): Double = {
    graft.functions.TopKFunctions.register(s)
    val e = emb(s, dir).withColumn("sig", lshSig(col("v")))
      .withColumn("sig2", lshSig2(col("v")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig"),
        col("sig2").as("q_sig2"), col("v").as("qv"), col("nrm").as("qn"))
    val sub = e.filter(col("vec_id") % m === 0)
    val subN = sub.count()
    val topC = math.max(FilteredBudgetFloor,
      math.ceil(subN * RerankFraction).toInt)
    def top3(scored: DataFrame): DataFrame =
      finalTopK(scored, 3).select("q_id", "vec_id")
    val truth = top3(sub
      .join(broadcast(q.select(col("q_id"), col("qv"), col("qn"))),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6)
          .as("sim")))
    val cand = sub.select(col("vec_id"), col("sig"), col("sig2"))
      .join(broadcast(q.select(col("q_id"), col("q_sig"), col("q_sig2"))),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (-(bit_count(col("sig").bitwiseXOR(col("q_sig"))) +
            bit_count(col("sig2").bitwiseXOR(col("q_sig2"))))
          .cast("double")).as("nh"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions
        .topkBy(col("nh"), col("vec_id"), lit(topC)).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("p"))
      .select(col("q_id"), col("p.id").as("vec_id"))
    val approx = top3(sub.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q.select(col("q_id"), col("qv"), col("qn"))),
        Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6)
          .as("sim")))
    val r = truth.join(approx.withColumn("hit", lit(1)),
        Seq("q_id", "vec_id"), "left")
      .agg(avg(coalesce(col("hit"), lit(0)).cast("double")))
      .head().getDouble(0)
    math.round(r * 1000) / 1000.0
  }

  // -- s21: embedding drift monitor ----------------------------------------
  /** s21 — per-dimension drift between two corpus epochs (vec_id
    * parity stands in for the batch boundary a production monitor
    * compares: yesterday's embedding run vs today's). For every
    * dimension: the two epoch means and their absolute shift — the
    * signal that catches a swapped encoder checkpoint, a
    * normalization change, or upstream feature rot BEFORE an ANN
    * index is rebuilt over mixed-provenance vectors. The q39 PSI
    * monitor covers scalar columns; this is its vector-column twin.
    *
    * Scale shape: `posexplode` widens n rows to n·64, but the rows
    * are (epoch, dim, double) — ~20 bytes, no text, no vectors — and
    * the aggregate is map-side combinable down to 64 rows per
    * partition before the single exchange; the conditional-mean pivot
    * avoids a self-join on epoch. Shift is computed from the
    * 6-dp-rounded means so the comparison is engine-portable (the
    * unrounded doubles differ in summation order across
    * partitionings).
    */
  def embeddingDrift(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "embeddings")
      .select((col("vec_id") % 2).as("epoch"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "v")))
      .groupBy((col("pos") + 1).cast(LongType).as("dim"))
      .agg(round(avg(when(col("epoch") === 0, col("v"))), 6).as("mean_a"),
        round(avg(when(col("epoch") === 1, col("v"))), 6).as("mean_b"))
      .withColumn("shift", round(abs(col("mean_a") - col("mean_b")), 6))
  }

  // -- s23: semantic-bucket-capped diversity downsampling -------------------

  /** Per-bucket keep cap for the s23 diversity sample. */
  val DiversityCap = 8

  /** s23 — diversity downsampling by semantic-bucket cap: every vector
    * lands in its [[lshBucket]] (the low-[[LshPlanes]]-bit SimHash
    * cell — the same deterministic geometry the persisted LSH layout
    * partitions by), and at most [[DiversityCap]] vectors survive per
    * bucket (smallest vec_id, the stable choice). This is the cheap
    * topic-balancing cut (cap redundant neighborhoods, keep coverage)
    * that SemDeDup-style pipelines run when pairwise similarity (s16)
    * is too expensive for a first pass: no pair join at all, ONE
    * narrow map (64-bit signature per vector) + one bounded-heap
    * aggregate per bucket via `topk_by` — never a rank window over
    * raw vectors, never a shuffle of the embedding column beyond the
    * 256-key bucket exchange of (bucket, vec_id) pairs.
    */
  def bucketCapSample(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    emb(s, dir)
      .select(lshBucket(col("v")).as("bucket"), col("vec_id"))
      .groupBy("bucket")
      // constant ordinal: the heap's tie-break (smallest id) IS the
      // election, kept exact in the long domain — an ord of
      // -vec_id-as-double would lose id ordering above 2^53
      .agg(graft.functions.TopKFunctions
        .topkBy(lit(0.0), col("vec_id"), lit(DiversityCap)).as("tk"))
      .select(col("bucket"), posexplode(col("tk")))
      .select(col("bucket"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast(LongType).as("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s23_bucket_cap" -> bucketCapSample _,
    "s22_recall_filtered" -> recallFiltered _,
    "s21_embedding_drift" -> embeddingDrift _,
    "s18_recall_lsh" -> recallLsh _,
    "s17_mmr" -> mmrDiversify _,
    "s14_hybrid_rrf" -> hybridRrf _,
    "s15_hard_negatives" -> hardNegatives _,
    "s16_semdedup" -> semDedup _,
    "s1_knn_brute" -> knnBrute _,
    "s19_knn_filtered" -> ((s: SparkSession, dir: String) => knnFiltered(s, dir)),
    "s20_knn_filtered_lsh" ->
      ((s: SparkSession, dir: String) => knnFilteredLsh(s, dir)),
    "s9_knn_topk"  -> knnBruteTopK _,
    "s8_embed_clusters" -> embedClusters _,
    "s7_knn_int8" -> ((s: SparkSession, dir: String) => knnIvfInt8(s, dir)),
    "s2_knn_ivf"   -> knnIvf _,
    "s3_embed_dup" -> embedDupPairs _,
    // verdict face (r13): KMeans cell assignment isn't SQL-reproducible,
    // so the registered query emits the recall-vs-brute envelope verdict
    // (deterministic truth size + floor + 0/1 flag) hash-gated by a real
    // DuckDB oracle; Bench's recall gate reads knnIvfKmeans directly.
    "s4_knn_ivf_kmeans" -> ((s: SparkSession, dir: String) =>
      graft.tools.Envelopes.s4Verdict(s, dir)),
    "s5_quantize" -> quantizeInt8 _,
    "s6_knn_lsh" -> ((s: SparkSession, dir: String) => knnLsh(s, dir)),
    "s13_knn_jl" -> ((s: SparkSession, dir: String) => knnJl(s, dir)),
    "s10_knn_pq" -> ((s: SparkSession, dir: String) => knnPqInline(s, dir)),
    "s11_knn_ivfpq" -> ((s: SparkSession, dir: String) => knnIvfPq(s, dir)),
    "s12_label_vote" -> knnLabelVote _)

  private val cosSql =
    "list_dot_product(av, bv) / (sqrt(list_dot_product(av, av)) * sqrt(list_dot_product(bv, bv)))"

  /** One signature word as a DuckDB sum-of-CASE over plane literals —
    * shared by the s6/s20 oracles for both words.
    */
  private def sigWordSql(ps: Seq[Array[Double]]): String =
    ps.zipWithIndex.map { case (p, i) =>
      val lst = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $lst) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  /** s6's full oracle statement — the same 128 plane constants as
    * literals, so both signature words are bit-identical and the
    * Hamming rank (hence the candidate set and final ranking)
    * reproduces exactly. A val so s18's recall oracle can nest it
    * verbatim.
    */
  private lazy val knnLshSql = {
    val sigSql = sigWordSql(sigPlanes)
    val sig2Sql = sigWordSql(sigPlanesB)
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |b AS (SELECT vec_id, v, $sigSql AS sig, $sig2Sql AS sig2 FROM e),
       |n AS (SELECT CAST(ceil($RerankFraction * COUNT(*)) AS BIGINT)
       |  AS topc FROM e),
       |cand AS (SELECT q_id, vec_id FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY bit_count(xor(e.sig, q.sig))
       |        + bit_count(xor(e.sig2, q.sig2)), e.vec_id) AS hr
       |  FROM b q JOIN b e ON q.vec_id < 20 AND e.vec_id <> q.vec_id), n
       |  WHERE hr <= n.topc)
       |SELECT q_id, vec_id, sim, rk FROM (
       |  SELECT c.q_id, c.vec_id,
       |    round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY c.q_id
       |      ORDER BY round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) DESC,
       |        c.vec_id) AS rk
       |  FROM cand c JOIN b e ON e.vec_id = c.vec_id
       |    JOIN b q ON q.vec_id = c.q_id)
       |WHERE rk <= 3""".stripMargin
  }

  private lazy val knnBruteSql =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings)
       |SELECT q_id, vec_id, sim, rk FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) DESC,
       |        e.vec_id) AS rk
       |  FROM e q JOIN e ON q.vec_id < 20 AND e.vec_id <> q.vec_id)
       |WHERE rk <= 5""".stripMargin

  private lazy val knnFilteredSql =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings)
       |SELECT q_id, vec_id, sim, rk FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) DESC,
       |        e.vec_id) AS rk
       |  FROM e q JOIN e ON q.vec_id < 20 AND e.vec_id <> q.vec_id
       |    AND e.label = q.label)
       |WHERE rk <= 5""".stripMargin

  private lazy val knnFilteredLshSql = {
    val sigSql = sigWordSql(sigPlanes)
    val sig2Sql = sigWordSql(sigPlanesB)
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |b AS (SELECT vec_id, label, v, $sigSql AS sig, $sig2Sql AS sig2 FROM e),
       |n AS (SELECT GREATEST(CAST($FilteredBudgetFloor AS BIGINT),
       |    CAST(ceil($RerankFraction * COUNT(*) /
       |      COUNT(DISTINCT label)) AS BIGINT)) AS topc FROM e),
       |cand AS (SELECT q_id, vec_id FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY bit_count(xor(e.sig, q.sig))
       |        + bit_count(xor(e.sig2, q.sig2)), e.vec_id) AS hr
       |  FROM b q JOIN b e ON q.vec_id < 20 AND e.vec_id <> q.vec_id
       |    AND e.label = q.label), n
       |  WHERE hr <= n.topc)
       |SELECT q_id, vec_id, sim, rk FROM (
       |  SELECT c.q_id, c.vec_id,
       |    round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY c.q_id
       |      ORDER BY round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) DESC,
       |        c.vec_id) AS rk
       |  FROM cand c JOIN b e ON e.vec_id = c.vec_id
       |    JOIN b q ON q.vec_id = c.q_id)
       |WHERE rk <= 3""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // s23: the first LshPlanes plane constants as literals (the s6
    // discipline), native rank window over the identical total order
    "s23_bucket_cap" -> {
      val bucketSql = sigPlanes.take(LshPlanes).zipWithIndex
        .map { case (p, i) =>
          val lst = p.mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lst) >= 0" +
            s" THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |b AS (SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket FROM e),
         |r AS (SELECT bucket, vec_id,
         |    row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rk
         |  FROM b)
         |SELECT bucket, vec_id, CAST(rk AS BIGINT) AS rk FROM r
         |WHERE rk <= $DiversityCap""".stripMargin
    },
    "s21_embedding_drift" ->
      """WITH x AS (SELECT vec_id % 2 AS epoch,
        |    generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |m AS (SELECT CAST(dim AS BIGINT) AS dim,
        |    round(AVG(v) FILTER (epoch = 0), 6) AS mean_a,
        |    round(AVG(v) FILTER (epoch = 1), 6) AS mean_b
        |  FROM x GROUP BY 1)
        |SELECT dim, mean_a, mean_b,
        |  round(abs(mean_a - mean_b), 6) AS shift FROM m""".stripMargin,
    // s14: the t11 BM25 chain (verbatim arithmetic) and the s1 cosine
    // chain, each ranked to depth 50, fused with the identical
    // two-term reciprocal sum
    "s14_hybrid_rrf" -> {
      val cosQ = cosSql.replace("av", "q.v").replace("bv", "e.v")
      s"""WITH d AS (SELECT doc_id,
         |  list_transform(string_split_regex(trim(text), '\\s+'),
         |    x -> lower(x)) AS t
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS term FROM d)
         |  WHERE term IN ('query', 'stream', 'merge') GROUP BY 1, 2),
         |dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tf GROUP BY 1),
         |dlen AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM d),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |  avg(CAST(len(t) AS DOUBLE)) AS avgdl FROM d),
         |bs AS (SELECT doc_id,
         |  round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |    * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
         |    AS score
         |  FROM tf JOIN dfc USING (term) JOIN dlen USING (doc_id)
         |    CROSS JOIN st
         |  GROUP BY doc_id),
         |tr AS (SELECT doc_id, rt FROM (
         |  SELECT doc_id, CAST(ROW_NUMBER() OVER
         |      (ORDER BY score DESC, doc_id) AS BIGINT) AS rt
         |  FROM bs) WHERE rt <= $RrfDepth),
         |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |vs AS (SELECT e.vec_id AS doc_id, round($cosQ, 6) AS sim
         |  FROM ev e JOIN ev q ON q.vec_id = 0 AND e.vec_id <> 0),
         |vr AS (SELECT doc_id, rv FROM (
         |  SELECT doc_id, CAST(ROW_NUMBER() OVER
         |      (ORDER BY sim DESC, doc_id) AS BIGINT) AS rv
         |  FROM vs) WHERE rv <= $RrfDepth)
         |SELECT COALESCE(tr.doc_id, vr.doc_id) AS doc_id,
         |  tr.rt AS rank_bm25, vr.rv AS rank_vec,
         |  round(COALESCE(1.0 / ($RrfK + tr.rt), 0.0)
         |    + COALESCE(1.0 / ($RrfK + vr.rv), 0.0), 6) AS rrf
         |FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
    },
    // s7: same quantize arithmetic as s5 (proved cross-engine there),
    // then ADC scoring — fp query · dequantized corpus
    "s7_knn_int8" -> {
      val adcSim =
        """round(list_dot_product(q.v, e.dq)
          |      / (sqrt(list_dot_product(q.v, q.v))
          |         * sqrt(list_dot_product(e.dq, e.dq))), 6)""".stripMargin
      s"""WITH raw AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |sc AS (SELECT vec_id, label, v,
         |  127.0 / greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
         |    AS scale FROM raw),
         |dqt AS (SELECT vec_id, label, v,
         |  list_transform(v, x -> round(x * scale) / scale) AS dq FROM sc)
         |SELECT q_id, vec_id, sim, rk FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    $adcSim AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY $adcSim DESC, e.vec_id) AS rk
         |  FROM dqt q JOIN dqt e ON e.label = q.label
         |    AND q.vec_id < 20 AND e.vec_id <> q.vec_id)
         |WHERE rk <= 3""".stripMargin
    },
    // s17: the greedy MMR loop unrolled as CTEs (the q54
    // fixed-iteration discipline); each step's selected set is the
    // union of the previous steps' one-row CTEs
    "s17_mmr" -> {
      def sel(i: Int): String =
        (1 until i).map(j => s"SELECT vec_id FROM m$j").mkString(" UNION ALL ")
      def step(i: Int): String =
        s"""m$i AS (
           |  SELECT vec_id, qsim,
           |    round(qsim * $MmrLambda - ms * $MmrLambdaC, 6) AS mmr,
           |    CAST($i AS BIGINT) AS step
           |  FROM (
           |    SELECT c.vec_id, c.qsim, MAX(p.ps) AS ms
           |    FROM cand c JOIN p ON p.b = c.vec_id
           |      AND p.a IN (${sel(i)})
           |    WHERE c.vec_id NOT IN (${sel(i)})
           |    GROUP BY c.vec_id, c.qsim)
           |  ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |cand AS (
         |  SELECT vec_id, v,
         |    round(${cosSql.replace("av", "qv").replace("bv", "v")}, 6)
         |      AS qsim
         |  FROM e, q WHERE vec_id <> 0
         |  ORDER BY qsim DESC, vec_id LIMIT $MmrCandidates),
         |p AS (SELECT a.vec_id AS a, b.vec_id AS b,
         |    round(${cosSql.replace("av", "a.v").replace("bv", "b.v")}, 6)
         |      AS ps
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |m1 AS (SELECT vec_id, qsim, round(qsim * $MmrLambda, 6) AS mmr,
         |    CAST(1 AS BIGINT) AS step
         |  FROM cand ORDER BY mmr DESC, vec_id LIMIT 1),
         |${(2 to MmrK).map(step).mkString(",\n")}
         |SELECT step, vec_id, qsim, mmr FROM (
         |  ${(1 to MmrK).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")})""".stripMargin
    },
    "s1_knn_brute" -> knnBruteSql,
    // s9 computes the identical ranking through the bounded-heap
    // aggregate — the oracle is deliberately s1's window SQL verbatim:
    // two physical strategies, one declared semantics
    "s9_knn_topk" -> knnBruteSql,
    "s2_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings)
         |SELECT q_id, vec_id, sim, rk FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) DESC,
         |        e.vec_id) AS rk
         |  FROM e q JOIN e ON e.label = q.label
         |    AND q.vec_id < 20 AND e.vec_id <> q.vec_id)
         |WHERE rk <= 3""".stripMargin,
    "s3_embed_dup" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings)
         |SELECT id_a, id_b, sim FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    round(${cosSql.replace("av", "a.v").replace("bv", "b.v")}, 6) AS sim
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE sim >= 0.35""".stripMargin,
    // s15: the s1 scored-pair chain with the positive-ceiling
    // aggregate and the same strict semi-hard band on rounded sims
    "s15_hard_negatives" -> {
      val cosQ = cosSql.replace("av", "q.v").replace("bv", "e.v")
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |s AS (SELECT q.vec_id AS q_id, q.label AS q_label,
         |    e.vec_id, e.label, round($cosQ, 6) AS sim
         |  FROM e q JOIN e ON q.vec_id < 20 AND e.vec_id <> q.vec_id),
         |p AS (SELECT q_id, MAX(sim) AS max_pos FROM s
         |  WHERE label = q_label GROUP BY 1)
         |SELECT q_id, vec_id, sim, max_pos, CAST(rk AS BIGINT) AS rk FROM (
         |  SELECT s.q_id, s.vec_id, s.sim, p.max_pos,
         |    ROW_NUMBER() OVER (PARTITION BY s.q_id
         |      ORDER BY s.sim DESC, s.vec_id) AS rk
         |  FROM s JOIN p USING (q_id)
         |  WHERE s.label <> s.q_label AND s.sim < p.max_pos)
         |WHERE rk <= $HardNegK""".stripMargin
    },
    // s16: s3's pair predicate resolved by the keep-lowest-id rule —
    // min qualifying smaller partner, left-joined onto the id set
    "s16_semdedup" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |pairs AS (SELECT id_a, id_b FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    round(${cosSql.replace("av", "a.v").replace("bv", "b.v")}, 6) AS sim
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |  WHERE sim >= 0.35),
         |drp AS (SELECT id_b AS vec_id, MIN(id_a) AS dup_of
         |  FROM pairs GROUP BY 1)
         |SELECT e.vec_id,
         |  CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS INTEGER)
         |    AS keep,
         |  d.dup_of
         |FROM e LEFT JOIN drp d USING (vec_id)""".stripMargin,
    // s8: s3's pair predicate feeding the same recursive reachability
    // closure as the d8 oracle — min(reach) is the component minimum
    "s8_embed_clusters" ->
      s"""WITH RECURSIVE e0 AS (SELECT vec_id, label,
         |  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT id_a, id_b FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    round(${cosSql.replace("av", "a.v").replace("bv", "b.v")}, 6) AS sim
         |  FROM e0 a JOIN e0 b ON a.label = b.label AND a.vec_id < b.vec_id)
         |  WHERE sim >= 0.35),
         |e AS (SELECT id_a AS a, id_b AS b FROM p
         |  UNION SELECT id_b, id_a FROM p),
         |nodes AS (SELECT DISTINCT a AS id FROM e),
         |r AS (SELECT id AS node, id AS reach FROM nodes
         |  UNION
         |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a)
         |SELECT node AS vec_id, min(reach) AS cluster_id,
         |  CAST(CASE WHEN node = min(reach) THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM r GROUP BY node""".stripMargin,
    "s6_knn_lsh" -> knnLshSql,
    // s19: the brute SQL restricted to the query's label pre-ranking
    "s19_knn_filtered" -> knnFilteredSql,
    // s20: s6's signature chain with the label predicate BEFORE the
    // Hamming rank and the budget scaled to the average label stream
    "s20_knn_filtered_lsh" -> knnFilteredLshSql,
    // s22: the filtered twin of s18 — both filtered retrievals nest
    // verbatim, the recall join is set arithmetic on pinned rankings
    "s22_recall_filtered" ->
      s"""WITH fb AS ($knnFilteredSql),
         |fl AS ($knnFilteredLshSql)
         |SELECT b.q_id, CAST(COUNT(*) AS BIGINT) AS k,
         |  CAST(COUNT(l.vec_id) AS BIGINT) AS n_hit,
         |  round(CAST(COUNT(l.vec_id) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM (SELECT * FROM fb WHERE rk <= 3) b
         |LEFT JOIN fl l ON l.q_id = b.q_id AND l.vec_id = b.vec_id
         |GROUP BY b.q_id""".stripMargin,
    // s18: the two retrievals nest verbatim as CTEs — the recall join
    // is plain set arithmetic on top of two already-pinned rankings
    "s18_recall_lsh" ->
      s"""WITH brute AS ($knnBruteSql),
         |lsh AS ($knnLshSql)
         |SELECT b.q_id, CAST(COUNT(*) AS BIGINT) AS k,
         |  CAST(COUNT(l.vec_id) AS BIGINT) AS n_hit,
         |  round(CAST(COUNT(l.vec_id) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM (SELECT * FROM brute WHERE rk <= 3) b
         |LEFT JOIN lsh l ON l.q_id = b.q_id AND l.vec_id = b.vec_id
         |GROUP BY b.q_id""".stripMargin,
    "s13_knn_jl" -> {
      // the same JlDims Gaussian projection rows as literals — identical
      // sketches, so the rounded reduced-cosine rank (and therefore
      // the candidate set and final ranking) reproduces exactly
      val rvSql = jlPlanes.map { p =>
        val lst = p.mkString("[", ", ", "]")
        s"list_dot_product(v, $lst)"
      }.mkString("[", ",\n    ", "]")
      val est = "list_dot_product(e.rv, q.rv) / (e.rn * q.rn)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |r AS (SELECT vec_id, v, $rvSql AS rv FROM e),
         |b AS (SELECT vec_id, v, rv, sqrt(list_dot_product(rv, rv)) AS rn
         |  FROM r),
         |n AS (SELECT GREATEST(CAST(3 AS BIGINT),
         |    CAST(ceil($JlRerankFraction * COUNT(*)) AS BIGINT))
         |  AS topc FROM e),
         |cand AS (SELECT q_id, vec_id FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round($est, 6) DESC, e.vec_id) AS hr
         |  FROM b q JOIN b e ON q.vec_id < 20 AND e.vec_id <> q.vec_id), n
         |  WHERE hr <= n.topc)
         |SELECT q_id, vec_id, sim, rk FROM (
         |  SELECT c.q_id, c.vec_id,
         |    round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY c.q_id
         |      ORDER BY round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) DESC,
         |        c.vec_id) AS rk
         |  FROM cand c JOIN b e ON e.vec_id = c.vec_id
         |    JOIN b q ON q.vec_id = c.q_id)
         |WHERE rk <= 3""".stripMargin
    },
    "s10_knn_pq" -> {
      // codebooks come FROM the embeddings table (PqSampleIds), so no
      // literals: the cb CTE slices the sampled unit vectors exactly
      // like pqCodebooks. Every dot is list_dot_product over the same
      // left-to-right order as vec_dot; ADC scores round to 6 dp
      // BEFORE the candidate cutoff (ties to the smaller vec_id) so
      // the rerank set is tie-stable cross-engine, and the final
      // ranking is exact cosine of unit vectors — the s1 discipline.
      val dsub = Dims / PqM
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |u AS (SELECT vec_id,
         |  list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
         |  FROM e),
         |sm AS (SELECT c.range::INT AS code,
         |  CAST((21 + 29 * c.range) % 500 AS BIGINT) AS sid
         |  FROM range($PqK) c),
         |cb AS (SELECT g.range::INT AS sub, sm.code,
         |    list_slice(u.uv, g.range * $dsub + 1, g.range * $dsub + $dsub)
         |      AS cv
         |  FROM sm JOIN u ON u.vec_id = sm.sid CROSS JOIN range($PqM) g),
         |cbn AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc
         |  FROM cb),
         |enc0 AS (SELECT u.vec_id, b.sub, b.code,
         |    list_dot_product(
         |      list_slice(u.uv, b.sub * $dsub + 1, b.sub * $dsub + $dsub),
         |      b.cv) - b.cc / 2 AS d
         |  FROM u CROSS JOIN cbn b),
         |enc AS (SELECT vec_id, sub, code FROM (
         |  SELECT vec_id, sub, code,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |      ORDER BY d DESC, code) AS rn
         |  FROM enc0) WHERE rn = 1),
         |qdt AS (SELECT u.vec_id AS q_id, b.sub, b.code,
         |    list_dot_product(
         |      list_slice(u.uv, b.sub * $dsub + 1, b.sub * $dsub + $dsub),
         |      b.cv) AS d
         |  FROM u CROSS JOIN cbn b WHERE u.vec_id < 20),
         |adc AS (SELECT q.q_id, enc.vec_id, round(SUM(q.d), 6) AS adc
         |  FROM enc JOIN qdt q ON q.sub = enc.sub AND q.code = enc.code
         |    AND enc.vec_id <> q.q_id
         |  GROUP BY 1, 2),
         |cand AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adc DESC, vec_id) AS cr
         |  FROM adc) WHERE cr <= $PqRerank)
         |SELECT q_id, vec_id, sim, rk FROM (
         |  SELECT c.q_id, c.vec_id,
         |    round(list_dot_product(qu.uv, eu.uv), 6) AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY c.q_id
         |      ORDER BY round(list_dot_product(qu.uv, eu.uv), 6) DESC,
         |        c.vec_id) AS rk
         |  FROM cand c JOIN u eu ON eu.vec_id = c.vec_id
         |    JOIN u qu ON qu.vec_id = c.q_id)
         |WHERE rk <= 5""".stripMargin
    },
    // s12: s1's exact top-5 as a CTE, neighbor labels voted with the
    // same (votes DESC, label) argmax window, own label joined back
    "s12_label_vote" -> {
      val sim = s"round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6)"
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |nn AS (SELECT q_id, vec_id FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY $sim DESC, e.vec_id) AS rk
         |  FROM e q JOIN e ON q.vec_id < 20 AND e.vec_id <> q.vec_id)
         |  WHERE rk <= 5),
         |v AS (SELECT nn.q_id, e.label, COUNT(*) AS votes
         |  FROM nn JOIN e ON e.vec_id = nn.vec_id GROUP BY 1, 2),
         |p AS (SELECT q_id, label AS pred_label, votes FROM (
         |  SELECT q_id, label, votes, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY votes DESC, label) AS rn FROM v) WHERE rn = 1)
         |SELECT p.q_id, o.label AS own_label, p.pred_label, p.votes,
         |  CAST(CASE WHEN o.label = p.pred_label THEN 1 ELSE 0 END
         |    AS INTEGER) AS agree
         |FROM p JOIN e o ON o.vec_id = p.q_id""".stripMargin
    },
    "s11_knn_ivfpq" -> {
      // cells AND codebooks come from the embeddings table
      // (CoarseCellIds / PqSampleIds), so no literals. The residual
      // never materializes: its subtraction is inlined into each
      // encode term as an explicit left-to-right sum — the same
      // accumulation order as zip_with(a-b) fed to vec_dot. ADC
      // scores (coarse term + table sum) round to 6 dp before the
      // candidate cutoff; the final ranking is exact cosine.
      val dsub = Dims / PqM
      val cellLit = CoarseCellIds.mkString("[", ", ", "]")
      val resTerms = (1 to dsub).map(i =>
        s"(u.uv[b.sub*$dsub+$i] - k.ccv[b.sub*$dsub+$i]) * b.cv[$i]")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |u AS (SELECT vec_id,
         |  list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
         |  FROM e),
         |ci AS (SELECT c.range::INT AS cell,
         |  CAST(($cellLit)[c.range + 1] AS BIGINT) AS sid
         |  FROM range($IvfPqCells) c),
         |cc AS (SELECT ci.cell, u.uv AS ccv
         |  FROM ci JOIN u ON u.vec_id = ci.sid),
         |sm AS (SELECT c.range::INT AS code,
         |  CAST((21 + 29 * c.range) % 500 AS BIGINT) AS sid
         |  FROM range($PqK) c),
         |cb AS (SELECT g.range::INT AS sub, sm.code,
         |    list_slice(u.uv, g.range * $dsub + 1, g.range * $dsub + $dsub)
         |      AS cv
         |  FROM sm JOIN u ON u.vec_id = sm.sid CROSS JOIN range($PqM) g),
         |cbn AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc
         |  FROM cb),
         |cd0 AS (SELECT u.vec_id, c.cell, list_dot_product(u.uv, c.ccv) AS cd
         |  FROM u CROSS JOIN cc c),
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cd DESC, cell) AS rn FROM cd0)
         |  WHERE rn <= $IvfPqAssign),
         |enc0 AS (SELECT u.vec_id, a.cell, b.sub, b.code,
         |    $resTerms - b.cc / 2 AS d
         |  FROM u JOIN asg a ON a.vec_id = u.vec_id
         |    JOIN cc k ON k.cell = a.cell CROSS JOIN cbn b),
         |enc AS (SELECT vec_id, cell, sub, code FROM (
         |  SELECT vec_id, cell, sub, code, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id, cell, sub ORDER BY d DESC, code) AS rn
         |  FROM enc0) WHERE rn = 1),
         |qd0 AS (SELECT u.vec_id AS q_id, b.sub, b.code,
         |    list_dot_product(
         |      list_slice(u.uv, b.sub * $dsub + 1, b.sub * $dsub + $dsub),
         |      b.cv) AS d
         |  FROM u CROSS JOIN cbn b WHERE u.vec_id < 20),
         |pr AS (SELECT q_id, cell, qcd FROM (
         |  SELECT vec_id AS q_id, cell, cd AS qcd, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id ORDER BY cd DESC, cell) AS rn
         |  FROM cd0 WHERE vec_id < 20) WHERE rn <= $IvfPqProbes),
         |adc AS (SELECT p.q_id, enc.vec_id, enc.cell,
         |  round(max(p.qcd) + SUM(q.d), 6) AS adc
         |  FROM enc JOIN pr p ON p.cell = enc.cell AND enc.vec_id <> p.q_id
         |    JOIN qd0 q ON q.q_id = p.q_id AND q.sub = enc.sub
         |      AND q.code = enc.code
         |  GROUP BY 1, 2, 3),
         |adc2 AS (SELECT q_id, vec_id, max(adc) AS adc
         |  FROM adc GROUP BY 1, 2),
         |cand AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY adc DESC, vec_id) AS cr
         |  FROM adc2) WHERE cr <= $IvfPqRerank)
         |SELECT q_id, vec_id, sim, rk FROM (
         |  SELECT c.q_id, c.vec_id,
         |    round(list_dot_product(qu.uv, eu.uv), 6) AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY c.q_id
         |      ORDER BY round(list_dot_product(qu.uv, eu.uv), 6) DESC,
         |        c.vec_id) AS rk
         |  FROM cand c JOIN u eu ON eu.vec_id = c.vec_id
         |    JOIN u qu ON qu.vec_id = c.q_id)
         |WHERE rk <= 5""".stripMargin
    },
    "s5_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        127.0 / greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
        |          AS scale
        |      FROM e)
        |SELECT vec_id, CAST(unnest(generate_series(1, len(v))) - 1 AS BIGINT) AS i,
        |  CAST(round(unnest(v) * scale) AS INTEGER) AS q,
        |  round(scale, 6) AS scale
        |FROM s""".stripMargin)
}
