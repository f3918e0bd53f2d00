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
    graft.functions.VectorFunctions.register(s)
    // Single-file test input = one split; the pair joins are CPU-bound
    // → spread rows across cores (no-op posture at real scale).
    Tables.load(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Pairwise cosine from precomputed norms. */
  private def pairCos(av: Column, an: Column, bv: Column, bn: Column): Column =
    dot(av, bv) / (an * bn)

  // -- s1: brute-force top-k ----------------------------------------------
  /** Exact cosine top-5 over the whole corpus for queries vec_id < 20.
    * Ties broken by neighbor id so ranks are deterministic.
    */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id"), col("sim"),
        col("rk").cast(LongType).as("rk"))
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
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    e.join(broadcast(q), col("label") === col("q_label"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(pairCos(col("qv"), col("qn"), col("v"), col("nrm")), 6).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("vec_id"), col("sim"),
        col("rk").cast(LongType).as("rk"))
  }

  // -- s3: embedding near-dup pairs ---------------------------------------
  /** Near-duplicate vector pairs: cosine >= 0.35 within a cell
    * (threshold tuned to the synthetic corpus, whose max cross-pair
    * cosine is ~0.51). Cell blocking keeps the pair join O(cell²), the
    * standard embedding-dedup shape.
    */
  def embedDupPairs(s: SparkSession, dir: String): DataFrame = {
    // Broadcast the build side: the label-keyed self-join then streams
    // the probe side without shuffling the (wide) vector arrays. At
    // 100 TB the build side is the per-cell centroid shard, still
    // broadcastable; full-corpus × full-corpus would instead bucket
    // both sides by cell id.
    val e = emb(s, dir)
    e.as("a").join(broadcast(e.as("b")),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(pairCos(col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm")), 6)
          .as("sim"))
      .filter(col("sim") >= 0.35)
  }

  // -- KMeans-based IVF (API surface; validated by ScalaTest, not the
  //    SQL oracle — KMeans cell assignment isn't SQL-reproducible) ---------
  /** Assigns every vector to a KMeans cell — the real coarse quantizer
    * an IVF index would use at scale. Deterministic via fixed seed.
    */
  def kmeansCells(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    // built-in array→vector conversion (codegen-adjacent, no Scala UDF)
    val df = emb(s, dir).withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(777L).setFeaturesCol("features")
      .fit(df)
    model.transform(df).select(col("vec_id"), col("prediction").as("cell"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_knn_brute" -> knnBrute _,
    "s2_knn_ivf"   -> knnIvf _,
    "s3_embed_dup" -> embedDupPairs _)

  private val cosSql =
    "list_dot_product(av, bv) / (sqrt(list_dot_product(av, av)) * sqrt(list_dot_product(bv, bv)))"

  val oracleSql: Map[String, String] = Map(
    "s1_knn_brute" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings)
         |SELECT q_id, vec_id, sim, rk FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSql.replace("av", "q.v").replace("bv", "e.v")}, 6) DESC,
         |        e.vec_id) AS rk
         |  FROM e q JOIN e ON q.vec_id < 20 AND e.vec_id <> q.vec_id)
         |WHERE rk <= 5""".stripMargin,
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
         |WHERE sim >= 0.35""".stripMargin)
}
