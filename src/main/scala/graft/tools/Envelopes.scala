package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Machine-checkable envelope verdicts for the queries that are
  * rows-only by declared design (VERDICT r11 ask #5): their
  * correctness is statistical (RNG samples, sketch bounds, recall and
  * metric floors), so instead of a DuckDB hash compare the verify run
  * computes each query's declared envelope ON THE VERIFY SF and emits
  * pass/fail into the artifact next to the oracle results. The same
  * envelopes are pinned harder (fixture corpora, tighter tolerances)
  * in ScalaTest; this module exists so the correctness artifact is
  * auditable without reading test code.
  */
object Envelopes {

  /** name -> (pass, detail) for every rows-only query. */
  def check(spark: SparkSession, sfDir: String): Seq[(String, Boolean, String)] =
    Seq(
      "q11_sample" -> q11(spark, sfDir) _,
      "q36_stratified" -> q36(spark, sfDir) _,
      "q35_approx_stats" -> q35(spark, sfDir) _,
      "s4_knn_ivf_kmeans" -> s4(spark, sfDir) _,
      "c12_quality_model" -> c12(spark, sfDir) _
    ).map { case (name, f) =>
      try { val (ok, detail) = f(()); (name, ok, detail) }
      catch { case e: Throwable =>
        (name, false, s"envelope check crashed: ${e.getMessage}")
      }
    }

  /** q11: seeded Bernoulli(0.01) over lineitem — realized row count
    * within 6 binomial sigmas of the expectation.
    */
  private def q11(spark: SparkSession, sfDir: String)(u: Unit) = {
    val n = graft.core.Tables.load(spark, sfDir, "lineitem").count()
    val k = graft.SparkEntry.queries("q11_sample")(spark, sfDir).count()
    val p = 0.01
    val tol = 6 * math.sqrt(n * p * (1 - p))
    (math.abs(k - n * p) <= tol,
      f"rows=$k expected=${n * p}%.1f tol=$tol%.1f (6 sigma)")
  }

  /** q36: per-stratum Bernoulli fractions — every stratum's realized
    * count within 6 binomial sigmas of its declared rate.
    */
  private def q36(spark: SparkSession, sfDir: String)(u: Unit) = {
    val rates = Map("O" -> 0.1, "F" -> 0.05, "P" -> 0.5)
    val totals = graft.core.Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.SparkEntry.queries("q36_stratified")(spark, sfDir)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val checks = rates.toSeq.sortBy(_._1).map { case (st, p) =>
      val n = totals.getOrElse(st, 0L)
      val k = got.getOrElse(st, 0L).toDouble
      val tol = 6 * math.sqrt(n * p * (1 - p))
      (math.abs(k - n * p) <= tol, f"$st:$k%.0f/${n * p}%.1f±$tol%.1f")
    }
    (checks.forall(_._1), checks.map(_._2).mkString(" "))
  }

  /** q35: HLL++ distinct within 5×rsd of the exact distinct per group;
    * the GK median between the exact 0.49 and 0.51 quantiles.
    */
  private def q35(spark: SparkSession, sfDir: String)(u: Unit) = {
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val exact = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("nd"),
      expr("percentile(l_extendedprice, 0.49)").as("lo"),
      expr("percentile(l_extendedprice, 0.51)").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.SparkEntry.queries("q35_approx_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val checks = approx.toSeq.sortBy(_._1).map { case (g, (nd, p50)) =>
      val (ndX, lo, hi) = exact(g)
      val ndOk = math.abs(nd - ndX) <= 5 * 0.01 * ndX
      val pOk = p50 >= lo && p50 <= hi
      (ndOk && pOk, f"$g:nd=$nd/$ndX p50=$p50%.2f∈[$lo%.2f,$hi%.2f]")
    }
    (checks.forall(_._1), checks.map(_._2).mkString(" "))
  }

  /** s4: KMeans-IVF recall@5 against the exact brute-force neighbors —
    * the same 0.9 floor the bench's quality gate enforces.
    */
  private def s4(spark: SparkSession, sfDir: String)(u: Unit) = {
    def pairs(name: String) =
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = graft.SparkEntry.queries("s1_knn_brute")(spark, sfDir)
      .collect().filter(_.getLong(3) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs("s4_knn_ivf_kmeans")
    val recall = truth.intersect(got).size.toDouble / truth.size
    (recall >= 0.9, f"recall@5=$recall%.3f floor=0.9")
  }

  /** c12: distilled quality gate — accuracy ≥ 0.85 and rank AUC ≥ 0.9
    * against the rule labels (the CurationModelSpec floors).
    */
  private def c12(spark: SparkSession, sfDir: String)(u: Unit) = {
    val rows = graft.llm.Curation.qualityClassifierScores(spark, sfDir)
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getInt(3)))
    val acc = rows.count(r => r._3 == r._1).toDouble / rows.length
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    val auc = pos.iterator.map(p =>
      neg.count(p > _) + 0.5 * neg.count(p == _)).sum /
      (pos.length.toDouble * neg.length)
    (acc >= 0.85 && auc >= 0.9, f"acc=$acc%.3f auc=$auc%.3f floors=0.85/0.9")
  }
}
