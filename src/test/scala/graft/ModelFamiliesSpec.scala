package graft

import org.apache.spark.ml.classification._
import graft.etl.{AirlineFixture, Cleaning}
import graft.ml.TrainJob
import graft.stats.Statistics

/** Smoke-fit every estimator family the reference uses (M11–M17) on a
  * small fixture — one cheap config per family, asserting a sane
  * metric comes back (full grids are exercised by TVS/CV tests).
  */
class ModelFamiliesSpec extends SparkSpec {

  private lazy val cleaned =
    Cleaning.cleaned(AirlineFixture.generate(spark, 1200)).cache()
  private lazy val cols = Statistics.catNumCols(cleaned)

  private def fit(est: org.apache.spark.ml.PipelineStage): Unit = {
    val r = TrainJob.run(cleaned, cols._1.take(1), cols._2, est, None)
    assert(r.metrics.accuracy > 0.0 && r.metrics.accuracy <= 1.0)
  }

  test("M11 LogisticRegression") { fit(new LogisticRegression()) }
  test("M12 DecisionTree") {
    fit(new DecisionTreeClassifier().setSeed(777L).setMaxDepth(3)) }
  test("M13 RandomForest") {
    fit(new RandomForestClassifier().setSeed(777L).setMaxDepth(3).setNumTrees(3)) }
  test("M14 GBT") {
    fit(new GBTClassifier().setSeed(777L).setMaxDepth(3).setMaxIter(3)) }
  test("M15 LinearSVC") { fit(new LinearSVC().setMaxIter(5)) }
  test("M16 GaussianNaiveBayes") {
    // Gaussian NB rejects the sparse one-hot vectors StandardScaler
    // leaves untouched only in the numeric slot — scale numerics only,
    // as the reference pipeline does, and it fits fine.
    fit(new NaiveBayes().setModelType("gaussian")) }
  test("M17 MLP (tiny topology)") {
    val inputSize = {
      // categorical one-hot width + scaled numeric width resolved at fit
      // time by the pipeline; use a numeric-only pipeline for a fixed size
      cols._2.size
    }
    val r = TrainJob.run(cleaned, Nil, cols._2,
      new MultilayerPerceptronClassifier().setSeed(777L)
        .setLayers(Array(inputSize, 4, 2)).setMaxIter(5), None)
    assert(r.metrics.accuracy > 0.0)
  }

  // -- fixture-golden metrics ----------------------------------------------
  // The fixture is pure-hash-derived and the holdout split is temporal,
  // so every metric below is exactly reproducible in this pinned
  // session (local[4], 4 shuffle partitions). Locking the values turns
  // a silent feature-pipeline drift — a dropped column, a changed
  // scaler, an indexer reorder — into a test failure; the 1e-3 band
  // absorbs ulp-level reduction-order noise and nothing else.
  // (BASELINE.md's real-data metrics are unreachable without the real
  // data; the fixture's own metrics are the testable surrogate.)

  test("golden: LR metrics on the deterministic fixture") {
    val m = TrainJob.run(cleaned, cols._1.take(1), cols._2,
      new LogisticRegression(), None).metrics
    val want = Seq(0.445215, 0.920502, 0.0, 0.0, 0.0, 0.882399)
    val got = Seq(m.areaRoc, m.accuracy, m.tpr, m.fpr, m.precision, m.f1)
    got.zip(want).zip(Seq("roc", "acc", "tpr", "fpr", "prec", "f1")).foreach {
      case ((g, w), n) => assert(math.abs(g - w) < 1e-3, s"$n drifted: $g vs $w")
    }
  }

  test("golden: GBT metrics on the deterministic fixture") {
    val m = TrainJob.run(cleaned, cols._1.take(1), cols._2,
      new GBTClassifier().setSeed(777L).setMaxDepth(3).setMaxIter(3), None).metrics
    val want = Seq(0.352632, 0.912134, 0.0, 0.009091, 0.0, 0.878203)
    val got = Seq(m.areaRoc, m.accuracy, m.tpr, m.fpr, m.precision, m.f1)
    got.zip(want).zip(Seq("roc", "acc", "tpr", "fpr", "prec", "f1")).foreach {
      case ((g, w), n) => assert(math.abs(g - w) < 1e-3, s"$n drifted: $g vs $w")
    }
  }

  // -- BASELINE.md degenerate-behavior sentinels ---------------------------

  test("sentinel: LinearSVC under heavy reg collapses to the majority class " +
      "(TPR = FPR = 1.0, accuracy = majority prior)") {
    import org.apache.spark.sql.functions._
    // Label is hash-noise (no feature signal), majority class 0 at ~52%
    // — the shape of the reference data where heavy regularization
    // drives the weights to ~0 and the intercept predicts the majority
    // class everywhere. With the evaluators' metricLabel=0 defaults
    // (reference parity), an all-0 predictor scores TPR = FPR = 1.0 and
    // accuracy = precision = P(label=0) (BASELINE.md Linear SVC rows).
    val shaped = cleaned.withColumn("Delay_Status",
      when(abs(xxhash64(col("DayofMonth"), col("DepTimeMinute"),
        col("AirTime"))) % 100 < 52, 0).otherwise(1))
    val r = TrainJob.run(shaped, cols._1.take(1), cols._2,
      new LinearSVC().setRegParam(2.0), None)
    val (_, test) = TrainJob.split(
      shaped.withColumnRenamed("Delay_Status", "label"))
    val prior0 = test.filter(col("label") === 0).count().toDouble / test.count()
    assert(r.metrics.tpr === 1.0, s"tpr ${r.metrics.tpr}")
    assert(r.metrics.fpr === 1.0, s"fpr ${r.metrics.fpr}")
    assert(math.abs(r.metrics.accuracy - prior0) < 1e-9,
      s"acc ${r.metrics.accuracy} vs prior0 $prior0")
  }

  test("law: model-quality ordering on a planted-signal fixture — " +
      "AUC(GBT) > AUC(LR) > AUC(NB), and GBT's Var set is the argmax") {
    import org.apache.spark.sql.functions._
    // The report's headline result (BASELINE.md model table: GBT-Var
    // best AUC, tree ensembles above linear above NB) as a LAW on a
    // fixture with the signal planted to exercise each family's
    // representational edge (seeded, pinned session — every number
    // below is deterministic):
    //  - an INTERACTION: (DepTimeMinute >= 30) XOR (AirTime > 165) —
    //    marginally ~flat on each carrier (P ≈ 0.5 per side), so only
    //    the tree ensemble (depth ≥ 2) can represent it; both carriers
    //    are top-variance numerics, so the Var set keeps them while
    //    Uni's marginal ANOVA-F scores are blind to them.
    //  - a margin on the DIFFERENCE of two correlated columns
    //    (Distance ≈ 7.5·AirTime + U[0,50)): logistic regression
    //    recovers the clean difference with one weight pair; Gaussian
    //    NB's diagonal covariance cannot — the shared AirTime variance
    //    swamps each marginal. LR > NB by construction, not by luck.
    val at = coalesce(col("AirTime"), lit(150.0))
    val dist = coalesce(col("Distance"), lit(1150.0))
    val u = (abs(xxhash64(col("DayofMonth"), col("DepTimeMinute"),
      col("AirTime"), lit(1414))) % 1000).cast("double") / 1000.0
    val xorSig = (coalesce(col("DepTimeMinute"), lit(0.0)) >= 30.0)
      .=!=(at > 165.0)
    val lin = (dist - at * 7.5) / 50.0 // the U[0,1) noise component
    val p1 = when(xorSig, lit(0.62)).otherwise(lit(0.05)) + lin * 0.3
    val shaped = cleaned.withColumn("Delay_Status", (u < p1).cast("int"))
    def auc(catC: Seq[String], numC: Seq[String],
        est: org.apache.spark.ml.PipelineStage): Double =
      TrainJob.run(shaped, catC, numC, est, None).metrics.areaRoc
    def gbt() = new GBTClassifier().setSeed(777L).setMaxDepth(3).setMaxIter(20)
    val full = (cols._1, cols._2)
    val gbtFull = auc(full._1, full._2, gbt())
    val lrFull = auc(full._1, full._2, new LogisticRegression())
    val nbFull = auc(full._1, full._2,
      new NaiveBayes().setModelType("gaussian"))
    // Pinned-session values: GBT 0.737, LR 0.558, NB 0.449 (LR's edge
    // over NB is exactly the correlated-difference margin: LR on the
    // (Distance, AirTime) pair alone reads 0.590 — the planted 0.597
    // — while NB lands BELOW chance, double-counting the shared
    // variance). Margins assert the law with ~half the measured gaps
    // as cushion against ML-impl drift across Spark versions.
    assert(gbtFull > lrFull + 0.08,
      s"tree ensemble must beat linear on the interaction: $gbtFull vs $lrFull")
    assert(lrFull > nbFull + 0.04,
      s"LR must beat diagonal-covariance NB on the correlated-difference " +
        s"margin: $lrFull vs $nbFull")
    // Feature sets via the script-2 selection flow (uni top-k, var
    // top-6) — GBT on the Var set is the argmax, the report's
    // headline cell: the Var set keeps exactly the high-variance
    // signal carriers while Full dilutes depth-limited trees with
    // noise columns and Uni's ANOVA-F scores are blind to the
    // marginally-flat interaction carriers.
    val sel = Statistics.analyze(shaped)
    val gbtUni = auc(sel.uniCat, sel.uniNum, gbt())
    val gbtVar = auc(Nil, sel.varNum, gbt())
    assert(gbtVar >= gbtFull && gbtVar > gbtUni,
      s"GBT-Var must be the argmax: var=$gbtVar full=$gbtFull uni=$gbtUni")
    assert(gbtVar > lrFull && gbtVar > nbFull,
      s"GBT-Var must top the family AUCs: $gbtVar vs lr=$lrFull nb=$nbFull")
  }

  test("sentinel: DecisionTree best rows identical on full vs univariate sets " +
      "when the signal feature survives selection") {
    import org.apache.spark.sql.functions._
    // Label is a pure function of the 12-valued Month: the tree splits
    // exactly at a distinct value, reaches purity at depth 1, and the
    // extra full-set features never enter the model — so the full and
    // uni cells emit byte-identical best rows (BASELINE.md Decision
    // Tree Full ≡ Uni note). A continuous-threshold label would NOT
    // reproduce this: quantile binning leaves impurity and the trees
    // diverge on noise features.
    val shaped = cleaned.withColumn("Delay_Status",
      when(col("Month") <= 6, 1).otherwise(0))
    val (est, grid) = graft.ml.Models.decisionTree()
    val uniCat = cols._1.take(1)
    val uniNum = Seq("Month", "AirTime")
    val full = TrainJob.run(shaped, cols._1, cols._2, est, Some(grid))
    val uni = TrainJob.run(shaped, uniCat, uniNum, est, Some(grid))
    assert(full.best.map(_.toSeq.map(p => p.param.name -> p.value).sortBy(_._1))
      == uni.best.map(_.toSeq.map(p => p.param.name -> p.value).sortBy(_._1)),
      s"full ${full.best} vs uni ${uni.best}")
    assert(full.metrics == uni.metrics,
      s"full ${full.metrics} vs uni ${uni.metrics}")
  }
}
