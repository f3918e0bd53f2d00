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
}
