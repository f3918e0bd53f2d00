package graft

import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import graft.etl.{AirlineFixture, Cleaning}
import graft.ml.{Evaluate, Features, Models, TrainJob, Tuning}
import graft.stats.Statistics

/** Golden pipeline tests (SURVEY §5.2): fixture → clean → statistics /
  * feature selection → train → evaluate, asserting structure and
  * metric sanity (exact values are Spark-version dependent; SURVEY
  * §7.4 item 3 mandates tolerance/structure checks, not hashes).
  */
class StatsMlSpec extends SparkSpec {

  private lazy val cleaned =
    Cleaning.cleaned(AirlineFixture.generate(spark, 3000)).cache()

  test("reflective cat/num split excludes Year and label") {
    val (cat, num) = Statistics.catNumCols(cleaned)
    assert(cat.contains("Airline") && cat.contains("OriginCityName"))
    assert(!num.contains("Year") && !num.contains("Delay_Status"))
    assert(num.contains("AirTime") && num.contains("DepTimeHour"))
  }

  test("full statistical analysis: chi-square, selectors, variance rule") {
    val sel = Statistics.analyze(cleaned)
    // chi² over the five surviving categoricals, all results populated
    assert(sel.chi.nonEmpty)
    sel.chi.foreach { case (_, p, dof, stat) =>
      assert(p >= 0 && p <= 1 && dof >= 0 && stat >= 0)
    }
    assert(sel.uniCat.size == 3)
    assert(sel.uniNum.size == 7)
    // 6th-largest-variance threshold keeps >= 6 features (ties may add)
    assert(sel.varNum.size >= 6)
    // correlation matrices are square over their input widths
    assert(sel.corrBefore.numRows == sel.corrBefore.numCols)
    assert(sel.corrAfter.numRows < sel.corrBefore.numRows)
  }

  test("LR end-to-end: pipeline fit, temporal split, six metrics") {
    val (cat, num) = Statistics.catNumCols(cleaned)
    val r = TrainJob.run(cleaned, cat, num,
      new org.apache.spark.ml.classification.LogisticRegression(), None)
    val m = r.metrics
    assert(m.areaRoc > 0.3 && m.areaRoc <= 1.0)
    Seq(m.accuracy, m.tpr, m.fpr, m.precision, m.f1)
      .foreach(v => assert(v >= 0 && v <= 1))
  }

  test("TVS grid search picks a best param set") {
    val (cat, num) = Statistics.catNumCols(cleaned)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
    val grid = new org.apache.spark.ml.tuning.ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.1, 0.01)).build()
    val r = TrainJob.run(cleaned, cat.take(2), num, lr, Some(grid))
    assert(r.best.isDefined)
    assert(r.metrics.areaRoc > 0.0)
  }

  test("CV (2-fold smoke) returns best params and metrics") {
    val (cat, num) = Statistics.catNumCols(cleaned)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
    val grid = new org.apache.spark.ml.tuning.ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.1, 0.01)).build()
    val r = TrainJob.run(cleaned, cat.take(1), num, lr, Some(grid), cvFolds = Some(2))
    assert(r.best.isDefined && r.metrics.areaRoc > 0.0)
  }

  test("decision tree variant trains (estimator family smoke)") {
    val (cat, num) = Statistics.catNumCols(cleaned)
    val dt = new org.apache.spark.ml.classification.DecisionTreeClassifier()
      .setSeed(777L).setMaxDepth(5)
    val r = TrainJob.run(cleaned, cat.take(1), num, dt, None)
    assert(r.metrics.accuracy > 0.0)
  }

  test("model registry: all eight families expose estimator + grid") {
    assert(Models.logisticRegression()._2.length == 9)
    assert(Models.decisionTree()._2.length == 8)
    assert(Models.randomForest()._2.length == 32)
    assert(Models.gbt()._2.length == 4)
    assert(Models.linearSvc()._2.length == 5)
    assert(Models.naiveBayes()._2.length == 5)
    assert(Models.mlpTopologies(10).map(_.length).toSeq == Seq(4, 5, 5))
  }
}
