package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.DataFrame

/** Hyper-parameter search (SURVEY §2.5 M18–M19, A10; reference
  * `Scripts/3_...py:94-102` TVS and `Scripts/10_...py:92-99` CV).
  * Both searches fan the grid out as concurrent fits; `parallelism`
  * maps each grid point to its own Spark job cascade.
  */
object Tuning {

  /** M18: single 0.8 train/validation split over the grid. */
  def trainValidationSplit(estimator: Estimator[_ <: Model[_]],
      grid: Array[ParamMap], evaluator: Evaluator,
      train: DataFrame): TrainValidationSplitModel =
    new TrainValidationSplit()
      .setEstimator(estimator)
      .setEstimatorParamMaps(grid)
      .setEvaluator(evaluator)
      .setTrainRatio(0.8)
      .setSeed(777L)
      .fit(train)

  /** M19: 10-fold cross validation, 10 concurrent fit threads. */
  def crossValidate(estimator: Estimator[_ <: Model[_]],
      grid: Array[ParamMap], evaluator: Evaluator, train: DataFrame,
      folds: Int = 10, parallelism: Int = 10): CrossValidatorModel =
    new CrossValidator()
      .setEstimator(estimator)
      .setEstimatorParamMaps(grid)
      .setEvaluator(evaluator)
      .setNumFolds(folds)
      .setParallelism(parallelism)
      .setSeed(777L)
      .fit(train)

  /** A10: best grid point = argmax validation metric (driver-side,
    * reference `sorted(...)[0]`).
    */
  def bestParams(model: TrainValidationSplitModel): ParamMap =
    model.getEstimatorParamMaps(model.validationMetrics.indices
      .maxBy(model.validationMetrics))

  def bestParams(model: CrossValidatorModel): ParamMap =
    model.getEstimatorParamMaps(model.avgMetrics.indices
      .maxBy(model.avgMetrics))
}
