package graft.ml

import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.sql.DataFrame

/** The reference's six-metric evaluation block (SURVEY §2.5 M21–M22;
  * `Scripts/3_...py:74-79,106-111`): ROC-AUC plus five multiclass
  * metrics over the scored predictions. Each evaluate is one
  * distributed aggregate job.
  */
object Evaluate {

  case class Metrics(areaRoc: Double, accuracy: Double, tpr: Double,
      fpr: Double, precision: Double, f1: Double)

  def metrics(predictions: DataFrame, labelCol: String = "label"): Metrics = {
    def mc(name: String) = new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setMetricName(name).evaluate(predictions)
    Metrics(
      areaRoc = new BinaryClassificationEvaluator().setLabelCol(labelCol)
        .setMetricName("areaUnderROC").evaluate(predictions),
      accuracy = mc("accuracy"),
      tpr = mc("truePositiveRateByLabel"),
      fpr = mc("falsePositiveRateByLabel"),
      precision = mc("precisionByLabel"),
      f1 = mc("f1"))
  }
}
