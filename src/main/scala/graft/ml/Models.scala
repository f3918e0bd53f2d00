package graft.ml

import org.apache.spark.ml.classification._
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.ParamGridBuilder

/** The reference's eight estimator configurations with their hyper-
  * parameter grids (SURVEY §2.5 M11–M17, M20; `Scripts/3-9_...py:81-90`).
  * Each entry pairs an estimator with its `ParamGridBuilder` grid;
  * seeds are pinned for partition-stable metrics (SURVEY §7.4 item 4).
  */
object Models {

  def logisticRegression(): (LogisticRegression, Array[ParamMap]) = {
    val lr = new LogisticRegression()
    (lr, new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.1, 0.01, 0.05))
      .addGrid(lr.elasticNetParam, Array(0.0, 0.5, 1.0))
      .build())
  }

  def decisionTree(): (DecisionTreeClassifier, Array[ParamMap]) = {
    val dt = new DecisionTreeClassifier().setSeed(777L)
    (dt, new ParamGridBuilder()
      .addGrid(dt.impurity, Array("gini", "entropy"))
      .addGrid(dt.maxDepth, Array(5, 10, 15, 20))
      .build())
  }

  def randomForest(): (RandomForestClassifier, Array[ParamMap]) = {
    val rf = new RandomForestClassifier().setSeed(777L)
    (rf, new ParamGridBuilder()
      .addGrid(rf.impurity, Array("gini", "entropy"))
      .addGrid(rf.maxDepth, Array(5, 10, 15, 20))
      .addGrid(rf.numTrees, Array(5, 10, 15, 20))
      .build())
  }

  def gbt(): (GBTClassifier, Array[ParamMap]) = {
    val g = new GBTClassifier().setSeed(777L)
    (g, new ParamGridBuilder()
      .addGrid(g.maxDepth, Array(5, 10, 15, 20))
      .build())
  }

  def linearSvc(): (LinearSVC, Array[ParamMap]) = {
    val svc = new LinearSVC()
    (svc, new ParamGridBuilder()
      .addGrid(svc.regParam, Array(0.0, 0.3, 0.5, 1.0, 2.0))
      .build())
  }

  def naiveBayes(): (NaiveBayes, Array[ParamMap]) = {
    val nb = new NaiveBayes().setModelType("gaussian")
    (nb, new ParamGridBuilder()
      .addGrid(nb.smoothing, Array(0.0, 0.3, 0.5, 0.7, 1.0))
      .build())
  }

  /** MLP topologies (`Scripts/9_...py:81-110`): input layer sized to
    * the assembled feature vector at runtime, hidden stacks fixed.
    */
  def mlpTopologies(inputSize: Int): Seq[Array[Int]] = Seq(
    Array(inputSize, 200, 200, 2),
    Array(inputSize, 300, 300, 300, 2),
    Array(inputSize, 500, 500, 500, 2))

  def mlp(layers: Array[Int]): MultilayerPerceptronClassifier =
    new MultilayerPerceptronClassifier().setLayers(layers).setSeed(777L)
}
