package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}

/** Feature pipeline builder (SURVEY §2.5 M1–M4, M10; reference
  * `pipeline_creator`, `Scripts/3_...py:56-72`): per-categorical
  * StringIndexer (+skip) → OneHotEncoder, numeric VectorAssembler →
  * StandardScaler (unit std-dev, no centering — reference default),
  * final assembler over encoded + scaled, then the estimator.
  *
  * All six stage families are executor-side MLlib transforms; the only
  * driver work is the per-indexer distinct-count fit.
  */
object Features {

  def pipelineCreator(categoricalCols: Seq[String], numericalCols: Seq[String],
      estimator: PipelineStage): Pipeline = {
    val indexers = categoricalCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(c + "_string")
        .setHandleInvalid("skip"))
    val encoders = categoricalCols.map(c =>
      new OneHotEncoder().setInputCol(c + "_string").setOutputCol(c + "_encoded"))
    val assembleNum = new VectorAssembler()
      .setInputCols(numericalCols.toArray).setOutputCol("vector_num")
    val scale = new StandardScaler()
      .setInputCol("vector_num").setOutputCol("vector_num_scaled")
    val assembleAll = new VectorAssembler()
      .setInputCols((categoricalCols.map(_ + "_encoded") :+ "vector_num_scaled").toArray)
      .setOutputCol("features")
    new Pipeline().setStages(
      (indexers ++ encoders ++ Seq(assembleNum, scale, assembleAll, estimator)).toArray)
  }
}
