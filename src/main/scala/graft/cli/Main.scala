package graft.cli

import org.apache.spark.sql.SparkSession
import graft.core.Session
import graft.etl.Cleaning
import graft.io.{Sinks, Sources}
import graft.ml.{Models, TrainJob}
import graft.stats.Statistics
import graft.viz.VizQueries

/** Command-line entry points mirroring the reference's batch scripts
  * (SURVEY §3 entry points A/B/C):
  *
  * {{{
  *   graft.cli.Main clean  <input.csv> <outDir>       // script 1
  *   graft.cli.Main stats  <cleaned>   <outDir>       // script 2
  *   graft.cli.Main train  <model> <cleaned> <outDir> [cv]  // scripts 3-10
  *   graft.cli.Main viz    <vizData>   <outDir>       // viz notebooks' inputs
  * }}}
  *
  * `<model>` ∈ lr, dt, rf, gbt, svc, nb. Inputs are header CSV (parity
  * with the reference) or parquet (preferred; detected by extension).
  * Outputs: parity CSVs via [[Sinks]].
  */
object Main {

  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  private def read(spark: SparkSession, path: String) =
    if (path.endsWith(".csv")) Sources.csvInferred(spark, path)
    else Sources.parquet(spark, path)

  def run(spark: SparkSession, args: Seq[String]): Unit = args match {
    case Seq("clean", in, out) =>
      val raw = read(spark, in).persist()
      Sinks.csv(Cleaning.vizDataset(raw), s"$out/Flight_Data_Visualization",
        singleFile = true)
      Sinks.csv(Cleaning.cleaned(raw), s"$out/Full_Cleaned_Data", singleFile = true)

    case Seq("stats", in, out) =>
      val cleaned = read(spark, in).persist()
      val sel = Statistics.analyze(cleaned)
      Sinks.tinyCsv(Seq("selected_features"), sel.uniCat.map(Seq(_)),
        s"$out/univariate_categorical_feature_selection.csv")
      Sinks.tinyCsv(Seq("selected_features"), sel.uniNum.map(Seq(_)),
        s"$out/univariate_numerical_feature_selection.csv")
      Sinks.tinyCsv(Seq("selected_features"), sel.varNum.map(Seq(_)),
        s"$out/variance_feature_selection.csv")
      Sinks.tinyCsv(Seq("features", "pValue", "degreesOfFreedom", "statistics"),
        sel.chi.map(c => Seq(c._1, c._2, c._3, c._4)),
        s"$out/chi_square_statistic.csv")

    case Seq("train", model, in, out) => train(spark, model, in, out, cv = false)
    case Seq("train", model, in, out, "cv") => train(spark, model, in, out, cv = true)

    case Seq("viz", in, out) =>
      val viz = read(spark, in).persist()
      Sinks.csv(VizQueries.flightsPerMonth(viz),
        s"$out/Number_flights_vs_Months", singleFile = true)
      Sinks.csv(VizQueries.flightsPerWeekday(viz),
        s"$out/Number_flights_vs_Weeks", singleFile = true)
      Sinks.csv(VizQueries.distancePerYear(viz),
        s"$out/Distance_vs_Year", singleFile = true)

    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      System.err.println("usage: clean|stats|train|viz ... (see scaladoc)")
  }

  private def train(spark: SparkSession, model: String, in: String,
      out: String, cv: Boolean): Unit = {
    val cleaned = read(spark, in)
    val (estimator, grid) = model match {
      case "lr"  => Models.logisticRegression()
      case "dt"  => Models.decisionTree()
      case "rf"  => Models.randomForest()
      case "gbt" => Models.gbt()
      case "svc" => Models.linearSvc()
      case "nb"  => Models.naiveBayes()
      case m => sys.error(s"unknown model $m (lr|dt|rf|gbt|svc|nb)")
    }
    val (cat, num) = Statistics.catNumCols(cleaned)
    val r = TrainJob.run(cleaned, cat, num, estimator, Some(grid),
      cvFolds = if (cv) Some(10) else None)
    val m = r.metrics
    Sinks.tinyCsv(Seq("parameter", "values"),
      Seq(Seq("best_params", r.best.map(_.toString).getOrElse("")),
        Seq("area_ROC", m.areaRoc), Seq("accuracy", m.accuracy),
        Seq("tpr", m.tpr), Seq("fpr", m.fpr),
        Seq("precision", m.precision), Seq("f1_score", m.f1)),
      s"$out/${model}_metrics.csv")
  }
}
