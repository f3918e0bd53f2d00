package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.ml.feature.{StringIndexer, UnivariateFeatureSelector, VarianceThresholdSelector, VectorAssembler}
import org.apache.spark.ml.linalg.{Matrix, Vector}
import org.apache.spark.ml.stat.{ChiSquareTest, Correlation, Summarizer}

/** Statistical-analysis & feature-selection surface (SURVEY §2.5
  * M1/M3/M5–M9; reference `Scripts/2_cs_777_statistical_analysis_
  * feature_selection.py`). Distributed aggregates run on executors;
  * only tiny matrices/vectors come back to the driver, which sorts /
  * thresholds / maps indices to names — the reference's two-tier shape
  * kept in one JVM.
  */
object Statistics {

  /** Reflective categorical/numeric split (`Scripts/2_...py:39-52`):
    * string dtype ⇒ categorical; everything else numeric except Year
    * and the label.
    */
  def catNumCols(df: DataFrame, label: String = "Delay_Status")
      : (Seq[String], Seq[String]) = {
    val (cat, rest) = df.dtypes.toSeq.partition(_._2 == "StringType")
    (cat.map(_._1),
      rest.map(_._1).filterNot(c => c == "Year" || c == label))
  }

  /** M1: frequency-descending string indexing of every categorical
    * column, appended as `<col>_string` (`Scripts/2_...py:56-57`).
    */
  def indexCategoricals(df: DataFrame, catCols: Seq[String]): DataFrame =
    catCols.foldLeft(df) { (d, c) =>
      new StringIndexer().setInputCol(c).setOutputCol(c + "_string")
        .setHandleInvalid("skip").fit(d).transform(d)
    }

  /** M3+M5: assemble `cols` and compute the Pearson correlation matrix
    * (`Scripts/2_...py:59-61`). Executors run one treeAggregate; only
    * the N×N matrix reaches the driver.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
      vecCol: String = "vector_assem_all"): Matrix = {
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol(vecCol)
      .setHandleInvalid("skip").transform(df)
    Correlation.corr(assembled, vecCol).head().getAs[Matrix](0)
  }

  /** M6: χ² independence of each indexed categorical vs the label
    * (`Scripts/2_...py:89-93`). Returns (feature, pValue, dof, stat).
    */
  def chiSquare(df: DataFrame, catCols: Seq[String],
      label: String = "Delay_Status"): Seq[(String, Double, Int, Double)] = {
    val assembled = new VectorAssembler()
      .setInputCols(catCols.map(_ + "_string").toArray)
      .setOutputCol("vector_assem_cat").transform(df)
    val r = ChiSquareTest.test(assembled, "vector_assem_cat", label).head()
    val p = r.getAs[Vector]("pValues").toArray
    val d = r.getSeq[Int](r.fieldIndex("degreesOfFreedom"))
    val s = r.getAs[Vector]("statistics").toArray
    catCols.indices.map(i => (catCols(i), p(i), d(i), s(i)))
  }

  /** M7: univariate top-k selection (`Scripts/2_...py:103-118`) —
    * χ² for categorical features, ANOVA-F for continuous, vs the
    * categorical label. Returns selected column names in index order.
    */
  def univariateSelect(df: DataFrame, cols: Seq[String], vecCol: String,
      featureType: String, k: Int, label: String = "Delay_Status")
      : Seq[String] = {
    val selector = new UnivariateFeatureSelector()
      .setFeaturesCol(vecCol).setOutputCol(vecCol + "_selected")
      .setLabelCol(label).setSelectionMode("numTopFeatures")
      .setFeatureType(featureType).setLabelType("categorical")
      .setSelectionThreshold(k)
    selector.fit(df).selectedFeatures.toSeq.map(cols)
  }

  /** M8+M9: variance-threshold selection with the reference's
    * "threshold = 6th-largest variance ⇒ keep the top-(keep)" rule
    * (`Scripts/2_...py:124-131`): Summarizer computes per-feature
    * variance distributed; the driver sorts the tiny vector and picks
    * the (keep)-th largest as the threshold.
    */
  def varianceTopK(df: DataFrame, numCols: Seq[String],
      vecCol: String = "vector_assem_num", keep: Int = 6): Seq[String] = {
    val kth = df
      .select(Summarizer.metrics("variance").summary(col(vecCol)).as("s"))
      .select("s.variance").head().getAs[Vector](0)
      .toArray.sorted(Ordering[Double].reverse)(keep - 1)
    // Spark 4's selector keeps variance strictly > threshold; the
    // reference (Spark 3.3) observably kept the k-th feature itself
    // (report lists 6 kept with the 6th-largest as threshold), so step
    // just below the k-th value to preserve reference behavior across
    // the version drift (SURVEY §7.4 item 3).
    val threshold = Math.nextDown(kth)
    val model = new VarianceThresholdSelector()
      .setFeaturesCol(vecCol).setOutputCol(vecCol + "_selected")
      .setVarianceThreshold(threshold).fit(df)
    model.selectedFeatures.toSeq.map(numCols)
  }

  /** The full script-2 flow on a cleaned table: index, correlate,
    * drop the reference's high-correlation columns, χ², univariate ×2,
    * variance-threshold. Returns the three selected-feature lists
    * (uniCat, uniNum, varNum) — the driver-feedback values that
    * parameterize training (kept as in-process Scala values; SURVEY
    * §7.4 item 5).
    */
  case class Selection(uniCat: Seq[String], uniNum: Seq[String], varNum: Seq[String],
      chi: Seq[(String, Double, Int, Double)], corrBefore: Matrix, corrAfter: Matrix)

  def analyze(cleanedDf: DataFrame, label: String = "Delay_Status",
      dropCols: Seq[String] = Seq("Origin", "Dest", "Distance", "Quarter", "Diverted"))
      : Selection = {
    // The |cat| eager StringIndexer fits plus two correlations and
    // three selector fits each rescan the input — persist it for
    // library callers that didn't (guarded so an already-cached
    // caller's StorageLevel is left alone).
    val ownPersist =
      cleanedDf.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (ownPersist) cleanedDf.persist()
    try analyzeOn(cleanedDf, label, dropCols)
    finally if (ownPersist) { cleanedDf.unpersist(); () }
  }

  private def analyzeOn(cleanedDf: DataFrame, label: String,
      dropCols: Seq[String]): Selection = {
    val (cat0, num0) = catNumCols(cleanedDf, label)
    val indexed0 = indexCategoricals(cleanedDf, cat0)
    val corrBefore = correlationMatrix(indexed0,
      cat0.map(_ + "_string") ++ num0 :+ label)

    val df = indexed0.drop(dropCols ++ dropCols.map(_ + "_string"): _*)
    val (cat, num) = {
      val (c, n) = catNumCols(df, label)
      (c.filterNot(_.endsWith("_string")), n.filterNot(_.endsWith("_string")))
    }
    val corrAfter = correlationMatrix(df, cat.map(_ + "_string") ++ num :+ label)

    val withCat = new VectorAssembler()
      .setInputCols(cat.map(_ + "_string").toArray).setOutputCol("vector_assem_cat")
      .transform(df)
    // Three selector fits + χ² read this frame — cache it once.
    val withNum = new VectorAssembler()
      .setInputCols(num.toArray).setOutputCol("vector_assem_num")
      .transform(withCat).persist()

    try {
      val chi = {
        // withNum carries vector_assem_cat too — run χ² on the cached frame
        val r = ChiSquareTest.test(withNum, "vector_assem_cat", label).head()
        val p = r.getAs[Vector]("pValues").toArray
        val d = r.getSeq[Int](r.fieldIndex("degreesOfFreedom"))
        val s = r.getAs[Vector]("statistics").toArray
        cat.indices.map(i => (cat(i), p(i), d(i), s(i)))
      }
      Selection(
        uniCat = univariateSelect(withNum, cat, "vector_assem_cat", "categorical", 3, label),
        uniNum = univariateSelect(withNum, num, "vector_assem_num", "continuous", 7, label),
        varNum = varianceTopK(withNum, num),
        chi = chi, corrBefore = corrBefore, corrAfter = corrAfter)
    } finally { withNum.unpersist(); () }
  }
}
