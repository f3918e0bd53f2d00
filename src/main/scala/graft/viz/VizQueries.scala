package graft.viz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The five aggregate queries feeding the reference's visualization
  * notebooks (SURVEY §2.4 A4–A6; consumed at viz1 c2/c4/c6/c8 and
  * viz2 c1). Each is a single partial-aggregated groupBy — the shape
  * that scales: the shuffle carries one row per group, not per flight.
  */
object VizQueries {

  /** viz1 c4 — flights per month. */
  def flightsPerMonth(viz: DataFrame): DataFrame =
    viz.groupBy("Month").count().orderBy("Month")

  /** viz1 c6 — flights per day-of-week. */
  def flightsPerWeekday(viz: DataFrame): DataFrame =
    viz.groupBy("DayOfWeek").count().orderBy("DayOfWeek")

  /** viz1 c8 — flights per delay group, ascending (A9 sort). */
  def flightsPerDelayGroup(viz: DataFrame, delayGroupCol: String = "DelayGroup")
      : DataFrame =
    viz.groupBy(delayGroupCol).count().orderBy("count")

  /** viz1 c2 — total distance per year (A5 group-by sum). */
  def distancePerYear(viz: DataFrame): DataFrame =
    viz.groupBy("Year").agg(sum("Distance").as("Distance")).orderBy("Year")

  /** viz2 c1-c7 — airline × delay-group counts pivoted wide, plus the
    * per-airline horizontal total, ordered by total desc (A6/A8; the
    * native pivot replaces the reference's driver-side pandas loop).
    */
  def airlineDelayGroupPivot(viz: DataFrame, delayGroupCol: String = "DelayGroup")
      : DataFrame = {
    val piv = viz.groupBy("Airline").pivot(delayGroupCol).count().na.fill(0L)
    val groupCols = piv.columns.filterNot(_ == "Airline")
    piv.withColumn("Total", groupCols.map(col).reduce(_ + _))
      .orderBy(desc("Total"))
  }
}
