package graft.viz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The five aggregate queries feeding the reference's visualization
  * notebooks (SURVEY §2.4 A4–A6; consumed at viz1 c2/c4/c6/c8 and
  * viz2 c1). Each is a single partial-aggregated groupBy — the shape
  * that scales: the shuffle carries one row per group, not per flight.
  *
  * Column names match what the notebooks read off the CSVs
  * (`Number of Flights`, `Week`, `DelayGroup` — viz1 c2/c4/c6/c8,
  * viz2 c1/c3), so the emitted files are drop-in replacements.
  */
object VizQueries {

  private val nFlights = count(lit(1)).as("Number of Flights")

  /** viz1 c4 — flights per month (`df_2['Month']`, `['Number of Flights']`). */
  def flightsPerMonth(viz: DataFrame): DataFrame =
    viz.groupBy("Month").agg(nFlights).orderBy("Month")

  /** viz1 c6 — flights per day-of-week; the notebook's CSV names the
    * key column `Week` (`df_3['Week']`).
    */
  def flightsPerWeekday(viz: DataFrame): DataFrame =
    viz.groupBy(col("DayOfWeek").as("Week")).agg(nFlights).orderBy("Week")

  /** viz1 c8 — flights per delay group, ascending (A9 sort; the
    * notebook re-sorts by `Number of Flights` before plotting).
    */
  def flightsPerDelayGroup(viz: DataFrame, delayGroupCol: String = "DelayGroup")
      : DataFrame =
    viz.groupBy(delayGroupCol).agg(nFlights).orderBy("Number of Flights")

  /** viz1 c2 — total distance per year (A5 group-by sum). */
  def distancePerYear(viz: DataFrame): DataFrame =
    viz.groupBy("Year").agg(sum("Distance").as("Distance")).orderBy("Year")

  /** viz2 c1 — the long-format `Airline_DelayGroup_Count.csv` the
    * notebook reads (`Airline`, `DelayGroup`, `Number of Flights`);
    * its pandas loop then reshapes it wide — see
    * [[airlineDelayGroupPivot]] for the native-Spark reshape.
    */
  def airlineDelayGroupCount(viz: DataFrame, delayGroupCol: String = "DelayGroup")
      : DataFrame =
    viz.groupBy("Airline", delayGroupCol).agg(nFlights)
      .orderBy("Airline", delayGroupCol)

  /** viz2 c2-c7 — airline × delay-group counts pivoted wide, plus the
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
