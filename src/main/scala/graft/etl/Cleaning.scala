package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Airline cleaning stage (SURVEY §1.4 stage 2; reference
  * `Scripts/1_cs_777_cleaning_data.py`). Pure DataFrame → DataFrame
  * transforms: Catalyst collapses the withColumn chain into a single
  * projection, so the whole stage is one codegen'd pass over the scan.
  *
  * Reference-semantics notes (SURVEY §7.4 hard parts):
  *  - `substr(0, n)` keeps PySpark's position-0 behavior (identical in
  *    the Scala API: SQL substring treats 0 like 1).
  *  - The hour `when` ladder's `otherwise(0)` arm is an Int while the
  *    `when` arms are strings → Spark coerces the column to string
  *    ("0"), and the later int cast recovers 0. Preserved verbatim.
  *  - `split(city, ",").getItem(0)` returns the whole string when no
  *    comma is present (not null). Preserved.
  */
object Cleaning {

  /** The 40-name drop list of `Scripts/1_...py:41-46`. */
  val removeColsList: Seq[String] = Seq(
    "FlightDate", "CRSDepTime", "DepDelayMinutes", "ArrDelayMinutes",
    "CRSElapsedTime", "ActualElapsedTime", "Marketing_Airline_Network",
    "Operated_or_Branded_Code_Share_Partners", "DOT_ID_Marketing_Airline",
    "IATA_Code_Marketing_Airline", "Flight_Number_Marketing_Airline",
    "Operating_Airline", "DOT_ID_Operating_Airline",
    "IATA_Code_Operating_Airline", "Tail_Number",
    "Flight_Number_Operating_Airline", "OriginAirportID",
    "OriginAirportSeqID", "OriginCityMarketID", "OriginStateFips",
    "OriginStateName", "OriginWac", "DestAirportID", "DestAirportSeqID",
    "DestCityMarketID", "DestStateFips", "DestStateName", "DestWac",
    "DepDel15", "DepartureDelayGroups", "DepTimeBlk", "TaxiOut",
    "WheelsOff", "WheelsOn", "TaxiIn", "CRSArrTime", "ArrDel15",
    "ArrivalDelayGroups", "ArrTimeBlk", "DistanceGroup")

  /** P1 anti-select: keep columns not in the drop list (`:48`). */
  def selectSurvivors(df: DataFrame): DataFrame = {
    val drop = removeColsList.toSet
    df.select(df.columns.filterNot(drop).map(col).toSeq: _*)
  }

  /** P4 boolean filters (`:50,53`): (cancelled, flown). */
  def splitCancelled(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col("Cancelled") === true), df.filter(col("Cancelled") === false))

  /** BTS departure-delay-group derivation: 15-minute buckets of
    * DepDelay clamped to [-2, 12]. The raw `DepartureDelayGroups`
    * column is on the drop list, but the viz notebooks consume a
    * `DelayGroup` column (viz1 c8, viz2 c1) — the reference produced
    * those CSVs off-script, so the engine re-derives the standard
    * bucketing from the retained `DepDelay`. Null delay (cancelled
    * rows) ⇒ null group.
    */
  def delayGroup(depDelay: Column): Column =
    least(greatest(floor(depDelay / 15), lit(-2)), lit(12)).cast(IntegerType)

  /** Viz dataset (`:58-61`): cancelled rows ∪ null-free flown rows,
    * plus the derived [[delayGroup]] the viz notebooks read.
    */
  def vizDataset(df: DataFrame): DataFrame = {
    val (cancelled, flown) = splitCancelled(selectSurvivors(df))
    cancelled.union(flown.na.drop())
      .withColumn("DelayGroup", delayGroup(col("DepDelay")))
  }

  /** P8 binary label (`:68`): 0 iff neither departure nor arrival was
    * delayed. Label law: Delay_Status = 0 ⇔ DepDelay ≤ 0 ∧ ArrDelay ≤ 0.
    */
  def delayStatus: Column =
    when(col("DepDelay") <= 0 && col("ArrDelay") <= 0, 0).otherwise(1)

  /** HHMM hour decode (`:79-81`): int-as-string prefix, 3-arm ladder.
    * Note the string/int type-coerced otherwise arm (see class doc).
    */
  def hhmmHour(c: Column): Column = {
    val s = c.cast(IntegerType).cast(StringType)
    when(c >= 1000, s.substr(0, 2))
      .when(c >= 100 && c < 1000, s.substr(0, 1))
      .otherwise(0)
      .cast(IntegerType)
  }

  /** HHMM minute decode (`:82`): last two characters (negative-start
    * substr; a 1-char string yields itself).
    */
  def hhmmMinute(c: Column): Column =
    c.cast(IntegerType).cast(StringType).substr(-2, 2).cast(IntegerType)

  /** Full cleaned table (`:56-98`): null-free flown rows, label
    * derived, leaky columns dropped, city names de-suffixed, HHMM
    * times decoded into hour/minute ints, Diverted as int.
    */
  def cleaned(df: DataFrame): DataFrame = {
    val (_, flown) = splitCancelled(selectSurvivors(df))
    flown.na.drop()
      .drop("Cancelled")
      .withColumn("Delay_Status", delayStatus)
      .drop("DepDelay", "ArrDelay")
      .withColumn("OriginCityName", split(col("OriginCityName"), ",").getItem(0))
      .withColumn("DestCityName", split(col("DestCityName"), ",").getItem(0))
      .withColumn("DepTimeHour", hhmmHour(col("DepTime")))
      .withColumn("DepTimeMinute", hhmmMinute(col("DepTime")))
      .withColumn("ArrTimeHour", hhmmHour(col("ArrTime")))
      .withColumn("ArrTimeMinute", hhmmMinute(col("ArrTime")))
      .drop("DepTime", "ArrTime")
      .withColumn("Diverted", col("Diverted").cast(IntegerType))
  }
}
