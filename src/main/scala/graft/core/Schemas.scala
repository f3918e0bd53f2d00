package graft.core

import org.apache.spark.sql.types._

/** Explicit StructTypes (SURVEY §7.1 core/Schemas; §1.3-§1.4 logical
  * schemas). The reference re-infers schemas from CSV on every read
  * (two passes per file); the engine default is declared schemas —
  * one pass, stable types, and the 100 TB posture of schema-on-write
  * parquet.
  */
object Schemas {

  private def s(n: String) = StructField(n, StringType)
  private def i(n: String) = StructField(n, IntegerType)
  private def d(n: String) = StructField(n, DoubleType)
  private def b(n: String) = StructField(n, BooleanType)

  /** Raw Kaggle flight-delay schema (61 columns): the 21 survivors of
    * the cleaning drop list plus the 40 dropped names
    * (`Scripts/1_...py:41-46`; SURVEY §1.4 stage 1).
    */
  val rawAirline: StructType = StructType(Seq(
    s("FlightDate"), s("Airline"), s("Origin"), s("Dest"),
    b("Cancelled"), b("Diverted"), i("CRSDepTime"), d("DepTime"),
    d("DepDelayMinutes"), d("DepDelay"), d("ArrTime"), d("ArrDelayMinutes"),
    d("ArrDelay"), d("AirTime"), d("CRSElapsedTime"), d("ActualElapsedTime"),
    d("Distance"), i("Year"), i("Quarter"), i("Month"), i("DayofMonth"),
    i("DayOfWeek"), s("Marketing_Airline_Network"),
    s("Operated_or_Branded_Code_Share_Partners"), i("DOT_ID_Marketing_Airline"),
    s("IATA_Code_Marketing_Airline"), i("Flight_Number_Marketing_Airline"),
    s("Operating_Airline"), i("DOT_ID_Operating_Airline"),
    s("IATA_Code_Operating_Airline"), s("Tail_Number"),
    i("Flight_Number_Operating_Airline"), i("OriginAirportID"),
    i("OriginAirportSeqID"), i("OriginCityMarketID"), s("OriginCityName"),
    s("OriginState"), i("OriginStateFips"), s("OriginStateName"),
    i("OriginWac"), i("DestAirportID"), i("DestAirportSeqID"),
    i("DestCityMarketID"), s("DestCityName"), s("DestState"),
    i("DestStateFips"), s("DestStateName"), i("DestWac"), d("DepDel15"),
    d("DepartureDelayGroups"), s("DepTimeBlk"), d("TaxiOut"), d("WheelsOff"),
    d("WheelsOn"), d("TaxiIn"), i("CRSArrTime"), d("ArrDel15"),
    d("ArrivalDelayGroups"), s("ArrTimeBlk"), d("DistanceGroup"),
    d("DivAirportLandings")))

  /** Cleaned-stage schema (SURVEY §1.4 stage 2): survivors + derived
    * label/time parts, leaky columns gone.
    */
  val cleanedAirline: StructType = StructType(Seq(
    s("Airline"), s("Origin"), s("Dest"), i("Diverted"), d("AirTime"),
    d("Distance"), i("Year"), i("Quarter"), i("Month"), i("DayofMonth"),
    i("DayOfWeek"), s("OriginCityName"), s("OriginState"), s("DestCityName"),
    s("DestState"), i("Delay_Status"), i("DepTimeHour"), i("DepTimeMinute"),
    i("ArrTimeHour"), i("ArrTimeMinute")))
}
