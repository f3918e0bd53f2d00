package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic airline-shaped fixture (FIXTURES.md §B) for golden
  * pipeline tests. Generated distributed (`spark.range` + hash-derived
  * columns — no driver-side loops, no RNG), so the same code shape
  * would emit a 100 TB fixture on a cluster.
  *
  * Every column is a pure function of the row id via xxhash64, so any
  * row is reproducible independently of partitioning.
  */
object AirlineFixture {

  private def h(salt: Int): Column = abs(xxhash64(col("id"), lit(salt)))
  private def pick(salt: Int, values: Seq[String]): Column =
    element_at(array(values.map(lit): _*), (h(salt) % values.size + 1).cast("int"))

  val airlines: Seq[String] = Seq(
    "Alpha Air", "Bravo Airways", "Canyon Jet", "Delta Wing", "EchoFly",
    "Foxtrot Air", "Golf Airlines", "Hotel Air", "IndigoJet", "Juliet Air")
  val cities: Seq[String] = Seq(
    "Boston, MA", "New York, NY", "Chicago, IL", "Austin, TX", "Denver, CO",
    "Seattle, WA", "Miami, FL", "Atlanta, GA", "Phoenix, AZ", "Nomad") // one no-comma edge
  val states: Seq[String] =
    Seq("MA", "NY", "IL", "TX", "CO", "WA", "FL", "GA", "AZ", "XX")
  val ports: Seq[String] =
    Seq("BOS", "JFK", "ORD", "AUS", "DEN", "SEA", "MIA", "ATL", "PHX", "NMD")

  /** HHMM-encoded time-of-day hitting the decode ladder's boundary
    * cases (0, <100, [100,1000), >=1000) plus ~2% nulls.
    */
  private def hhmm(salt: Int): Column = {
    val hour = h(salt) % 24
    val minute = h(salt + 1) % 60
    when(h(salt + 2) % 50 === 0, lit(null))
      .otherwise((hour * 100 + minute).cast("double"))
  }

  def generate(spark: SparkSession, rows: Long = 5000): DataFrame = {
    // Airline frequency skew: quadratic hash fold concentrates mass on
    // low indices (exercises StringIndexer's frequency ordering).
    val airlineIdx = ((h(1) % 10) * (h(2) % 10) / 10 % 10 + 1).cast("int")
    spark.range(rows).select(
      col("id"),
      (lit(2018) + h(3) % 5).cast("int").as("Year"),
      (h(4) % 12 + 1).cast("int").as("Month"),
      (h(5) % 28 + 1).cast("int").as("DayofMonth"),
      (h(6) % 7 + 1).cast("int").as("DayOfWeek"),
      element_at(array(airlines.map(lit): _*), airlineIdx).as("Airline"),
      pick(7, ports).as("Origin"),
      pick(8, ports).as("Dest"),
      pick(9, cities).as("OriginCityName"),
      pick(10, states).as("OriginState"),
      pick(11, cities).as("DestCityName"),
      pick(12, states).as("DestState"),
      (h(13) % 50 === 0).as("Cancelled"),
      lit(false).as("Diverted"),              // zero variance (corr NaN path)
      hhmm(14).as("DepTime"),
      hhmm(17).as("ArrTime"),
      (h(20) % 120 - 30).cast("double").as("DepDelay"), // mixed sign incl. 0
      (h(21) % 140 - 40).cast("double").as("ArrDelay"),
      when(h(22) % 60 === 0, lit(null))
        .otherwise((h(23) % 300 + 30).cast("double")).as("AirTime"))
      .withColumn("Quarter", ((col("Month") - 1) / 3 + 1).cast("int"))
      .withColumn("Distance",
        (col("AirTime") * 7.5 + (h(24) % 50).cast("double")).cast("double"))
      .drop("id")
  }
}
