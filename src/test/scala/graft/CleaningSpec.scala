package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.etl.{AirlineFixture, Cleaning}

/** SURVEY §5.2 unit tests for the cleaning stage: HHMM decode
  * round-trip property, label law, city-split edge, schema contract.
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("HHMM decode: hour/minute round-trip for t in [0, 2400)") {
    val ts = (0 until 2400).filter(t => t % 100 < 60).map(_.toDouble)
    val df = ts.toDF("t")
      .select(col("t"),
        Cleaning.hhmmHour(col("t")).as("h"),
        Cleaning.hhmmMinute(col("t")).as("m"))
      .collect()
    df.foreach { r =>
      val t = r.getDouble(0).toInt
      assert(r.getInt(1) == t / 100, s"hour of $t")
      assert(r.getInt(2) == t % 100, s"minute of $t")
    }
  }

  test("HHMM decode: ScalaCheck property over sampled valid HHMM values") {
    val prop = Prop.forAll(Gen.choose(0, 23), Gen.choose(0, 59)) { (h: Int, m: Int) =>
      val t = (h * 100 + m).toDouble
      val r = Seq(t).toDF("t")
        .select(Cleaning.hhmmHour(col("t")), Cleaning.hhmmMinute(col("t")))
        .head
      r.getInt(0) == h && r.getInt(1) == m
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("label law: Delay_Status = 0 iff DepDelay <= 0 and ArrDelay <= 0") {
    val df = Seq((-5.0, -3.0), (0.0, 0.0), (1.0, -2.0), (-1.0, 4.0), (10.0, 10.0))
      .toDF("DepDelay", "ArrDelay")
      .withColumn("s", Cleaning.delayStatus)
      .collect()
    df.foreach { r =>
      val expected = if (r.getDouble(0) <= 0 && r.getDouble(1) <= 0) 0 else 1
      assert(r.getInt(2) == expected)
    }
  }

  test("city split keeps whole string when no comma (reference edge)") {
    val r = Seq("Boston, MA", "Nomad").toDF("OriginCityName")
      .select(split(col("OriginCityName"), ",").getItem(0).as("c"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("Boston", "Nomad"))
  }

  test("cleaned fixture: schema contract and row invariants") {
    val raw = AirlineFixture.generate(spark, 2000)
    val cleaned = Cleaning.cleaned(raw).cache()
    val cols = cleaned.columns.toSet
    assert(Set("Delay_Status", "DepTimeHour", "DepTimeMinute", "ArrTimeHour",
      "ArrTimeMinute").subsetOf(cols))
    assert(!cols.exists(Set("Cancelled", "DepDelay", "ArrDelay", "DepTime", "ArrTime")))
    assert(cleaned.filter(col("Delay_Status").isin(0, 1)).count() == cleaned.count())
    assert(cleaned.filter(col("OriginCityName").contains(",")).count() == 0)
    assert(cleaned.filter(col("DepTimeHour") < 0 || col("DepTimeHour") > 23).count() == 0)
    assert(cleaned.filter(col("DepTimeMinute") < 0 || col("DepTimeMinute") > 59).count() == 0)
    // viz dataset = cancelled ∪ null-free flown
    val viz = Cleaning.vizDataset(raw)
    assert(viz.count() > cleaned.count())
    cleaned.unpersist()
  }
}
