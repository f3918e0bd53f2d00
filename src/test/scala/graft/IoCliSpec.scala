package graft

import java.nio.file.Files
import graft.core.Schemas
import graft.etl.AirlineFixture
import graft.io.{Sinks, Sources}

/** Sources/sinks round-trips and the CLI clean job end-to-end. */
class IoCliSpec extends SparkSpec {

  test("raw airline schema has 61 columns; cleaned has the stage-2 set") {
    assert(Schemas.rawAirline.length == 61)
    assert(Schemas.cleanedAirline.fieldNames.contains("Delay_Status"))
  }

  test("csv sink + inferred source round-trip") {
    val dir = Files.createTempDirectory("graft_io").toString
    val df = AirlineFixture.generate(spark, 200)
    Sinks.csv(df, s"$dir/out", singleFile = true)
    val back = Sources.csvInferred(spark, s"$dir/out")
    assert(back.count() == 200)
    assert(back.columns.toSet == df.columns.toSet)
  }

  test("tinyCsv + columnList round-trip (S3/S4 driver-side path)") {
    val dir = Files.createTempDirectory("graft_tiny").toString
    Sinks.tinyCsv(Seq("selected_features"),
      Seq(Seq("AirTime"), Seq("Month")), s"$dir/sel.csv")
    val list = Sources.columnList(spark, s"$dir/sel.csv")
    assert(list == Seq("AirTime", "Month"))
  }

  test("cli clean job writes viz + cleaned parity CSVs") {
    val dir = Files.createTempDirectory("graft_cli").toString
    val fixture = s"$dir/raw"
    AirlineFixture.generate(spark, 500).write.parquet(fixture)
    graft.cli.Main.run(spark, Seq("clean", fixture, s"$dir/out"))
    assert(Sources.csvInferred(spark, s"$dir/out/Full_Cleaned_Data").count() > 0)
    assert(Sources.csvInferred(spark, s"$dir/out/Flight_Data_Visualization").count() > 0)
  }
}
