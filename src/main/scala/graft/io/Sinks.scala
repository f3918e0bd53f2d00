package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import java.nio.file.{Files, Paths}

/** Sinks (SURVEY §2.1 S2–S3).
  *
  * The reference's `coalesce(1)` single-CSV sink is a deliberate
  * convenience, not a semantic requirement (SURVEY §7.4 item 6) — the
  * engine default is partitioned parquet; `singleFile = true` is the
  * opt-in parity mode for small outputs only.
  */
object Sinks {

  /** Engine-default sink: partitioned parquet (scales with the data;
    * optional partition columns enable partition pruning downstream).
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** S2 parity sink: header CSV, optionally collapsed to one file —
    * only for outputs known to be small (viz aggregates, metric
    * tables); a single writer task is a scale bottleneck otherwise.
    */
  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).option("header", true).csv(path)

  /** ORC sink (engine extension — columnar interchange). */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** JSON-lines sink (engine extension). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** S3 tiny-result sink: rows already on the driver → one CSV file.
    * Fields containing separators are RFC-4180 quoted (pandas parity —
    * e.g. the MLP `layers` list value).
    */
  def tinyCsv(header: Seq[String], rows: Seq[Seq[Any]], path: String): Unit = {
    def cell(v: Any): String = {
      val s = String.valueOf(v)
      if (s.exists("\",\n\r".contains(_))) "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }
    val body = (header.map(cell(_)) +: rows.map(_.map(cell)))
      .map(_.mkString(",")).mkString("", "\n", "\n")
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), body)
  }
}
