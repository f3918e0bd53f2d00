package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources (SURVEY §2.1 S1/S4).
  *
  * S1 parity mode reads header CSV with schema inference (two passes,
  * like the reference); the engine default takes an explicit schema —
  * one pass and type-stable, which is the only viable form at 100 TB
  * (inference over a PB-scale directory is a full extra scan).
  */
object Sources {

  /** S1 — reference-parity CSV read (header + inferSchema). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", true).csv(path)

  /** S1 engine default — declared-schema CSV read (single pass). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", true).schema(schema).csv(path)

  /** Engine-default columnar source. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Fault-tolerant CSV read for raw ingest: malformed rows land in
    * `_corrupt_record` instead of failing the job (PERMISSIVE mode) —
    * at 100 TB a handful of broken rows must not kill a multi-hour
    * scan, and the corrupt column makes them routable to a quarantine
    * sink. The passed schema gets the corrupt column appended.
    */
  def csvPermissive(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read
      .option("header", true)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** ORC source (engine extension): Spark's other native columnar
    * format — same predicate-pushdown/column-pruning path as parquet,
    * so interchange with ORC-based warehouses costs no scan posture.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines source (engine extension — declared schema, single
    * pass; inference variant for exploration only).
    */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def jsonInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S4 — tiny driver-side list read (the reference's pandas
    * `read_csv(...).iloc[:,0].tolist()` feeding feature lists between
    * jobs): first column of a small CSV as driver values.
    */
  def columnList(spark: SparkSession, path: String): Seq[String] =
    spark.read.option("header", true).csv(path)
      .collect().map(_.getString(0)).toSeq
}
