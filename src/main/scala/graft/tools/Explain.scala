package graft.tools

import org.apache.spark.sql.SparkSession

/** Offline plan-audit tool: prints the formatted physical plan of the
  * named `SparkEntry.queries` entries (all of them with no args) so
  * shuffle/broadcast/codegen shapes can be reviewed without editing a
  * spec. `SPARK_GRAFT_SF_DIR` selects the data directory.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_RAW=1: print the executedPlan.toString with Bench's
    // v1 normalization applied — the exact string the plan fingerprint
    // hashes, for diffing when a fingerprint drifts unexpectedly.
    val raw = sys.env.get("SPARK_GRAFT_RAW").contains("1")
    names.foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      if (raw)
        println(df.queryExecution.executedPlan.toString
          .replaceAll("#\\d+", "#")
          .replaceAll("plan_id=\\d+", "plan_id=")
          .replaceAll("file:[^\\],\\s)]+", "file:"))
      else df.explain("formatted")
    }
    spark.stop()
  }
}
