package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc ANN recall probe: recall@k of one registered query against
  * the exact brute-force truth (s1), without running the whole bench.
  * Usage:
  *   tools/run_class.sh graft.tools.RecallProbe <sfDir> <queryName> [k]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val k = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val truth = graft.SparkEntry.queries("s1_knn_brute")(spark, sfDir)
      .collect().filter(_.getLong(3) <= k)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val got = graft.SparkEntry.queries(name)(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dt = (System.nanoTime() - t0) / 1e9
    val recall = truth.intersect(got).size.toDouble / truth.size
    println(f"[recall] $name recall@$k=$recall%.3f (${dt}%.2f s)")
    spark.stop()
  }
}
