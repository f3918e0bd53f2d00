package graft.tools

import org.apache.spark.sql.SparkSession
import graft.llm.Similarity

/** Scratch: sweep IVF (k, nprobe) for recall vs brute ground truth. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val truth = Similarity.knnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- Seq(8, 10, 12, 16); np <- Seq(1, 2, 3, 4)) {
      val ivf = Similarity.knnIvfKmeans(spark, dir, k = k, nprobe = np, topK = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = truth.intersect(ivf).size.toDouble / truth.size
      println(f"k=$k%2d nprobe=$np%2d recall=$rec%.3f scanned=${np.toDouble / k}%.2f")
    }
    spark.stop()
  }
}
