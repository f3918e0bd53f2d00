package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // absorb session warmup (codegen, scheduler, parquet footer reads)
    // so the first timed query isn't charged for it
    val warmupSec = timed(spark.range(1000000L).selectExpr("sum(id)").collect())
    graft.core.Tables.all.foreach(t =>
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () })
    // contamination sentinel: a fixed trivial query (pure CPU, no IO,
    // post-warmup) whose cost is load-invariant BY THE ENGINE — on a
    // quiet box it runs in milliseconds, so an inflated value flags the
    // whole artifact as load-contaminated without needing a rerun
    val sentinelSec = timed(spark.range(10000000L)
      .selectExpr("sum(id * 3 % 7)").collect())
    // median of 3 runs per query: a single load spike on the box can't
    // distort the round-over-round comparison
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // optional arg: regex over query names, for targeted measurement of
    // one operator while iterating (the driver passes no args = full run)
    val selected = args.headOption match {
      case Some(re) => SparkEntry.queries.filter(_._1.matches(re))
      case None     => SparkEntry.queries
    }
    // plan fingerprint: md5 of the FINAL (post-AQE) physical plan with
    // volatile tokens stripped — expression ids, plan ids, file paths.
    // Same code + data ⇒ same hash, so a lost broadcast or a new
    // shuffle flips the fingerprint and is machine-detectable
    // round-over-round from the artifacts alone (like the load
    // sentinel made timing noise detectable). Queries that eagerly
    // checkpoint internally (d8, c8, …) fingerprint their final
    // checkpointed tail only.
    def planFp(df: org.apache.spark.sql.DataFrame): String = {
      val norm = df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#")
        .replaceAll("plan_id=\\d+", "plan_id=")
        .replaceAll("file:[^\\],\\s)]+", "file:")
      java.security.MessageDigest.getInstance("MD5")
        .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    }
    val fps = scala.collection.mutable.Map[String, String]()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { i =>
        spark.catalog.clearCache() // queries that persist subtrees stay cold
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          df.count()
          if (i == 1) fps(name) = planFp(df)
        } catch { case _: Throwable => if (i == 1) fps(name) = "error" }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.size / 2)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val plans = fps.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // warmup_sec/sentinel_sec make a dirty run machine-detectable from
    // the artifact alone: both are fixed-size engine-only operations
    // (quiet-box reference ~0.1-0.5 s); a multiple of that means the
    // box was loaded and the per-query numbers are noise.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","warmup_sec":$warmupSec,"sentinel_sec":$sentinelSec,"plans":$plans}""")
    spark.stop()
  }
}
