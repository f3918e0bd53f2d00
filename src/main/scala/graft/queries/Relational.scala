package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.core.Tables

/** SURVEY §2.6 declared query inventory Q1–Q15: each reference
  * operator pattern (SURVEY §2.1–§2.5 citations inline) transplanted
  * onto the driver's star-schema testdata. Every query is expressed
  * with the declarative DataFrame API so Catalyst pushes filters and
  * prunes columns at the parquet scan.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Q1 — projection + filter (ref S1/P1 `Scripts/1_...py:30,41-48`,
    * P4/P5 filters). Predicate + column pruning reach the scan.
    */
  def q1FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30)
      .select("l_orderkey", "l_quantity", "l_extendedprice")

  /** Q2 — conditional label derivation (ref P8 `when().otherwise()`
    * `Scripts/1_...py:68`).
    */
  def q2Conditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") <= 1000, 0).otherwise(1).as("big"))

  /** Q3 — string ops (ref F1 split/getItem `Scripts/1_...py:75-76`,
    * F2 substr `:79-87`).
    */
  def q3StringOps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      split(col("p_name"), " ").getItem(0).as("name_head"),
      col("p_type").substr(1, 5).as("type_pref"))

  /** Q4 — cast + compound range predicate (ref P11 `Scripts/1_...py:79-92`,
    * P6 `:80,85`). l_quantity is integral-valued so truncate-vs-round
    * cast semantics agree with the oracle.
    */
  def q4CastRange(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_extendedprice") >= 100 && col("l_extendedprice") < 10000)
      .select(
        col("l_orderkey"),
        col("l_quantity").cast(IntegerType).as("qty_int"))

  /** Q5 — positional union (ref A1 nb c5, `Scripts/1_...py:58`). */
  def q5Union(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey").as("k"))
      .union(t(s, dir, "supplier").select(col("s_suppkey").as("k")))

  /** Q6 — group-by count (ref A4, viz1 c4/c6/c8). Partial (map-side)
    * aggregation before the shuffle is free from HashAggregate.
    */
  def q6GroupCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))

  /** Q7 — group-by sum per year (ref A5, viz1 c2 "Distance per Year").
    * Sum rounded to 2dp on both sides: parallel vs sequential double
    * summation differ in ulps; rounding makes the hash stable.
    */
  def q7GroupSum(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(year(col("l_shipdate")).cast(LongType).as("yr"))
      .agg(round(sum(col("l_extendedprice")), 2).as("total"))

  /** Q8 — pivot wide reshape (ref A6 viz2 c2-c5, Airline×DelayGroup).
    * Native Spark pivot with explicit value list (avoids the extra
    * distinct-values job — the 100 TB-safe form).
    */
  def q8Pivot(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val renamed = Map(
      "1-URGENT" -> "p_urgent", "2-HIGH" -> "p_high", "3-MEDIUM" -> "p_medium",
      "4-NOT SPECIFIED" -> "p_notspec", "5-LOW" -> "p_low")
    val piv = t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", prios)
      .count()
    piv.select(
      col("o_orderstatus") +: prios.map(p =>
        coalesce(col(s"`$p`"), lit(0L)).as(renamed(p))): _*)
  }

  /** Q9 — distinct (ref A7 viz2 c3). */
  def q9Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select("o_orderpriority").distinct()

  /** Q10 — group-by sum + sort desc (ref A8/A9 viz2 c6-c7). */
  def q10SortAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(round(sum(col("o_totalprice")), 2).as("s"))
      .orderBy(desc("s"))

  /** Q11 — seeded Bernoulli sample (ref P12 nb c8 `sample(0.001, 777)`).
    * RNG is partitioning-dependent → no SQL oracle; driver does a
    * rows-only envelope check.
    */
  def q11Sample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").sample(withReplacement = false, 0.01, 777L)

  /** Q12 — TPC-H Q3-style 3-way join (engine extension, SURVEY §2.4
    * note). customer is the small side → explicit broadcast; at
    * 100 TB orders⋈lineitem stays a shuffle join on the shared
    * orderkey, which AQE sizes.
    */
  def q12Join(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** Q13 — Pearson correlation (ref M5 `Scripts/2_...py:61,85`),
    * the pure-SQL pairwise form of `Correlation.corr`.
    */
  def q13Corr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("c"))

  /** Q14 — variance / mean / stddev (ref A3/M8/M9 `Scripts/2_...py:124-126`). */
  def q14Variance(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(
      round(var_samp(col("o_totalprice")), 2).as("v"),
      round(avg(col("o_totalprice")), 4).as("m"),
      round(stddev_samp(col("o_totalprice")), 4).as("sd"))

  /** Q15 — frequency-ordered index (ref M1 StringIndexer analogue,
    * `Scripts/2_...py:57`): category → dense index by descending
    * frequency, ties broken lexicographically. Window runs over the
    * already-aggregated (tiny) frame, so the single-partition window
    * is safe at any scale.
    */
  def q15FreqIndex(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "events").groupBy("event_type").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(desc("n"), col("event_type"))
    counts
      .select(
        col("event_type"),
        (row_number().over(w) - 1).cast(LongType).as("idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_filter_project" -> q1FilterProject _,
    "q2_conditional"    -> q2Conditional _,
    "q3_string_ops"     -> q3StringOps _,
    "q4_cast_range"     -> q4CastRange _,
    "q5_union"          -> q5Union _,
    "q6_group_count"    -> q6GroupCount _,
    "q7_group_sum"      -> q7GroupSum _,
    "q8_pivot"          -> q8Pivot _,
    "q9_distinct"       -> q9Distinct _,
    "q10_sort_agg"      -> q10SortAgg _,
    // verdict face (r13): the sample itself is RNG/partitioning-bound,
    // so the registered query emits the deterministic 6-sigma binomial
    // envelope verdict, hash-gated by a real DuckDB oracle; the raw
    // sample stays exercised inside the verdict and in specs.
    "q11_sample"        -> ((s: SparkSession, d: String) =>
      graft.tools.Envelopes.q11Verdict(s, d)),
    "q12_join"          -> q12Join _,
    "q13_corr"          -> q13Corr _,
    "q14_variance"      -> q14Variance _,
    "q15_freq_index"    -> q15FreqIndex _)

  val oracleSql: Map[String, String] = Map(
    "q1_filter_project" ->
      """SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30""".stripMargin,
    "q2_conditional" ->
      """SELECT o_orderkey, CASE WHEN o_totalprice <= 1000 THEN 0 ELSE 1 END AS big
        |FROM orders""".stripMargin,
    "q3_string_ops" ->
      """SELECT p_partkey, split_part(p_name, ' ', 1) AS name_head,
        |substr(p_type, 1, 5) AS type_pref FROM part""".stripMargin,
    "q4_cast_range" ->
      """SELECT l_orderkey, CAST(l_quantity AS INTEGER) AS qty_int FROM lineitem
        |WHERE l_extendedprice >= 100 AND l_extendedprice < 10000""".stripMargin,
    "q5_union" ->
      """SELECT c_custkey AS k FROM customer
        |UNION ALL SELECT s_suppkey AS k FROM supplier""".stripMargin,
    "q6_group_count" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        |GROUP BY 1, 2""".stripMargin,
    "q7_group_sum" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
        |round(SUM(l_extendedprice), 2) AS total FROM lineitem GROUP BY 1""".stripMargin,
    "q8_pivot" ->
      """SELECT o_orderstatus,
        |COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
        |COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
        |COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
        |COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
        |COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
        |FROM orders GROUP BY 1""".stripMargin,
    "q9_distinct" -> "SELECT DISTINCT o_orderpriority FROM orders",
    "q10_sort_agg" ->
      """SELECT o_orderstatus, round(SUM(o_totalprice), 2) AS s FROM orders
        |GROUP BY 1 ORDER BY s DESC""".stripMargin,
    "q12_join" ->
      """SELECT l_orderkey,
        |round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1998-01-01'
        |AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q13_corr" ->
      "SELECT round(corr(l_quantity, l_extendedprice), 6) AS c FROM lineitem",
    "q14_variance" ->
      """SELECT round(var_samp(o_totalprice), 2) AS v,
        |round(avg(o_totalprice), 4) AS m,
        |round(stddev_samp(o_totalprice), 4) AS sd FROM orders""".stripMargin,
    "q15_freq_index" ->
      """SELECT event_type,
        |ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) - 1 AS idx
        |FROM events GROUP BY event_type""".stripMargin)
}
