package graft

import org.apache.spark.sql.functions._
import graft.queries.Mining

/** Pattern-mining operators: association rules (q70) and synchronous
  * label propagation (q71) — hand-computable fixtures plus invariant
  * checks on the TPC-H-shaped data.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("labelPropagate finds the two components of a barbell graph") {
    // two triangles {1,2,3} and {10,11,12} joined by nothing: after one
    // round every node holds its component's minimum label; further
    // rounds are a fixpoint
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L))
    val e0 = tri.toDF("src", "dst")
    val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
    val got = Mining.labelPropagate(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // tier equality (CC-cutover discipline): the distributed rounds,
    // forced via a -1 cutover, label identically to the driver tier
    val dist = Mining.labelPropagate(edges, 3, driverMaxEdges = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == got)
  }

  test("labelPropagate tie rule picks the smallest label deterministically") {
    // node 5 has neighbors 1 and 2 (one vote each): ties break toward
    // the smaller label, so 5 adopts 1 in round one
    val e0 = Seq((1L, 5L), (2L, 5L)).toDF("src", "dst")
    val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
    val r1 = Mining.labelPropagate(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(5L) == 1L)
  }

  test("q70 rules satisfy the support/confidence/lift identities") {
    val rules = Mining.q70AssocRules(spark, sfDir)
    val rows = rules.collect()
    assert(rows.nonEmpty)
    // every rule meets the integer support floor
    assert(rows.forall(_.getLong(2) >= Mining.MinSupport))
    // the rule set is direction-symmetric in support: (a→b) and (b→a)
    // carry the same supp
    val bySupp = rows.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(bySupp.forall { case ((a, b), s) => bySupp.get((b, a)).contains(s) })
    // confidence within (0, 1]; lift strictly positive
    assert(rows.forall(r => r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
    assert(rows.forall(r => r.getDouble(4) > 0))
  }

  test("q70 confidence matches a hand-joined recount on one rule") {
    val baskets = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey".as("oid"), $"l_partkey".as("item")).distinct()
    val first = Mining.q70AssocRules(spark, sfDir)
      .orderBy("ante", "cons").limit(1).collect()(0)
    val (a, b) = (first.getLong(0), first.getLong(1))
    val sa = baskets.filter($"item" === a).count()
    val sab = baskets.filter($"item" === a).select("oid")
      .intersect(baskets.filter($"item" === b).select("oid")).count()
    assert(first.getLong(2) == sab)
    assert(math.abs(first.getDouble(3) - sab.toDouble / sa) < 1e-6)
  }
}
