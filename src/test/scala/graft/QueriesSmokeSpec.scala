package graft

/** t1 smoke: every SparkEntry query executes on sf0.001 and the
  * flagship entry returns rows (the driver's smoke contract).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry has an oracle (verdict faces included)") {
    // r13: the formerly rows-only queries register envelope VERDICT
    // faces with real oracles — nothing may ship without a hash gate
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    // ...and the five statistical queries also carry a measured-value
    // envelope check (the side `envelope.json` detail)
    val enveloped = graft.tools.Envelopes.check(spark, sfDir).map(_._1).toSet
    val expected = Set("q11_sample", "q35_approx_stats", "q36_stratified",
      "s4_knn_ivf_kmeans", "c12_quality_model")
    assert(enveloped == expected,
      s"envelope drift: ${expected.diff(enveloped)} / ${enveloped.diff(expected)}")
    assert(expected.subsetOf(SparkEntry.oracleSql.keySet),
      "verdict faces must carry DuckDB oracles")
  }

  test("every envelope verdict passes at sf0.001") {
    graft.tools.Envelopes.check(spark, sfDir).foreach {
      case (name, ok, detail) => assert(ok, s"$name: $detail")
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      assert(fn(spark, sfDir).count() >= 0)
    }
  }

  test("global plan lint: no cartesian product, no Python, no UDF in " +
      "any of the 190 query plans (MLlib model faces exempt from the " +
      "UDF rule — predict transforms plan ScalaUDFs by construction)") {
    // The per-operator PlanSpec pins cover ~30 hand-picked shapes;
    // this closes the other 160: a CartesianProduct anywhere is a
    // 100 TB outage (every crossJoin in the tree must stay broadcast-
    // pinned), and the zero-UDF claim (all custom kernels are codegen
    // Expressions or typed aggregates) is asserted engine-wide
    // instead of spot-checked.
    val udfExempt = Set("c12_quality_model", "s4_knn_ivf_kmeans")
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct"))
          bad += s"$name: CartesianProduct"
        if (p.contains("BatchEvalPython") || p.contains("ArrowEvalPython"))
          bad += s"$name: Python UDF"
        if (!udfExempt(name) && p.contains("ScalaUDF"))
          bad += s"$name: ScalaUDF"
      } catch { case e: Throwable => bad += s"$name: plan build failed: " +
        Option(e.getMessage).getOrElse(e.getClass.getName).take(120) }
    }
    assert(bad.isEmpty, s"plan lint failures:\n${bad.mkString("\n")}")
  }
}
