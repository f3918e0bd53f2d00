package graft

/** t1 smoke: every SparkEntry query executes on sf0.001 and the
  * flagship entry returns rows (the driver's smoke contract).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry has an oracle or is a declared rows-only check") {
    // RNG-dependent / sketch-internal / model-fit-dependent by design
    val rowsOnly = Set("q11_sample", "q35_approx_stats", "q36_stratified",
      "s4_knn_ivf_kmeans", "c12_quality_model")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    // ...and every declared rows-only query has an ENVELOPE check, so
    // the correctness artifact carries a verdict for all of them
    val enveloped = graft.tools.Envelopes
      .check(spark, sfDir).map(_._1).toSet
    assert(rowsOnly == enveloped,
      s"rows-only/envelope drift: ${rowsOnly.diff(enveloped)} / ${enveloped.diff(rowsOnly)}")
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
}
