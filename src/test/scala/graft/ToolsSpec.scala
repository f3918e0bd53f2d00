package graft

import org.apache.spark.sql.functions._

/** Coverage for the round-13 measurement tooling: the CDC phase split
  * (the bench's bootstrap-vs-steady instrument) and the ScaleSoak
  * corpus builder (the sf1 scaling-curve input).
  */
class ToolsSpec extends SparkSpec {

  test("cdcPhaseTimings: all six phases run and time positive, both sinks") {
    for (scd2 <- Seq(false, true)) {
      val (boot, ap, rp) =
        graft.ops.Maintenance.cdcPhaseTimings(spark, sfDir, scd2)
      assert(boot > 0 && ap > 0 && rp > 0,
        s"scd2=$scd2 phases ($boot, $ap, $rp)")
    }
  }

  test("ScaleSoak.buildCorpus: factor-exact row counts, distinct keys, " +
      "perturbed replicas, nulls preserved") {
    val out = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val factor = 3
    graft.tools.ScaleSoak.buildCorpus(spark, sfDir, out, factor)
    val base = graft.core.Tables.load(spark, sfDir, "documents")
    val soak = graft.core.Tables.load(spark, out, "documents")
    val nBase = base.count()
    assert(soak.count() == factor * nBase)
    // every replica is a distinct doc to the dedup paths: ids unique,
    // non-null texts unique per replica (the " r<i>" tag)
    assert(soak.select("doc_id").distinct().count() == factor * nBase)
    val nNullBase = base.filter(col("text").isNull).count()
    assert(soak.filter(col("text").isNull).count() == factor * nNullBase,
      "null-text population must scale with the factor (concat propagates)")
    val distinctTexts = soak.filter(col("text").isNotNull)
      .select("text").distinct().count()
    assert(distinctTexts == factor * base.filter(col("text").isNotNull)
      .select("text").distinct().count(),
      "each replica's texts must be distinct from every other replica's")
    // events: users scale with the factor
    val ev = graft.core.Tables.load(spark, out, "events")
    val evBase = graft.core.Tables.load(spark, sfDir, "events")
    assert(ev.count() == factor * evBase.count())
    assert(ev.select("user_id").distinct().count() ==
      factor * evBase.select("user_id").distinct().count())
    // customer: q79's input scales with distinct names
    val c = graft.core.Tables.load(spark, out, "customer")
    val cBase = graft.core.Tables.load(spark, sfDir, "customer")
    assert(c.count() == factor * cBase.count())
    assert(c.select("c_name").distinct().count() ==
      factor * cBase.select("c_name").distinct().count())
    // embeddings (r14): the ANN soak needs factor-x DISTINCT points in
    // unit-cosine space — ids unique, replica 0 byte-identical to the
    // base, and every replica vector direction-perturbed (a pure
    // rescale would vanish under normalization)
    val emb = graft.core.Tables.load(spark, out, "embeddings")
    val embBase = graft.core.Tables.load(spark, sfDir, "embeddings")
    val nEmbBase = embBase.count()
    assert(emb.count() == factor * nEmbBase)
    assert(emb.select("vec_id").distinct().count() == factor * nEmbBase)
    val rep0 = emb.filter(col("vec_id") < nEmbBase)
      .select(col("vec_id"), col("embedding"))
    assert(rep0.exceptAll(embBase.select(col("vec_id"), col("embedding")))
      .count() == 0, "replica 0 must be the original vectors")
    // a replica's unit direction differs from its source: compare the
    // cosine of (base vec, replica-1 vec) — strictly below 1 for all
    import org.apache.spark.sql.functions.{sqrt => sqrtC}
    graft.functions.VectorFunctions.register(spark)
    val dotUdfFree = {
      val a = embBase.select(col("vec_id").as("k"),
        col("embedding").cast("array<double>").as("va"))
      val b = emb.filter(col("vec_id") >= nEmbBase &&
          col("vec_id") < 2 * nEmbBase)
        .select((col("vec_id") - nEmbBase).as("k"),
          col("embedding").cast("array<double>").as("vb"))
      a.join(b, "k").select(
        (graft.llm.Similarity.dot(col("va"), col("vb")) /
          (sqrtC(graft.llm.Similarity.dot(col("va"), col("va"))) *
            sqrtC(graft.llm.Similarity.dot(col("vb"), col("vb")))))
          .as("cos"))
    }
    val maxCos = dotUdfFree.agg(org.apache.spark.sql.functions.max("cos"))
      .head().getDouble(0)
    assert(maxCos < 1.0 - 1e-9,
      s"replica vectors must change direction, max cos = $maxCos")
  }
}
