package graft

import graft.index.Indexes

/** The graft.index registry (VERDICT r11 stretch #8): every persisted
  * index/model family registers its build (and append, where the
  * layout supports increments) in one place, and the CLI's uniform
  * `index build|append` surface routes through it. These tests audit
  * coverage and that the facade delegates to the same code paths the
  * family-specific entry points use.
  */
class IndexFacadeSpec extends SparkSpec {

  test("registry covers every persisted index/model family") {
    assert(Indexes.all.map(_.name).toSet == Set(
      "fp", "shingle", "band", "cluster", "apss", "bm25", "phash",
      "ivf", "pq", "ivfpq", "lsh", "bpe", "lm", "dsir"))
    assert(Indexes.all.filter(_.append.isDefined).map(_.name).toSet ==
      Set("bm25", "phash", "ivf", "ivfpq", "lsh", "shingle", "band"),
      "append-capable set drifted — register (or justify) the change here")
    // names unique, kinds constrained
    assert(Indexes.all.map(_.name).distinct.size == Indexes.all.size)
    assert(Indexes.all.map(_.kind).toSet.subsetOf(
      Set("bucketed-table", "parquet-layout", "model-file")))
  }

  test("unknown family and non-appendable family fail with the " +
      "actionable message") {
    val e1 = intercept[IllegalArgumentException](Indexes.get("nope"))
    assert(e1.getMessage.contains("known:"))
    val e2 = intercept[IllegalArgumentException](
      Indexes.append(spark, "pq", spark.range(1).toDF(), "x"))
    assert(e2.getMessage.contains("appendable:"))
  }

  test("facade build delegates to the family writer: bm25 built through " +
      "the facade serves the same scores as the direct path") {
    Indexes.build(spark, "bm25", sfDir, "bm25_facade_spec")
    val viaFacade = graft.llm.TextAnalysis
      .bm25FromIndex(spark, "bm25_facade_spec").collect()
      .map(_.toSeq.toList).toSet
    graft.llm.TextAnalysis.writeBm25Index(spark, sfDir, "bm25_direct_spec")
    val direct = graft.llm.TextAnalysis
      .bm25FromIndex(spark, "bm25_direct_spec").collect()
      .map(_.toSeq.toList).toSet
    assert(viaFacade.nonEmpty && viaFacade == direct)
  }

  test("facade append routes a batch into the stored layout: phash") {
    Indexes.build(spark, "phash", sfDir, "phash_facade_spec")
    val before = spark.table("phash_facade_spec").count()
    val batch = graft.llm.Multimodal.mediaTable(spark, sfDir).limit(3).toDF()
    Indexes.append(spark, "phash", batch, "phash_facade_spec")
    val after = spark.table("phash_facade_spec").count()
    assert(after > before, s"append added no band rows: $before -> $after")
  }
}
