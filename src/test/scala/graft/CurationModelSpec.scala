package graft

import graft.llm.Curation

/** c12 model-gated quality filter: the classifier must actually learn
  * the target-domain structure (metric floors, not hashes — an LBFGS
  * fit is float-order-sensitive, which is why c12 is registered
  * rows-only), and the gated curation variant must stay inside the
  * ungated pipeline's output.
  */
class CurationModelSpec extends SparkSpec {

  private def scored() = Curation.qualityClassifierScores(spark, sfDir)
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))

  test("c12: distilled gate reproduces the quality decision — accuracy and AUC floors") {
    val rows = scored()
    assert(rows.length == 500)
    val bothClasses = rows.map(_._2).toSet
    assert(bothClasses == Set(0, 1), s"label degenerate: $bothClasses")
    val acc = rows.count(r => r._4 == r._2).toDouble / rows.length
    assert(acc >= 0.85, s"model accuracy $acc below floor")
    // rank-based AUC over the probability scores: P(score(pos) >
    // score(neg)) with half-credit ties
    val pos = rows.filter(_._2 == 1).map(_._3)
    val neg = rows.filter(_._2 == 0).map(_._3)
    val auc = pos.iterator.map(p =>
      neg.count(p > _) + 0.5 * neg.count(p == _)).sum / (pos.length.toDouble * neg.length)
    assert(auc >= 0.9, s"model AUC $auc below floor")
    info(f"c12 accuracy $acc%.3f auc $auc%.3f (${pos.length} pass / ${neg.length} fail)")
  }

  test("c12: refit reproduces the metric within tolerance") {
    val a1 = { val r = scored(); r.count(x => x._4 == x._2).toDouble / r.length }
    val a2 = { val r = scored(); r.count(x => x._4 == x._2).toDouble / r.length }
    assert(math.abs(a1 - a2) <= 0.02, s"refit accuracy drifted: $a1 vs $a2")
  }

  test("model-gated curation admits only model-passed docs and gates for real") {
    val passed = scored().filter(_._4 == 1).map(_._1).toSet
    val gated = Curation.curateModelGated(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val full = Curation.curate(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(gated.nonEmpty)
    // every admitted doc cleared the model gate (a strict subset-of-
    // full claim would be wrong: the fp-dedup window may elect a
    // different representative when a cluster's min doc_id is gated
    // out — the gate composes BEFORE dedup, as in a real release)
    assert(gated.subsetOf(passed),
      s"gated output leaked ${gated.diff(passed).take(5)} past the model gate")
    // the gate does real work: non-target-domain docs the base
    // pipeline keeps are excluded
    assert(gated.size < full.size, s"gate admitted everything (${full.size})")
  }
}
