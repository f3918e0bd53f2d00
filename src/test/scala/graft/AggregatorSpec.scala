package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashAggregator
import graft.llm.Dedup

/** The typed MinHash Aggregator must agree exactly with the
  * DataFrame 32-column min() implementation, and the multimodal
  * resize/frame-sample stubs must hold their invariants.
  */
class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("MinHashAggregator matches the DataFrame signature implementation") {
    val viaAgg = Dedup.shingleSets(spark, sfDir)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"),
        (graft.llm.TextAnalysis.hash60(col("sh")) % Dedup.M).as("hv"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAggregator.toColumn.name("sig"))
      .collect().toMap

    val viaDf = Dedup.signatures(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (0 until Dedup.NumHashes).map(k => r.getLong(1 + k)))
      .toMap

    assert(viaAgg.keySet == viaDf.keySet)
    viaAgg.foreach { case (doc, sig) =>
      assert(sig == viaDf(doc), s"signature mismatch for doc $doc")
    }
  }

  test("resize stub preserves aspect clamp and frame sampling is deterministic") {
    val fs = graft.llm.Multimodal.processedFeatures(spark, sfDir).collect()
    assert(fs.nonEmpty)
    fs.foreach { case (f, frames) =>
      assert(f.width <= 32 && f.height <= 32 && f.width >= 1 && f.height >= 1)
      if (f.kind == "video") {
        assert(frames.headOption.contains(0))
        assert(frames == frames.sorted && frames.distinct == frames)
      } else assert(frames == Seq(0))
    }
  }
}
