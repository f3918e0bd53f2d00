package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count–min sketch aggregator (Cormode & Muthukrishnan 2005): a
  * [[Depth]]×[[Width]] counter grid over token occurrences, the
  * bounded-memory heavy-hitter primitive.
  *
  * IN is one token occurrence; BUF is the flat counter grid
  * (`buf(r*Width + cell_r(tok)) += 1` per row); merge is element-wise
  * sum, so the aggregation is associative+commutative and Spark runs
  * full map-side partial aggregation — the shuffle carries ONE
  * Depth×Width grid per partition, never the token stream. That is
  * the 100 TB story: frequency estimation over an unbounded vocabulary
  * in O(Depth×Width) memory and one narrow pass, where an exact
  * group-by count shuffles the whole distinct vocabulary.
  *
  * Counters are exact sums, so the merged grid is IDENTICAL under any
  * partitioning / merge order, and `estimate = min_r grid[r][cell_r]`
  * is deterministic and ≥ the true count (collisions only ever add) —
  * the no-false-negative contract the t19 spec pins. Row hashes are
  * the engine's portable md5-60 (`cell_r(tok) = md5_60("r:tok") mod
  * Width`), so a SQL engine replays the grid cell-for-cell; a
  * production sketch would swap in a cheaper 2-universal hash at the
  * cost of that replayability.
  */
object CmsAggregator extends Aggregator[String, Array[Long], Seq[Long]] {
  val Depth = 4
  val Width = 1024

  /** Row-r cell of a token — shared by the build (here) and the probe
    * (`TextAnalysis.cmsEst`), and replayed verbatim in the oracle.
    */
  def cell(r: Int, tok: String): Int =
    (HashOps.md5Prefix60((r + ":" + tok).getBytes("UTF-8")) % Width).toInt

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    var r = 0
    while (r < Depth) { buf(r * Width + cell(r, tok)) += 1; r += 1 }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  // native array-of-long encoding (UnsafeArrayData under the hood) —
  // the hot partial-merge path moves the 4096-counter grid as raw
  // longs instead of an ObjectOutputStream payload
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
