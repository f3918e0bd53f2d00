package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; Beyer et
  * al. SIGMOD 2007 "On synopses for distinct value estimation under
  * multiset operations"): keep the [[K]] smallest DISTINCT hash values
  * seen; if the hash is uniform on [0, 2^60), the K-th smallest value
  * is at expected fraction K/n of the range, so `(K-1)·2^60 / kth`
  * estimates the distinct count n.
  *
  * IN is one 60-bit element hash; BUF is the sorted ascending array of
  * the ≤K smallest distinct hashes; merge is a sorted-set merge capped
  * at K. The aggregation is associative + commutative, so Spark runs
  * full map-side partial aggregation — the shuffle carries ONE ≤K-long
  * array per partition and group, never the element stream. That is
  * the 100 TB story: distinct counting (and, unlike HLL, distinct SET
  * ALGEBRA — union by merging sketches, intersection via the AKMV
  * K_∩/K rule on the unioned k-mins) in O(K) memory and one narrow
  * pass, where an exact count-distinct shuffles every distinct value.
  *
  * The k-min set of a fixed input multiset is IDENTICAL under any
  * partitioning / merge order, and the hashes are the engine's
  * portable md5-60 — so a SQL engine replays the sketch value-for-
  * value (`ORDER BY hash LIMIT K` per group) and every downstream
  * estimate matches bit-for-bit; a production sketch would swap in a
  * cheaper hash at the cost of that replayability.
  */
object KmvAggregator extends Aggregator[Long, Array[Long], Seq[Long]] {
  val K = 256

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val at = -i - 1
      if (buf.length >= K && at >= K) buf // larger than current k-th
      else {
        val n = math.min(buf.length + 1, K)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, n - at - 1)
        out
      }
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[Long](math.min(x.length + y.length, K))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < x.length || j < y.length)) {
      val take =
        if (i >= x.length) { val v = y(j); j += 1; v }
        else if (j >= y.length) { val v = x(i); i += 1; v }
        else if (x(i) < y(j)) { val v = x(i); i += 1; v }
        else if (x(i) > y(j)) { val v = y(j); j += 1; v }
        else { val v = x(i); i += 1; j += 1; v } // dedup equal heads
      out(o) = take; o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  // native array-of-long encoding — partial merges move raw longs,
  // not an ObjectOutputStream payload (the CmsAggregator lesson)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
