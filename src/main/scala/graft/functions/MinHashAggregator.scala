package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash signature aggregator (SURVEY §7.3: custom
  * `Aggregator[IN,BUF,OUT]` for dedup) — the strongly-typed
  * counterpart of [[graft.llm.Dedup.signatures]]'s 32-column
  * `min()` form.
  *
  * IN is one 60-bit shingle hash (pre-reduced mod M); BUF is the
  * running 32-slot minimum vector; merge is element-wise min, so the
  * aggregation is associative+commutative and Spark runs it with full
  * map-side partial aggregation — the shuffle carries one 32-long
  * buffer per document, never the shingles.
  *
  * Usage: `ds.groupByKey(_.docId).agg(MinHashAggregator.toColumn)` or
  * `udaf(MinHashAggregator)` for DataFrame use.
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Seq[Long]] {
  import graft.llm.Dedup.{M, NumHashes}

  private def a(k: Int): Long = 12582917L * k + 7L
  private def b(k: Int): Long = 15485863L * k + 11L

  override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], hv: Long): Array[Long] = {
    var k = 0
    while (k < NumHashes) {
      val h = (hv * a(k) + b(k)) % M
      if (h < buf(k)) buf(k) = h
      k += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var k = 0
    while (k < NumHashes) { if (y(k) < x(k)) x(k) = y(k); k += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.javaSerialization[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
