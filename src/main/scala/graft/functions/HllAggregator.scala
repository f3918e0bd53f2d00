package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct sketch (Flajolet et al. 2007, AOFA; the
  * bias-corrected register form of Heule et al. 2013 is unnecessary at
  * this register count and range): [[M]] byte registers, each holding
  * the maximum "rank" (leading-zero run + 1) observed among the hashes
  * routed to that register. The estimate is the classic harmonic mean
  * `alpha_m * m^2 / sum_j 2^-M_j`, with Flajolet's linear-counting
  * fallback `m * ln(m / V)` below 2.5m when V registers are empty.
  *
  * IN is one 60-bit element hash (the engine's portable md5-60); the
  * register index is `h mod M` and the rank comes from the remaining
  * `60 - log2(M)` bits — both pure integer arithmetic a SQL engine
  * replays exactly (`h % 512`, `52 - length(bin(h // 512))`), which is
  * what makes the sketch oracle-checkable value-for-value.
  *
  * BUF is the fixed [[M]]-byte register array; reduce is a pointwise
  * max at one index, merge is the elementwise max of two arrays — so
  * the aggregation is associative + commutative and Spark runs full
  * map-side partial aggregation: the shuffle carries ONE 512-byte
  * array per partition and group, never the element stream. That is
  * the 100 TB posture: per-slice cardinality in O(m) FIXED memory —
  * where the KMV sibling ([[KmvAggregator]]) pays O(K) longs but buys
  * set algebra, HLL's registers are 16x smaller per sketch at similar
  * error (1.04/sqrt(512) ~ 4.6%), the right trade when only union and
  * cardinality are asked of the synopsis (register-max IS the union).
  *
  * The downstream estimate avoids float-summation order entirely:
  * `sum_j 2^-M_j` is computed as the exact integer `sum_j 2^(52-M_j)`
  * (every term a power of two <= 2^52, the 512-term sum < 2^61 fits a
  * long) divided by 2^52 once at the end — so both engines see the
  * identical double regardless of aggregation order.
  */
object HllAggregator extends Aggregator[Long, Array[Byte], Seq[Byte]] {
  /** Register count (2^9). */
  val M = 512
  /** log2([[M]]) — index bits taken off the 60-bit hash. */
  val P = 9
  /** Rank ceiling: a zero remaining-bits value has all `60 - P` = 51
    * bits clear, rank 52.
    */
  val MaxRank = 60 - P + 1
  /** Flajolet's alpha_m for m = 512. */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
    val idx = (h % M).toInt
    val w = h / M
    // rank = leading zeros of w within its 51-bit field, plus one:
    // 51 - bitlen(w) + 1, with the all-zero field pinned to MaxRank
    val rank =
      if (w == 0L) MaxRank
      else MaxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rank > buf(idx)) buf(idx) = rank.toByte
    buf
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (y(i) > x(i)) x(i) = y(i)
      i += 1
    }
    x
  }

  override def finish(buf: Array[Byte]): Seq[Byte] = buf.toSeq

  // native binary encoding — partial merges move 512 raw bytes
  override def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Seq[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Byte]]()
}
