package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002; Beyer
  * et al. 2007, "On synopses for distinct value estimation under multiset
  * operations" — both public): keep the k smallest DISTINCT hash values
  * seen; the k-th smallest order statistic estimates the distinct count as
  * `(k−1)·M div h_(k)` over a hash universe of size M.
  *
  * This is the bounded-state alternative to `collect_set` for cardinality
  * work: the aggregation buffer is a sorted Long array capped at k
  * elements, so per-group state is O(k) REGARDLESS of group size — a
  * mega-host with 10^9 distinct urls costs the same 64-slot buffer as a
  * 10-url host, where a collect_set would hold the whole group on one
  * executor. Partial (map-side) buffers merge by a two-pointer distinct
  * merge, so the shuffle moves ≤ k longs per (partition, group): exactly
  * the mergeable-synopsis contract of the paper.
  *
  * Determinism: the k smallest distinct values of a multiset are
  * independent of encounter order and partitioning, so the sketch (and
  * anything derived from it) is bit-stable under any degree of
  * parallelism — the property every oracle-checked op in this engine
  * needs.
  */
class KMinValues(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    KMinValues.insert(buf, v, k)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KMinValues.mergeSorted(a, b, k)

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KMinValues {

  /** Insert `v` into sorted-distinct `buf` keeping at most `k` smallest;
    * returns `buf` unchanged (no allocation) on duplicate or
    * larger-than-max-at-capacity values — the hot path once a big group
    * saturates its sketch.
    */
  def insert(buf: Array[Long], v: Long, k: Int): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, v)
    if (idx >= 0) return buf // already present
    val ins = -idx - 1
    if (buf.length >= k && ins >= k) return buf // beyond capacity
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = v
    if (ins < n - 1) System.arraycopy(buf, ins, out, ins + 1, n - 1 - ins)
    out
  }

  /** Two-pointer distinct merge of two sorted arrays, truncated to the k
    * smallest — the partial-aggregate combine.
    */
  def mergeSorted(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    if (a.isEmpty) return if (b.length <= k) b else b.take(k)
    if (b.isEmpty) return if (a.length <= k) a else a.take(k)
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }
}
