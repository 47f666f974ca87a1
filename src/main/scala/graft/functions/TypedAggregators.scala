package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed Catalyst `Aggregator`s — the one extension surface the engine
  * had not yet exercised (native expressions, a custom
  * LogicalPlan+Strategy+Exec, and transformWithState processors all
  * are). An Aggregator's reduce/merge split is what lets Spark plan it
  * as PARTIAL aggregation: map-side state per (partition, group) is
  * O(k), only finished buffers cross the shuffle — the same contract
  * every built-in agg honors, proven by the q49 plan gate.
  */
object TypedAggregators {

  /** Bounded top-k accumulator: per group, the ids of the k largest
    * (value, id) pairs under the TOTAL order (value DESC, id ASC),
    * emitted as a comma-joined id string — the generalization of
    * max_by (k = 1 IS max_by with a deterministic tie-break;
    * QueriesSpec proves result-identity with the window top-k form).
    *
    * Buffer is a flat Array[Long] of interleaved (value, id) pairs,
    * kept sorted and truncated at k: O(k) state per partial aggregate
    * regardless of group size, and Array[Long] round-trips through the
    * aggregation buffer natively (no Kryo, no per-row boxing of a
    * collection). reduce() is a bounded insert, merge() a bounded
    * sorted-array merge — associative and commutative, so the
    * partial/final split is sound at any partitioning.
    */
  class TopKIds(k: Int) extends Aggregator[(Long, Long), Array[Long], String]
      with Serializable {

    private def wins(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
      v1 > v2 || (v1 == v2 && i1 < i2)

    override def zero: Array[Long] = Array.emptyLongArray

    /** Map-side bounded insert, allocation-free on the hot path: when
      * the buffer is full and the new pair loses to the current k-th,
      * return the buffer untouched (the common case once a group has
      * seen ≥ k rows); when it wins, shift-insert IN PLACE (the
      * Aggregator contract explicitly allows mutating and returning
      * `b`). Only a growing (not-yet-full) buffer allocates. */
    override def reduce(b: Array[Long], a: (Long, Long)): Array[Long] = {
      val v = a._1; val id = a._2
      val full = b.length >= 2 * k
      if (full && !wins(v, id, b(b.length - 2), b(b.length - 1))) return b
      // binary search for the insert slot among the sorted pairs
      var lo = 0; var hi = b.length / 2
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (wins(b(2 * mid), b(2 * mid + 1), v, id)) lo = mid + 1 else hi = mid
      }
      val pos = 2 * lo
      if (full) { // shift [pos, end-2) right by one pair, dropping the k-th
        var o = b.length - 2
        while (o > pos) { b(o) = b(o - 2); b(o + 1) = b(o - 1); o -= 2 }
        b(pos) = v; b(pos + 1) = id
        b
      } else {
        val out = new Array[Long](b.length + 2)
        System.arraycopy(b, 0, out, 0, pos)
        out(pos) = v; out(pos + 1) = id
        System.arraycopy(b, pos, out, pos + 2, b.length - pos)
        out
      }
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(x.length + y.length, 2 * k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        val takeX = j >= y.length ||
          (i < x.length && wins(x(i), x(i + 1), y(j), y(j + 1)))
        if (takeX) { out(o) = x(i); out(o + 1) = x(i + 1); i += 2 }
        else { out(o) = y(j); out(o + 1) = y(j + 1); j += 2 }
        o += 2
      }
      out
    }

    override def finish(b: Array[Long]): String =
      b.grouped(2).map(p => p(1).toString).mkString(",")

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
