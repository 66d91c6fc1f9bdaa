package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate flowing into [[TopKAgg]]. */
case class Scored(score: Double, id: Long)

/** Typed bounded top-k aggregation: per group, keep the k best
  * (score desc, id asc) rows — the aggregation-shaped sibling of
  * [[graft.ext.Curation.balancedTopK]]'s window form, and the one to
  * reach for at 100 TB when k is small and groups are huge.
  *
  * Why it beats the window at scale: `row_number()` has no partial
  * aggregation — every row of every group crosses the wire to its
  * group's partition before any can be discarded, and one hot group
  * (a dominant crawl domain) is one task sorting that whole group.
  * An Aggregator runs map-side first (ObjectHashAggregate partial),
  * so each input partition forwards AT MOST k rows per group it saw:
  * the shuffle volume drops from |rows| to ≤ k·partitions·groups and
  * the hot-group sort disappears. The window form stays the right
  * choice when k is a large fraction of the group (buffers would
  * approach group size anyway) or when a global rank column over ALL
  * rows is the requested output.
  *
  * The buffer is a best-first sorted List bounded at k; insert is a
  * single O(k) splice per row (no per-row re-sort) and merge replays
  * the smaller side into the larger. Ordering is total — score desc
  * then id asc, compared via `java.lang.Double.compare` so NaN has a
  * fixed rank (above +∞, matching Spark SQL's sort order for NaN)
  * instead of primitive `>`/`==` both answering false and silently
  * breaking the bounded-insert invariant — so results are
  * deterministic under any partitioning and match a
  * `ROW_NUMBER() OVER (ORDER BY score DESC, id)` oracle exactly.
  */
class TopKAgg(k: Int)
    extends Aggregator[Scored, List[Scored], Array[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def insert(buf: List[Scored], x: Scored): List[Scored] = {
    // buf invariant: best-first, length <= k. Skip the splice when the
    // buffer is full and x loses to the current worst (the hot path —
    // almost every row of a huge group once the buffer saturates).
    if (buf.lengthCompare(k) >= 0 && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      val merged = pre ::: (x :: post)
      if (merged.lengthCompare(k) > 0) merged.init else merged
    }
  }

  override def zero: List[Scored] = Nil
  override def reduce(buf: List[Scored], in: Scored): List[Scored] =
    insert(buf, in)
  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    if (a.lengthCompare(b.length) >= 0) b.foldLeft(a)(insert)
    else a.foldLeft(b)(insert)
  override def finish(buf: List[Scored]): Array[Scored] = buf.toArray

  override def bufferEncoder: ExpressionEncoder[List[Scored]] =
    ExpressionEncoder[List[Scored]]()
  override def outputEncoder: ExpressionEncoder[Array[Scored]] =
    ExpressionEncoder[Array[Scored]]()
}

object TopKAgg {
  /** The aggregator as an untyped column function, for use in
    * `agg(...)` over a `struct(score, id)` input column. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k), ExpressionEncoder[Scored]())

  /** [[QuotaTopKAgg]] as an untyped column function over a
    * `struct(score, id, dom)` input column. */
  def quotaTopK(k: Int, m: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new QuotaTopKAgg(k, m), ExpressionEncoder[DomScored]())
}

/** One (score, id, domain) candidate flowing into [[QuotaTopKAgg]]. */
case class DomScored(score: Double, id: Long, dom: String)

/** Bounded top-k aggregation under a per-domain quota: keep the k
  * best rows (score desc, id asc — [[TopKAgg]]'s total order) subject
  * to AT MOST `m` rows per domain — the curation pass that stops one
  * crawl domain from monopolizing a score-ordered selection.
  *
  * Semantics are exactly the greedy score-ordered scan that skips
  * domain-exhausted rows, which is equivalent to (and oracled as):
  * rows whose within-domain rank ≤ m, re-ranked globally, top k —
  * two window functions in SQL. The aggregator form exists for the
  * same reason [[TopKAgg]] does: windows have no partial aggregation,
  * so at 100 TB every row crosses the wire; here each input partition
  * forwards at most k quota-valid rows, so the shuffle carries
  * ≤ k·partitions rows and the domain counting state is a bounded
  * map inside the buffer.
  *
  * Buffer invariant: the quota-valid top-k of every row seen — ≤ m
  * per domain, ≤ k total, best-first. Truncating at k loses nothing:
  * a row outside its partial's top-k can only re-enter the merged
  * top-k if rows above it are quota-evicted at merge, but each
  * quota-eviction is caused by ≥ m higher-scoring same-domain rows,
  * all of which also outrank the dropped row — so ≥ k rows still
  * outrank it (the per-domain s_d counting argument in
  * PropertySpec's reference check).
  */
class QuotaTopKAgg(k: Int, m: Int)
    extends Aggregator[DomScored, List[DomScored], Array[DomScored]] {
  require(k > 0, s"k must be positive, got $k")
  require(m > 0, s"per-domain quota m must be positive, got $m")

  private def better(a: DomScored, b: DomScored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  /** Drop the first row of `dom` past the quota (the (m+1)-th best —
    * at most one exists right after an insert). */
  private def dropBeyondQuota(buf: List[DomScored],
                              dom: String): List[DomScored] = {
    var seen = 0
    val out = List.newBuilder[DomScored]
    var rest = buf
    var dropped = false
    while (rest.nonEmpty) {
      val h = rest.head
      if (!dropped && h.dom == dom) {
        seen += 1
        if (seen > m) dropped = true else out += h
      } else out += h
      rest = rest.tail
    }
    out.result()
  }

  private def insert(buf: List[DomScored], x: DomScored): List[DomScored] =
    // full buffer and x loses to the worst kept row: x is outside the
    // quota-valid top-k regardless of its domain (the hot path)
    if (buf.lengthCompare(k) >= 0 && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      // every quota-valid row above x is in the buffer (x outranks
      // buf.last here), so this count alone decides x's validity:
      // m same-domain rows above x ⇒ x is not in its domain's top-m
      if (pre.count(_.dom == x.dom) >= m) buf
      else {
        val merged = dropBeyondQuota(pre ::: (x :: post), x.dom)
        if (merged.lengthCompare(k) > 0) merged.init else merged
      }
    }

  override def zero: List[DomScored] = Nil
  override def reduce(buf: List[DomScored], in: DomScored): List[DomScored] =
    insert(buf, in)
  override def merge(a: List[DomScored], b: List[DomScored]): List[DomScored] =
    if (a.lengthCompare(b.length) >= 0) b.foldLeft(a)(insert)
    else a.foldLeft(b)(insert)
  override def finish(buf: List[DomScored]): Array[DomScored] = buf.toArray

  override def bufferEncoder: ExpressionEncoder[List[DomScored]] =
    ExpressionEncoder[List[DomScored]]()
  override def outputEncoder: ExpressionEncoder[Array[DomScored]] =
    ExpressionEncoder[Array[DomScored]]()
}
