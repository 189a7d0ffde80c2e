package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-`Aggregator` UDAF (SURVEY §2.11's UDAF surface): keep the k rows
  * with the SMALLEST order key per group, in BOUNDED state.
  *
  * This is the custom-aggregate case the native surface genuinely lacks:
  * `sort_array(collect_list(...))[1:k]` materializes the WHOLE group in the
  * aggregation buffer (unbounded state — the thing that OOMs a 100 TB
  * group-by), while this buffer never holds more than k elements on any
  * partial, and partials MERGE associatively (merge-keep-k), so map-side
  * combine works and the shuffle moves ≤ k rows per (group, partition).
  *
  * With `key = md5(id)` the result is a DETERMINISTIC UNIFORM group sample
  * — the bounded-state form of "ORDER BY md5(id) LIMIT k per group" — which
  * any engine replays exactly (the q131/q52 content-addressed discipline:
  * no RNG, no row-order dependence, stable under reruns, partitioning, and
  * corpus growth). Distinct (key, payload) pairs only: re-deliveries of the
  * same element collapse, so the sample is replay-idempotent too.
  *
  * Scala path: `udaf(new BottomK(k)).apply(keyCol, payloadCol)`. An
  * Aggregator plans as ObjectHashAggregate (no whole-stage codegen) — the
  * documented trade for bounded custom state; everything expressible as
  * algebraic Column aggregates should stay native (this repo's rule), and
  * this exists for the shapes that can't.
  *
  * @param k max elements retained (bounded buffer size)
  */
class BottomK(k: Int) extends Aggregator[BottomK.In, BottomK.Buf, Seq[String]] {
  require(k >= 1, "k must be >= 1")
  import BottomK.{Buf, In}

  override def zero: Buf = Buf(Nil, Nil)

  override def reduce(b: Buf, a: In): Buf =
    if (a == null || a.key == null || a.payload == null) b
    else insert(b, a.key, a.payload)

  override def merge(a: Buf, b: Buf): Buf =
    b.keys.zip(b.payloads).foldLeft(a) { case (acc, (key, p)) => insert(acc, key, p) }

  /** Sorted-insert keeping ≤ k: buffers stay sorted by (key, payload), so
    * insert is O(k) and the result is order-independent — any reduce/merge
    * tree yields the same k survivors (ties broken by payload, duplicates
    * collapsed). */
  private def insert(buf: Buf, key: String, p: String): Buf = {
    val pairs = buf.keys.zip(buf.payloads)
    if (pairs.contains((key, p))) return buf
    if (pairs.length == k) {
      val (lk, lp) = pairs.last
      if (lk < key || (lk == key && lp < p)) return buf
    }
    val (lo, hi) = pairs.span { case (bk, bp) => bk < key || (bk == key && bp < p) }
    val merged = ((lo :+ ((key, p))) ++ hi).take(k)
    Buf(merged.map(_._1), merged.map(_._2))
  }

  override def finish(r: Buf): Seq[String] = r.payloads

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object BottomK {
  /** One aggregated element: `key` orders (ascending), `payload` survives. */
  final case class In(key: String, payload: String)

  /** Bounded sorted buffer: parallel lists ≤ k, sorted by (key, payload) —
    * a plain product type so the default product encoder serializes it. */
  final case class Buf(keys: Seq[String], payloads: Seq[String])
}
