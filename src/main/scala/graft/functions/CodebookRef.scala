package graft.functions

import org.apache.spark.broadcast.Broadcast

/** How a quantizer codebook travels to the executors.
  *
  * [[PlainCodebooks]] is the plan-embedded form every nearest-centroid
  * expression used originally: the matrix serializes into the task binary
  * via `addReferenceObj` — fastest at small k, but the task/plan bytes grow
  * with k·dim, which under the k ∝ n regime (targetCell ≈ 100) explodes
  * the plan long before the driver copy hurts.
  *
  * [[BroadcastCodebooks]] carries only a [[Broadcast]] HANDLE in the plan;
  * the matrix ships once per executor through the torrent broadcast data
  * plane and the generated code resolves it ONCE per operator instance
  * (mutable-state init, never per row). Same arithmetic, same codebook,
  * bit-identical results — the over-
  * [[graft.dedup.Dedup.CodebookLiteralMaxBytes]] fallback for the
  * map-only assignment family (IVFADC coarse cells — where a join-based
  * assignment would put an n·k-row exchange on the hot path for no
  * reason: the codebook has to meet every row either way).
  *
  * Shape as everywhere in this family: `value(group)(centroid)(dim)`. */
sealed trait CodebookRef extends Serializable {
  def value: Array[Array[Array[Double]]]
}

final case class PlainCodebooks(cb: Array[Array[Array[Double]]])
    extends CodebookRef {
  def value: Array[Array[Array[Double]]] = cb
}

final case class BroadcastCodebooks(bc: Broadcast[Array[Array[Array[Double]]]])
    extends CodebookRef {
  def value: Array[Array[Array[Double]]] = bc.value
}
