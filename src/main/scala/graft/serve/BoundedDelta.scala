package graft.serve

import java.util.concurrent.atomic.AtomicReference

/** Thrown by a delta tier's writers after [[DeltaTier.republish]] sealed
  * the handle: the delta segment was folded into a new immutable base and
  * the caller must re-read its serving reference (e.g. [[BoundedDelta.get]])
  * and retry. Making the stale-handle write THROW — instead of landing in a
  * discarded delta — is what turns "the swap quietly loses up to a lag
  * window of writes" from a code-review finding into a structural
  * impossibility.
  */
final class RepublishedHandleException(msg: String)
  extends IllegalStateException(msg)

/** A freshness tier whose delta segment can fold into a new immutable
  * base without a Spark job — the in-memory half of the republish
  * protocol ([[DeltaPostingsIndex]], [[DeltaSparseIndex]]). The durable
  * artifact still comes from the periodic Spark rebuild; `republish()`
  * is what the SERVING process does between rebuilds so its delta cost
  * stays bounded.
  */
trait DeltaTier[Self <: DeltaTier[Self]] {

  /** Documents currently in the delta segment. */
  def deltaSize: Long

  /** Fold the delta into a NEW immutable base and return a handle with
    * an empty delta. Seals THIS handle: subsequent writes throw
    * [[RepublishedHandleException]] (reads keep serving the pre-fold
    * snapshot — immutable, still correct, just stale once the caller
    * swaps). Contract: the returned handle serves EXACTLY what this one
    * did at the moment of the fold — same rows, same order, same score
    * bits (the per-tier specs pin it) — so the swap is invisible to
    * readers except in latency.
    */
  def republish(): Self
}

/** The BOUNDED freshness handle — the engine-level answer to "the delta
  * segment grows until a caller republishes": writers go through
  * [[write]], and whenever the delta crosses `maxDeltaDocs` the handle
  * folds it into a new immutable base ([[DeltaTier.republish]]) and
  * swaps atomically. Consequences, by construction:
  *
  *  - the per-query delta cost (exhaustive delta scan; merged-stats
  *    re-derivation on the BM25 tier) is bounded by `maxDeltaDocs`,
  *    whatever the churn rate — the freshness tier cannot degrade
  *    unboundedly between Spark rebuilds;
  *  - no write is ever lost: the fold happens under the same lock that
  *    serializes writers, and a writer that somehow holds a stale handle
  *    (bypassing [[write]]) fails loudly on the seal instead of writing
  *    into a discarded delta;
  *  - readers are untouched: [[get]] is a lock-free volatile read of an
  *    immutable snapshot; a reader racing the swap serves either side of
  *    it, both correct (the fold is result-invisible).
  *
  * The fold runs IN-BAND in the crossing writer's request — that request
  * pays the republish latency (ServeBench's churn rows measure it as the
  * p-max of the mixed cell). A deployment that wants it off the write
  * path runs [[write]]'s fold in a maintenance thread instead; the bound
  * then holds at `maxDeltaDocs` + one maintenance interval of arrivals.
  *
  * Writers serialize on this object (delta writes are µs-scale; the
  * serialization point is the same one the per-handle monitor already
  * imposed); the periodic Spark rebuild still replaces the whole handle
  * via [[set]] when the durable artifact publishes.
  */
final class BoundedDelta[T <: DeltaTier[T]](initial: T,
                                            val maxDeltaDocs: Long) {
  require(maxDeltaDocs >= 1, s"maxDeltaDocs $maxDeltaDocs must be >= 1")

  private val ref = new AtomicReference[T](initial)
  private val folds = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The current serving snapshot (lock-free). */
  def get: T = ref.get()

  /** How many threshold-triggered republishes have run. */
  def republishCount: Long = folds.get()

  /** Run `body` (one request's writes — e.g. an add, or the add+retract
    * pair of an in-flight purge) against the current handle, then fold
    * and swap if the delta crossed the bound. Returns the handle `body`
    * ran on — its delta contains the writes, so a read-your-writes
    * caller searches that handle (post-swap readers see the same rows
    * from the new base).
    */
  def write(body: T => Unit): T = this.synchronized {
    val d = ref.get()
    body(d)
    if (d.deltaSize >= maxDeltaDocs) {
      ref.set(d.republish())
      folds.incrementAndGet(): Unit
    }
    d
  }

  /** Replace the handle wholesale — the durable Spark rebuild's publish
    * (the caller is responsible for the new base superseding the old
    * handle's contents, exactly as with a raw AtomicReference).
    */
  def set(next: T): Unit = this.synchronized { ref.set(next) }
}
