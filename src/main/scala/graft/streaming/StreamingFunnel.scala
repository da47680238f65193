package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.operators.Funnel]]: per-entity furthest-step
  * tracking over an unbounded event stream.
  *
  * The funnel automaton is ORDER-SENSITIVE (step i counts only strictly
  * after a qualifying step i−1 in the (us, event_id) total order), and no
  * O(1) state can replay an out-of-order prefix — a newly-arrived earlier
  * `view` can retroactively qualify an already-seen `click`. So the
  * operator uses the watermark as its ordering barrier, the same contract
  * Flink CEP and Spark's own session windows run on:
  *
  *  - events newer than the watermark BUFFER in state (bounded by the
  *    lateness horizon per entity, not by history length);
  *  - when the watermark advances, the now-final prefix drains through the
  *    automaton in (us, event_id) order. Drains can never reorder: every
  *    drained event is ≤ the watermark, every buffered one is >, so
  *    consecutive drains process disjoint ascending time intervals;
  *  - events older than the watermark on ARRIVAL are dropped by Spark's
  *    standard late-row filtering — the documented watermark trade;
  *  - an event-time timeout re-arms while the buffer is non-empty, so a
  *    quiet entity still drains (and re-emits) once the watermark passes
  *    its buffered events — without it, only keys present in a batch get
  *    invoked and tail events would hang in state forever.
  *
  * Emission (Update mode): the entity's CURRENT depth after each drain.
  * Depth is monotone non-decreasing — flags have the prefix property, a
  * step sets only if its predecessor already did — so max-per-entity over
  * the update stream IS the final depth, and an at-least-once sink
  * dedupes by construction.
  *
  * `step` is the 0-based index of the row's event type in the funnel
  * (negative = not a funnel event: it buffers, drains, and is ignored —
  * useful for watermark-advancing sentinels and mixed streams).
  */
object StreamingFunnel {

  case class FEvent(ukey: Long, ts: Timestamp, us: Long, event_id: Long, step: Int)
  case class BufEv(us: Long, event_id: Long, step: Int)
  case class FState(buf: Seq[BufEv], flags: Seq[Boolean])
  case class DepthUpdate(ukey: Long, depth: Int)

  /** `delay` is the lateness horizon (the watermark delay): larger values
    * buffer more but tolerate more cross-batch disorder; an event older
    * than max-seen-ts − delay on arrival is dropped by Spark itself.
    */
  def depths(events: Dataset[FEvent], nSteps: Int,
             delay: String = "0 seconds"): Dataset[DepthUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.ukey)
      .flatMapGroupsWithState[FState, DepthUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (ukey: Long, it: Iterator[FEvent], state: GroupState[FState]) =>
          val st = state.getOption
            .getOrElse(FState(Vector.empty, Vector.fill(nSteps)(false)))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = st.buf ++ it.map(e => BufEv(e.us, e.event_id, e.step))
          val (ready, rest) = all.partition(_.us <= wmUs)
          var flags = st.flags
          ready.sortBy(b => (b.us, b.event_id)).foreach { b =>
            if (b.step == 0) flags = flags.updated(0, true)
            else if (b.step > 0 && b.step < nSteps && flags(b.step - 1))
              flags = flags.updated(b.step, true)
          }
          state.update(FState(rest, flags))
          if (rest.nonEmpty) {
            // must be strictly beyond the current watermark or Spark
            // rejects it; ms-floor of the earliest buffered event is safe
            // (fires no later than that event becomes final)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1,
                rest.map(_.us).min / 1000L))
          }
          Iterator.single(DepthUpdate(ukey, flags.count(identity)))
      }
  }
}
