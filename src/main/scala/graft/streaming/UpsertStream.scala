package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming latest-wins upsert — the ONLINE form of
  * [[graft.operators.Upsert.latestWins]] (q106) and the continuous version
  * of the reference's cache refresh
  * (`/root/reference/02_method2_manual_vector_embedding.sql:415-418`):
  * versioned rows arrive on a stream, and for every key the engine
  * maintains (and re-emits, in UPDATE output mode, whenever it changes)
  * the greatest-`(version, priority)` row seen so far.
  *
  * State shape: `mapGroupsWithState` holds exactly ONE row per key — the
  * current winner — so state is O(live keys), independent of stream length
  * or update frequency; each batch's comparisons are per-arriving-key only.
  * UPDATE mode emission (one row per key per batch in which that key
  * received data, carrying the post-merge winner) is pinned empirically in
  * StreamingSpec before the q112 oracle relies on the single-batch form.
  *
  * No timeout: cache entries never expire by time here (eviction policy
  * belongs to the cache tiering in [[graft.api.SemanticSearch]], not the
  * merge). A TTL would be one `GroupStateTimeout.EventTimeTimeout` away.
  */
object UpsertStream {

  /** One versioned document row; `prio` breaks version ties (caller makes
    * `(version, prio)` unique per key, the [[graft.operators.Upsert]]
    * contract).
    */
  case class DocVersion(doc_id: Long, text: String, lang: String,
                        source: String, n_chars: Long, version: Long,
                        prio: Int)

  /** Latest-wins over a keyed stream of [[DocVersion]]: emits each key's
    * current winner in every batch where the key received rows.
    */
  def latestWins(ds: Dataset[DocVersion]): Dataset[DocVersion] = {
    implicit val enc = Encoders.product[DocVersion]
    ds.groupByKey(_.doc_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[DocVersion], state: GroupState[DocVersion]) =>
          val best = (state.getOption.iterator ++ rows)
            .maxBy(r => (r.version, r.prio))
          state.update(best)
          best
      }
  }
}
