package graft.serve

/** Incremental serving over an immutable [[MemoryAnnIndex]] — the
  * freshness segment between index publishes. The reference's
  * TARGET_LAG contract says new rows become searchable within the lag
  * window; [[ServingIndex]] covers the REBUILD half (reload on sidecar
  * mtime). This covers the live half, the way Lucene/Vespa do: the
  * published index stays immutable, writes land in a small
  * memory-resident delta segment (brute-force scanned — it is bounded
  * by one lag window of arrivals), and deletes/updates tombstone by id.
  * A search merges the two tiers; the periodic Spark rebuild folds the
  * delta back into the next published artifact and a fresh handle
  * starts empty.
  *
  * Result contract (DeltaSpec + the q193 oracle pin it): `topK` returns
  * EXACTLY what a [[MemoryAnnIndex]] built over
  * (base rows ∖ tombstones) ∪ delta rows would return — same rows, same
  * order, same score bits. The base tier is consulted for
  * k + |tombstones| candidates, which is sufficient even if every
  * tombstoned row ranked above the true top-k; the delta tier scans its
  * buffer with the same pinned cosine fold; the k-bounded merge uses the
  * engine's (score DESC, id ASC) rule.
  *
  * `add` is an UPSERT: it tombstones any base row with the same id and
  * replaces any pending delta row — latest-wins at serving, the same
  * SCD-1 rule the batch tier's [[graft.operators.Upsert]] applies.
  * `delete` tombstones both tiers. Ids never seen are fine (a delete
  * racing the rebuild that already dropped the row is ordinary).
  *
  * Thread-safety: writers serialize on this object; readers are
  * wait-free on an immutable snapshot swapped per write (reads during a
  * write serve the previous state — the same visibility rule as
  * [[ServingIndex.current]]).
  *
  * Scale posture: the delta is ONE lag window of writes (the reference's
  * 1-minute TARGET_LAG at even 1k writes/s is 60k rows ≈ 15 MB at
  * dim 64) — brute force over it is microseconds next to the base scan,
  * and the tombstone overscan adds |dead| rows to one heap pass. If the
  * delta outgrows that envelope the fix is operational, not structural:
  * publish more often.
  */
final class DeltaAnnIndex(base: MemoryAnnIndex) {

  /** Immutable per-write snapshot: delta rows (id-ascending, dim-strided
    * vectors) + tombstoned base ids.
    */
  private final case class State(ids: Array[Long], vecs: Array[Float],
                                 dead: Set[Long])

  @volatile private var state: State =
    State(Array.emptyLongArray, Array.emptyFloatArray, Set.empty)

  def dim: Int = base.dim
  def deltaSize: Int = state.ids.length
  def tombstoneCount: Int = state.dead.size

  /** Upsert `id` with `vec`: searchable by the next `topK` call. */
  def add(id: Long, vec: Seq[Float]): Unit = this.synchronized {
    require(vec.length == dim, s"vec dim ${vec.length} != index dim $dim")
    val s = state
    val keep = s.ids.indices.filter(i => s.ids(i) != id)
    val n = keep.length + 1
    val ids = new Array[Long](n)
    val vecs = new Array[Float](n * dim)
    // delta stays id-ascending so the merge's tie rule needs no sort
    val insertAt = keep.count(i => s.ids(i) < id)
    var w = 0
    (keep.take(insertAt) ++ Seq(-1) ++ keep.drop(insertAt)).foreach { src =>
      if (src == -1) {
        ids(w) = id
        var j = 0
        while (j < dim) { vecs(w * dim + j) = vec(j); j += 1 }
      } else {
        ids(w) = s.ids(src)
        System.arraycopy(s.vecs, src * dim, vecs, w * dim, dim)
      }
      w += 1
    }
    // the base copy (if any) is now shadowed; delta row is live again
    state = State(ids, vecs, s.dead + id)
  }

  /** Delete `id` from both tiers: gone by the next `topK` call. */
  def delete(id: Long): Unit = this.synchronized {
    val s = state
    val keep = s.ids.indices.filter(i => s.ids(i) != id)
    if (keep.length == s.ids.length) {
      state = s.copy(dead = s.dead + id)
    } else {
      val ids = new Array[Long](keep.length)
      val vecs = new Array[Float](keep.length * dim)
      var w = 0
      keep.foreach { src =>
        ids(w) = s.ids(src)
        System.arraycopy(s.vecs, src * dim, vecs, w * dim, dim)
        w += 1
      }
      state = State(ids, vecs, s.dead + id)
    }
  }

  /** Merged top-k over (base ∖ tombstones) ∪ delta — bit-identical to a
    * rebuilt [[MemoryAnnIndex]] over the same logical rows. `filters`
    * apply to the base tier only (delta rows carry no metadata columns;
    * a filtered deployment routes writes through the rebuild).
    */
  def topK(query: Seq[Float], k: Int,
           filters: Seq[MetaFilter] = Nil): Seq[(Long, Double)] = {
    val s = state
    val fromBase = base.topK(query, k + s.dead.size, filters)
      .filterNot { case (id, _) => s.dead(id) }
    val q = query.toArray
    val fromDelta = s.ids.indices.map { r =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      val bse = r * dim
      while (j < dim) {
        val x = s.vecs(bse + j).toDouble; val y = q(j).toDouble
        dot += x * y; na += x * x; nb += y * y; j += 1
      }
      (s.ids(r), dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    (fromBase ++ fromDelta)
      .sortBy { case (id, sc) => (-sc, id) }.take(k)
  }

  /** The delta segment's rows, id-ascending — what the next Spark
    * rebuild unions into the base corpus (tombstones translate to an
    * anti-join on [[tombstonedIds]]).
    */
  def deltaRows: Seq[(Long, Seq[Float])] = {
    val s = state
    s.ids.indices.map(r =>
      (s.ids(r), (0 until dim).map(j => s.vecs(r * dim + j))))
  }

  def tombstonedIds: Set[Long] = state.dead
}
