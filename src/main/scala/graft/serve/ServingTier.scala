package graft.serve

/** What a routed front door ([[graft.api.SemanticSearch]]) needs from the
  * tier behind it — extracted so the SAME door (JSON parse → coverage
  * route → serve/fallback → stringify) composes with either deployment
  * shape: the in-process memory tier ([[MemoryServer]]) or the
  * multi-process shard fleet ([[FleetTier]]). The door's coverage rule is
  * built from these five methods; a tier narrows its own coverage by
  * returning None from [[tryParseFilter]] or fewer [[metaColumns]], and
  * the door falls back to the Spark job path — never a wrong answer.
  *
  * Contract every implementation must keep (the bit-identity promise the
  * door makes): when [[servesExactDense]] is true, [[topKVecDnf]] returns
  * EXACTLY what the Spark path's pinned cosine fold + (score DESC,
  * id ASC) order produces over the same rows — same ids, same score BITS.
  */
trait ServingTier {

  /** True iff dense requests serve exactly (no probe/approximation) —
    * the routing precondition for the door's bit-identity contract.
    */
  def servesExactDense: Boolean

  /** Metadata columns this tier can stringify for response assembly. */
  def metaColumns: Set[String]

  /** The exact string the Spark path's CAST would emit for this row's
    * column (only called for columns in [[metaColumns]]).
    */
  def metaString(colName: String, id: Long): String

  /** Compile the request's filter to DNF over THIS tier's capabilities;
    * None = not covered here (the door falls back). `Seq(Nil)` = one
    * unconstrained branch = match-all.
    */
  def tryParseFilter(node: com.fasterxml.jackson.databind.JsonNode)
      : Option[Seq[Seq[MetaFilter]]]

  /** Dense top-k under a DNF filter from [[tryParseFilter]]. */
  def topKVecDnf(qvec: Seq[Float], k: Int,
                 dnf: Seq[Seq[MetaFilter]]): Seq[(Long, Double)]
}

/** What the HYBRID front door ([[graft.api.HybridSearch]]) needs from an
  * exact fused-retrieval tier: both legs pooled `poolK` deep, RRF-fused
  * to `k` with the engine's one fusion fold ([[graft.operators.Bm25
  * .rrfFuseLocal]] semantics — 1-based ranks per leg, (rrf DESC, id ASC)
  * order). Implementations must be EXACT (the door's bit-identity
  * promise): the in-process [[ShardedHybridServer]], the [[MemoryServer]]
  * monolith, and the multi-process [[FleetHybridTier]] all are.
  */
trait HybridTier {
  def searchHybrid(qvec: Seq[Float], terms: Seq[String], k: Int,
                   poolK: Int = 20, c: Int = 60): Seq[(Long, Double)]
}
