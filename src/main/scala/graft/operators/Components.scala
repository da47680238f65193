package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup output ([[Dedup.jaccardPairs]],
  * [[Dedup.minHashLshPairs]], [[Dedup.simHashPairs]]) into deletable
  * clusters: docs A~B and B~C must collapse to ONE survivor even when A~C
  * was never emitted as a pair. Pairs alone under-delete; components are
  * what a production dedup actually drops.
  *
  * Algorithm: iterated min-label propagation. Every vertex starts labeled
  * with its own id; each round every vertex takes the min of its label and
  * its neighbors' labels. Converges in at most the graph diameter rounds —
  * near-dup graphs are unions of near-cliques, so single-digit rounds in
  * practice; `maxIter` bounds adversarial chains and the loop early-stops
  * on a converged round.
  *
  * Scale shape: the edge list is materialized ONCE (checkpointed — the
  * upstream pair pipeline, often an LSH join, does not re-execute per
  * round) and pre-partitioned on `src`, so each round is two shuffles of
  * O(E) (labels onto edge partitioning, then the min-combine back to
  * vertices) with map-side partial min. The loop's vertex set is ONLY the
  * pair endpoints — per-round label state is O(touched rows), not
  * O(corpus); untouched nodes attach as singletons at output time. The
  * driver holds one changed-count per round — never the graph. This is
  * the standard Spark CC shape (GraphX/GraphFrames do the same dance with
  * the same bounds).
  *
  * Fault tolerance: by default rounds materialize via eager
  * `localCheckpoint` — fastest, but it truncates lineage while storing
  * blocks only on executors, so on a real cluster ONE executor loss
  * mid-loop kills the job (the truncated lineage cannot recompute). Pass
  * `checkpointDir` (HDFS/S3/any shared FS) to use reliable `checkpoint`
  * instead: each round's labels persist to the shared store and survive
  * executor loss — the right trade at 100 TB under dynamic allocation,
  * for one extra write of O(V) per round. See SCALE.md §components.
  */
object Components {

  /** (id, component) for every id in `nodes`, where component = min id
    * reachable through `pairs` (singletons map to themselves).
    *
    * @param pairs undirected edges as columns `id_a`, `id_b`
    * @param nodes vertex set (one id column named `idCol`) — pass the full
    *              corpus so untouched docs come out as singletons. Pair
    *              endpoints absent from `nodes` still mediate connectivity
    *              (and may name components) but do not appear in the output.
    * @param checkpointDir when set, rounds checkpoint RELIABLY to this
    *              directory (executor-loss-safe); when None, eager
    *              localCheckpoint (fast, single-app-lifetime semantics).
    */
  def connectedComponents(pairs: DataFrame, nodes: DataFrame, idCol: String,
                          maxIter: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sc = spark.sparkContext
    // reliable mode mutates the context-global checkpoint dir; remember a
    // caller-set one and restore it on exit (the restored dir gains a fresh
    // UUID subdir — Spark's setCheckpointDir semantics — but later
    // checkpoints still land under the caller's original tree)
    val prevCkptDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    // LOCAL checkpoint blocks are released by the ContextCleaner once
    // unreferenced; RELIABLE checkpoint FILES are not (Spark only deletes
    // them under spark.cleaner.referenceTracking.cleanCheckpoints, default
    // false) — without explicit cleanup a long loop leaves O(V) files per
    // round in the shared FS. Superseded rounds are deleted below as soon
    // as the next round is materialized; what remains on disk at return is
    // the edge list + the final labels (O(touched), not O(rounds)), live
    // until app exit because the returned frame reads them.
    val fsDir = checkpointDir.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      (p.getFileSystem(sc.hadoopConfiguration), p)
    }
    def listCkpts(): Set[String] = fsDir match {
      case None => Set.empty
      case Some((fs, p)) =>
        val st = fs.globStatus(new org.apache.hadoop.fs.Path(p, "*/rdd-*"))
        if (st == null) Set.empty else st.map(_.getPath.toString).toSet
    }
    def deleteCkpts(paths: Set[String]): Unit = fsDir.foreach { case (fs, _) =>
      paths.foreach(s =>
        fs.delete(new org.apache.hadoop.fs.Path(s), true))
    }
    // both variants preserve outputPartitioning through LogicalRDD, so the
    // partitioning-reuse argument below holds for either
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    // symmetric edge list, materialized once; per-round joins reuse these
    // blocks instead of re-running the (possibly expensive) pair pipeline.
    // Symmetrization is ONE explode over a 2-struct array, not a union of
    // two projections: union branches are separate physical subtrees, so
    // the pair pipeline (an LSH/prefix join) would execute twice INSIDE
    // this one materialize job (measured r16: the q62/q98/q116 plans each
    // carried two full copies of the jaccard-prefix DAG).
    val edges = materialize(pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .repartition(parts, col("src")))
    try {

    // the propagation vertex set is ONLY the pair endpoints: a node with no
    // edge is a singleton by definition — its label can never change, so
    // carrying it through the loop would checkpoint O(|nodes|) per round
    // for nothing. On a 100 TB corpus where near-dup pairs touch a small
    // fraction of rows, looping over endpoints makes per-round state
    // O(touched), orders of magnitude below O(corpus); untouched nodes are
    // re-attached as singletons at output time with one anti-join, outside
    // the loop. Endpoints missing from `nodes` (pairs computed on a
    // superset of the current frame) still MEDIATE connectivity — dropping
    // them would silently split A~B~C into {A},{C} when B was filtered out;
    // they are removed from the OUTPUT below, so the (id, component)
    // contract over `nodes` is unchanged. Endpoints come from the
    // CHECKPOINTED edge list (src covers both directions) — reading `pairs`
    // here would re-execute the whole upstream pair pipeline a second time.
    val touched = edges.select(col("src").as("id")).distinct()
    // labels pinned to hash(id) partitioning: the checkpoint preserves
    // outputPartitioning, so the edges⋈labels probe (src≡id layout) and the
    // labels⋈neighborMin merge (dst comes out of the groupBy already hashed
    // compatibly) both plan WITHOUT re-shuffling labels — one shuffle per
    // round (the neighbor-min combine), not three
    // every vertex starts "changed" (its initial label is news to its
    // neighbors); the flag travels WITH the labels so each round's frontier
    // is a filter on the checkpointed frame, not a separate computation
    val preLabels = listCkpts()
    var labels = materialize(touched
      .select(col("id"), col("id").as("label"), lit(true).as("changed"))
      .repartition(parts, col("id")))
    // reliable-mode files backing the CURRENT labels round (empty in local
    // mode) — deleted when the next round supersedes them
    var labelsCkpt = listCkpts() -- preLabels
    var converged = false
    var iter = 0
    while (iter < maxIter && !converged) {
      // FRONTIER propagation: new information can only originate at a
      // vertex whose label changed last round — a label last changed in
      // round k was already offered to every neighbor in round k+1, so
      // unchanged vertices have nothing new to say. Each round therefore
      // joins edges against the (shrinking) frontier, not all V labels:
      // near-clique dup graphs collapse the frontier to near-zero after
      // two rounds, and at 100 TB the per-round cost tracks the active
      // boundary instead of O(E).
      val frontier = labels.where(col("changed")).select(col("id"), col("label"))
      // candidates from two frontier-bounded sources in ONE plan:
      //  - neighbors of frontier vertices (hash-to-min, 1 hop/round);
      //  - frontier vertices reading their NEW parent's current label
      //    (pointer jumping / path halving) — a vertex that just adopted
      //    label p asks p for ITS label next round, doubling effective hop
      //    distance and making adversarial-chain convergence log-bounded.
      // Both sources only ever surface component-member labels, so the
      // "labels only decrease, min vertex keeps its own id" fixpoint
      // argument is unchanged.
      val viaNeighbors = edges.join(frontier, edges("src") === frontier("id"))
        .select(col("dst").as("cid"), col("label").as("cand"))
      // round 1's jump is a no-op (every label is still its own id) — skip
      // the join entirely there
      val candidates = if (iter == 0) viaNeighbors else {
        val viaParent = frontier.toDF("fid", "flabel")
          .join(labels, col("flabel") === labels("id"))
          .select(col("fid").as("cid"), col("label").as("cand"))
        viaNeighbors.union(viaParent)
      }
      val candMin = candidates
        .groupBy(col("cid")).agg(min(col("cand")).as("nmin"))
      // the changed-count rides the checkpoint job as an observed metric —
      // no second per-round action just to test convergence
      val obs = new org.apache.spark.sql.Observation
      val pre = listCkpts()
      val next = materialize(labels
        .join(candMin, labels("id") === candMin("cid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("changed"))
        .observe(obs, count(when(col("changed"), 1)).as("n_changed")))
      converged = obs.get("n_changed").asInstanceOf[Long] == 0L
      // `next` is eagerly materialized, so the previous round's reliable
      // checkpoint files have no remaining reader — reclaim them now
      val created = listCkpts() -- pre
      deleteCkpts(labelsCkpt)
      labelsCkpt = created
      labels = next
      iter += 1
    }
    // an unconverged exit means labels may be UNDER-MERGED (extra near-dups
    // survive downstream) with no other signal — pointer jumping needs
    // diameter > ~2^maxIter to get here, so it marks pathological input or
    // a far-too-small maxIter; say so instead of failing silently
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents stopped UNCONVERGED after $maxIter rounds; " +
          "labels may be under-merged — raise maxIter")
    // touched nodes take their propagated label; untouched nodes are
    // singletons (one anti-join, no per-round cost); endpoints absent from
    // `nodes` drop out here
    val nodeIds = nodes.select(col(idCol).as("id"))
    labels
      .join(nodeIds, Seq("id"), "left_semi")
      .select(col("id"), col("label"))
      .union(nodeIds.join(touched, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("label")))
      .select(col("id").as(idCol), col("label").as("component"))
    } finally {
      // undo our overwrite of a caller-set checkpoint dir (when none was
      // set before, ours stays — the context API has no unset)
      (prevCkptDir, checkpointDir) match {
        case (Some(prev), Some(d)) if prev != d => sc.setCheckpointDir(prev)
        case _ => ()
      }
    }
  }

  /** Per-component rollup: survivor id (= component min), member count. */
  def componentStats(pairs: DataFrame, nodes: DataFrame, idCol: String,
                     maxIter: Int = 20,
                     checkpointDir: Option[String] = None): DataFrame =
    connectedComponents(pairs, nodes, idCol, maxIter, checkpointDir)
      .groupBy(col("component")).agg(count(lit(1)).as("n_members"))

  /** Near-dup dedup: keep one survivor per component — the min id among
    * the rows PRESENT in `df` (the component label itself may name a row
    * that was filtered out upstream; it still identifies the cluster, but
    * cannot be the survivor of a frame it is not in).
    */
  def survivors(df: DataFrame, pairs: DataFrame, idCol: String,
                maxIter: Int = 20,
                checkpointDir: Option[String] = None): DataFrame = {
    val comp = connectedComponents(pairs, df.select(idCol), idCol, maxIter,
      checkpointDir)
    val keep = comp.groupBy(col("component")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Near-dup dedup, BEST-copy policy: keep the row maximizing `rankCol`
    * per component, ties broken by min id — real pipelines keep the
    * highest-quality (or newest) copy of each cluster, not the min-id one
    * [[survivors]] keeps. Rows with a null rank lose to any ranked row; a
    * component whose every rank is null falls back to min id — both from
    * one rule: the argmax key is the struct (rank, -id) under Spark's
    * null-smallest struct ordering.
    *
    * Scale shape matches [[survivors]]: the per-component argmax is ONE
    * max_by hash aggregation (map-side partial merge, no per-component
    * window sort), then a semi join back — the [[Upsert]] latest-wins
    * shape applied to the component label.
    */
  def survivorsBy(df: DataFrame, pairs: DataFrame, idCol: String,
                  rankCol: String, maxIter: Int = 20,
                  checkpointDir: Option[String] = None): DataFrame = {
    val comp = connectedComponents(pairs, df.select(idCol), idCol, maxIter,
      checkpointDir)
    val keep = comp
      .join(df.select(col(idCol), col(rankCol)), Seq(idCol))
      .groupBy(col("component"))
      .agg(max_by(col(idCol),
        struct(col(rankCol), (-col(idCol)).as("__graft_neg_id"))).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Semi-supervised label propagation (Zhu/Ghahramani-style, hard
    * labels): seed labels spread over the pair graph for a FIXED number
    * of synchronous rounds. Each round, every non-seed node adopts the
    * majority label of its labeled neighbors — argmax by (votes DESC,
    * label ASC), an all-integer decision, so the result is deterministic
    * and engine-portable with no float anywhere. Seeds are clamped.
    * Nodes with no labeled neighbor stay unlabeled (absent from the
    * output); the labeled set only grows, and a node that was labeled in
    * round r always has a labeled neighbor in round r+1 (its label
    * source keeps its own label), so re-voting each round from scratch
    * loses nothing. Known LPA boundary, spec-pinned: synchronous
    * re-voting can oscillate at vote ties (a node equidistant between
    * two seed regions flips with round parity) — `rounds` is a model
    * parameter (label influence radius), not a convergence knob.
    *
    * Scale shape: per round, ONE edge⋈label join (labels hash-partition
    * by id; the edge list is the static side) + ONE (node, label) count
    * aggregate + ONE bounded argmax aggregate — the Pregel message round
    * as vanilla shuffles, cost O(E_labeled)/round, rounds fixed by the
    * caller (label influence radius), not data-dependent.
    *
    * @param pairs undirected edges as `id_a`, `id_b`
    * @param seeds (`idCol`, `labelCol`) — the clamped ground-truth rows
    * @param rounds number of synchronous propagation rounds
    * @return (`idCol`, `labelCol`) for every labeled node
    */
  def labelPropagate(pairs: DataFrame, seeds: DataFrame, idCol: String,
                     labelCol: String, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // one explode, not a union of two projections — the upstream pair
    // pipeline executes once inside the checkpoint job (see
    // connectedComponents' edge-list note)
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").as("__src"), col("id_b").as("__dst")),
        struct(col("id_b").as("__src"), col("id_a").as("__dst")))).as("__e"))
      .select(col("__e.__src").as("__src"), col("__e.__dst").as("__dst"))
      .localCheckpoint(true) // the static side of every round's join
    val seed = seeds.select(col(idCol), col(labelCol))
    var cur = seed
    for (_ <- 1 to rounds) {
      val votes = edges
        .join(cur.withColumnRenamed(idCol, "__src"), "__src")
        .groupBy(col("__dst"), col(labelCol))
        .agg(count(lit(1)).as("__votes"))
      // argmax (votes DESC, label ASC) as ONE min-of-struct aggregate:
      // (-votes, label) minimizes to the winner under the pinned rule
      val best = votes.groupBy(col("__dst"))
        .agg(min(struct((-col("__votes")).as("nv"), col(labelCol).as("l")))
          .as("__w"))
        .select(col("__dst").as(idCol), col("__w").getField("l").as(labelCol))
      cur = seed.unionByName(best.join(seed, Seq(idCol), "left_anti"))
        .localCheckpoint(true) // truncate the growing round lineage
    }
    cur
  }
}
