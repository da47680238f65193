package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and domain mixing for training-data pipelines.
  *
  * Everything keys off a uniform derived from the row's ID, not `rand()`:
  * `rand(seed)` is partition-index dependent, so the sample would change
  * under repartitioning, AQE coalescing, or a rerun over re-split input
  * files — unacceptable when the sample defines a training set that must be
  * reproducible and auditable. Hash-of-id sampling is stable across runs,
  * engines, partitionings, and cluster sizes, and needs no shuffle: it is a
  * map-side filter in the scan stage.
  */
object Sampling {

  /** Deterministic uniform in [0,1) from an id: the top 32 bits of
    * md5(id), scaled. `salt` decouples independent sampling decisions on
    * the same rows (sample vs fractional-epoch upsample, round k vs k+1).
    * Exact in double (the 32-bit integer and the 2^32 divisor are both
    * representable), so the value is bit-portable across engines. md5 costs
    * ~100 ns/row; at true 100 TB scale swap in xxhash64 (same contract,
    * not cross-engine-portable) if the scan is hash-bound.
    */
  def uniformFromId(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Stratified deterministic sample: keep a row iff uniformFromId(id) <
    * rate(stratum). Strata absent from `rates` get `defaultRate`. Map-side
    * only — the rates ship as a literal map expression, no join, no
    * shuffle.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val rateMap = map(rates.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val rate = coalesce(element_at(rateMap, col(strataCol)), lit(defaultRate))
    df.where(uniformFromId(col(idCol)) < rate)
  }

  /** Score-weighted deterministic sample: keep a row with probability
    * `weightCol` (clamped to [0, 1]), decided by the id hash — "sample
    * proportional to quality", the curation move between a hard quality
    * threshold (gate) and a flat rate (stratifiedSample). Deterministic
    * and growth-stable like every sampler here: a row's fate depends only
    * on (id, salt, its own weight), so re-running over a grown corpus
    * keeps prior decisions. Map-side only — no join, no shuffle; null
    * weights never keep (explicit, like the gate's null rule).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     salt: String = ":wt"): DataFrame =
    df.where(uniformFromId(col(idCol), salt) <
      least(greatest(col(weightCol), lit(0.0)), lit(1.0)))

  /** Deterministic weighted upsampling for domain mixing: weight w emits
    * floor(w) copies of every row plus one more with probability frac(w),
    * decided per-row by the id hash — so a lang weighted 2.3 contributes
    * exactly ~2.3 epochs of its docs, reproducibly. Rows are tagged with
    * `epoch` (1-based copy index — an output column, overwritten if the
    * caller has one); weights < 1 degrade to a plain sample.
    * explode(sequence(...)) is map-side row generation — output rows never
    * exceed ceil(w)·input within a partition, no shuffle.
    */
  def upsample(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val whole = floor(weight).cast("long")
    val extra = when(uniformFromId(col(idCol), salt = ":up") < (weight - whole),
      1L).otherwise(0L)
    // scratch column named collision-proof so the drop is caller-safe
    val nCopies = "__graft_n_copies"
    df.withColumn(nCopies, whole + extra)
      .where(col(nCopies) > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col(nCopies))))
      .drop(nCopies)
  }

  /** Deterministic train/val/test split assignment by hash ranges: fraction
    * f_i of rows lands in split i, decided by where uniformFromId(id) falls
    * in the cumulative-fraction partition of [0,1). Disjoint and exhaustive
    * by construction (fractions must sum to 1), reproducible under any
    * repartitioning, and stable as the corpus grows — a doc keeps its split
    * when new docs arrive, which a rank-based split does not guarantee.
    * Map-side only (one when-chain, no shuffle).
    */
  def splitAssign(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = ":split"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = uniformFromId(col(idCol), salt)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    // null id => null split (a when-chain's otherwise would silently dump
    // null ids into the tail bucket); the tail bucket absorbs fp residue
    val assigned = fractions.zip(cuts).dropRight(1)
      .foldLeft(when(u.isNull, lit(null).cast("string"))) {
        case (acc, ((name, _), cut)) => acc.when(u < cut, lit(name))
      }
      .otherwise(lit(fractions.last._1))
    df.withColumn("split", assigned)
  }

  /** Deterministic shard id in [0, k): the same 32-bit md5 prefix as
    * [[uniformFromId]], reduced mod k — integer arithmetic end to end, so
    * bit-portable across engines. The standard way to split a
    * low-cardinality group key (a handful of sources) into k× the
    * parallelism without losing determinism: group by (source, shard)
    * instead of source.
    */
  def shardFromId(id: Column, k: Int, salt: String = ":shard"): Column = {
    require(k > 0, "shard count must be positive")
    pmod(conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long"), lit(k.toLong))
  }

  /** Exact-size deterministic sample: exactly min(n, |stratum|) rows per
    * stratum — the "fixed 1,000-doc eval set per language" primitive, where
    * a RATE sample's binomial variance is unacceptable. Rows are ranked by
    * their id-hash within the stratum (id as tiebreak for the zero-measure
    * hash-collision case), so membership is reproducible across runs and
    * partitionings; unlike [[stratifiedSample]] it is NOT growth-stable
    * (rank n+1 displaces rank n when a better-hashed doc arrives — inherent
    * to any exact-size contract).
    *
    * Scale shape: NOT a `row_number` window — that fully sorts every
    * stratum inside one task, the one-task-per-stratum killer when a
    * stratum holds billions of rows. Instead the n smallest (hash, id)
    * pairs per stratum are kept by a bounded-heap aggregation
    * ([[Ann.TopKAgg]] on the negated hash-uniform): O(n) state per group,
    * map-side partial merge, one hash-agg shuffle of n rows per (stratum,
    * partition), then a broadcast semi-join recovers the full rows. No
    * per-stratum sort anywhere in the plan.
    *
    * Preconditions of the heap path: ids are integral (castable to long)
    * and unique within a stratum; null-id rows are never sampled (their
    * hash orders nowhere). Non-integral ids fall back to the window form —
    * correct, but carrying the per-stratum sort.
    */
  def exactSizeSample(df: DataFrame, idCol: String, strataCol: String,
                      n: Int, salt: String = ":exact"): DataFrame = {
    require(n > 0, "sample size must be positive")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        // TopKAgg keeps the k HIGHEST scores (ties -> lower id); negating the
        // uniform makes that exactly the n smallest (u, id) — the same rank-n
        // membership the window form selects.
        val bottomK = udaf(new Ann.TopKAgg(n),
          org.apache.spark.sql.Encoders.product[Ann.Scored])
        val sel = df
          .where(col(idCol).isNotNull)
          .select(col(strataCol).as("__graft_stratum"),
            (-uniformFromId(col(idCol), salt)).as("__graft_neg_u"),
            col(idCol).cast("long").as("__graft_id"))
          .groupBy(col("__graft_stratum"))
          .agg(bottomK(col("__graft_neg_u"), col("__graft_id")).as("__graft_sel"))
          .select(col("__graft_stratum"),
            explode(col("__graft_sel")).as("__graft_s"))
          .select(col("__graft_stratum"),
            col("__graft_s.id").as("__graft_sel_id"))
        df.join(broadcast(sel),
          col(strataCol) <=> col("__graft_stratum") &&
            col(idCol).cast("long") === col("__graft_sel_id"),
          "left_semi")
      case _ =>
        // same null-id rule as the heap path (which drops them before the
        // aggregation): nulls would otherwise sort FIRST here and be
        // sampled — one API, one membership rule
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
          .orderBy(uniformFromId(col(idCol), salt), col(idCol))
        df.where(col(idCol).isNotNull)
          .withColumn("__graft_rank", row_number().over(w))
          .where(col("__graft_rank") <= n)
          .drop("__graft_rank")
    }
  }

  /** Domain mixing by a per-stratum weight table (the "N epochs of
    * Wikipedia, 0.3 epochs of CommonCrawl" move).
    */
  def mixDomains(df: DataFrame, idCol: String, strataCol: String,
                 weights: Map[String, Double],
                 defaultWeight: Double = 1.0): DataFrame = {
    val wMap = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    upsample(df, idCol,
      coalesce(element_at(wMap, col(strataCol)), lit(defaultWeight)))
  }

  /** Deterministic negative sampling for contrastive training — each doc
    * gets `rounds` pseudo-random partners via hash-ring successors: round
    * j places every id on a ring ordered by md5(id || ":neg" || j) and
    * pairs it with its successor. Hash ordering IS the randomness (the
    * partner is content- and position-uncorrelated), and like every
    * sampler in this module the output is a pure function of the id set —
    * reproducible under repartitioning, AQE, and reruns, unlike
    * rand(seed)-based pairing.
    *
    * Scale shape: the ring is BUCKETIZED by the first `bucketHexLen` hex
    * chars of the hash (16^len buckets, wraparound within each bucket), so
    * each round costs one (round, bucket) shuffle and per-bucket sorts of
    * N/16^len rows — no global sort, no single ring task. Raise
    * `bucketHexLen` with corpus size; the splice at bucket boundaries only
    * changes WHICH hash-successor a boundary doc gets, never the
    * uniformity contract. A doc alone in its bucket has no partner and is
    * dropped (vanishing probability once N >> buckets).
    *
    * Output: (idCol, round, neg_id), neg_id != id. Null ids never pair.
    */
  def ringNegatives(df: DataFrame, idCol: String, rounds: Int = 1,
                    bucketHexLen: Int = 2): DataFrame = {
    require(rounds > 0, s"rounds must be positive: $rounds")
    require(bucketHexLen >= 1 && bucketHexLen <= 8,
      s"bucketHexLen must be in [1, 8]: $bucketHexLen")
    val h = md5(concat(col(idCol).cast("string"), lit(":neg"),
      col("round").cast("string")))
    val ring = df.select(col(idCol)).where(col(idCol).isNotNull)
      .select(col(idCol), explode(sequence(lit(1), lit(rounds))).as("round"))
      .withColumn("__h", h)
      .withColumn("__b", substring(col("__h"), 1, bucketHexLen))
    val w = Window.partitionBy(col("round"), col("__b"))
      .orderBy(col("__h"), col(idCol))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    ring
      .withColumn("neg_id",
        coalesce(lead(col(idCol), 1).over(w), first(col(idCol)).over(wFull)))
      .where(col("neg_id") =!= col(idCol))
      .select(col(idCol), col("round").cast("long").as("round"), col("neg_id"))
  }

  /** Deterministic epoch shuffle: assign every row a `(shard, pos)` training
    * order for epoch `epoch` — the global shuffle a training job needs,
    * without `rand()` (unstable under repartitioning) and without a global
    * sort (the single-task killer). Shard = [[shardFromId]] on an
    * epoch-salted hash; pos = rank of the row's independently-salted hash
    * uniform within its shard. Different epochs are decorrelated by the
    * salt, and the full order is a pure function of the id set —
    * reproducible across runs, partitionings, and cluster sizes, auditable
    * after the fact (the q61 rule).
    *
    * Scale shape: one (shard) shuffle; per-shard `row_number` sorts
    * |corpus|/nShards rows in one task each, so parallelism is chosen BY
    * nShards — at 100 TB you size shards to the training reader's file
    * appetite (10^4..10^5 shards), which simultaneously bounds the
    * per-task sort. The shard column doubles as the write partition for
    * [[Pack.writeShards]].
    */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int,
                   epoch: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val salt = s":epoch$epoch"
    val w = Window.partitionBy(col("shard"))
      .orderBy(uniformFromId(col(idCol), salt + ":o"), col(idCol))
    df.withColumn("shard", shardFromId(col(idCol), nShards, salt + ":s"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Exact-k WEIGHTED sampling without replacement (Efraimidis &
    * Spirakis 2006, A-ES): every row draws an exponential with rate =
    * its weight — e = −ln(u)/w — and the k SMALLEST draws win, which
    * realizes inclusion probability proportional to weight without
    * replacement. The training-data use: "pick exactly 100k docs,
    * quality-weighted" ([[weightedSample]] is the Bernoulli form —
    * right rate, random size; [[exactSizeSample]] is exact-k but
    * unweighted).
    *
    * Determinism and bit-portability: u is the md5 hash-uniform
    * (exact lattice, clamped at 2^−32 so u = 0 stays finite), the ln
    * runs through [[graft.functions.DetMath.withLnDet]] on 1/u ≥ 1
    * (−ln u = lnDet(1/u)), and the one divide by w is correctly
    * rounded — so the ORDER, and therefore the sample, is the same on
    * every engine, partitioning, and re-run. Key scale-invariance
    * (c·w for all rows ⇒ e/c for all rows ⇒ same order) is exact when
    * c is a power of two.
    *
    * Scale shape: map-side key computation + one global top-k
    * (TakeOrderedAndProject — k·partitions heap state, no global
    * sort). Rows with null/non-positive weight or null id never
    * sample (an exponential with rate ≤ 0 is not a draw).
    */
  def weightedSampleExactK(df: DataFrame, idCol: String, weightCol: String,
                           k: Int, salt: String = ":aes"): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val uClamp = greatest(uniformFromId(col(idCol), salt),
      lit(java.lang.Math.scalb(1.0, -32)))
    val keyed = graft.functions.DetMath.withLnDet(
      df.where(col(idCol).isNotNull && col(weightCol).isNotNull &&
          col(weightCol) > lit(0))
        .withColumn("__winv", lit(1.0) / uClamp),
      "__winv", "__lnu")
    keyed
      .withColumn("aes_key", col("__lnu") / col(weightCol).cast("double"))
      .drop("__winv", "__lnu")
      .orderBy(col("aes_key"), col(idCol))
      .limit(k)
  }
}
