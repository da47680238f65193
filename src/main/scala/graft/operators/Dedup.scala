package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHashFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for training-data pipelines, at three cost tiers:
  *
  *  - exact: one hash-shuffle on the content fingerprint — O(n).
  *  - MinHash-LSH / SimHash: per-row signatures (no shuffle), then one
  *    shuffle on the band/chunk bucket; candidate pairs only within buckets,
  *    never the O(n^2) cross join.
  *  - n-gram Jaccard / embedding-cosine: exact pair verification, only ever
  *    applied within blocking keys or LSH buckets.
  *
  * At 100 TB the invariant is: NOTHING here materializes an unblocked pair
  * set; every pairwise step is preceded by a bucket/block equi-join that
  * Catalyst executes as a shuffled hash join on the bucket key.
  *
  * Pair emission is half the dedup story: collapse the pair graph to
  * deletable clusters with [[Components.connectedComponents]] (A~B, B~C
  * must drop to one survivor even when A~C was never emitted), and run
  * [[exactDedup]] BEFORE any LSH pass — on replica-dense corpora the
  * identical copies land in every band bucket together and the candidate
  * space goes quadratic in the replica depth (measured in
  * `tools/ScaleProbe`, documented in SCALE.md).
  */
object Dedup {

  /** Exact dedup on a normalized content fingerprint. Returns one row per
    * distinct content with the minimal id as the survivor plus the duplicate
    * count. Single hash aggregation, map-side partial agg — scales linearly.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.contentFingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep only the survivor rows (min id per fingerprint). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Cross-source overlap matrix: for every unordered source pair (a < b),
    * the number of distinct keys present in BOTH — the provenance report
    * ("which crawls mirror each other") that decides whether a source gets
    * dropped wholesale before paying for pairwise dedup. The key is
    * caller-chosen: exact content fingerprints for mirror detection
    * ([[crossSourceOverlap]]), word n-grams for mutual-contamination depth.
    *
    * One key shuffle; source sets collapse per key (bounded by the source
    * count, not the corpus), and pairs are expanded per-row from the
    * sorted in-row set — at most C(n_sources, 2) per key, never a corpus
    * self-join.
    */
  def overlapMatrix(keyed: DataFrame, keyCol: String,
                    sourceCol: String): DataFrame =
    keyed.select(col(keyCol).as("k"), col(sourceCol).as("source"))
      .distinct()
      .groupBy("k")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .where(size(col("srcs")) > 1)
      // all (i, j>i) pairs from the sorted in-row set: slice is 1-based,
      // so i+2 starts just past the 0-based position i
      .select(explode(expr(
        """flatten(transform(srcs, (a, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |    b -> named_struct('src_a', a, 'src_b', b))))""".stripMargin)).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))

  /** [[overlapMatrix]] on exact content fingerprints (mirror detection). */
  def crossSourceOverlap(df: DataFrame, textCol: String,
                         sourceCol: String): DataFrame =
    overlapMatrix(
      df.select(TextAnalysis.contentFingerprint(col(textCol)).as("fingerprint"),
        col(sourceCol)),
      "fingerprint", sourceCol)

  /** MinHash signatures (k hashes over the distinct token set). `tokensOf`
    * chooses the set representation: whitespace tokens (default) or
    * character k-shingles ([[TextAnalysis.charShingles]]) — the canonical
    * MinHash input when tokenization/word-order robustness matters.
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16,
                        tokensOf: Column => Column = split(_, " ")): DataFrame =
    df.select(col(idCol),
      minhashSignature(tokensOf(col(textCol)), numHashes).as("minhash"))

  /** Banded minhash bucket assignment: one row per (id, band, bucket),
    * carrying any `blockCols` so callers can constrain candidate GENERATION
    * with them (filtering cross-block pairs after enumeration is the
    * round-2 lesson this module exists to avoid).
    */
  private def bandedBuckets(df: DataFrame, idCol: String, textCol: String,
                            numHashes: Int, bands: Int,
                            tokensOf: Column => Column = split(_, " "),
                            blockCols: Seq[String] = Nil): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    df.select((col(idCol) +: blockCols.map(col)) :+
        minhashSignature(tokensOf(col(textCol)), numHashes).as("minhash"): _*)
      .select((col(idCol) +: blockCols.map(col)) :+
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws(",", slice(col("minhash"), b * rows + 1, lit(rows)))))): _*)
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
  }

  /** DIRECT MinHash-LSH candidate pairs — the raw expanded enumeration,
    * kept as the completeness baseline/demo ([[minHashLshPairs]] is the
    * default entry now): signatures are cut into `bands` bands of
    * `numHashes / bands` rows each; docs sharing any band hash become a
    * candidate pair. Returns (id_a, id_b, n_shared_bands) with id_a < id_b.
    *
    * OUTPUT-PROPORTIONAL by construction: on a replica-dense corpus it
    * materializes Σ n_a·n_b rows over replica groups — pair volume
    * quadratic in the replication factor even though every replica of a
    * text carries the IDENTICAL signature (measured 85.7×/117.6 s at the
    * 10× battery when this was the default entry; the unified entry's
    * multiplicity form measures 0.4×). The plan itself is the right one —
    * the cost IS the output — which is why it survives as the executable
    * conservation oracle (DedupSpec) and a bounded demo (q292), never as
    * the production path.
    *
    * Plan shape: scan -> per-row signature -> explode(bands) [xN, no shuffle]
    * -> shuffle on (band, bucket) -> self-join within bucket. Both self-join
    * subtrees are structurally identical, so Catalyst's ReuseExchange rule
    * computes signatures ONCE and feeds the second side from the first side's
    * shuffle files — signature sharing without pinning any cache blocks
    * (which a persist here used to leak across long-lived sessions).
    */
  def minHashLshPairsDirect(df: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 16, bands: Int = 4,
                            tokensOf: Column => Column = split(_, " ")): DataFrame = {
    val banded = bandedBuckets(df, idCol, textCol, numHashes, bands, tokensOf)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col(s"a.band") === col(s"b.band") && col(s"a.bucket") === col(s"b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** MinHash-LSH near-duplicate pairs — exact-dedup-FIRST, the default
    * entry (the [[substringDupReport]] unification applied here: collapse
    * exact duplicates INSIDE the operator; the raw expanded enumeration
    * survives as [[minHashLshPairsDirect]], a bounded demo).
    *
    * Why collapse first: the direct form on a replica-dense corpus
    * (crawl mirrors, template farms, the scale bench's replicated
    * shards) pays Σ n_a·n_b over replica groups — pair volume quadratic
    * in the replication factor even though every replica of a text
    * carries the IDENTICAL signature and adds zero information. So ONE
    * hash aggregation keeps the min-id representative and replica count
    * per exact text, LSH runs over DISTINCT texts only, and the replica
    * mass returns as integer MULTIPLICITIES, never as materialized rows:
    *   - cross-group candidates: (rep_a, rep_b, n_shared_bands,
    *     n_pairs = n_a·n_b) — every (x∈A, y∈B) pair shares exactly the
    *     bands the representatives share (signatures are functions of
    *     the text alone);
    *   - within-group rows: (rep, rep, bands, n·(n−1)/2) — exact
    *     duplicates share ALL bands by construction.
    * Σ n_pairs equals [[minHashLshPairsDirect]]'s row count on the full
    * corpus exactly (DedupSpec pins this), so callers needing the
    * expanded pair stream can join replica id-lists back on demand —
    * that expansion is OUTPUT-bound by definition, not a compute step.
    */
  def minHashLshPairs(df: DataFrame, idCol: String,
                      textCol: String, numHashes: Int = 16,
                      bands: Int = 4,
                      tokensOf: Column => Column = split(_, " "))
      : DataFrame = {
    val groups = df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("__n"))
    val counts = groups.select(col(idCol).as("__cid"), col("__n"))
    val cross = minHashLshPairsDirect(groups.select(col(idCol), col(textCol)),
        idCol, textCol, numHashes, bands, tokensOf)
      .join(counts.select(col("__cid").as("id_a"), col("__n").as("__na")), "id_a")
      .join(counts.select(col("__cid").as("id_b"), col("__n").as("__nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared_bands"),
        (col("__na") * col("__nb")).as("n_pairs"))
    val within = groups.where(col("__n") >= 2)
      .select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        lit(bands.toLong).as("n_shared_bands"),
        expr("(__n * (__n - 1)) div 2").as("n_pairs"))
    cross.unionByName(within)
  }

  /** Alias of [[minHashLshPairs]] — kept for the callers written while
    * dedup-first was the opt-in form (the unification made it the
    * default; q266 pins the name against the same oracle).
    */
  def minHashLshPairsDedupFirst(df: DataFrame, idCol: String,
                                textCol: String, numHashes: Int = 16,
                                bands: Int = 4,
                                tokensOf: Column => Column = split(_, " "))
      : DataFrame =
    minHashLshPairs(df, idCol, textCol, numHashes, bands, tokensOf)

  /** SimHash near-dup candidates: 60-bit simhash split into `chunks` chunks;
    * by pigeonhole, pairs within Hamming distance `chunks - 1` share at least
    * one exact chunk. Verifies with bit_count(xor) <= maxHamming.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    val bitsPer = 60 / chunks
    val sigs = df.select(col(idCol), simhash60(split(col(textCol), " ")).as("simhash"))
    // symmetric self-join subtrees: the planner shuffles both sides on
    // (chunk, chunk_val) and ReuseExchange computes signatures once
    val chunked = sigs.select(col(idCol), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftright", col("simhash"), c * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1)))))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** [[simHashPairs]]'s candidate machinery generalized to any 64-bit
    * signature carried as two 32-bit halves (`loCol` bits 0-31, `hiCol`
    * 32-63 — the [[graft.multimodal.Multimodal.imageAHash]] layout, which
    * avoids bit-63 sign traps): chunk-pigeonhole candidates (complete for
    * `maxHamming <= chunks - 1`: two signatures within the bound MUST agree
    * on at least one chunk), exact hamming verify, distinct. One
    * (chunk, chunk_val) shuffle; never O(n²).
    */
  def hammingPairs64(df: DataFrame, idCol: String, loCol: String,
                     hiCol: String, maxHamming: Int = 3,
                     chunks: Int = 4): DataFrame = {
    require(chunks >= 2 && 64 % chunks == 0, s"chunks=$chunks must divide 64")
    require(maxHamming <= chunks - 1,
      s"pigeonhole completeness needs maxHamming <= ${chunks - 1}")
    val bitsPer = 64 / chunks
    val chunkVals = (0 until chunks).map { c =>
      val fromLo = c * bitsPer < 32
      val src = if (fromLo) col(loCol) else col(hiCol)
      val off = if (fromLo) c * bitsPer else c * bitsPer - 32
      call_function("shiftright", src, lit(off))
        .bitwiseAND(lit((1L << math.min(bitsPer, 32)) - 1))
    }
    val chunked = df.select(col(idCol), col(loCol), col(hiCol),
        posexplode(array(chunkVals: _*)))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (bit_count(col(s"a.$loCol").bitwiseXOR(col(s"b.$loCol"))) +
          bit_count(col(s"a.$hiCol").bitwiseXOR(col(s"b.$hiCol"))))
          .as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Distinct word n-grams of a text column (n=1 => distinct tokens). */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    if (n == 1) array_distinct(toks)
    else array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact n-gram Jaccard pairs at or above `threshold`, optionally within
    * blocking keys. Routing is threshold-driven, because the scale-safe
    * algorithm differs:
    *
    *  - `threshold >= 0.5`: the PPJoin-style prefix filter
    *    ([[jaccardPairsPrefix]]) — candidates from an equi-join on each doc's
    *    rarest tokens, never O(block^2). Results are identical to the blocked
    *    path (the prefix filter is complete: no false negatives).
    *  - `threshold < 0.5`: the blocked pair join ([[jaccardPairsBlocked]]) —
    *    exact, but quadratic within a block; callers at 100 TB scale with low
    *    thresholds should use [[jaccardPairsLsh]] (recall-approximate,
    *    bucket-bounded) instead.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCols: Seq[String], n: Int = 1,
                   threshold: Double = 0.8): DataFrame =
    if (threshold >= 0.5) jaccardPairsPrefix(df, idCol, textCol, threshold, blockCols, n)
    else jaccardPairsBlocked(df, idCol, textCol, blockCols, n, threshold)

  /** Edit-distance verified near-dup pairs — the character-level verifier
    * of the classic fuzzy-dedup toolbox (catches small in-place edits that
    * shift every word n-gram; set-based Jaccard under-scores those).
    * Docs are compared on a `prefixLen`-char prefix and kept at
    * levenshtein <= maxDist; `blockCols` bounds the comparison universe
    * like every pairwise step here.
    *
    * Candidate generation is sub-quadratic via the positional q-gram count
    * filter (Gravano et al. VLDB'01, the Ed-Join candidate family): one
    * edit operation destroys at most q of a string's overlapping q-grams,
    * so two prefixes within edit distance `maxDist` share at least
    * `max(len_a, len_b) - q + 1 - maxDist*q` q-grams — and each surviving
    * gram appears in BOTH strings at positions differing by at most
    * `maxDist` (net indels before the gram never exceed the edit count).
    * With q = prefixLen / (maxDist + 1), every pair whose LONGER prefix has
    * length >= q*(maxDist+1) is guaranteed >= 1 shared (gram, ±maxDist
    * position) — those candidates come from an equi-join on the gram,
    * never an O(block^2) enumeration. Pairs where BOTH prefixes are
    * shorter than q*(maxDist+1) can evade the filter; that residue is a
    * length-bounded stratum (< q*(maxDist+1) chars) enumerated blocked —
    * run [[exactDedup]] first so it is distinct-bounded, not row-bounded.
    * (Pairs of one short and one long prefix differ in length by more than
    * `maxDist` and cannot be within distance anyway.) The union is
    * therefore COMPLETE: the routed pair set is exactly the blocked pair
    * set — DedupSpec proves set-equality against
    * [[editDistancePairsBlocked]] and asserts the candidate bound on a hot
    * block. The thresholded form of `levenshtein` caps the verify DP at
    * O(prefixLen * maxDist) per candidate. Integer distances are
    * engine-portable by construction.
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], prefixLen: Int = 64,
                        maxDist: Int = 8): DataFrame = {
    val q = prefixLen / (maxDist + 1)
    // a 1-gram join is every character of the alphabet — no selectivity,
    // and the whole corpus would land in the short stratum anyway
    if (q < 2)
      return editDistancePairsBlocked(df, idCol, textCol, blockCols,
        prefixLen, maxDist)
    val lMin = q * (maxDist + 1)
    val slim = df.select(
        (col(idCol) +: blockCols.map(col)) :+
          substring(col(textCol), 1, prefixLen).as("prefix"): _*)
      .withColumn("len", length(col("prefix")))
    // positional q-grams of every doc with at least one gram; the self-join
    // subtrees are identical so ReuseExchange computes grams once
    val grams = slim.where(col("len") >= q)
      .select((col(idCol) +: blockCols.map(col)) ++ Seq(col("len"),
        posexplode(transform(sequence(lit(0), col("len") - q),
          i => col("prefix").substr(i + 1, lit(q))))): _*)
      .withColumnsRenamed(Map("pos" -> "gpos", "col" -> "gram"))
    val ga = grams.as("a")
    val gb = grams.as("b")
    val gramBlockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val gramCand = ga.join(gb,
        col("a.gram") === col("b.gram") && gramBlockCond &&
          col(s"a.$idCol") < col(s"b.$idCol") &&
          abs(col("a.gpos") - col("b.gpos")) <= maxDist &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    // short-stratum residue: pairs entirely below the count-filter floor
    val short = slim.where(col("len") < lMin)
    val sa = short.as("a")
    val sb = short.as("b")
    val shortBlockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val shortCand = sa.join(sb,
        shortBlockCond && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    val cand = gramCand.union(shortCand).distinct()
    // verify: prefixes joined back by id (block equality already held at
    // candidate generation on both branches)
    val pa = slim.select(col(idCol).as("id_a"), col("prefix").as("prefix_a"))
    val pb = slim.select(col(idCol).as("id_b"), col("prefix").as("prefix_b"))
    cand.join(pa, "id_a").join(pb, "id_b")
      .withColumn("edit_dist",
        levenshtein(col("prefix_a"), col("prefix_b"), maxDist))
      // the thresholded form returns -1 when the cap is exceeded
      .where(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
  }

  /** The O(block^2) enumeration form of [[editDistancePairs]]: exact and
    * simple, but pair COUNT is quadratic in the block size — only safe on
    * small or distinct-bounded blocks. The routed form produces the
    * identical pair set with bucket-bounded candidates; this remains the
    * executable completeness oracle for DedupSpec and the fallback when
    * `prefixLen < 2*(maxDist+1)` leaves no usable gram length.
    */
  def editDistancePairsBlocked(df: DataFrame, idCol: String, textCol: String,
                               blockCols: Seq[String], prefixLen: Int = 64,
                               maxDist: Int = 8): DataFrame = {
    val slim = df.select(
      (col(idCol) +: blockCols.map(col)) :+
        substring(col(textCol), 1, prefixLen).as("prefix"): _*)
    val a = slim.toDF(slim.columns.map(_ + "_a"): _*)
    val b = slim.toDF(slim.columns.map(_ + "_b"): _*)
    val blockCond = blockCols.map(c => col(s"${c}_a") === col(s"${c}_b"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, blockCond && col(s"${idCol}_a") < col(s"${idCol}_b"))
      .withColumn("edit_dist",
        levenshtein(col("prefix_a"), col("prefix_b"), maxDist))
      // the thresholded form returns -1 when the cap is exceeded
      .where(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col(s"${idCol}_a").as("id_a"), col(s"${idCol}_b").as("id_b"),
        col("edit_dist"))
  }

  /** Exact n-gram Jaccard similarity for pairs within a blocking key.
    * `blockCols` bounds the pair space (same-language, same-source, an LSH
    * bucket...); the join is a shuffled equi-join on the block, never a full
    * cross product — but pair enumeration is O(b^2) in the block size, so at
    * scale this is only safe with high-cardinality blocks.
    *
    * Two scale choices baked in: (1) n-grams are xxhash64-hashed to longs
    * before intersection — primitive set ops instead of per-pair string
    * hashing (intersection SIZES are unchanged modulo 2^-64 collisions);
    * (2) the self-join subtrees are structurally identical, so the planner
    * shuffles both sides on the block key and ReuseExchange computes the
    * gram sets once — co-located pair generation with no pinned cache.
    */
  def jaccardPairsBlocked(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], n: Int = 1,
                          threshold: Double = 0.8): DataFrame = {
    val hashed = sort_array(
      array_distinct(transform(wordNgrams(col(textCol), n), t => xxhash64(t))))
    val grams = df.select(
      (col(idCol) +: blockCols.map(col)) :+ hashed.as("grams"): _*)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // one explicit repartition on the SHARED subtree: both join sides are the
    // identical exchange (ReuseExchange computes grams once), it already
    // satisfies the join's clustering requirement, and the user-pinned
    // partition count stops AQE from coalescing this tiny-bytes/heavy-CPU
    // pair-generation stage onto a single core
    val part = (if (blockCols.nonEmpty) grams.repartition(parts, blockCols.map(col): _*)
                else grams.repartition(parts))
    val a = part.as("a")
    val b = part.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, blockCond && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        graft.functions.SetFunctions.jaccardSorted(
          col("a.grams"), col("b.grams")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Recall-approximate Jaccard pairs for LOW thresholds at scale: candidate
    * pairs come from MinHash-LSH buckets (optionally intersected with
    * blocking keys), then exact n-gram Jaccard verifies each candidate. The
    * candidate set is bounded by bucket co-membership — never O(block^2) —
    * at the cost of missing pairs that collide in no band (recall
    * 1-(1-j^(numHashes/bands))^bands; pick bands=numHashes for rows=1
    * buckets and near-1 recall at j >= ~0.3).
    */
  def jaccardPairsLsh(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, blockCols: Seq[String] = Nil,
                      n: Int = 1, numHashes: Int = 16,
                      bands: Int = 16): DataFrame = {
    verifyJaccard(df,
      lshCandidates(df, idCol, textCol, blockCols, numHashes, bands),
      idCol, textCol, blockCols, n, threshold)
  }

  /** The LSH candidate stage alone: slim (id_a, id_b) pairs sharing a
    * (band, bucket) within the same block. `blockCols` participate in the
    * candidate equi-join itself — a hot minhash bucket on a low-diversity
    * corpus only enumerates pairs within each block, mirroring
    * [[prefixCandidates]] (filtering cross-block pairs after enumeration
    * was the round-2 quadratic-blowup lesson). Exposed so candidate-set
    * growth is directly testable.
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    blockCols: Seq[String] = Nil, numHashes: Int = 16,
                    bands: Int = 16): DataFrame = {
    val banded = bandedBuckets(df, idCol, textCol, numHashes, bands,
      blockCols = blockCols)
    val a = banded.as("a")
    val b = banded.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          blockCond && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact-Jaccard verification of a slim (id_a, id_b) candidate set:
    * join the gram sets back by id (two equi-shuffles) and keep pairs in the
    * same block scoring >= threshold.
    */
  private def verifyJaccard(df: DataFrame, cand: DataFrame, idCol: String,
                            textCol: String, blockCols: Seq[String], n: Int,
                            threshold: Double): DataFrame = {
    // sorted + distinct so the fused two-pointer JaccardSorted expression
    // applies — allocation-free per pair, vs a hash set per array_intersect
    val hashed = sort_array(
      array_distinct(transform(wordNgrams(col(textCol), n), t => xxhash64(t))))
    val grams = df.select(
      (col(idCol) +: blockCols.map(col)) :+ hashed.as("grams"): _*)
    val ga = grams.select(col(idCol).as("id_a") +:
      (blockCols.map(c => col(c).as(s"a_$c")) :+ col("grams").as("grams_a")): _*)
    val gb = grams.select(col(idCol).as("id_b") +:
      (blockCols.map(c => col(c).as(s"b_$c")) :+ col("grams").as("grams_b")): _*)
    val blockCond = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    cand.join(ga, "id_a").join(gb, "id_b")
      .where(blockCond)
      .select(col("id_a"), col("id_b"),
        graft.functions.SetFunctions.jaccardSorted(
          col("grams_a"), col("grams_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Prefix-filtered exact Jaccard pairs (PPJoin-style, Xiao et al. '08):
    * for threshold t, two sets can only reach jaccard >= t if they share a
    * token among each one's (|d| - ceil(t*|d|) + 1) globally-rarest tokens.
    * Candidates therefore come from an equi-join on PREFIX tokens only —
    * at t=0.9 the prefix is ~10% of each doc, and common tokens (the
    * quadratic-blowup culprits) rarely appear in prefixes at all.
    *
    * Plan: token-frequency join (shuffle on token) -> per-doc rarity-sorted
    * prefix -> candidate equi-join on prefix token (+ optional blocks, with
    * the size filter t*|b| <= |a| <= |b|/t applied in-join) -> distinct ->
    * exact jaccard verification on the candidate pairs only. Every stage is
    * an equi-shuffle; nothing is quadratic in a block.
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double, blockCols: Seq[String] = Nil,
                         n: Int = 1): DataFrame =
    verifyJaccard(df,
      prefixCandidates(df, idCol, textCol, threshold, n, blockCols),
      idCol, textCol, blockCols, n, threshold)

  /** The PPJoin candidate stage alone: slim (id_a, id_b) pairs that survive
    * the prefix-token equi-join, the in-join size filter
    * (t*|b| <= |a| <= |b|/t), and the positional filter: a match at 0-based
    * positions (pa, pb) of the rarity-sorted token lists bounds the overlap
    * by min(|a|-pa, |b|-pb), which must still reach the jaccard-equivalent
    * requirement t/(1+t)*(|a|+|b|) — pairs sharing only late-prefix tokens
    * are pruned before the distinct. Exposed so candidate-set growth is
    * directly testable (DedupSpec asserts it stays far below the quadratic
    * pair count on a deliberately hot block). Sharing across the self-join
    * comes from ReuseExchange on the identical subtrees, not from persist —
    * nothing is pinned in the block manager after the query completes.
    *
    * `blockCols` participate in the candidate equi-join itself, not just in
    * downstream verification: a shared prefix token only generates a
    * candidate within the same block. On corpora where a token's prefix
    * bucket is large this divides the |bucket|^2 enumeration by the block
    * count (measured 76x on the dense synthetic corpus) — blocking must
    * constrain candidate GENERATION, not merely filter after it.
    */
  def prefixCandidates(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double, n: Int = 1,
                       blockCols: Seq[String] = Nil): DataFrame = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    val hashed = array_distinct(transform(wordNgrams(col(textCol), n), t => xxhash64(t)))
    val grams = df.select(
        (col(idCol) +: blockCols.map(col)) :+ hashed.as("grams"): _*)
      .withColumn("sz", size(col("grams")))
    val toks = grams.select(
      (col(idCol) +: blockCols.map(col)) ++ Seq(col("sz"), explode(col("grams")).as("g")): _*)
    val freq = toks.groupBy("g").agg(count(lit(1)).as("gdf"))
    val prefix = toks.join(freq, "g")
      .groupBy(col(idCol) +: blockCols.map(col) :+ col("sz"): _*)
      .agg(sort_array(collect_list(struct(col("gdf"), col("g")))).as("rare_first"))
      .withColumn("prefix", slice(col("rare_first"), lit(1),
        (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")))
      .select((col(idCol) +: blockCols.map(col)) ++ Seq(col("sz"), posexplode(col("prefix"))): _*)
      .select((col(idCol) +: blockCols.map(col)) ++ Seq(col("sz"), col("pos"), col("col.g").as("g")): _*)
    val a = prefix.as("a")
    val b = prefix.as("b")
    // overlap requirement as a real-valued bound with a tiny slack: an
    // integer ub >= ceil(x) iff ub >= x; the 1e-9 guards the borderline
    // where x is exactly integral but floating rounding nudges it up
    // (keeping one extra candidate is safe — verification is exact)
    val need = (col("a.sz") + col("b.sz")) * lit(threshold / (1.0 + threshold)) - lit(1e-9)
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b,
        col("a.g") === col("b.g") && blockCond && col(s"a.$idCol") < col(s"b.$idCol") &&
          col("a.sz") >= ceil(col("b.sz") * threshold) &&
          col("b.sz") >= ceil(col("a.sz") * threshold) &&
          least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) >= need)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key (e.g. an
    * IVF/LSH bucket assignment produced by [[Ann]]). Exact cosine on the
    * blocked pairs only — at scale the block key MUST include an
    * [[Ann.withHyperplaneBuckets]] / [[Ann.withIvfAssignment]] column so the
    * pair space is bucket-bounded, never O(block^2) on a raw metadata block.
    *
    * Both self-join sides are built from ONE repartitioned slim projection
    * (mirroring [[jaccardPairsBlocked]]): the subtrees are structurally
    * identical, so ReuseExchange scans and shuffles the embeddings once, and
    * the pinned partition count stops AQE from coalescing the
    * tiny-bytes/heavy-CPU pair stage onto a single core.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                            blockCols: Seq[String],
                            threshold: Double = 0.95): DataFrame = {
    val slim = df.select((col(idCol) +: blockCols.map(col)) :+ col(embCol): _*)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val part = (if (blockCols.nonEmpty) slim.repartition(parts, blockCols.map(col): _*)
                else slim.repartition(parts))
    val a = part.as("a")
    val b = part.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, blockCond && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosineSim(col(s"a.$embCol"), col(s"b.$embCol")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): cluster the embedding space, then drop every
    * document that has a sufficiently-similar predecessor *within its
    * block*. The deterministic survivor rule matches the engine's exact-
    * dedup convention (q13): a row is removed iff SOME lower-id row in the
    * same block is `>= threshold` cosine-similar, so the minimum id of each
    * near-dup neighborhood always survives and the result is independent of
    * partitioning and evaluation order (the paper's random-keeper is
    * replaced by the id argmin, same reduction ratio).
    *
    * `blockCols` is the paper's k-means clustering generalized: pass an
    * [[Ann.withIvfAssignment]] cell (pure SemDeDup), optionally tightened
    * with an [[Ann.withHyperplaneBuckets]] column when cluster populations
    * are too large for exact within-cluster pairs — the same
    * recall-for-scan-bound trade documented on [[embeddingNearDupPairs]],
    * which provides the pair machinery (one shuffled slim projection reused
    * for both join sides, pair space bucket-bounded, never O(corpus^2)).
    * The final anti-join shuffles only (id) pairs — survivors never carry
    * embeddings through a shuffle.
    */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
                    blockCols: Seq[String],
                    threshold: Double = 0.95): DataFrame = {
    val dups = embeddingNearDupPairs(df, idCol, embCol, blockCols, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dups, Seq(idCol), "left_anti")
  }

  /** SUBSTRING-level duplication: maximal runs of consecutive shared word
    * k-shingles between document pairs — the distributed approximation of
    * suffix-array substring dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL'22: exact duplicate SPANS ≥ ~50
    * chars matter even when whole documents differ; doc-level MinHash
    * misses a copied paragraph inside an otherwise-novel page).
    *
    * Relational reformulation: a shared substring of t ≥ k tokens between
    * docs A and B is exactly a run of t−k+1 consecutive shingle matches on
    * one DIAGONAL (posA − posB constant) of the match matrix — so emit
    * (docA, docB, diag, posA) match points from a shingle equi-join, then
    * gaps-and-islands per (pair, diag): island id = posA − row_number().
    * No suffix array, no sequential pass; three shuffles total (shingle
    * df-count, shingle join, island window keyed by pair+diag).
    *
    * Scale bounds: the shingle join's fan-out is capped BEFORE the join by
    * two filters on the same one aggregate — `maxDf` (a shingle present in
    * more than `maxDf` docs is dropped: boilerplate/stopword diagonals
    * would otherwise go quadratic across the corpus) and `maxOccurrences`
    * (a shingle with more than `maxOccurrences` total POSITIONS is
    * dropped: a template line repeated m times inside doc A and n times
    * inside doc B contributes m·n match points across distinct diagonals
    * even when only two docs share it, so a doc-count cap alone does not
    * bound the join — the occurrence cap pins per-shingle fan-out at
    * `maxOccurrences`² regardless of within-doc repetition). Runs that
    * common are boilerplate removal's job — [[Boilerplate]] — not pair
    * dedup's. On replica-dense corpora run [[exactDedup]] first (q266's
    * measured rule) so identical copies don't saturate `maxDf` —
    * [[substringDupReport]] does exactly that internally.
    *
    * Output, one row per unordered pair with any run of ≥ `minRunTokens`
    * tokens: `(id_a, id_b, max_run_tokens, n_runs, shared_positions)` —
    * longest shared run in TOKENS (shingle run + k − 1), number of
    * distinct maximal runs ≥ the floor, and total matched shingle
    * positions across all diagonals.
    */
  def sharedShingleRuns(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 5, maxDf: Int = 16,
                        minRunTokens: Int = 10,
                        maxOccurrences: Int = 64): DataFrame = {
    require(k >= 1 && minRunTokens >= k,
      s"minRunTokens $minRunTokens must be >= shingle size $k")
    val minRunShingles = minRunTokens - k + 1
    val toks = split(lower(col(textCol)), "\\s+")
    val shingles = transform(
      sequence(lit(0), size(toks) - k),
      i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k)))))
    val s = df.where(size(toks) >= k)
      .select(col(idCol).as("__id"), posexplode(shingles))
      .select(col("__id"), col("pos").as("__pos"), col("col").as("__h"))
    // both caps BEFORE the join, from ONE aggregate on the shingle key:
    // distinct-doc count (cross-corpus boilerplate) and total position
    // count (within-doc repetition — the m·n diagonal blowup)
    val rare = s.groupBy("__h")
      .agg(countDistinct("__id").as("__df"), count(lit(1)).as("__occ"))
      .where(col("__df") <= maxDf && col("__occ") <= maxOccurrences)
      .select("__h")
    val sr = s.join(rare, Seq("__h"), "left_semi")
    val a = sr.select(col("__h"), col("__id").as("id_a"), col("__pos").as("__pa"))
    val b = sr.select(col("__h"), col("__id").as("id_b"), col("__pos").as("__pb"))
    val m = a.join(b, Seq("__h")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("__pa") - col("__pb")).as("__diag"), col("__pa"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a", "id_b", "__diag").orderBy("__pa")
    val runs = m
      .withColumn("__isl", col("__pa") - row_number().over(w))
      .groupBy("id_a", "id_b", "__diag", "__isl")
      .agg(count(lit(1)).as("__run"))
    runs.groupBy("id_a", "id_b")
      .agg((max("__run") + lit(k.toLong - 1)).as("max_run_tokens"),
        sum(when(col("__run") >= minRunShingles, 1L).otherwise(0L)).as("n_runs"),
        sum("__run").as("shared_positions"))
      .where(col("n_runs") > 0)
  }

  /** The dedup ACTION over [[sharedShingleRuns]]: per document, the longest
    * span it shares with any EARLIER (smaller-id) document, and a flag at
    * `minRunTokens` — earliest copy survives unflagged, every later doc
    * carrying a duplicated span is named with the span length. One row per
    * input document (docs with no shared span — including null-text docs —
    * keep nulls/false), so the conservation identity
    * `count(*) == count(flagged) + count(clean)` is checkable downstream.
    *
    * This is the DEDUP-FIRST form and the DEFAULT entry (the q266
    * ORDERING RULE, measured at ratio 1.0 vs the direct form's 11.1× on a
    * 10× replica corpus — SCALE10 r12): on N identical copies of a page
    * the direct shingle join pays C(N,2) full-length diagonal runs per
    * page even though exact-text knowledge answers those pairs for free.
    * Identical texts collapse to a min-id representative FIRST; the
    * shingle machinery runs over DISTINCT texts only (its work is bounded
    * by the distinct corpus no matter how replicated the input is), and
    * the per-document verdict reassembles exactly:
    *
    *  - a non-minimum replica shares its FULL text with its group's
    *    earlier minimum — span = its own token count, by construction,
    *    no shingles needed (flagged iff that length ≥ `minRunTokens`);
    *  - a cross-text span seen by any document d is the span between
    *    d's representative and another representative r' — and "some
    *    member of r's group precedes d" reduces to `r' < d`, because a
    *    group's representative IS its minimum id.
    *
    * Semantics note (deliberate, like [[minHashLshPairsDedupFirst]]):
    * the df/occurrence caps apply over the DISTINCT-text corpus — the
    * right reading of "boilerplate" (replicas of one page must not
    * saturate a shingle's document frequency). On a replica-free corpus
    * this equals [[substringDupReportDirect]] exactly (DedupSpec pins
    * it); on a replica corpus the two differ only through that cap
    * reading, and this form's is the intended one.
    */
  def substringDupReport(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, maxDf: Int = 16,
                         minRunTokens: Int = 10,
                         maxOccurrences: Int = 64): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    val all = df.select(col(idCol), col(textCol),
      size(toks).cast("long").as("__len"))
    // a null text can never share a span: route those rows around the
    // text-keyed group join (which would silently DROP them — null keys
    // never equi-join) and union them back unflagged, preserving the
    // one-row-per-input-document conservation contract
    val nullText = all.where(col(textCol).isNull)
      .select(col(idCol), lit(null).cast("long").as("max_shared_tokens"),
        lit(false).as("dup_substring"))
    val docs = all.where(col(textCol).isNotNull)
    val groups = docs.groupBy(col(textCol)).agg(min(col(idCol)).as("__rep"))
    val reps = docs.join(groups, Seq(textCol))
      .where(col(idCol) === col("__rep"))
      .select(col(idCol), col(textCol))
    val pairs = sharedShingleRuns(reps, idCol, textCol, k, maxDf,
      minRunTokens, maxOccurrences)
    // symmetric rep-pair spans: either endpoint's group may hold the
    // later document. Emitted as ONE explode over a 2-struct array, not a
    // union of two projections: a union's branches are separate physical
    // subtrees, so the whole shingle pipeline (explode + caps + join +
    // diagonal window) would execute TWICE — measured as the dominant
    // cost of q276/q284 in r16 (plan showed the full run-detection DAG
    // duplicated under Union). Same rows, one execution.
    val sym = pairs
      .select(explode(array(
        struct(col("id_a").as("__r1"), col("id_b").as("__r2"),
          col("max_run_tokens")),
        struct(col("id_b").as("__r1"), col("id_a").as("__r2"),
          col("max_run_tokens")))).as("__sym"))
      .select(col("__sym.__r1").as("__r1"), col("__sym.__r2").as("__r2"),
        col("__sym.max_run_tokens").as("max_run_tokens"))
    val tagged = docs.join(groups, Seq(textCol))
    val crossBest = tagged
      .join(sym, col("__r1") === col("__rep") && col("__r2") < col(idCol))
      .groupBy(col(idCol))
      .agg(max("max_run_tokens").as("__cx"))
    tagged.join(crossBest, Seq(idCol), "left")
      .select(col(idCol),
        greatest(coalesce(col("__cx"), lit(-1L)),
          when(col(idCol) > col("__rep") &&
            col("__len") >= minRunTokens, col("__len")).otherwise(-1L))
          .as("__mx"))
      .select(col(idCol),
        when(col("__mx") >= 0L, col("__mx")).as("max_shared_tokens"),
        (col("__mx") >= 0L).as("dup_substring"))
      .unionByName(nullText)
  }

  /** The DIRECT (exhaustive) form of [[substringDupReport]]: the shingle
    * machinery over the raw corpus, no exact-duplicate collapse — kept as
    * the measured baseline and cross-check (its caps read document
    * frequency over the RAW corpus, so N replicas of a page count N times
    * toward `maxDf`). On replica-dense corpora this pays C(N,2)
    * full-length diagonal runs per replicated page — 11.1× at a 10×
    * corpus where the default entry holds 1.0 (SCALE10 r12) — so it is a
    * demo/baseline, NOT the production entry; use [[substringDupReport]],
    * which answers replica pairs from exact-text knowledge for free.
    */
  def substringDupReportDirect(df: DataFrame, idCol: String, textCol: String,
                               k: Int = 5, maxDf: Int = 16,
                               minRunTokens: Int = 10,
                               maxOccurrences: Int = 64): DataFrame = {
    val pairs = sharedShingleRuns(df, idCol, textCol, k, maxDf, minRunTokens,
      maxOccurrences)
    val perDoc = pairs.groupBy(col("id_b").as(idCol))
      .agg(max("max_run_tokens").as("max_shared_tokens"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .withColumn("dup_substring", col("max_shared_tokens").isNotNull)
  }
}
