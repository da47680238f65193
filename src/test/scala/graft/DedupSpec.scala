package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the  QUICK brown fox jumps over the lazy dog"), // ws/case variant of 1
    (3L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (4L, "completely different text about spark engines"),
    (5L, "the quick brown fox jumps over the lazy dog")   // exact dup of 1
  ).toDF("id", "text")

  test("exact dedup groups whitespace/case-normalized duplicates") {
    val groups = Dedup.exactGroups(docs, "id", "text").collect()
    val byKeep = groups.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeep(1L) == 3L) // 1, 2, 5 share a fingerprint
    assert(groups.length == 3)
    val survivors = Dedup.exactDedup(docs, "id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L, 4L))
  }

  test("minhash LSH surfaces the near-duplicate pair, not unrelated docs") {
    val pairs = Dedup.minHashLshPairsDirect(docs, "id", "text", numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L))) // identical token sets always collide
    assert(pairs.contains((1L, 3L)) || pairs.contains((3L, 5L))) // near-dup likely
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc stays out
  }

  test("dedup-first LSH: multiplicities == full-corpus pair stream on a replica-dense corpus") {
    // replica-dense: 3 distinct texts, replicated 4x/3x/2x with min ids 10/20/30
    val base = Seq(
      10L -> "alpha beta gamma delta epsilon zeta",
      20L -> "alpha beta gamma delta epsilon eta", // near-dup of 10
      30L -> "totally unrelated words live here now")
    val replicas = Seq(4, 3, 2)
    val dense = base.zip(replicas).flatMap { case ((id, t), n) =>
      (0 until n).map(i => (id + i, t)) }.toDF("id", "text")
    // minHashLshPairs IS the dedup-first form now (round-14 unification);
    // the DedupFirst name must stay a bit-identical alias
    val got = Dedup.minHashLshPairs(dense, "id", "text",
        numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val viaAlias = Dedup.minHashLshPairsDedupFirst(dense, "id", "text",
        numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(viaAlias == got, "DedupFirst alias must equal the unified default")
    // within-group rows: min-id rep, all bands shared, C(n,2) pairs
    assert(got((10L, 10L)) == ((8L, 6L)), "4 replicas -> C(4,2)=6 exact pairs")
    assert(got((20L, 20L)) == ((8L, 3L)))
    assert(got((30L, 30L)) == ((8L, 1L)))
    // cross-group multiplicity = n_a * n_b, bands = what the reps share
    got.get((10L, 20L)).foreach { case (_, np) => assert(np == 12L) }
    assert(!got.contains((10L, 30L)) && !got.contains((20L, 30L)),
      "unrelated texts must not collide at 16/8 banding")
    // the conservation identity: sum of multiplicities == the row count
    // the quadratic full-corpus pair stream would have materialized
    val full = Dedup.minHashLshPairsDirect(dense, "id", "text",
      numHashes = 16, bands = 8).count()
    assert(got.values.map(_._2).sum == full,
      "dedup-first multiplicities must conserve the full pair stream")
  }

  test("char shingles: sliding distinct k-grams, short-text edge, LSH robustness") {
    val sh = Seq(("abcdef", 1), ("ab", 2)).toDF("t", "i")
      .select(TextAnalysis.charShingles(col("t"), 3)).collect()
    assert(sh(0).getSeq[String](0) == Seq("abc", "bcd", "cde", "def"))
    assert(sh(1).getSeq[String](0) == Seq("ab")) // shorter than k => truncated single
    // word-order noise: token-set jaccard sees a near-dup, shingles stay
    // robust too — both should pair the reordered doc with its original
    val docs2 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick the brown fox jumps over the lazy dog"), // word swap
      (3L, "completely unrelated text about something else")
    ).toDF("id", "text")
    val pairs = Dedup.minHashLshPairs(docs2, "id", "text", numHashes = 16, bands = 8,
        tokensOf = t => TextAnalysis.charShingles(t, 5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical texts hamming 0, near-dups close, unrelated far") {
    val sigs = docs.select(col("id"),
      graft.functions.TextHashFunctions.simhash60(split(col("text"), " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(5L)) == 0)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("jaccard pairs: exact dup scores 1.0, near-dup high, with blocking") {
    val blocked = docs.withColumn("block", lit("all"))
    val pairs = Dedup.jaccardPairs(blocked, "id", "text", Seq("block"),
        n = 1, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 5L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.7 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("embedding near-dup pairs within block only") {
    val rows = Seq(
      (1L, "x", Array(1f, 0f, 0f)),
      (2L, "x", Array(0.99f, 0.1f, 0f)),
      (3L, "x", Array(0f, 1f, 0f)),
      (4L, "y", Array(1f, 0f, 0f)) // same vector as 1, different block
    ).toDF("id", "block", "emb")
    val pairs = Dedup.embeddingNearDupPairs(rows, "id", "emb", Seq("block"), 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // 1-4 blocked apart; 1-3 orthogonal
  }

  test("content fingerprint invariant to whitespace runs and case") {
    val fp = Seq("a b  c", "A  B C", "a b d").toDF("t")
      .select(TextAnalysis.contentFingerprint(col("t"))).collect().map(_.getString(0))
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
  }

  test("prefix-filtered jaccard equals blocked jaccard at high threshold") {
    // random docs with engineered near-dups
    val rnd = new scala.util.Random(23)
    val vocab = Seq.tabulate(40)(i => s"w$i")
    val base = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")))
    val nearDups = base.take(8).map { case (id, t) =>
      (id + 100L, (t.split(" ").toSeq :+ "extra").mkString(" ")) // ~0.9 jaccard
    }
    val docs = (base ++ nearDups).toDF("id", "text").withColumn("block", lit("all"))
    val viaBlocked = Dedup.jaccardPairsBlocked(docs, "id", "text", Seq("block"),
        n = 1, threshold = 0.8)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaPrefix = Dedup.jaccardPairsPrefix(docs, "id", "text",
        threshold = 0.8, blockCols = Seq("block"))
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaPrefix == viaBlocked)
    assert(viaPrefix.nonEmpty, "engineered near-dups must be found")
  }

  test("jaccardPairs dispatches high thresholds to the prefix path") {
    val blocked = docs.withColumn("block", lit("all"))
    val plan = Dedup.jaccardPairs(blocked, "id", "text", Seq("block"),
      n = 1, threshold = 0.8).queryExecution.optimizedPlan.toString
    // the prefix path is recognizable by its token-frequency aggregation;
    // the blocked path has no Aggregate before the pair join
    assert(plan.contains("count("), s"expected prefix-path plan:\n$plan")
  }

  /** One deliberately hot block: N docs sharing a blocking key, mostly
    * distinct content. The quadratic pair space is N*(N-1)/2; the prefix
    * filter must keep the candidate set far below it — this is the 100 TB
    * skew story (VERDICT round 1: blocked path is O(b^2) on a hot block).
    */
  test("prefix candidates stay far below quadratic on a hot block") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq.tabulate(2000)(i => s"tok$i")
    val n = 200
    val hot = Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")))
    val dups = hot.take(5).map { case (id, t) => (id + 1000L, t + " xtra") }
    val df = (hot ++ dups).toDF("id", "text")
    val quadratic = (n + 5).toLong * (n + 4) / 2
    val nCand = Dedup.prefixCandidates(df, "id", "text", threshold = 0.8).count()
    assert(nCand < quadratic / 10,
      s"candidates $nCand not bounded vs quadratic $quadratic")
    // and the surviving pairs are exactly the planted near-dups
    val pairs = Dedup.jaccardPairs(df, "id", "text", Nil, n = 1, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == hot.take(5).map { case (id, _) => (id, id + 1000L) }.toSet)
  }

  test("LSH-verified jaccard: low threshold, bounded candidates, planted recall") {
    val rnd = new scala.util.Random(41)
    val vocab = Seq.tabulate(500)(i => s"v$i")
    val base = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")))
    // planted mid-similarity pairs (~0.45-0.6 jaccard: half the tokens kept)
    val mids = base.take(6).map { case (id, t) =>
      val toks = t.split(" ")
      (id + 500L, (toks.take(toks.length * 2 / 3) ++ Seq("p", "q", "r")).mkString(" "))
    }
    val df = (base ++ mids).toDF("id", "text").withColumn("block", lit("b"))
    val exact = Dedup.jaccardPairsBlocked(df, "id", "text", Seq("block"),
        n = 1, threshold = 0.35)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val viaLsh = Dedup.jaccardPairsLsh(df, "id", "text", threshold = 0.35,
        blockCols = Seq("block"), numHashes = 16, bands = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // LSH result is a subset of the exact result with identical scores
    viaLsh.foreach { case (k, v) => assert(exact.contains(k) && exact(k) == v) }
    // and at bands=numHashes (rows=1) recall on the planted pairs is total
    val planted = base.take(6).map { case (id, _) => (id, id + 500L) }
    planted.foreach { p =>
      assert(!exact.contains(p) || viaLsh.contains(p), s"LSH missed planted $p")
    }
    assert(viaLsh.nonEmpty)
  }

  /** Blocks must constrain LSH candidate GENERATION, not just verification —
    * a hot minhash bucket spanning blocks would otherwise enumerate every
    * cross-block pair only to discard it later (the round-2 prefix-path
    * lesson, applied to the LSH route).
    */
  test("LSH candidates are block-bounded at the candidate join") {
    // identical content duplicated across two blocks: every doc's buckets
    // collide with its cross-block twin
    val base = Seq.tabulate(30)(i => s"shared text body number $i with words")
    val df = (base.zipWithIndex.map { case (t, i) => (i.toLong, t, "blkA") } ++
      base.zipWithIndex.map { case (t, i) => (i + 100L, t, "blkB") })
      .toDF("id", "text", "block")
    val unblocked = Dedup.lshCandidates(df, "id", "text").count()
    val blocked = Dedup.lshCandidates(df, "id", "text", Seq("block")).count()
    assert(blocked * 2 <= unblocked,
      s"blocked candidates $blocked not bounded vs unblocked $unblocked")
    // and the verified output within blocks is unchanged by the pushdown:
    // every cross-block twin pair is gone, within-block scores survive
    val pairs = Dedup.jaccardPairsLsh(df, "id", "text", threshold = 0.9,
        blockCols = Seq("block"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => (a < 100) == (b < 100) },
      "cross-block pair leaked through block-bounded candidates")
  }

  /** Round-1 leak: pair operators persisted intermediates and never released
    * them. Now NOTHING in Dedup caches — sharing comes from ReuseExchange —
    * so no pair plan may contain an in-memory cache scan. (Asserted on the
    * plans, not on getPersistentRDDs, which other concurrently-running suites
    * legitimately populate.)
    */
  test("pair queries pin no cache blocks") {
    val blocked = docs.withColumn("block", lit("all"))
    val plans = Seq(
      Dedup.minHashLshPairs(docs, "id", "text", 16, 8),
      Dedup.jaccardPairsPrefix(docs, "id", "text", 0.8, Seq.empty),
      Dedup.jaccardPairsLsh(blocked, "id", "text", 0.3, Seq("block")))
    plans.foreach { df =>
      df.count() // materialize: caching would register here
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("InMemoryTableScan") && !plan.contains("InMemoryRelation"),
        s"dedup plan pins cache blocks:\n$plan")
    }
  }

  /** At scale the bucket self-join is a sort-merge join over two IDENTICAL
    * shuffle subtrees; Catalyst's ReuseExchange then computes signatures once
    * and feeds the second side from the first's shuffle files. (Tiny inputs
    * broadcast one side instead, so pin SMJ by disabling auto-broadcast.)
    */
  test("minhash LSH self-join reuses one exchange (signatures computed once)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Dedup.minHashLshPairs(docs, "id", "text", 16, 8)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"), s"expected ReusedExchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Round-2 verdict: the embedding pair join must mirror the jaccard twin —
    * ONE repartitioned slim subtree feeding both self-join sides, so
    * ReuseExchange scans/shuffles the embeddings once instead of twice.
    */
  test("embedding near-dup self-join reuses one exchange (embeddings shuffled once)") {
    import graft.operators.Ann
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rows = Seq.tabulate(20)(i =>
        (i.toLong, s"b${i % 2}", Array(1f + i, 2f, 3f))).toDF("id", "block", "emb")
      val df = Dedup.embeddingNearDupPairs(rows, "id", "emb", Seq("block"), 0.5)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"), s"expected ReusedExchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** The 100 TB contract of embeddingNearDupPairs: on a hot metadata block the
    * caller composes an [[Ann.withHyperplaneBuckets]] sub-block key. The
    * bucketed pair space must stay far below quadratic, results must be a
    * subset of the unbucketed exact pairs with identical scores, and
    * identical vectors (cos = 1) always share every sign bit, so planted
    * exact dups are recalled totally.
    */
  test("hyperplane sub-blocks bound the embedding pair space on a hot block") {
    import graft.operators.Ann
    val rnd = new scala.util.Random(11)
    val n = 100
    val base = Seq.tabulate(n)(i =>
      (i.toLong, "hot", Array.fill(8)(rnd.nextGaussian().toFloat)))
    val dups = base.take(5).map { case (id, l, v) => (id + 1000L, l, v.clone()) }
    val rows = (base ++ dups).toDF("id", "label", "emb")
    val bucketed = Ann.withHyperplaneBuckets(rows, "emb", Ann.hyperplanes(8, 4, seed = 5))
    val quadratic = (n + 5).toLong * (n + 4) / 2
    val bounded = bucketed.groupBy("lsh_bucket").count().collect()
      .map(r => { val b = r.getLong(1); b * (b - 1) / 2 }).sum
    assert(bounded < quadratic / 2,
      s"bucketed pair space $bounded not bounded vs quadratic $quadratic")
    val exact = Dedup.embeddingNearDupPairs(rows, "id", "emb", Seq("label"), 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val viaBuckets = Dedup.embeddingNearDupPairs(bucketed, "id", "emb",
        Seq("label", "lsh_bucket"), 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    viaBuckets.foreach { case (k, v) => assert(exact.contains(k) && exact(k) == v) }
    base.take(5).foreach { case (id, _, _) =>
      assert(viaBuckets.contains((id, id + 1000L)), s"missed planted dup $id")
    }
  }

  test("edit-distance pairs: catches in-place edits Jaccard misses; blocked; capped") {
    val df = Seq(
      (1L, "en", "s1", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "s1", "the quick brewn fox jumps over the lazy dog"), // 1 char edit
      (3L, "en", "s1", "completely different content here with nothing shared"),
      (4L, "en", "s2", "the quick brown fox jumps over the lazy dog") // other block
    ).toDF("doc_id", "lang", "source", "text")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
        Seq("lang", "source"), prefixLen = 64, maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == Map((1L, 2L) -> 1)) // the single-char edit, distance 1
    // (1,4) identical texts but different blocks: never enumerated
    // every word 1-gram of doc 2 differs from doc 1 in exactly one token —
    // jaccard = 8/10 < 0.9, so the q39-style pass at 0.9 would drop it
    val jac = Dedup.jaccardPairs(df, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      .collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("edit-distance routing: q-gram candidates reproduce the blocked pair set exactly") {
    // deterministic corpus exercising every routing stratum: long prefixes
    // (gram path), short strings below the q*(maxDist+1) floor (blocked
    // residue), planted edits at distances 1..10 (in- and out-of-threshold),
    // length mismatches, cross-block twins, a null text, an empty text
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val bases = (0 until 40).map(i => (i.toLong, if (i % 2 == 0) "en" else "de",
      s"s${i % 3}", randStr(50 + rnd.nextInt(40))))
    val edited = bases.take(20).map { case (id, lang, src, t) =>
      val nEdits = 1 + rnd.nextInt(10)
      val chars = t.toCharArray
      (0 until nEdits).foreach { _ =>
        chars(rnd.nextInt(chars.length)) = ('a' + rnd.nextInt(26)).toChar
      }
      (id + 1000L, lang, src, new String(chars))
    }
    val extras = Seq(
      (2000L, "en", "s0", "tiny"), (2001L, "en", "s0", "tinq"),  // short stratum
      (2002L, "en", "s0", ""), (2003L, "en", "s0", ""),          // empty texts
      (2004L, "en", "s0", null.asInstanceOf[String]))            // null text
    val df = (bases ++ edited ++ extras).toDF("doc_id", "lang", "source", "text")
    def pairSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val routed = pairSet(Dedup.editDistancePairs(df, "doc_id", "text",
      Seq("lang", "source"), prefixLen = 64, maxDist = 8))
    val blocked = pairSet(Dedup.editDistancePairsBlocked(df, "doc_id", "text",
      Seq("lang", "source"), prefixLen = 64, maxDist = 8))
    assert(routed == blocked, "routed pair set must equal the blocked pair set")
    assert(blocked.contains((2000L, 2001L)) && blocked((2000L, 2001L)) == 1)
    assert(blocked.contains((2002L, 2003L)) && blocked((2002L, 2003L)) == 0)
    assert(blocked.nonEmpty && blocked.values.forall(d => d >= 0 && d <= 8))
    // degenerate prefixLen: router must fall back to the blocked form
    val tinyRouted = pairSet(Dedup.editDistancePairs(df, "doc_id", "text",
      Seq("lang", "source"), prefixLen = 12, maxDist = 8))
    val tinyBlocked = pairSet(Dedup.editDistancePairsBlocked(df, "doc_id", "text",
      Seq("lang", "source"), prefixLen = 12, maxDist = 8))
    assert(tinyRouted == tinyBlocked)
  }

  test("edit-distance routing: candidate count is bounded on a hot dissimilar block") {
    // one hot (lang, source) block of mutually-dissimilar long docs: the
    // quadratic enumeration would emit n*(n-1)/2 pairs; the q-gram
    // candidate stage must stay far below that
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val n = 300
    val df = (0 until n).map(i => (i.toLong, "en", "s0", randStr(80)))
      .toDF("doc_id", "lang", "source", "text")
    // count candidates by reproducing the gram-join stage: pairs sharing a
    // positional 7-gram (q = 64 / 9 = 7) within +-8 positions
    val q = 7
    val grams = df.select(col("doc_id"), substring(col("text"), 1, 64).as("prefix"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), length(col("prefix")) - q),
          i => col("prefix").substr(i + 1, lit(q)))))
      .withColumnsRenamed(Map("pos" -> "gpos", "col" -> "gram"))
    val cand = grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.gpos") - col("b.gpos")) <= 8)
      .select("a.doc_id", "b.doc_id").distinct().count()
    val quadratic = n.toLong * (n - 1) / 2
    assert(cand < quadratic / 20,
      s"candidate stage emitted $cand of $quadratic quadratic pairs — not sub-quadratic")
    // and the routed operator still returns the exact (empty-ish) truth
    val routed = Dedup.editDistancePairs(df, "doc_id", "text",
      Seq("lang", "source"), prefixLen = 64, maxDist = 8).count()
    val blocked = Dedup.editDistancePairsBlocked(df, "doc_id", "text",
      Seq("lang", "source"), prefixLen = 64, maxDist = 8).count()
    assert(routed == blocked)
  }

  test("overlap matrix: hand-computed source-pair counts, ordered pairs, singletons dropped") {
    // keys: k1 in {A,B,C}; k2 in {A,B}; k3 in {C} only; k4 in {B} twice
    // (per-source duplicates must collapse before counting)
    val keyed = Seq(
      ("k1", "A"), ("k1", "B"), ("k1", "C"),
      ("k2", "B"), ("k2", "A"),
      ("k3", "C"),
      ("k4", "B"), ("k4", "B")
    ).toDF("k", "source")
    val got = Dedup.overlapMatrix(keyed, "k", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "B") -> 2L, ("A", "C") -> 1L, ("B", "C") -> 1L))
    // pairs are emitted sorted (src_a < src_b): no reversed duplicates
    assert(got.keys.forall { case (a, b) => a < b })
  }

  test("hammingPairs64: pigeonhole candidates complete vs brute force (seeded random)") {
    val rnd = new scala.util.Random(7)
    // clustered signatures: 30 bases, each with 0-3 bit flips -> real pairs
    val sigs = (0 until 30).flatMap { b =>
      val base = rnd.nextLong()
      (0 until 4).map { j =>
        var v = base
        (0 until rnd.nextInt(4)).foreach(_ => v ^= 1L << rnd.nextInt(64))
        (b * 10L + j, v & 0xFFFFFFFFL, (v >>> 32) & 0xFFFFFFFFL)
      }
    }
    val df = sigs.toDF("id", "lo", "hi")
    val got = Dedup.hammingPairs64(df, "id", "lo", "hi", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      a <- sigs; b <- sigs if a._1 < b._1
      h = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= 3
    } yield (a._1, b._1, h)).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture must contain near pairs")
  }

  test("semanticDedup: min id of each near-dup neighborhood survives, blocks isolate") {
    // block X: ids 1,2,3 mutually ~identical; block Y: id 10 identical to
    // them in VALUE but blocked apart (must survive); id 11 orthogonal
    val e1 = Seq(1.0f, 0.0f, 0.0f)
    val rows = Seq(
      (1L, "X", e1), (2L, "X", Seq(0.999f, 0.01f, 0.0f)),
      (3L, "X", Seq(0.998f, 0.02f, 0.0f)),
      (10L, "Y", e1), (11L, "Y", Seq(0.0f, 1.0f, 0.0f))
    ).toDF("id", "block", "emb")
    val kept = Dedup.semanticDedup(rows, "id", "emb", Seq("block"), 0.95)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 11L),
      s"min id survives per block-neighborhood, got $kept")
  }

  test("semanticDedup: chain semantics — removed iff ANY lower-id neighbor") {
    // 1~2 and 2~3 but 1!~3: 2 drops (neighbor 1), 3 drops (neighbor 2) —
    // the exists-a-lower-id rule, not a connected-components survivor pick
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.4358899f)),   // cos(1,2) ~ 0.9
      (3L, Seq(0.62f, 0.7846418f))   // cos(2,3) ~ 0.9, cos(1,3) ~ 0.62
    ).toDF("id", "emb").withColumn("block", lit(0))
    val kept = Dedup.semanticDedup(rows, "id", "emb", Seq("block"), 0.85)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"2 and 3 each have a lower-id neighbor, got $kept")
  }

  // --- substring-level runs (q275/q276) -----------------------------------

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("sharedShingleRuns: a copied span is found with its exact length") {
    // doc 2 embeds a verbatim 12-token span from doc 1 inside novel text;
    // doc 3 is fully novel. Expect exactly the (1,2) pair with
    // max_run_tokens = 12: 8 consecutive 5-shingle matches on one diagonal.
    val span = words("c", 12)
    val docs = Seq(
      (1L, words("a", 9) + " " + span + " " + words("b", 9)),
      (2L, words("x", 7) + " " + span + " " + words("y", 11)),
      (3L, words("z", 40))).toDF("id", "text")
    val out = Dedup.sharedShingleRuns(docs, "id", "text",
      k = 5, maxDf = 16, minRunTokens = 10).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === (1L, 2L))
    assert(r.getLong(2) === 12L, "max_run_tokens = the span length")
    assert(r.getLong(3) === 1L, "one qualifying run")
    assert(r.getLong(4) === 8L, "12-token span = 8 shared 5-shingles")
  }

  test("sharedShingleRuns: spans shorter than the floor do not pair") {
    val span = words("c", 8) // 8 < minRunTokens = 10
    val docs = Seq(
      (1L, words("a", 10) + " " + span + " " + words("b", 10)),
      (2L, words("x", 10) + " " + span + " " + words("y", 10))
    ).toDF("id", "text")
    assert(Dedup.sharedShingleRuns(docs, "id", "text").isEmpty)
  }

  test("sharedShingleRuns: two separated copies count as two runs") {
    val s1 = words("c", 10); val s2 = words("d", 11)
    val docs = Seq(
      (1L, s1 + " " + words("a", 6) + " " + s2),
      (2L, s2 + " " + words("x", 9) + " " + s1)).toDF("id", "text")
    val r = Dedup.sharedShingleRuns(docs, "id", "text").collect().head
    assert(r.getLong(2) === 11L)
    assert(r.getLong(3) === 2L, "both spans are maximal runs >= floor")
  }

  test("sharedShingleRuns: the df-cap drops boilerplate diagonals") {
    // the same 20-token boilerplate in 6 docs; maxDf=4 must suppress all
    // pairs, maxDf=8 must emit all C(6,2)=15
    val bp = words("bp", 20)
    val docs = (1L to 6L).map(i => (i, words(s"u$i", 5) + " " + bp))
      .toDF("id", "text")
    assert(Dedup.sharedShingleRuns(docs, "id", "text", maxDf = 4).isEmpty)
    assert(Dedup.sharedShingleRuns(docs, "id", "text", maxDf = 8)
      .count() === 15L)
  }

  test("sharedShingleRuns: the occurrence cap bounds within-doc repetition") {
    // a 5-token template line repeated 40x inside each of TWO docs: only 2
    // docs share it (df-cap 16 passes), but the repeated text is periodic
    // with period 5, so each of its 5 distinct shingles occurs ~39 times
    // per doc — m*n ≈ 1.5k match points per shingle if joined. The default
    // occurrence cap (64 < ~78 total) must drop them BEFORE the join;
    // raising the cap re-admits the pair (and its quadratic match count).
    val template = words("t", 5)
    val repeated = Seq.fill(40)(template).mkString(" ")
    val docs = Seq(
      (1L, words("a", 6) + " " + repeated),
      (2L, words("x", 6) + " " + repeated),
      (3L, words("z", 30))).toDF("id", "text")
    assert(Dedup.sharedShingleRuns(docs, "id", "text").isEmpty,
      "default maxOccurrences=64 suppresses the repetitive template")
    val admitted = Dedup.sharedShingleRuns(docs, "id", "text",
      maxOccurrences = 500).collect()
    assert(admitted.length === 1 &&
      (admitted.head.getLong(0), admitted.head.getLong(1)) === (1L, 2L))
    assert(admitted.head.getLong(4) > 1000L,
      "uncapped, the single shared template yields a quadratic match count")
  }

  test("substringDupReport (dedup-first) == direct form on a replica-free corpus") {
    val span = words("c", 12)
    val docs = Seq(
      (1L, words("a", 9) + " " + span + " " + words("b", 9)),
      (2L, words("x", 7) + " " + span + " " + words("y", 11)),
      (3L, words("z", 40)),
      (4L, words("q", 3))).toDF("id", "text")
    val raw = Dedup.substringDupReportDirect(docs, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val df1 = Dedup.substringDupReport(docs, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(df1 === raw, "no replicas => the ordering rule changes nothing")
  }

  test("substringDupReport: null-text docs surface unflagged (conservation)") {
    // the text-keyed group join would silently drop null-text rows (null
    // keys never equi-join); the report must route them around and keep
    // one row per input document
    val span = words("c", 12)
    val docs = Seq(
      (1L, words("a", 9) + " " + span),
      (2L, span + " " + words("y", 11)),
      (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val rep = Dedup.substringDupReport(docs, "id", "text")
      .orderBy("id").collect()
    assert(rep.length === 4, "one row per input doc incl. null texts")
    assert(rep(2).isNullAt(1) && !rep(2).getBoolean(2))
    assert(rep(3).isNullAt(1) && !rep(3).getBoolean(2),
      "two null texts are not each other's duplicates")
    assert(rep(1).getLong(1) === 12L && rep(1).getBoolean(2),
      "non-null spans still pair")
  }

  test("substringDupReport: replicas answered exactly, cross spans kept") {
    // text A (30 tokens, contains nothing shared), B embeds a 12-token
    // span of A, A is replicated twice more, T is a 3-token text with a
    // copy. The shingle machinery must only ever see the 4 DISTINCT
    // texts; replicas resolve by exact-text knowledge.
    val span = words("c", 12)
    val textA = words("a", 9) + " " + span + " " + words("b", 9) // 30 tokens
    val textB = words("x", 7) + " " + span + " " + words("y", 11)
    val docs = Seq(
      (1L, textA), (2L, textB), (3L, words("z", 40)),
      (4L, textA), (5L, textA), (7L, "x y z"), (8L, "x y z"))
      .toDF("id", "text")
    val rep = Dedup.substringDupReport(docs, "id", "text")
      .orderBy("id").collect()
    assert(rep.length === 7, "one row per input doc (conservation)")
    def row(i: Long) = rep.find(_.getLong(0) == i).get
    assert(row(1).isNullAt(1) && !row(1).getBoolean(2), "earliest A unflagged")
    assert(row(2).getLong(1) === 12L && row(2).getBoolean(2),
      "cross-text span via the rep pair")
    assert(!row(3).getBoolean(2))
    assert(row(4).getLong(1) === 30L && row(5).getLong(1) === 30L,
      "replicas share their FULL text with the earlier minimum")
    assert(!row(7).getBoolean(2) && !row(8).getBoolean(2),
      "a replica shorter than minRunTokens is not a qualifying span")
  }

  test("substringDupReportDirect: earliest copy survives, conservation holds") {
    val span = words("c", 15)
    val docs = Seq(
      (1L, words("a", 9) + " " + span),
      (2L, span + " " + words("x", 9)),
      (3L, words("q", 30)),
      (4L, words("r", 3))). // shorter than one shingle — still reported
      toDF("id", "text")
    val rep = Dedup.substringDupReportDirect(docs, "id", "text")
      .orderBy("id").collect()
    assert(rep.length === 4, "one row per input doc")
    assert(rep(0).isNullAt(1) && !rep(0).getBoolean(2), "earliest unflagged")
    assert(rep(1).getLong(1) === 15L && rep(1).getBoolean(2))
    assert(!rep(2).getBoolean(2) && !rep(3).getBoolean(2))
  }
}
