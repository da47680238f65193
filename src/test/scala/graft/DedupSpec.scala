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
    val pairs = Dedup.minHashLshPairs(docs, "id", "text", numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L))) // identical token sets always collide
    assert(pairs.contains((1L, 3L)) || pairs.contains((3L, 5L))) // near-dup likely
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc stays out
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
    val viaBlocked = Dedup.jaccardPairs(docs, "id", "text", Seq("block"),
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
}
