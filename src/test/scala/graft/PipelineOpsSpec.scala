package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, Decontaminate, Pack, Sampling}

/** Specs for the round-4 training-data pipeline additions: benchmark
  * decontamination, sequence packing, deterministic sampling/mixing, and
  * near-dup connected components.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- decontaminate

  private lazy val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon"), // shares the 3-gram "beta gamma delta"
    (2L, "zeta eta theta iota kappa"),      // clean
    (3L, "one two beta gamma delta")        // contaminated via trailing gram
  ).toDF("doc_id", "text")

  private lazy val bench = Seq(
    (100L, "xx beta gamma delta yy")
  ).toDF("doc_id", "text")

  test("decontaminate: docs sharing an n-gram with the benchmark are dropped") {
    val hits = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", n = 3)
      .as[Long].collect().toSet
    assert(hits == Set(1L, 3L))
    val clean = Decontaminate.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("decontaminate: overlap shorter than n does not contaminate") {
    // only the 2-gram "beta gamma" of doc 4 appears in bench — at n=3 clean
    val c = Seq((4L, "beta gamma unrelated tail words")).toDF("doc_id", "text")
    assert(Decontaminate.contaminatedIds(c, bench, "doc_id", "text", n = 3).isEmpty)
  }

  test("contaminationSpans: planted overlaps yield exact maximal spans") {
    // doc 1: only the middle 3-gram "beta gamma delta" is in bench →
    // coverage 1..3, one span. doc 3: trailing gram → span 2..4. doc 2
    // clean → absent. doc 5 IS a bench line → every window hits, the
    // overlapping windows merge to one whole-doc span. doc 6 carries the
    // bench gram twice with clean middle → two disjoint spans.
    val c = corpus.union(Seq(
      (5L, "xx beta gamma delta yy"),
      (6L, "beta gamma delta a b c beta gamma delta")).toDF("doc_id", "text"))
    val got = Decontaminate.contaminationSpans(c, bench, "doc_id", "text", n = 3)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, 1, 3, 3L),
      (3L, 2, 4, 3L),
      (5L, 0, 4, 5L),
      (6L, 0, 2, 3L), (6L, 6, 8, 3L)))
  }

  test("contaminationSpans: short docs use the clamped whole-doc gram, coverage stays in-doc") {
    // both sides shorter than n=3: wordNgrams clamps to one whole-text
    // gram, and the coverage least() clamp must stop at the last real
    // token (positions 0..1, not 0..2)
    val c = Seq((7L, "beta gamma"), (8L, "other words")).toDF("doc_id", "text")
    val b = Seq((100L, "beta gamma")).toDF("doc_id", "text")
    val got = Decontaminate.contaminationSpans(c, b, "doc_id", "text", n = 3)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == Set((7L, 0, 1, 2L)))
  }

  test("contaminationSpans: bench broadcasts; corpus is not shuffled below the semi-join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = Decontaminate.contaminationSpans(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.sparkPlan
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"expected a broadcast semi-join:\n$plan")
    val streamed = bhj.head.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => bhj.head.left
      case _ => bhj.head.right
    }
    assert(streamed.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      s"corpus side shuffled below the semi-join:\n$plan")
  }

  test("decontaminate: bench gram set broadcasts; corpus is not shuffled into the join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.sparkPlan
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"expected a broadcast semi-join:\n$plan")
    // the scale contract: the corpus (streamed) side reaches the semi-join
    // with NO exchange below it — shuffling the 100 TB side is the failure
    // this operator exists to avoid (the only shuffle is the distinct on
    // hit ids, ABOVE the join)
    val streamed = bhj.head.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => bhj.head.left
      case _ => bhj.head.right
    }
    val streamedShuffles = streamed
      .collect { case s: ShuffleExchangeExec => s }
    assert(streamedShuffles.isEmpty,
      s"corpus side shuffled below the semi-join:\n$plan")
  }

  test("histogram: exact power-of-two buckets, null values dropped") {
    val df = Seq(0.0, 0.5, 15.99, 16.0, 31.5, -0.25, Double.NaN)
      .toDF("v").union(Seq(Tuple1(null.asInstanceOf[java.lang.Double])).toDF("v"))
    val got = graft.operators.Profile.histogram(
        df.where(!isnan(col("v")) || col("v").isNull), "v", 16.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    // bucket -> (n, max): [-0.25]→-1, [0,0.5,15.99]→0, [16,31.5]→1
    assert(got == Map(-1L -> ((1L, -0.25)), 0L -> ((3L, 15.99)),
      1L -> ((2L, 31.5))))
  }

  test("unpivot round-trips the pivot back to the long form") {
    val long = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b")).toDF("k", "t")
    val wide = long.groupBy("k").pivot("t", Seq("a", "b")).count()
      .select(col("k"), coalesce(col("a"), lit(0L)).as("n_a"),
        coalesce(col("b"), lit(0L)).as("n_b"))
    val melted = wide.unpivot(Array(col("k")),
        Array(col("n_a"), col("n_b")), "t", "n")
      .withColumn("t", substring(col("t"), 3, 10))
      .where(col("n") > 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(melted == Set((1L, "a", 2L), (1L, "b", 1L), (2L, "b", 1L)))
  }

  test("ring negatives: never self, reproducible, and a full ring when buckets are dense") {
    val docs = (1L to 200L).toDF("doc_id")
    // one bucket: every doc must get exactly one partner per round, and
    // the successor mapping is a permutation (everyone is someone's neg)
    val one = Sampling.ringNegatives(docs, "doc_id", rounds = 2, bucketHexLen = 1)
    val rows = one.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (id, _, n) => n != id })
    val perRound = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    // with 200 docs over 16 buckets no bucket is a singleton w.h.p. — every
    // doc pairs in both rounds
    assert(perRound(1L) == (1L to 200L).toSet && perRound(2L) == (1L to 200L).toSet)
    // determinism under repartitioning
    val again = Sampling.ringNegatives(docs.repartition(13), "doc_id",
      rounds = 2, bucketHexLen = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.toSet)
    // rounds are different rings: the two partner maps must differ somewhere
    val m1 = rows.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    val m2 = rows.filter(_._2 == 2L).map(t => t._1 -> t._3).toMap
    assert(m1 != m2)
    // null ids never pair
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(null.asInstanceOf[Any]),
        org.apache.spark.sql.Row(7L), org.apache.spark.sql.Row(8L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val nn = Sampling.ringNegatives(withNull, "doc_id", rounds = 1, bucketHexLen = 1)
      .collect().map(_.getLong(0)).toSet
    assert(!nn.contains(0L) && nn.subsetOf(Set(7L, 8L)))
  }

  test("leakage-safe split: a near-dup component never straddles splits") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 10L, 20L, 30L, 40L).toDF("doc_id")
    val comp = Components.connectedComponents(pairs, nodes, "doc_id")
    val split = Sampling.splitAssign(comp, "component",
      Seq("train" -> 0.5, "test" -> 0.5))
    val straddling = split.groupBy("component")
      .agg(countDistinct(col("split")).as("k")).where(col("k") > 1).count()
    assert(straddling == 0)
    // the planted chain {1,2,3} is one component — all three share a split
    assert(split.where(col("doc_id").isin(1L, 2L, 3L))
      .select("split").distinct().count() == 1)
  }

  test("shard writer: layout honors partition dirs, file caps, and in-file sort; read-back is lossless") {
    import org.apache.spark.sql.functions.col
    val rows = (1L to 97L).map(i => (i, s"s${(i % 3)}", i % 5, i * 10))
    val df = rows.toDF("doc_id", "source", "seq_id", "n_tokens")
    val dir = java.nio.file.Files.createTempDirectory("graft-shardw").toString
    graft.operators.Pack.writeShards(df, dir, partitionCols = Seq("source"),
      sortCols = Seq("seq_id", "doc_id"), maxRecordsPerFile = 10)
    // one dir per source value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("source=s0", "source=s1", "source=s2"))
    // every data file respects the cap, and rows inside are sorted
    val files = dirs.flatMap(d => new java.io.File(s"$dir/$d").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => s"$dir/$d/${f.getName}"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val rowsIn = spark.read.parquet(f)
        .select("seq_id", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rowsIn.length <= 10, s"file $f has ${rowsIn.length} rows > cap")
      assert(rowsIn.toSeq == rowsIn.toSeq.sorted, s"file $f not sorted")
    }
    // lossless round-trip (partition column reconstructed from the dir)
    val back = spark.read.parquet(dir)
      .select("doc_id", "source", "seq_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(back == rows.toSet)
  }

  test("shard writer: a dominant source gets volume-proportional write tasks") {
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    // heavy source: 500 of 510 rows — the round-6 skew shape where one
    // task would own the whole directory
    val rows = (1L to 500L).map(i => (i, "heavy", i % 7, i)) ++
      (501L to 510L).map(i => (i, "light", i % 7, i))
    val df = rows.toDF("doc_id", "source", "seq_id", "n_tokens")
    val prepared = graft.operators.Pack.prepareShards(df,
      partitionCols = Seq("source"), sortCols = Seq("seq_id", "doc_id"),
      maxRecordsPerFile = 50)
    // AQE coalesces this kilobyte-scale shuffle to one partition (at real
    // volumes its 64MB advisory target keeps many tasks for a dominant
    // source); switch coalescing off so the spec observes the partitioning
    // writeShards actually declares
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "64") // few file_no hash collisions
    val perTask =
      try prepared
        .withColumn("pid", spark_partition_id())
        .groupBy("source", "pid").count()
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      finally {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      }
    val tasksPerSource = perTask.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._3).max)
    }
    assert(tasksPerSource("heavy")._1 > 1,
      s"heavy source serialized into ${tasksPerSource("heavy")._1} task")
    // and the split really bounds per-task volume: ~cap rows per file_no
    // stratum; allow a couple of hash collisions, never the 500-row
    // serialized shape
    assert(tasksPerSource("heavy")._2 <= 250,
      s"worst task held ${tasksPerSource("heavy")._2} rows")
    // write is unchanged semantically: lossless round-trip + cap respected
    val dir = java.nio.file.Files.createTempDirectory("graft-shardskew").toString
    graft.operators.Pack.writeShards(df, dir, partitionCols = Seq("source"),
      sortCols = Seq("seq_id", "doc_id"), maxRecordsPerFile = 50)
    val back = spark.read.parquet(dir)
      .select("doc_id", "source", "seq_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(back == rows.toSet)
    val heavyFiles = new java.io.File(s"$dir/source=heavy").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(heavyFiles.forall(f =>
      spark.read.parquet(f.getPath).count() <= 50))
  }

  test("bloom decontaminate: identical result to the exact operator") {
    val exact = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", n = 3)
      .as[Long].collect().toSet
    val bloom = Decontaminate.contaminatedIdsBloom(corpus, bench, "doc_id", "text", n = 3)
      .as[Long].collect().toSet
    assert(bloom == exact && bloom == Set(1L, 3L))
    val clean = Decontaminate.decontaminateBloom(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("bloom decontaminate: deliberately undersized filter still exact (verify strips FPs)") {
    // 60 docs, 3 planted contaminated; expectedItems=1 saturates the sketch
    // so might_contain fires on many non-hits — the exact verify join must
    // strip every false positive
    val big = spark.range(60).selectExpr("id AS doc_id",
      "concat('w', id, ' w', id+1, ' w', id+2, ' w', id+3) AS text")
      .union(Seq((100L, "p q r s"), (101L, "x p q r"), (102L, "p q r zz"))
        .toDF("doc_id", "text"))
    val b2 = Seq((999L, "p q r t")).toDF("doc_id", "text")
    val exact = Decontaminate.contaminatedIds(big, b2, "doc_id", "text", n = 3)
      .as[Long].collect().toSet
    val bloom = Decontaminate.contaminatedIdsBloom(big, b2, "doc_id", "text",
      n = 3, expectedItems = 1L).as[Long].collect().toSet
    assert(exact == Set(100L, 101L, 102L))
    assert(bloom == exact)
  }

  test("bloom decontaminate: empty bench yields no hits (null sketch path)") {
    val none = bench.where(col("doc_id") < 0)
    assert(Decontaminate.contaminatedIdsBloom(corpus, none, "doc_id", "text",
      n = 3).isEmpty)
  }

  test("bloom decontaminate: might_contain pre-filter sits map-side, below any exchange") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = Decontaminate.contaminatedIdsBloom(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.sparkPlan
    val bloomFilters = plan.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, s"expected a might_contain pre-filter:\n$plan")
    // the pre-filter must run inside the corpus scan stage: no shuffle
    // beneath it — that is the whole point of the bloom route
    val below = bloomFilters.head.collect { case s: ShuffleExchangeExec => s }
    assert(below.isEmpty, s"might_contain filter above a shuffle:\n$plan")
  }

  // ---------------------------------------------------------------- boilerplate

  test("boilerplate: corpus-frequent n-grams flagged; gram shuffle reused") {
    import graft.operators.Boilerplate
    // "common header text" appears in all 6 docs (>= 5) -> boilerplate;
    // the other two 3-grams of each doc are unique to it
    val docs = (1L to 6L).map(i => (i, s"common header text unique$i tail$i"))
      .toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Boilerplate.stats(docs, "doc_id", "text", n = 3, minDocs = 5)
      val rows = out.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(rows.keySet == (1L to 6L).toSet)
      rows.values.foreach { case (nGrams, nBoiler, frac) =>
        assert(nGrams == 3L && nBoiler == 1L && frac == 1.0 / 3)
      }
      // the exploded gram table is shuffled ONCE: frequency agg + join-back
      // share the exchange
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"), s"expected ReusedExchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("boilerplate: one-pass CMS leg — exact-equal when wide, never misses when tight") {
    import graft.operators.Boilerplate
    // 300 docs: a planted template shared by 40 (>= minDocs 5), plus two
    // filler grams unique to each doc
    val docs = (1L to 300L).map { i =>
      val tpl = if (i <= 40) "the planted template gram " else ""
      (i, s"${tpl}u${i}a u${i}b u${i}c u${i}d")
    }.toDF("doc_id", "text")
    val exact = Boilerplate.stats(docs, "doc_id", "text", n = 3, minDocs = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // wide sketch (eps 1e-4 -> width 20k >> ~1.2k distinct grams): CMS
    // counts are exact with overwhelming margin -> identical output
    val wide = Boilerplate.statsApprox(docs, "doc_id", "text", n = 3, minDocs = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wide == exact)
    // tight sketch (heavy collisions): CMS never undercounts, so every true
    // boilerplate gram is still flagged — per-doc n_boiler can only grow
    val tight = Boilerplate.statsApprox(docs, "doc_id", "text", n = 3,
        minDocs = 5, eps = 0.05, confidence = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    tight.foreach { case (id, (nGrams, nBoiler)) =>
      assert(nGrams == exact(id)._1)
      assert(nBoiler >= exact(id)._2, s"doc $id lost a true boilerplate gram")
    }
  }

  test("boilerplate: CMS leg has NO gram shuffle — only the per-doc rollup") {
    import graft.operators.Boilerplate
    val docs = (1L to 20L).map(i => (i, s"common header text u${i}a u${i}b"))
      .toDF("doc_id", "text")
    val out = Boilerplate.statsApprox(docs, "doc_id", "text", n = 3, minDocs = 5)
    val planStr = out.queryExecution.executedPlan.toString
    val shuffles = planStr.split("\n")
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1,
      s"expected at most the idCol rollup exchange, got $shuffles:\n$planStr")
    assert(!planStr.contains("hashpartitioning(gram_h"), // never BY the gram hash
      s"gram-hash shuffle leaked into the one-pass leg:\n$planStr")
    // and it classifies the planted template like the exact form
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.forall(_ == 1L)) // "common header text" in all 20 docs
  }

  // ---------------------------------------------------------------- packing

  test("packing: concat-and-chunk assignment, offsets, oversized docs span") {
    val docs = Seq(
      (1L, "g", 100L), (2L, "g", 100L), (3L, "g", 100L), // starts: 0, 100, 200
      (4L, "g", 600L),                                   // start 300 -> seq 1
      (5L, "g", 10L),                                    // start 900 -> seq 3
      (6L, "h", 50L)                                     // separate group
    ).toDF("doc_id", "grp", "n")
    val got = Pack.assignSequences(docs, "doc_id", Seq("grp"), col("n"), budget = 256)
      .select("doc_id", "seq_id", "tok_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (0L, 0L))
    assert(got(2L) == (0L, 100L))
    assert(got(3L) == (0L, 200L)) // spills into seq 1, but STARTS in seq 0
    assert(got(4L) == (1L, 44L))  // 300 = 256 + 44
    assert(got(5L) == (3L, 132L)) // 900 = 3*256 + 132
    assert(got(6L) == (0L, 0L))   // fresh stream per group
    val stats = Pack.packStats(docs, "doc_id", Seq("grp"), col("n"), budget = 256)
      .where(col("grp") === "g" && col("seq_id") === 0)
      .select("n_docs", "seq_tokens", "fill_ratio").head()
    assert(stats.getLong(0) == 3L && stats.getLong(1) == 300L)
    assert(stats.getDouble(2) == 300.0 / 256)
  }

  test("packing: sharded group key multiplies window parallelism by k") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = (1L to 400L).map(i => (i, s"src${i % 2}", 10L))
      .toDF("doc_id", "source", "n")
    val sharded = docs.withColumn("shard", Sampling.shardFromId(col("doc_id"), 8))
    val out = Pack.assignSequences(sharded, "doc_id", Seq("source", "shard"),
      col("n"), 64)
    // the window partitions on BOTH keys — parallelism is sources × k, not
    // one task per source
    val w = out.queryExecution.sparkPlan.collect { case x: WindowExec => x }
    assert(w.nonEmpty && w.head.partitionSpec.size == 2,
      s"expected (source, shard) window partitioning:\n${out.queryExecution.sparkPlan}")
    val nGroups = out.select("source", "shard").distinct().count()
    assert(nGroups > 2 && nGroups <= 16, s"got $nGroups groups")
    // each (source, shard) group is an independent token stream: offsets
    // restart at 0 and seq_ids start at 0 per group
    val firsts = out.groupBy("source", "shard")
      .agg(min("tok_offset").as("o"), min("seq_id").as("s"))
    assert(firsts.select("o").as[Long].collect().forall(_ == 0L))
    assert(firsts.select("s").as[Long].collect().forall(_ == 0L))
  }

  test("packing: assignment is partitioning-independent") {
    val docs = (1L to 200L).map(i => (i, s"s${i % 3}", 10L + i % 7))
      .toDF("doc_id", "grp", "n")
    val a = Pack.assignSequences(docs, "doc_id", Seq("grp"), col("n"), 64)
      .select("doc_id", "seq_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Pack.assignSequences(docs.repartition(7), "doc_id", Seq("grp"), col("n"), 64)
      .select("doc_id", "seq_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  // ---------------------------------------------------------------- sampling

  test("uniformFromId matches a hand md5 and is partitioning-stable") {
    // hand-compute: top 32 bits of md5("7"), scaled
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.substring(0, 8), 16) / 4294967296.0
    val got = Seq(7L).toDF("id").select(Sampling.uniformFromId(col("id"))).head().getDouble(0)
    assert(got == expected)
    val base = (1L to 500L).toDF("id")
    val u1 = base.select(col("id"), Sampling.uniformFromId(col("id")).as("u")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val u2 = base.repartition(13).select(col("id"), Sampling.uniformFromId(col("id")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(u1 == u2)
    assert(u1.values.forall(u => u >= 0.0 && u < 1.0))
  }

  private lazy val strata = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    .toDF("doc_id", "lang")

  test("stratified sample: rates honored per stratum, nested across rates") {
    val all = Sampling.stratifiedSample(strata, "doc_id", "lang",
      Map("a" -> 1.0, "b" -> 0.0)).select("lang").as[String].collect()
    assert(all.nonEmpty && all.forall(_ == "a")) // rate 1 keeps all, rate 0 none
    // hash sampling is nested: the 25% sample is a subset of the 50% sample
    def ids(r: Double) = Sampling.stratifiedSample(strata, "doc_id", "lang",
      Map("a" -> r, "b" -> r)).select("doc_id").as[Long].collect().toSet
    val (s25, s50) = (ids(0.25), ids(0.5))
    assert(s25.subsetOf(s50))
    assert(s25.size > 100 && s25.size < 400) // ~250 expected
  }

  test("upsample: integer weights replicate exactly; fractional epoch is hash-decided") {
    val docs = (1L to 100L).map((_, "x")).toDF("doc_id", "lang")
    val threeX = Sampling.upsample(docs, "doc_id", lit(3.0))
    assert(threeX.count() == 300L)
    assert(threeX.groupBy("doc_id").count().where(col("count") =!= 3).isEmpty)
    assert(threeX.select("epoch").distinct().as[Long].collect().toSet == Set(1L, 2L, 3L))
    val mixed = Sampling.upsample(docs, "doc_id", lit(1.5))
    val n = mixed.count()
    assert(n >= 100L && n <= 200L) // 1 full epoch + ~half
    // every doc keeps epoch 1; the extra copy is epoch 2 for exactly the
    // docs whose salted uniform is below 0.5
    val extras = mixed.where(col("epoch") === 2).select("doc_id").as[Long].collect().toSet
    val expected = docs.where(Sampling.uniformFromId(col("doc_id"), ":up") < 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(extras == expected)
  }

  test("splitAssign: exhaustive, growth-stable, fraction-proportional") {
    val fracs = Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625)
    val df = (1L to 2000L).toDF("doc_id")
    val out = Sampling.splitAssign(df, "doc_id", fracs)
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L) // every row in exactly one split
    assert(counts("train") > 1600L && counts("val") > 60L && counts("test") > 60L)
    // a doc keeps its split when the corpus shrinks/grows or repartitions
    val sub = Sampling.splitAssign(df.where(col("doc_id") <= 1000).repartition(7),
        "doc_id", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = out.where(col("doc_id") <= 1000)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub == full)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(df, "doc_id", Seq("a" -> 0.5))
    }
  }

  test("exactSizeSample: exactly min(n, stratum size) rows, partitioning-stable") {
    val df = (1L to 500L).map(i => (i, if (i <= 480) "big" else "small"))
      .toDF("doc_id", "lang")
    val out = Sampling.exactSizeSample(df, "doc_id", "lang", n = 50)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 50L, "small" -> 20L)) // small stratum kept whole
    val ids1 = out.select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.exactSizeSample(df.repartition(11), "doc_id", "lang", n = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // the documented membership rule "null-id rows are never sampled" must
    // hold on BOTH type paths — the heap path (long ids) filters them in
    // its projection, the window fallback (string ids) must too, or nulls
    // would sort first and always be sampled
    val withNulls = Seq(("a", "x"), ("b", "x"), (null, "x"), (null, "x"))
      .toDF("doc_id", "lang")
    val sampled = Sampling.exactSizeSample(withNulls, "doc_id", "lang", n = 3)
      .select("doc_id").collect().map(_.getString(0))
    assert(sampled.length == 2 && !sampled.contains(null))
  }

  test("exactSizeSample: bounded-heap plan — no per-stratum window sort") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (1L to 500L).map(i => (i, if (i % 5 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val out = Sampling.exactSizeSample(df, "doc_id", "lang", n = 10)
    val plan = out.queryExecution.sparkPlan
    // the scale contract: selection is a bounded-heap aggregation (map-side
    // partial merge), NOT a full per-stratum sort — a stratum of a billion
    // rows must never land in one sorting task
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"window in exactSizeSample plan:\n$plan")
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      s"per-stratum sort in exactSizeSample plan:\n$plan")
    assert(plan.collect { case o: ObjectHashAggregateExec => o }.nonEmpty,
      s"expected bounded-heap ObjectHashAggregate:\n$plan")
    // membership is exactly the window form's rank-n set
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(Sampling.uniformFromId(col("doc_id"), ":exact"), col("doc_id"))
    val windowIds = df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10).select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == windowIds)
  }

  test("shardFromId: deterministic, in-range, and spreads a single group key") {
    val df = (1L to 200L).toDF("doc_id")
      .withColumn("shard", Sampling.shardFromId(col("doc_id"), 8))
    val shards = df.select("shard").as[Long].collect()
    assert(shards.forall(s => s >= 0 && s < 8))
    assert(shards.distinct.length == 8) // 200 ids hit all 8 shards
    val again = df.repartition(7).select("shard").as[Long].collect()
    assert(shards.sorted.sameElements(again.sorted))
  }

  // ---------------------------------------------------------------- quality gate

  test("gate: two-pass topHalf ≡ percent_rank >= 0.5, incl. ties and singletons") {
    import graft.operators.Gate
    val rnd = new scala.util.Random(7)
    // heavy ties (scores quantized to 10 levels) + a singleton stratum +
    // an all-tied stratum (rank form keeps NOTHING there: every pr = 0)
    val rows = (1L to 400L).map(i =>
      (i, s"src${i % 5}", (rnd.nextInt(10) / 8.0))) ++
      Seq((1000L, "solo", 0.01), (1001L, "flat", 0.5), (1002L, "flat", 0.5),
        (1003L, "flat", 0.5))
    val df = rows.toDF("doc_id", "source", "q")
    val got = Gate.topHalf(df, "source", "q")
      .select("doc_id").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val want = df
      .withColumn("pr", percent_rank().over(w.orderBy("q")))
      .withColumn("n", count(lit(1)).over(w))
      .where(col("pr") >= 0.5 || col("n") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.contains(1000L))                      // singleton survives
    assert(Seq(1001L, 1002L, 1003L).forall(!got.contains(_))) // all-tied drops
  }

  test("gate: plan is agg + broadcast filter — no window over the stratum") {
    import graft.operators.Gate
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (1L to 100L).map(i => (i, s"s${i % 3}", i / 100.0))
      .toDF("doc_id", "source", "q")
    val plan = Gate.topHalf(df, "source", "q").queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"window in gate plan:\n$plan")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected broadcast threshold join:\n$plan")
  }

  test("gate: sketch mode keeps roughly the top half, exactly above its boundary") {
    import graft.operators.{Gate, Percentiles}
    val df = (1L to 1000L).map(i => (i, "one", i / 1000.0)).toDF("doc_id", "source", "q")
    val kept = Gate.topHalf(df, "source", "q", Percentiles.Mode.Sketch(100))
      .select("q").as[Double].collect()
    // GK rank error <= n/accuracy = 10 ranks; boundary within [0.49, 0.51]
    assert(kept.length >= 480 && kept.length <= 520, s"kept ${kept.length}")
    val boundary = 1.0 - kept.length / 1000.0
    assert(kept.forall(_ > boundary - 1e-9))
  }

  test("quantileBins ≡ the all-integer rank form, incl. ties, singletons, and bins=3") {
    import graft.operators.Gate
    val rnd = new scala.util.Random(11)
    // heavy ties + a singleton + an all-tied stratum + null scores
    val rows = (1L to 400L).map(i =>
      (i, s"src${i % 5}", Some(rnd.nextInt(10) / 8.0))) ++
      Seq((1000L, "solo", Some(0.3)), (1001L, "flat", Some(0.5)),
        (1002L, "flat", Some(0.5)), (1003L, "flat", Some(0.5)),
        (1004L, "src0", None))
    val df = rows.toDF("doc_id", "source", "q")
    for (bins <- Seq(3, 4)) { // 3 exercises the non-dyadic case
      val got = Gate.quantileBins(df, "source", "q", bins)
        .select("doc_id", "bin").as[(Long, Int)].collect().toMap
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      val want = df.where(col("q").isNotNull)
        .withColumn("cl", rank().over(w.orderBy("q")) - 1)
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("bin", when(col("n") === 1, 0).otherwise(
          least(floor(col("cl") * bins / (col("n") - 1)), lit(bins - 1)))
          .cast("int"))
        .select("doc_id", "bin").as[(Long, Int)].collect().toMap
      assert(got == want, s"bins=$bins")
      assert(got(1000L) == 0)                       // singleton → bin 0
      assert(Seq(1001L, 1002L, 1003L).forall(got(_) == 0)) // all-tied → bin 0
      assert(!got.contains(1004L))                  // null score dropped
    }
  }

  test("quantileBins: plan is agg + broadcast map-side bin — no window") {
    import graft.operators.Gate
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (1L to 100L).map(i => (i, s"s${i % 3}", i / 100.0))
      .toDF("doc_id", "source", "q")
    val plan = Gate.quantileBins(df, "source", "q", 4).queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"window in quantileBins plan:\n$plan")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected broadcast boundary join:\n$plan")
  }

  test("quantileBins: sketch mode is tie-stable, in-range, and ~balanced") {
    import graft.operators.{Gate, Percentiles}
    val df = (1L to 1000L).map(i => (i, "one", i / 1000.0))
      .toDF("doc_id", "source", "q")
    val got = Gate.quantileBins(df, "source", "q", 4, Percentiles.Mode.Sketch(100))
      .select("q", "bin").as[(Double, Int)].collect().sortBy(_._1)
    assert(got.forall { case (_, b) => b >= 0 && b <= 3 })
    // monotone in v (tie-stable by construction: bin depends only on v)
    assert(got.sliding(2).forall { case Array((_, a), (_, b)) => a <= b })
    // GK rank error <= 10 ranks per cut → each bin holds 250 ± ~20
    val sizes = got.groupBy(_._2).view.mapValues(_.length)
    assert((0 to 3).forall(b => sizes.getOrElse(b, 0) > 200),
      s"unbalanced sketch bins: ${sizes.toMap}")
  }

  test("mixDomains: per-stratum weights with default for absent strata") {
    val docs = Seq((1L, "wiki"), (2L, "wiki"), (3L, "crawl")).toDF("doc_id", "src")
    val out = Sampling.mixDomains(docs, "doc_id", "src", Map("wiki" -> 2.0))
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("wiki") == 4L) // 2 docs x 2 epochs
    assert(out("crawl") == 1L) // default weight 1.0
  }

  test("curation projections are streaming-compatible (stateless map-side ops)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the per-row curation battery — quality score, lang ID, split
    // assignment, hash-sampling filter — must run unchanged on a stream
    // (no state, no shuffle); this is what makes the streaming ingest path
    // able to curate in-flight
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "the quick brown fox and the lazy dog"),
      (2L, "der und die das ist nicht ein"), (3L, "x"))
    val curated = Sampling.splitAssign(
      mem.toDF().toDF("doc_id", "text")
        .withColumn("q", graft.operators.TextAnalysis.qualityScore(
          graft.operators.TextAnalysis.qualityMetrics(col("text"))))
        .withColumn("lang", graft.operators.TextAnalysis.langIdGuess(col("text"))),
      "doc_id", Seq("train" -> 0.875, "val" -> 0.125))
    val q = curated.writeStream.format("memory").queryName("curated_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("curated_stream").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3), r.getString(4))).toMap
    spark.catalog.dropTempView("curated_stream")
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._2 == "en" && out(2L)._2 == "de")
    assert(out.values.forall(v => Set("train", "val").contains(v._3)))
    // batch twin produces identical values (streaming adds no semantics)
    val batch = Sampling.splitAssign(
      Seq((1L, "the quick brown fox and the lazy dog")).toDF("doc_id", "text")
        .withColumn("q", graft.operators.TextAnalysis.qualityScore(
          graft.operators.TextAnalysis.qualityMetrics(col("text"))))
        .withColumn("lang", graft.operators.TextAnalysis.langIdGuess(col("text"))),
      "doc_id", Seq("train" -> 0.875, "val" -> 0.125)).head()
    assert((batch.getDouble(2), batch.getString(3), batch.getString(4)) == out(1L))
  }

  // ---------------------------------------------------------------- components

  test("components: transitive closure over pairs, singletons survive") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val nodes = (1L to 7L).toDF("doc_id")
    val comp = Components.connectedComponents(pairs, nodes, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, // chain collapses (no 1-3 pair)
      4L -> 4L, 7L -> 7L,                            // untouched docs = singletons
      5L -> 5L, 6L -> 5L))
    val stats = Components.componentStats(pairs, nodes, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats == Map(1L -> 3L, 4L -> 1L, 5L -> 2L, 7L -> 1L))
  }

  test("survivorsBy: best copy per cluster; ties min-id; null rank loses; all-null falls back") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b")
    val df = Seq(
      (1L, Some(0.2)), (2L, Some(0.9)), (3L, Some(0.9)), // 2 wins (tie → min id)
      (4L, Some(0.1)),                                   // singleton survives
      (5L, Some(0.5)), (6L, None),                       // null loses to ranked
      (8L, None), (9L, None)                             // all-null → min id
    ).toDF("doc_id", "q")
    val got = Components.survivorsBy(df, pairs, "doc_id", "q")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(2L, 4L, 5L, 8L))
  }

  test("survivorsBy: argmax is a hash agg — no per-component window sort") {
    import org.apache.spark.sql.execution.window.WindowExec
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val df = Seq((1L, 0.1), (2L, 0.2), (3L, 0.3)).toDF("doc_id", "q")
    val plan = Components.survivorsBy(df, pairs, "doc_id", "q")
      .queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"window in survivorsBy plan:\n$plan")
  }

  test("components: endpoints missing from nodes still mediate connectivity") {
    // pairs computed on a superset: B (id 2) was filtered out of the frame,
    // but A~B and B~C must still put A and C in one component
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 3L, 9L).toDF("doc_id")
    val comp = Components.connectedComponents(pairs, nodes, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 3L -> 1L, 9L -> 9L)) // no row for absent 2
    // survivors: min PRESENT id per component survives, even when the
    // component label names a filtered-out row
    val df = Seq((3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val kept = Components.survivors(df, Seq((2L, 3L)).toDF("id_a", "id_b"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L)) // 3's component is labeled 2 (absent) — 3 survives
  }

  test("components: matches brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter(p => p._1 != p._2)
      // reference union-find
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (1 to n).map(i => i.toLong -> find(i).toLong).toMap
      val got = Components.connectedComponents(
          edges.toDF("id_a", "id_b"), (1L to n.toLong).toDF("doc_id"), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("packing: matches a sequential per-group fold on random inputs") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 300L).map(i => (i, s"g${rnd.nextInt(4)}", rnd.nextInt(500).toLong + 1))
    val expected = docs.groupBy(_._2).flatMap { case (_, rows) =>
      rows.sortBy(_._1).foldLeft((0L, List.empty[(Long, Long)])) {
        case ((cum, acc), (id, _, tok)) => (cum + tok, (id, cum / 128) :: acc)
      }._2
    }.toMap
    val got = Pack.assignSequences(docs.toDF("doc_id", "grp", "n"),
        "doc_id", Seq("grp"), col("n"), budget = 128)
      .select("doc_id", "seq_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("components: reliable checkpointing converges to the same labels") {
    // checkpointDir routes the per-round materialization through reliable
    // checkpoint() (executor-loss-safe at cluster scale) — results must be
    // identical to the localCheckpoint default
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
      val nodes = (1L to 8L).toDF("doc_id")
      val local = Components.connectedComponents(pairs, nodes, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = Components.connectedComponents(pairs, nodes, "doc_id",
          checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      assert(local(4L) == 1L && local(7L) == 6L)
      // the reliable run actually wrote checkpoint data to the shared dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no reliable checkpoint files written")
      // ...and reclaimed every SUPERSEDED round (Spark itself never
      // deletes reliable checkpoint files): what remains is exactly the
      // edge list + the final labels — O(touched), not O(rounds)
      val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(rddDirs == 2,
        s"expected 2 surviving checkpoints (edges + final labels), got $rddDirs")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("weighted sample: edge weights, expectation, repartition-stable, null drops") {
    import graft.operators.Sampling
    val df = (1L to 2000L).map(i => (i,
      if (i <= 500) 0.0 else if (i <= 1000) 1.0
      else if (i <= 1500) 0.5 else Double.NaN)).toDF("id", "w")
      .withColumn("w", when(isnan(col("w")), lit(null)).otherwise(col("w")))
    val kept = Sampling.weightedSample(df, "id", "w")
      .select("id").as[Long].collect().toSet
    assert(!kept.exists(_ <= 500), "weight 0 must keep nothing")
    assert((501L to 1000L).forall(kept), "weight 1 must keep everything")
    val half = (1001L to 1500L).count(kept)
    assert(half > 200 && half < 300, s"weight 0.5 kept $half of 500")
    assert(!kept.exists(_ > 1500), "null weight must never keep")
    // decisions depend only on (id, salt, weight): partitioning-independent
    val kept2 = Sampling.weightedSample(df.repartition(7), "id", "w")
      .select("id").as[Long].collect().toSet
    assert(kept2 == kept)
  }

  test("keywords: tf/df ranking hand-computed; tf exchange shared with df") {
    val df = Seq(
      (1L, "spark spark spark rare common"),
      (2L, "common words common words common"),
      (3L, "rare common other other")
    ).toDF("doc_id", "text")
    val got = graft.operators.Keywords.topTerms(df, "doc_id", "text", k = 2)
    val byDoc = got.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)).map(r =>
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // doc 1: spark tf=3 df=1 -> 3.0; rare tf=1 df=2 -> 0.5
    assert(byDoc(1L).head == ("spark", 3L, 1L, 3.0))
    assert(byDoc(1L)(1) == ("rare", 1L, 2L, 0.5))
    // doc 2: common tf=3/df=3 -> 1.0, words tf=2/df=1 -> 2.0: words ranks first
    assert(byDoc(2L).head._1 == "words" && byDoc(2L)(1)._1 == "common")
    // doc 3: other tf=2 df=1 -> 2.0 first; tie rare(0.5) vs common? common
    // tf=1 df=3 -> 1/3 < rare 0.5 -> rare second
    assert(byDoc(3L).map(_._1).toSeq == Seq("other", "rare"))
    // the (doc, term) tf exchange feeds BOTH the df aggregation and the
    // join probe side — ReuseExchange must compute it once
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"tf exchange not shared between tf and df consumers:\n$plan")
  }

  test("components: long path converges within maxIter; survivors keep min per cluster") {
    val n = 12L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b") // path 1-2-...-12
    val df = (1L to n).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val comp = Components.connectedComponents(pairs, df.select("doc_id"), "doc_id")
      .collect().map(r => r.getLong(1)).toSet
    assert(comp == Set(1L)) // one component labeled by the min id
    val kept = Components.survivors(df, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("bigram rarity: hand-computed smoothed probabilities, short-doc rule") {
    // corpus: c1(a)=3, c1(b)=3, c1(c)=1, c1(z)=1, V=4
    // bigram counts: (a,b)=3, (b,a)=1, (b,c)=1
    // p(a,b)=(3+1)/(3+4)=4/7; p(b,a)=p(b,c)=(1+1)/(3+4)=2/7
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = graft.operators.LmScore
      .bigramRarity(docs, "doc_id", "text", rareMaxP = 0.3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(1L) == ((3L, 1L, Some(1.0 / 3), Some(2.0 / 7))))
    assert(got(2L) == ((2L, 1L, Some(0.5), Some(2.0 / 7))))
    assert(got(3L) == ((0L, 0L, None, None)))
  }

  test("resample ffill: hourly grid, carry-forward, null before first fact, tie rule") {
    import org.apache.spark.sql.functions.{col, date_format}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), Some(5.0)),
      (1L, ts("2024-01-01 01:30:00"), Some(7.0)),
      (1L, ts("2024-01-01 01:30:00"), Some(3.0)), // same instant: max wins
      (1L, ts("2024-01-01 02:15:00"), None),       // null obs carries past
      (2L, ts("2024-01-01 05:00:00"), Some(1.0))   // exactly on the grid
    ).toDF("user_id", "ts", "value")
    val got = graft.operators.Resample
      .ffillGrid(ev, "user_id", "ts", "value", stepMinutes = 60)
      .select(col("user_id"),
        date_format(col("grid_ts"), "yyyy-MM-dd HH:mm").as("g"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00", None),      // grid point before first fact
      (1L, "2024-01-01 01:00", Some(5.0)),
      (1L, "2024-01-01 02:00", Some(7.0)), // max of the 01:30 tie carried
      (2L, "2024-01-01 05:00", Some(1.0)))) // on-grid observation visible
  }

  test("sweep concurrency: two-level prefix equals brute force; [s,e) boundary; bucket-straddling") {
    import org.apache.spark.sql.functions.col
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // intervals straddling the tiny 1-hour buckets on purpose
    val iv = Seq(
      (ts("2024-01-01 00:10:00"), ts("2024-01-01 02:10:00")),
      (ts("2024-01-01 00:40:00"), ts("2024-01-01 01:20:00")),
      (ts("2024-01-01 01:00:00"), ts("2024-01-01 01:30:00")),
      (ts("2024-01-01 01:20:00"), ts("2024-01-01 03:00:00")), // starts AT an end: no overlap with #2
      (ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00"))
    ).toDF("s", "e")
    val got = graft.operators.Sweep
      .maxConcurrency(iv, "s", "e", bucketUs = 3600000000L)
      .head()
    // open sets: [00:40,01:00)->2, [01:00,01:20)->3, [01:20,01:30)->3
    // (interval 4 replaces 2 exactly at 01:20), peak 3 first at 01:00
    assert(got.getLong(0) == 3L)
    assert(got.getTimestamp(1) == ts("2024-01-01 01:00:00"))
    // running prefix at every boundary equals the single-window brute force
    val oi = graft.operators.Sweep
      .openIntervals(iv, "s", "e", bucketUs = 3600000000L)
      .orderBy("t", "delta").select("running").as[Long].collect().toSeq
    val brute = {
      val bounds = iv.collect().flatMap(r =>
        Seq((r.getTimestamp(0).getTime, 1), (r.getTimestamp(1).getTime, -1)))
        .sortBy(x => (x._1, x._2))
      bounds.scanLeft(0L)(_ + _._2).drop(1).toSeq
    }
    assert(oi == brute)
  }

  test("sweep concurrency: randomized equivalence with brute force (seeded)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(1234)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val iv = Seq.fill(300) {
      val s = base + rnd.nextInt(10 * 86400) * 1000L // 10 days, second grain
      val len = (1 + rnd.nextInt(7200)) * 1000L      // up to 2 h
      (new java.sql.Timestamp(s), new java.sql.Timestamp(s + len))
    }.toDF("s", "e")
    val got = graft.operators.Sweep
      .openIntervals(iv, "s", "e", bucketUs = 3600000000L) // 1h buckets, many straddles
      .orderBy("t", "delta").select("running").as[Long].collect().toSeq
    val brute = {
      val bounds = iv.collect().flatMap(r =>
        Seq((r.getTimestamp(0).getTime, 1), (r.getTimestamp(1).getTime, -1)))
        .sortBy(x => (x._1, x._2))
      bounds.scanLeft(0L)(_ + _._2).drop(1).toSeq
    }
    assert(got == brute)
  }

  test("resample ffill: randomized equivalence with brute force (seeded)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(99)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ev = Seq.fill(400) {
      val k = 1L + rnd.nextInt(5)
      val t = base + rnd.nextInt(3 * 86400) * 1000L
      val v = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(1000).toDouble)
      (k, new java.sql.Timestamp(t), v)
    }.toDF("user_id", "ts", "value")
    val got = graft.operators.Resample
      .ffillGrid(ev, "user_id", "ts", "value", stepMinutes = 180)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    val brute = {
      val rows = ev.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      // collapse same-instant by max (None < Some by the operator's
      // aggregate-max rule: max over values ignoring nulls; all-null -> None)
      val collapsed = rows.groupBy(x => (x._1, x._2)).map { case ((k, t), xs) =>
        val vs = xs.flatMap(_._3)
        (k, t, if (vs.isEmpty) None else Some(vs.max))
      }.toSeq
      val step = 180L * 60000L
      collapsed.groupBy(_._1).flatMap { case (k, xs) =>
        val mn = xs.map(_._2).min; val mx = xs.map(_._2).max
        val start = mn - (mn % step)
        Iterator.iterate(start)(_ + step).takeWhile(_ <= mx).map { g =>
          val before = xs.filter(x => x._2 <= g && x._3.nonEmpty)
          val fill = if (before.isEmpty) None
                     else Some(before.maxBy(_._2)).flatMap(_._3)
          (k, g, fill)
        }
      }.toSet
    }
    assert(got == brute)
  }

  test("quality checks: planted violations counted per rule; clean rules pass") {
    import graft.operators.Checks
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(10), 100L), (2L, Some(-5), 100L),          // one range violation
      (3L, None: Option[Int], 200L),                        // null fails the predicate
      (3L, Some(7), 999L)                                   // dup key + dangling FK
    ).toDF("k", "v", "fk")
    val dim = Seq(100L, 200L).toDF("ref")
    val got = Checks.report(df, Seq(
        Checks.Unique("uk", Seq("k")),
        Checks.Predicate("v_pos", col("v") > 0),
        Checks.RefIntegrity("fk", "fk", dim, "ref")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("uk") == ((4L, 2L, false)))    // both copies of k=3 count
    assert(got("v_pos") == ((4L, 2L, false))) // -5 and null
    assert(got("fk") == ((4L, 1L, false)))    // 999 dangles
    val clean = Checks.report(df.where(col("k") === 1L), Seq(
        Checks.Unique("uk", Seq("k")),
        Checks.Predicate("v_pos", col("v") > 0)))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(clean == Map("uk" -> true, "v_pos" -> true))
  }

  test("z-order: morton key matches a bit-interleave reference") {
    import org.apache.spark.sql.functions.{col, lit}
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L), (37L, 200L))
    val got = rows.toDF("x", "y")
      .withColumn("z", graft.operators.Layout.zValue(Seq(col("x"), col("y")), 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == morton(x, y, 8), s"($x,$y)") }
  }

  test("z-order layout: per-file bounding boxes tight in BOTH dims, unlike a 1-D sort") {
    import org.apache.spark.sql.functions.col
    // uniform 64x64 grid — under a pure-x sort every file spans ALL of y
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = rows.toDF("x", "y").repartition(8)
    def fileExtents(clustered: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      clustered.write.mode("overwrite").parquet(dir)
      val exts = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val t = spark.read.parquet(f.getPath)
            .agg(org.apache.spark.sql.functions.max(col("x")) -
                 org.apache.spark.sql.functions.min(col("x")),
              org.apache.spark.sql.functions.max(col("y")) -
                 org.apache.spark.sql.functions.min(col("y"))).head()
          (t.getLong(0), t.getLong(1))
        }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      exts
    }
    val zExt = fileExtents(graft.operators.Layout
      .clusterByZ(df, Seq(col("x"), col("y")), bitsPerDim = 6,
        numFiles = Some(8)))
    val xExt = fileExtents(df.repartitionByRange(8, col("x"))
      .sortWithinPartitions(col("x")))
    assert(zExt.size > 1 && xExt.size > 1)
    // 1-D sort: y extent is the full 63 in every file; z-order: both
    // extents stay fractions of the domain
    assert(xExt.forall(_._2 == 63L))
    // range boundaries are sampled, not quadrant-aligned, so a FILE can
    // straddle one major z boundary and span a dimension — the pruning
    // win is the MEAN extent (files skipped by a 1-dim predicate on
    // average); aligned cells are 31x15, straddlers pull the mean up
    val zAvgX = zExt.map(_._1).sum.toDouble / zExt.size
    val zAvgY = zExt.map(_._2).sum.toDouble / zExt.size
    assert(zAvgX <= 45.0 && zAvgY <= 45.0,
      s"z-ordered mean per-file extents ($zAvgX, $zAvgY) should be fractions of 63")
  }

  test("epoch shuffle: per-shard permutation, deterministic, epochs decorrelate") {
    val docs = (1L to 300L).toDF("doc_id")
    val e1 = Sampling.epochShuffle(docs, "doc_id", nShards = 8, epoch = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every row present; within each shard positions are exactly 1..n
    assert(e1.map(_._1).toSet == (1L to 300L).toSet)
    e1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // shard column is shardFromId with the epoch salt
    val expectShard = docs.select(col("doc_id"),
        Sampling.shardFromId(col("doc_id"), 8, ":epoch1:s").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1.forall { case (id, sh, _) => expectShard(id) == sh })
    // deterministic under repartitioning
    val again = Sampling.epochShuffle(docs.repartition(11), "doc_id", 8, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == e1.toSet)
    // a different epoch is a different order (shards and positions move)
    val e2 = Sampling.epochShuffle(docs, "doc_id", 8, epoch = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e2 != e1.toSet)
  }

  test("gopher rules: each rule fires on its designed violation") {
    import graft.operators.GopherRules
    val prose = ("the quick brown fox jumps over the lazy dog and " * 6).trim
    val docs = Seq(
      (1L, prose),                                    // passes everything
      (2L, "short text only"),                        // word count
      (3L, Seq.fill(60)("a").mkString(" ")),          // mean word len < 3
      (4L, Seq.fill(60)("##word").mkString(" ")),     // symbol ratio
      (5L, (1 to 60).map(i => s"- bullet $i line").mkString("\n")), // bullets
      (6L, Seq.fill(60)("123").mkString(" ")),        // alpha frac + stopwords
      (7L, Seq(prose, prose, prose, "see more...").mkString("\n"))
      // 1 ellipsis line of 4 = 0.25 <= 0.3 - passes
    ).toDF("doc_id", "text")
    val out = GopherRules.profile(docs, "doc_id", "text", minWords = 40)
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, f: String) = out(id).getAs[Boolean](f)
    assert(b(1, "keep"), s"doc 1 should pass: ${out(1L)}")
    assert(!b(2, "pass_words") && !b(2, "keep"))
    assert(b(2, "pass_symbol"), "short doc violates only its own rules")
    assert(!b(3, "pass_word_len"))
    assert(!b(4, "pass_symbol"))
    assert(!b(5, "pass_bullet") && !b(5, "pass_stopwords"))
    assert(!b(6, "pass_alpha") && !b(6, "pass_stopwords"))
    assert(b(7, "pass_ellipsis") && b(7, "keep"),
      s"1 ellipsis line of 4 (0.25 <= 0.3) must pass: ${out(7L)}")
  }

  test("source reputation: verdicts on aggregate stats; filter drops whole sources") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // good: long docs, no shorts
      (1L, "good", 400L), (2L, "good", 300L),
      // spammy: short average
      (3L, "spam", 50L), (4L, "spam", 60L),
      // mixed: fine average but too many shorts (2/3 short)
      (5L, "mixed", 90L), (6L, "mixed", 80L), (7L, "mixed", 700L)
    ).toDF("doc_id", "source", "n_chars")
    val v = graft.operators.Gate.sourceReputation(docs, "source", "n_chars",
      minAvgChars = 200.0, maxShortFrac = 0.5, shortChars = 100L)
    val byS = v.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(byS("good") == ((2L, 350.0, 0.0, true)))
    assert(byS("spam")._4 == false)  // avg 55 < 200
    assert(byS("mixed")._4 == false) // avg 290 ok but short_frac 2/3 > 0.5
    val kept = graft.operators.Gate.applyReputation(docs, v, "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
    // the verdict join must be a broadcast (map-side filter at corpus scale)
    val plan = graft.operators.Gate.applyReputation(docs, v, "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("semantic decontamination: planted near-copies flagged, map-side zero-shuffle plan") {
    import spark.implicits._
    val dim = 8
    def v(seed: Int): Seq[Float] =
      Seq.tabulate(dim)(j => math.sin(seed * 13 + j * 7).toFloat)
    val bench = Seq(v(1000), v(2000))
    // corpus: two exact benchmark copies, one slight paraphrase of
    // bench(0), and unrelated rows
    val corpus = Seq(
      (1L, bench(0)), (2L, bench(1)),
      (3L, bench(0).map(x => x + 0.01f)),
      (4L, v(7)), (5L, v(8))).toDF("vec_id", "embedding")
    val got = graft.operators.Decontaminate
      .byEmbedding(corpus, "vec_id", "embedding", bench, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got(1L)._2 && got(2L)._2, "exact copies must flag")
    assert(got(1L)._1 > 0.9999 && got(2L)._1 > 0.9999)
    assert(got(3L)._2, s"paraphrase at cos ${got(3L)._1} must flag at tau 0.9")
    assert(!got(4L)._2 && !got(5L)._2, "unrelated rows must pass")
    // zero-shuffle contract: a pure projection, no Exchange/join/generate
    val plan = graft.operators.Decontaminate
      .byEmbedding(corpus, "vec_id", "embedding", bench, tau = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"semantic decontamination must stay map-side:\n$plan")
  }

  // ---------------------------------------------------------------- label propagation

  private def lpPairs(es: (Long, Long)*) = es.toSeq.toDF("id_a", "id_b")
  private def lpSeeds(ss: (Long, String)*) = ss.toSeq.toDF("doc_id", "label")
  private def lpRun(pairs: org.apache.spark.sql.DataFrame,
                    seeds: org.apache.spark.sql.DataFrame,
                    rounds: Int): Map[Long, String] =
    Components.labelPropagate(pairs, seeds, "doc_id", "label", rounds)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("label propagation: chain spreads round by round; equidistant tie -> label asc") {
    // 1x — 2 — 3 — 4 — 5y: round 1 labels 2/4, round 2 reaches 3 with a
    // 1-1 conflict (x from 2, y from 4) — the pinned rule takes 'x'
    val pairs = lpPairs((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = lpSeeds(1L -> "x", 5L -> "y")
    assert(lpRun(pairs, seeds, 0) == Map(1L -> "x", 5L -> "y"))
    assert(lpRun(pairs, seeds, 1) ==
      Map(1L -> "x", 2L -> "x", 4L -> "y", 5L -> "y"))
    assert(lpRun(pairs, seeds, 2) ==
      Map(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "y", 5L -> "y"))
    // the documented LPA boundary: synchronous re-voting can OSCILLATE
    // at ties — round 3 flips 4 to 'x' (neighbors 3:x, 5:y tie, label
    // asc). rounds is a model parameter (label influence radius), not a
    // convergence knob; the oracle replays the same fixed-round model.
    assert(lpRun(pairs, seeds, 3) ==
      Map(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "x", 5L -> "y"))
  }

  test("label propagation: majority outvotes; seeds are clamped") {
    // node 10 has two 'y' neighbors and one 'x' neighbor -> 'y';
    // seed 20 is surrounded by 'x' voters but keeps its clamped 'y'
    val pairs = lpPairs((10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 3L))
    val seeds = lpSeeds(1L -> "x", 2L -> "y", 3L -> "y", 20L -> "y")
    val got = lpRun(pairs, seeds, 1)
    assert(got(10L) == "y", s"majority must win, got $got")
    assert(got(20L) == "y", "seed label must stay clamped")
    // 1/2/3 are seeds themselves: clamped regardless of neighbor votes
    assert(got(1L) == "x" && got(2L) == "y" && got(3L) == "y")
  }

  test("label propagation: components with no seed stay unlabeled") {
    val pairs = lpPairs((1L, 2L), (98L, 99L))
    val seeds = lpSeeds(1L -> "x")
    val got = lpRun(pairs, seeds, 3)
    assert(got == Map(1L -> "x", 2L -> "x"),
      s"the seedless 98—99 component must stay absent, got $got")
  }

  test("A-ES weighted exact-k: size, determinism, weight monotonicity") {
    val df = (1L to 300L).map(i => (i, if (i <= 10) 1000.0 else 1.0))
      .toDF("id", "w")
    val a = Sampling.weightedSampleExactK(df.repartition(1), "id", "w", 20)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSampleExactK(df.repartition(11), "id", "w", 20)
      .select("id").as[Long].collect().toSet
    assert(a === b, "partitioning-stable")
    assert(a.size === 20)
    // each heavy row beats each light row unless its exponential draw is
    // ~1000x unlucky; all 10 in a 20-slot sample is the overwhelming case
    assert((1L to 10L).toSet.subsetOf(a),
      s"1000x-weighted rows must dominate the sample, got $a")
  }

  test("A-ES: power-of-two weight rescale keeps the exact same sample") {
    val df = (1L to 200L).map(i => (i, (1 + i % 7).toDouble)).toDF("id", "w")
    val base = Sampling.weightedSampleExactK(df, "id", "w", 25)
      .select("id").as[Long].collect().toSeq
    val scaled = Sampling.weightedSampleExactK(
      df.withColumn("w", col("w") * lit(4.0)), "id", "w", 25)
      .select("id").as[Long].collect().toSeq
    assert(base === scaled, "e/4 for every row cannot change the order")
  }

  test("A-ES: null, zero, and negative weights never sample") {
    val df = Seq((1L, Some(2.0)), (2L, Some(0.0)), (3L, Some(-1.0)),
      (4L, None), (5L, Some(1.0))).toDF("id", "w")
    val got = Sampling.weightedSampleExactK(df, "id", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 5L))
  }
}
