package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.api.{CacheDecision, IndexBuilder, SemanticSearch}
import graft.embed.HashingTfEmbedder
import graft.filter.FilterDsl
import graft.functions.TextHashFunctions._
import graft.ingest.WorkoutCorpus
import graft.multimodal.Multimodal
import graft.operators.{Ann, Dedup, Percentiles, Profile, RangeJoin, Skew, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here has a matching DuckDB oracle in [[oracleSql]] unless it
  * depends on the pluggable embedder (scores are model-relative — SURVEY
  * §7.4.1) or on non-SQL plumbing (multimodal batching); those run as
  * rows-only checks.
  *
  * Float-parity design: the driver's checker compares doubles BIT-EXACTLY, so
  * every float column is produced either by (a) exact arithmetic (decimal
  * sums, integer-valued doubles), or (b) the identical sequence of IEEE
  * double ops in both engines (cosine = in-order fold — verified bit-equal
  * against DuckDB's `list_sum`-based fold).
  */
object SparkEntry {

  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Canonicalize `ts` to a session-zone TimestampType regardless of how the
    * parquet writer encoded it. TIMESTAMP(NANOS) reaches Spark as LongType
    * under the nanos-as-long legacy conf — re-derive micros with integer
    * floor division (no double round-trip, which would lose precision above
    * 2^53 ns). timestamp[us]/[ms] annotated columns arrive as
    * Timestamp(NTZ)Type and only need a cast: the session timezone is pinned
    * UTC, so the NTZ wall clock IS the epoch-micros instant DuckDB's
    * `epoch_us(ts)` reads from the same file. Works on batch and streaming
    * frames alike (it is pure schema dispatch + projection).
    */
  private[graft] def canonTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  private def events(s: SparkSession, dir: String): DataFrame = {
    // harmless when the file carries annotated timestamps; required to read
    // the TIMESTAMP(NANOS) form at all
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    canonTs(rd(s, dir, "events"))
  }

  private val dec = DecimalType(18, 2)

  /** The entity-resolution demo's two derived "source systems" of the
    * customer table (q235/q238/q260/q261 share them): billing keeps odd
    * keys only, uppercases names (missing for every 3rd), floors
    * balances to dollars, degrades segment for every 5th. The integer
    * FLOOR-to-dollar `x - ((x%100+100)%100)` is the same expression
    * text both engines run (`%` keeps dividend sign on both; `div`
    * would truncate where DuckDB's `//` floors). `a_band` is the a
    * side's cents floored to the same dollar grid — the refinement
    * column q260's banded blocking joins on.
    */
  private def erSides(s: SparkSession, dir: String,
                      sampleCap: Long = Long.MaxValue): (DataFrame, DataFrame) = {
    val cust = rd(s, dir, "customer")
      .where(col("c_custkey") <= sampleCap)
    val cents = round(col("c_acctbal") * 100).cast("long")
    def band(c: org.apache.spark.sql.Column) = c - ((c % 100 + 100) % 100)
    val a = cust.select(col("c_nationkey").as("nation"),
      col("c_custkey").as("a_key"), col("c_name").as("a_name"),
      col("c_mktsegment").as("a_seg"), cents.as("a_cents"),
      band(cents).as("a_band"))
    val b = cust.where(col("c_custkey") % 2 === 1)
      .select(col("c_nationkey").as("nation"),
        col("c_custkey").as("b_key"),
        when(col("c_custkey") % 3 =!= 0, upper(col("c_name"))).as("b_name"),
        when(col("c_custkey") % 5 === 0, lit("UNKNOWN"))
          .otherwise(col("c_mktsegment")).as("b_seg"),
        band(cents).as("b_cents"))
    (a, b)
  }

  /** Fellegi-Sunter integer agree/disagree/missing weights over the
    * joined (a, b) row — shared by the whole ER family.
    */
  private def erFieldScores: Seq[org.apache.spark.sql.Column] = Seq(
    when(col("b_name").isNull, 0L)
      .when(upper(col("a_name")) === col("b_name"), 6L).otherwise(-6L),
    when(col("a_cents") === col("b_cents"), 4L)
      .when(abs(col("a_cents") - col("b_cents")) <= 100L, 2L).otherwise(-3L),
    when(col("b_seg") === "UNKNOWN", 0L)
      .when(col("a_seg") === col("b_seg"), 1L).otherwise(-2L))

  /** Stateful streaming queries materialize one state store per shuffle
    * partition PER STATEFUL OPERATOR (a stream-stream join keeps four).
    * The state-partition count is a deployment knob like the checkpoint
    * dir: a 1000-executor run wants hundreds for state-size parallelism, a
    * bounded gate corpus wants few — at sf0.1 the 32-partition default
    * spends 3-4x the query's wall time on store setup/commit (measured on
    * q80: ~25 s at 32 partitions vs ~4 s at 4). Streaming gate queries run
    * their plan-and-start under a bounded count; the conf is restored after
    * (it is captured at stream planning time, so batch queries see the
    * original value).
    */
  private[graft] def withStreamPartitions[T](s: SparkSession, n: Int = 8)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Drain a finished memory-sink table into a plain local DataFrame and
    * drop the temp view (a leaked view per invocation otherwise outlives
    * the query in the shared session catalog).
    */
  private def drainSink(s: SparkSession, sink: String): DataFrame = {
    val out = s.table(sink)
    val result = s.createDataFrame(out.collectAsList(), out.schema)
    s.catalog.dropTempView(sink)
    result
  }

  /** q53/q70/q86 gate the same windowed aggregation through different
    * sinks/batching; the projection lives once for the same reason as
    * [[streamIntervalJoin]].
    */
  private def windowedCountsSelect(df: DataFrame): DataFrame =
    df.select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
      col("event_type"), col("n_events"),
      col("sum_value").cast("double").as("sum_value"))

  /** Shared body of q80/q81 — the clicks→purchases interval join as a real
    * StreamingQuery; the two gated rows differ ONLY in the join type, so
    * the condition/watermark/plumbing live once (a fix applied to one
    * cannot silently miss the other).
    */
  private def streamIntervalJoin(s: SparkSession, dir: String,
                                 joinType: String, tag: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val sink = tag + "_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    def side(): DataFrame = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .transform(canonTs)
    val clicks = side().where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = side().where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    withStreamPartitions(s) {
      val q = clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
          joinType)
        .select(col("click_id"), col("purchase_id"))
        .writeStream.outputMode("append").format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainSink(s, sink)
  }

  /** Read + round-robin repartition: the testdata files are single
    * row-group parquet (unsplittable scans), so per-row-expensive operators
    * would otherwise run on one core. The tiny exchange buys full-width
    * parallelism; on a real multi-file corpus the scan splits by itself and
    * this becomes a near-no-op rebalance.
    */
  private def rdPar(s: SparkSession, dir: String, name: String): DataFrame = {
    val parts = s.sessionState.conf.numShufflePartitions
    rd(s, dir, name).repartition(parts)
  }

  /** Fetch stored vectors by id in ONE filtered job (a per-id head() would
    * scan the table once per vector); fails loudly if an id is absent.
    */
  private def storedVecs(emb: DataFrame, ids: Int*): Seq[Seq[Float]] = {
    val got = emb.where(col("vec_id").isin(ids.map(_.toLong): _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    ids.map(id => got.getOrElse(id.toLong,
      throw new NoSuchElementException(s"stored vector vec_id=$id not found")))
  }

  /** Shared cosine SQL fragment for the DuckDB oracles: MUST fold in element
    * order in double precision, exactly like
    * [[graft.functions.CosineSimilarity]].
    */
  /** Squared-L2 list fold (mirrors Ann.l2Sq: per-element double cast BEFORE
    * the subtraction, summed in list order).
    */
  private def l2Sql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       |     * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))""".stripMargin

  /** Inner product in index order — the numerator of [[cosSql]], the twin
    * of the codegen DotProduct's double fold.
    */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |    * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin

  private def sqlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(",")

  // ---- shared text-analysis oracle fragments. q15/q16/q25 gate the stages
  // and q57 gates their composition; single definitions keep the composite
  // oracle coupled to the stage oracles (editing one cannot silently leave a
  // stale transcription behind).

  /** Stopword-hit count over a `text` column (mirrors TextAnalysis.hitCount
    * over `tokens(text)`).
    */
  private def stopHitsSql(ws: Seq[String]): String =
    s"len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x IN (${sqlList(ws)})))"

  /** Per-language hit columns (pairs with [[langCaseSql]]). */
  private val langHitsSql: String =
    s"""${stopHitsSql(TextAnalysis.StopwordsEn)} AS en,
       |  ${stopHitsSql(TextAnalysis.StopwordsDe)} AS de,
       |  ${stopHitsSql(TextAnalysis.StopwordsEs)} AS es,
       |  ${stopHitsSql(TextAnalysis.StopwordsFr)} AS fr""".stripMargin

  /** Language decision over en/de/es/fr hit columns (mirrors
    * TextAnalysis.langIdGuess tie order).
    */
  private val langCaseSql: String =
    """CASE WHEN greatest(en, de, es, fr) = 0 THEN 'und'
      |  WHEN en = greatest(en, de, es, fr) THEN 'en'
      |  WHEN de = greatest(en, de, es, fr) THEN 'de'
      |  WHEN es = greatest(en, de, es, fr) THEN 'es'
      |  ELSE 'fr' END""".stripMargin

  /** Quality metric select-list over `text` (aliases n_chars/n_toks/n_punct/
    * n_digits/n_stop; mirrors TextAnalysis.qualityMetrics).
    */
  /** Shared by q106 (batch max_by merge) and q112 (streaming
    * mapGroupsWithState merge): ONE transcription of the latest-wins
    * semantics — base corpus at version 1 plus a doc_id%3 refresh batch at
    * version 2; exactly the newest (version, prio) row per key survives.
    */
  private val latestWinsOracleSql: String =
    """WITH base AS (SELECT doc_id, text, lang, source, n_chars,
      |  CAST(1 AS BIGINT) AS version, 0 AS prio FROM documents),
      |upd AS (SELECT doc_id, text, 'xx' AS lang, source,
      |  n_chars + 1000 AS n_chars, CAST(2 AS BIGINT) AS version, 1 AS prio
      |  FROM documents WHERE doc_id % 3 = 0),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
      |SELECT doc_id, text, lang, source, n_chars, version FROM u
      |QUALIFY row_number() OVER (PARTITION BY doc_id
      |  ORDER BY version DESC, prio DESC) = 1""".stripMargin

  /** The unified dedup-first MinHash-LSH oracle — q23's LSH machinery
    * over DISTINCT texts' min-id representatives plus integer replica
    * multiplicities (cross-group n_a·n_b, within-group C(n,2)); all
    * counts integer so the twin is exact. Shared by q23 (the unified
    * default entry) and q266 (the pre-unification alias-name pin).
    */
  private val lshDedupFirstSql: String =
    """WITH g AS (SELECT min(doc_id) AS doc_id, text, count(*) AS n
      |  FROM documents GROUP BY text),
      |th AS (
      |  SELECT g.doc_id, CAST(('0x' || substring(md5(t.t), 1, 8)) AS BIGINT) AS h
      |  FROM g, unnest(list_distinct(string_split(g.text, ' '))) AS t(t)),
      |mh AS (
      |  SELECT doc_id, i.i AS hash_idx,
      |    min(((2 * i.i + 1) * h + i.i * 40503) % 4294967311) AS minhash
      |  FROM th, range(16) i(i)
      |  GROUP BY 1, 2),
      |sig AS (SELECT doc_id, list(minhash ORDER BY hash_idx) AS s FROM mh GROUP BY doc_id),
      |bands AS (SELECT doc_id, b.b AS band,
      |    md5(array_to_string(s[b.b * 8 + 1 : b.b * 8 + 8], ',')) AS bucket
      |  FROM sig, range(2) b(b)),
      |xg AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    count(*) AS n_shared_bands
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
      |    AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT xg.id_a, xg.id_b,
      |  CAST(xg.n_shared_bands AS BIGINT) AS n_shared_bands,
      |  CAST(ga.n * gb.n AS BIGINT) AS n_pairs
      |FROM xg JOIN g ga ON ga.doc_id = xg.id_a
      |  JOIN g gb ON gb.doc_id = xg.id_b
      |UNION ALL
      |SELECT doc_id, doc_id, CAST(2 AS BIGINT),
      |  CAST((n * (n - 1)) // 2 AS BIGINT)
      |FROM g WHERE n >= 2""".stripMargin

  private val qualityMetricsSql: String =
    s"""CAST(length(text) AS DOUBLE) AS n_chars,
       |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_toks,
       |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
       |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS n_digits,
       |  CAST($allStop4HitsSql AS DOUBLE) AS n_stop""".stripMargin

  private lazy val allStop4HitsSql: String = stopHitsSql(
    TextAnalysis.StopwordsEn ++ TextAnalysis.StopwordsDe
      ++ TextAnalysis.StopwordsEs ++ TextAnalysis.StopwordsFr)

  /** 0..1 score over the [[qualityMetricsSql]] aliases (mirrors
    * TextAnalysis.qualityScore weights).
    */
  private val qualityScoreSql: String =
    """least(n_chars / 200.0, 1.0) * 0.4
      |  + least(n_stop * 10.0 / greatest(n_toks, 1.0), 1.0) * 0.4
      |  + (1.0 - least(n_punct * 4.0 / greatest(n_chars, 1.0), 1.0)) * 0.1
      |  + (1.0 - least(n_digits * 4.0 / greatest(n_chars, 1.0), 1.0)) * 0.1""".stripMargin

  /** BPE-ish token count over `text` (mirrors TextAnalysis.bpeishTokenCount). */
  private val bpeishCountSql: String =
    """CAST(coalesce(list_sum(list_transform(
      |    list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0),
      |    w -> CAST(ceil(len(w) / 4.0) AS BIGINT))), 0) AS BIGINT)""".stripMargin

  /** Blocked word-set Jaccard pair CTEs (`g`, `jp`) over `table` — the q39
    * prefix-path pair graph; q62/q68 build their component closures and q69
    * its composed pipeline on the same fragment so the oracles cannot
    * drift apart.
    */
  private def prefixPairsSqlOn(table: String): String =
    s"""g AS (SELECT doc_id, lang, source,
      |  list_distinct(string_split(text, ' ')) AS grams FROM $table),
      |jp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS jaccard
      |  FROM g a JOIN g b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)""".stripMargin

  private val prefixPairsSql: String = prefixPairsSqlOn("documents")

  /** Portable shard id in [0, k): top-32 md5 bits of (id || salt) mod k
    * (mirrors [[graft.operators.Sampling.shardFromId]] — integer
    * arithmetic, bit-portable).
    */
  private def shardSql(idExpr: String, k: Int, salt: String = ":shard"): String =
    s"(CAST(('0x' || substring(md5(CAST($idExpr AS VARCHAR) || '$salt'), 1, 8)) AS BIGINT) % $k)"

  /** The DuckDB twin of [[ingestSummary]] over the reference CSV — shared
    * by q49 (CSV path) and q73 (JSONL round-trip path).
    */
  private val csvIngestOracleSql: String =
    """SELECT SPORT_TYPE, DIFFICULTY, count(*) AS n,
      |  CAST(sum(MOVING_TIME_SECONDS) AS BIGINT) AS sum_secs,
      |  count(DISTANCE_METERS) AS n_dist,
      |  min(DISTANCE_METERS) AS min_dist,
      |  max(DISTANCE_METERS) AS max_dist,
      |  strftime(max(CAST(CREATED_AT AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS max_created
      |FROM read_csv('/root/reference/00_sample_workout_data.csv',
      |  header=true, quote='"', escape='"',
      |  columns={'ID':'VARCHAR','EMBED_STR':'VARCHAR','SPORT_TYPE':'VARCHAR',
      |    'DIFFICULTY':'VARCHAR','MOVING_TIME_SECONDS':'INTEGER',
      |    'DISTANCE_METERS':'INTEGER','GENERATION_MODEL':'VARCHAR',
      |    'WORKOUT_SOURCE':'VARCHAR','STORE_VERSION':'VARCHAR',
      |    'RAW_JSON_STR':'VARCHAR','CREATED_AT':'VARCHAR'})
      |GROUP BY 1, 2""".stripMargin

  /** The shared typed-ingest summary over a [[WorkoutCorpus]] frame —
    * q49 (CSV) and q73 (JSONL round-trip) aggregate identically so their
    * oracles can assert both formats land in one canonical shape.
    */
  private def ingestSummary(corpus: DataFrame): DataFrame =
    corpus.groupBy("SPORT_TYPE", "DIFFICULTY")
      .agg(count(lit(1)).as("n"),
        sum("MOVING_TIME_SECONDS").as("sum_secs"),
        count(col("DISTANCE_METERS")).as("n_dist"),
        min(col("DISTANCE_METERS")).as("min_dist"),
        max(col("DISTANCE_METERS")).as("max_dist"),
        date_format(max(col("CREATED_AT")), "yyyy-MM-dd HH:mm:ss").as("max_created"))

  /** 60-bit SimHash CTE (`sh(doc_id, simhash)`) — mirrors
    * [[graft.functions.SimHash60]]: per-OCCURRENCE token votes over the top
    * 60 md5 bits, bit set iff the vote sum is positive. Shared by q24
    * (values) and q71 (pairs) so the two oracles cannot drift.
    */
  private val simhashSql: String =
    """toks AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(t.t), 1, 15)) AS BIGINT) AS h
      |  FROM documents, unnest(string_split(text, ' ')) AS t(t)),
      |votes AS (
      |  SELECT doc_id, b.b AS b,
      |    sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM toks, range(60) b(b) GROUP BY 1, 2),
      |sh AS (SELECT doc_id,
      |  CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      |FROM votes GROUP BY doc_id)""".stripMargin

  /** The q160/q161 sketch input: one `(source, posting)` row per token
    * occurrence, posting = "doc_id:token" — the distinct-(doc, token)
    * incidence whose cardinality is the inverted-index size (q139).
    */
  /** (source, posting=token trigram shingle) — the overlap-bearing item
    * the KMV family (q177/q178) sketches.
    */
  private[graft] def trigramShingles(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val sh = when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - lit(2)), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + lit(1)),
          element_at(t, i + lit(2)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("source"), explode(sh).as("posting"))
  }

  private def postingsBySource(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .select(col("source"),
        concat(col("doc_id").cast("string"), lit(":"), col("w")).as("posting"))

  /** Portable hash-uniform in [0,1): top 32 md5 bits of (id || salt),
    * scaled by 2^32 (mirrors [[graft.operators.Sampling.uniformFromId]] —
    * exact in double, so bit-portable).
    */
  private def uniformSql(idExpr: String, salt: String = ""): String = {
    val keyed = if (salt.isEmpty) s"CAST($idExpr AS VARCHAR)"
                else s"CAST($idExpr AS VARCHAR) || '$salt'"
    s"(CAST(('0x' || substring(md5($keyed), 1, 8)) AS BIGINT) / 4294967296.0)"
  }

  /** DuckDB twin of [[erSides]] + [[erFieldScores]]: the shared ER
    * CTEs (both derived source systems, with the a side's dollar band)
    * and the summed Fellegi-Sunter score expression — transcribed once,
    * used by all four ER oracles.
    */
  private def erCtesSql(sampleFilter: String = ""): String =
    s"""c AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer$sampleFilter),
      |a AS (SELECT c_nationkey AS nation, c_custkey AS a_key,
      |    c_name AS a_name, c_mktsegment AS a_seg, cents AS a_cents,
      |    cents - ((cents % 100 + 100) % 100) AS a_band FROM c),
      |b AS (SELECT c_nationkey AS nation, c_custkey AS b_key,
      |    CASE WHEN c_custkey % 3 <> 0 THEN upper(c_name) END AS b_name,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN'
      |      ELSE c_mktsegment END AS b_seg,
      |    cents - ((cents % 100 + 100) % 100) AS b_cents
      |  FROM c WHERE c_custkey % 2 = 1)""".stripMargin

  private lazy val erScoreSql: String =
    """(CASE WHEN b_name IS NULL THEN 0
      |      WHEN upper(a_name) = b_name THEN 6 ELSE -6 END)
      |    + (CASE WHEN a_cents = b_cents THEN 4
      |      WHEN abs(a_cents - b_cents) <= 100 THEN 2 ELSE -3 END)
      |    + (CASE WHEN b_seg = 'UNKNOWN' THEN 0
      |      WHEN a_seg = b_seg THEN 1 ELSE -2 END)""".stripMargin

  /** Shared CTE chain of the q275/q276 substring-run oracles: word
    * 5-shingles with positions, capped at 16 docs AND 64 total
    * occurrences per shingle (the within-doc repetition bound — same two
    * filters as [[graft.operators.Dedup.sharedShingleRuns]]), joined into
    * match points, reduced to maximal diagonal runs by gaps-and-islands. The
    * final `runs` relation has one row per (pair, diagonal, island) with
    * its consecutive-shingle count.
    */
  private def substringRunsCtes(src: String = "documents"): String =
    s"""t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      |  FROM $src),
      |s0 AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
      |  FROM t WHERE len(toks) >= 5),
      |s AS (SELECT doc_id, i - 1 AS pos,
      |    array_to_string(toks[i:i+4], ' ') AS sh FROM s0),
      |rare AS (SELECT sh FROM s GROUP BY sh
      |  HAVING count(DISTINCT doc_id) <= 16 AND count(*) <= 64),
      |sr AS (SELECT s.* FROM s JOIN rare USING (sh)),
      |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    a.pos - b.pos AS diag, a.pos AS pa
      |  FROM sr a JOIN sr b ON a.sh = b.sh AND a.doc_id < b.doc_id),
      |r AS (SELECT id_a, id_b, diag,
      |    pa - row_number() OVER (PARTITION BY id_a, id_b, diag ORDER BY pa)
      |      AS isl
      |  FROM m),
      |runs AS (SELECT id_a, id_b, diag, count(*) AS run
      |  FROM r GROUP BY id_a, id_b, diag, isl)""".stripMargin

  /** The q267/q268 mixing allowlist: relative weights, one source
    * deliberately absent from the data ("srcX" — the coverage-gap row),
    * most corpus sources deliberately unlisted (weight 0 — the
    * allowlist contract). Σw = 12; budget 300.
    */
  private val mixTargets: Seq[(String, Long)] =
    Seq("src1" -> 3L, "src2" -> 1L, "src3" -> 1L, "src17" -> 5L, "srcX" -> 2L)

  private val mixTargetsSql: String =
    "t(source, weight) AS (VALUES " + mixTargets.map {
      case (s, w) => s"('$s', $w)" }.mkString(", ") + ")"

  /** The ER threshold-calibration oracle, parameterized by an optional
    * candidate-stream predicate (q238: none — the coarse nation-only
    * stream; q261: the ±1-dollar-band window). Scores collapse to one
    * row per distinct value, cumulative windows over the bounded score
    * alphabet, precision flag by exact cross-multiplication.
    */
  private def erCalibrationSql(pairFilter: String,
                               sampleFilter: String = ""): String =
    s"""WITH ${erCtesSql(sampleFilter)},
      |p AS (SELECT a_key, b_key,
      |    $erScoreSql AS score
      |  FROM a JOIN b USING (nation)$pairFilter),
      |per AS (SELECT CAST(score AS BIGINT) AS score, count(*) AS n,
      |    CAST(sum(CASE WHEN a_key = b_key THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |  FROM p GROUP BY 1),
      |cm AS (SELECT score AS threshold,
      |    CAST(sum(pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
      |    CAST(sum(n) OVER (ORDER BY score DESC) AS BIGINT) AS n_ge,
      |    CAST(sum(pos) OVER () AS BIGINT) AS total_pos
      |  FROM per)
      |SELECT threshold, tp, n_ge - tp AS fp, total_pos - tp AS fn,
      |  CAST(tp AS DOUBLE) / CAST(n_ge AS DOUBLE) AS prec,
      |  CAST(tp AS DOUBLE) / CAST(total_pos AS DOUBLE) AS recall,
      |  tp * 100 >= 95 * n_ge AS meets_target
      |FROM cm""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the two serving paths the engine is built around: corpus
    * indexing through the fitted MLlib pipeline (the batch scale path), and
    * query embedding through the same model driver-side.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val embedder = graft.embed.MlLibEmbedder.fit(docs, "text", dim = 256)
    val index = embedder.transformCorpus(docs, "text", "EMBEDDING")
    new SemanticSearch(index, embedder, "doc_id", "text", "EMBEDDING")
      .topK("machine learning training data quality", 5)
  }

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * DRIVER-OUTPUT TYPE RULE (round-3 lesson, bisected empirically): never
    * leave a DECIMAL column in a query's final projection. The driver's hash
    * canonicalization coerces decimals asymmetrically between the Spark
    * parquet side and the DuckDB side, and any value whose fractional digits
    * end in zero ('101951.00' vs 101951.0) hash-mismatches even when
    * rows/schema/arrow-values all agree — the correlation over CORRECTNESS_r02
    * was exact (all 6 hash-fails had trailing-zero decimals; both passing
    * decimal queries had none, i.e. passed by luck). Money/metric sums are
    * still computed in exact DECIMAL arithmetic; only the FINAL column is
    * cast to DOUBLE on both sides (exact-decimal -> nearest-double is
    * correctly rounded and engine-identical — PROVIDED the unscaled decimal
    * value fits in 2^53, where both engines' conversions are exact; beyond
    * that DuckDB's int128/10^scale double path can differ from Spark's
    * BigDecimal.doubleValue by 1 ulp. Our sf0.01 sums peak around 10^9
    * unscaled; if a much larger SF ever feeds the gate, canonicalize via a
    * fixed-precision string or integer-cents column instead).
    * Confirmed by the round-3 q9x shadow bisect (CORRECTNESS_r03: decimal
    * control + order-by variants failed, double/varchar/cents/drop variants
    * passed); the shadows are deleted now the axis is proven.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational core (SURVEY §2.2/§2.4/§2.5): scan, filter, agg ----
    "q01_pricing_summary" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2))))
            .cast("double").as("sum_disc_price"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    "q02_filter_project" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .where(col("l_returnflag") === "R" && col("l_quantity").between(30, 40)
          && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") / lit(100.0)).as("price_hundreds"),
          substring(col("l_linestatus"), 1, 1).as("flag"))
    }),

    "q03_join_agg" -> ((s, dir) => {
      val o = rd(s, dir, "orders"); val c = rd(s, dir, "customer")
      val n = rd(s, dir, "nation"); val r = rd(s, dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("sum_totalprice"))
    }),

    "q04_join_topk" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
      val p = rd(s, dir, "part").where(col("p_size") > 40)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .select("l_orderkey", "l_linenumber", "p_name", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    }),

    "q05_semi_join" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      val li = rd(s, dir, "lineitem").where(col("l_quantity") === 50)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
    }),

    "q06_anti_join" -> ((s, dir) => {
      val c = rd(s, dir, "customer")
      val big = rd(s, dir, "orders").where(col("o_totalprice") > 300000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
    }),

    "q07_conditional_agg" -> ((s, dir) => {
      val highDisc = sum(when(col("l_discount") > 0.05, 1).otherwise(0))
      rd(s, dir, "lineitem").groupBy("l_linestatus")
        .agg(highDisc.as("n_high_disc"), count(lit(1)).as("n_rows"),
          (lit(100.0) * highDisc / count(lit(1))).as("pct_high_disc"))
    }),

    "q08_histogram" -> ((s, dir) => {
      rd(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium").otherwise("large"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
    }),

    "q09_window_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      rd(s, dir, "orders").withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2).select("o_custkey", "o_orderkey", "rn")
    }),

    "q10_token_explode" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .where(col("n") >= 5)
    }),

    "q11_json_extract" -> ((s, dir) => {
      events(s, dir).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    }),

    "q12_time_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).cast("double").as("sum_value"))
    }),

    "q26_distinct_agg" -> ((s, dir) => {
      events(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).cast("double").as("sum_value"))
    }),

    "q27_rollup" -> ((s, dir) => {
      // via spark.sql: exercises the SQL entry surface; DataFrame rollup over
      // a fresh join trips the ambiguous-self-join detector (dataset-id
      // metadata survives into Expand), the SQL path has no such lineage.
      rd(s, dir, "customer").createOrReplaceTempView("v_customer")
      rd(s, dir, "nation").createOrReplaceTempView("v_nation")
      rd(s, dir, "region").createOrReplaceTempView("v_region")
      s.sql("""SELECT coalesce(r_name, 'ALL') AS region,
              |  coalesce(n_name, 'ALL') AS nation, count(1) AS n_customers
              |FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey
              |JOIN v_region ON n_regionkey = r_regionkey
              |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)
    }),

    // ---- dedup operators (training-data pipeline) ----
    "q13_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(rd(s, dir, "documents"), "doc_id", "text")),

    // survivor-row form of exact dedup (left-semi join back to the corpus —
    // the "keep one copy" operation a training pipeline actually runs)
    "q46_exact_dedup_rows" -> ((s, dir) =>
      Dedup.exactDedup(rd(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")),

    // window-function family over event time: running decimal sum + lag
    // (one shuffle on user_id, both functions share the frame)
    "q47_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir).select(
        col("event_id"), col("user_id"),
        sum(col("value").cast(dec)).over(w).cast("double").as("running_value"),
        lag(col("event_id"), 1).over(w).as("prev_event"))
    }),

    // CUBE grouping-set lattice (rollup's sibling, q27)
    "q48_cube" -> ((s, dir) =>
      rd(s, dir, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))),

    "q21_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(rd(s, dir, "documents"), "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.3)),

    "q22_minhash_signatures" -> ((s, dir) => {
      Dedup.minHashSignatures(rdPar(s, dir, "documents"), "doc_id", "text", 16)
        .select(col("doc_id"), posexplode(col("minhash")))
        .select(col("doc_id"), col("pos").as("hash_idx"), col("col").as("minhash"))
    }),

    // 2 bands x 8 rows: band-collision prob = j^8, so only genuinely
    // near-duplicate pairs (j >~ 0.9) become candidates — the parameterization
    // that keeps the candidate set sub-quadratic on low-diversity corpora.
    // UNIFIED (round 14, the q276 substring precedent): minHashLshPairs
    // is dedup-first by DEFAULT now — exact duplicates collapse to a
    // min-id representative inside the operator, LSH runs over DISTINCT
    // texts, and replica mass returns as integer n_pairs multiplicities
    // (Σ n_pairs == the expanded pair-stream row count, DedupSpec). The
    // raw expanded enumeration survives as q292's bounded demo; q266
    // pins the pre-unification alias name against this same oracle.
    "q23_minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minHashLshPairs(rdPar(s, dir, "documents"), "doc_id", "text",
        numHashes = 16, bands = 2)),

    // the DIRECT (no exact-collapse) pair enumeration — the measured
    // baseline q23's unified entry is graded against, kept as a bounded
    // demo (the q281 pattern): its bucket self-join materializes
    // Σ n_a·n_b rows over replica groups (85.7x/117.6 s at 10x in the
    // r13 battery when it was the default), so the demo pins the corpus
    // to a FIXED 500-document slice. Production callers use q23's entry.
    "q292_lsh_pairs_direct" -> ((s, dir) =>
      Dedup.minHashLshPairsDirect(
        rd(s, dir, "documents").where(col("doc_id") < 500),
        "doc_id", "text", numHashes = 16, bands = 2)),

    // ---- GDPR purge PROPAGATED TO THE LEXICAL SERVING TIER — q201/
    // q202's protocol extended to the memory-resident index (round-14
    // verdict): a purge on the serving side is a REPUBLISH — amended
    // postings (rows of purged docs drop, everything else byte-equal) +
    // stats amended by exact integer subtraction load into a FRESH
    // handle, and cutover is the O(1) reference swap (the
    // DeltaPostingsIndex.fresh() rule; latency measured by
    // tools/RepublishProbe, staleness SLA in SCALE.md). The entry proves
    // the window's two sides: BEFORE the swap a purged doc is still
    // servable (probed exhaustively — k = df of one of its own terms, so
    // absence could not hide in a top-k cutoff), AFTER the swap the same
    // exhaustive probe surfaces no purged id, and the served ranking
    // equals the full-rebuild truth (q202's oracle) bit-for-bit.
    "q293_purge_republish_serve" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val postings = graft.operators.Bm25
        .buildPostings(docs, "doc_id", "text").localCheckpoint(true)
      val dstats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val (sumDl, n) = (dstats.getLong(0), dstats.getLong(1))
      val dfMap = postings.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val idf = graft.operators.Bm25.idfByTerm(dfMap, n, s)
      val avgdl = sumDl.toDouble / n.toDouble
      val purgedIds = docs.where(col("doc_id") % 13 === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val purgedSet = purgedIds.toSet
      val serving = new java.util.concurrent.atomic.AtomicReference(
        graft.serve.MemoryPostingsIndex.fromDataFrame(
          postings, "doc_id", idf, avgdl))
      // probe doc: first purged doc with a real token; probe term: its
      // first non-empty token; exhaustive k = df(term)
      val probe = docs
        .where(col("doc_id") % 13 === 0 && length(col("text")) > 0)
        .orderBy("doc_id").select("doc_id", "text").head()
      val (probeId, probeTerm) =
        (probe.getLong(0), probe.getString(1).split(" ").find(_.nonEmpty).get)
      val kAll = dfMap(probeTerm).toInt
      require(serving.get().searchWand(Seq(probeTerm), kAll)
        .exists(_._1 == probeId),
        s"q293: purged doc $probeId must be SERVABLE before the swap " +
          "(the staleness window is real)")
      // republish: deltas by subtraction -> amended artifact -> fresh
      // handle -> O(1) cutover
      val deltas = graft.operators.Forget.lexDeltas(postings, docs,
        "doc_id", "text", purgedIds)
      val n2 = n - deltas.docsDropped
      val avgdl2 = (sumDl - deltas.dlDropped).toDouble / n2.toDouble
      val df2 = graft.operators.Forget.updatedDf(dfMap, deltas)
      val idf2 = graft.operators.Bm25.idfByTerm(df2, n2, s)
      serving.set(graft.serve.MemoryPostingsIndex.fromDataFrame(
        graft.operators.Forget.purgePostings(postings, "doc_id", purgedIds),
        "doc_id", idf2, avgdl2))
      // post-swap exhaustive probe (k = the PRE-purge df): exactly the
      // surviving docs of the term must come back — never the purged
      // one, and never a vacuous pass when the term survives in no doc
      val postProbe = serving.get().searchWand(Seq(probeTerm), kAll)
      require(postProbe.size.toLong == df2.getOrElse(probeTerm, 0L) &&
        postProbe.forall(r => !purgedSet(r._1)),
        "q293: a purged doc is still servable after the republish swap " +
          s"(got ${postProbe.size} of ${df2.getOrElse(probeTerm, 0L)} survivors)")
      serving.get().searchWand(Seq("dup", "stream"), 10)
        .toDF("doc_id", "score")
    }),

    "q24_simhash" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(col("doc_id"), simhash60(split(col("text"), " ")).as("simhash"))
    }),

    // ---- SimHash PAIRS (the dedup step over q24's signatures): chunk-
    // pigeonhole candidate generation — 60 bits split into 4 chunks, any
    // pair within Hamming 3 must share an exact chunk (complete, no false
    // negatives) — verified with codegen bit_count(xor). The oracle is the
    // brute-force O(n^2) hamming join: completeness means the sets match
    // exactly. rdPar: the dominant cost is per-row signature computation
    // before any shuffle (same reasoning as q23/q40).
    "q71_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(rdPar(s, dir, "documents"), "doc_id", "text")),

    // ---- rolling-hash document fingerprint (Rabin-Karp poly_hash — the
    // order-SENSITIVE twin of q13's normalized md5 fingerprint: reordered
    // content changes it). Oracle folds per character; the transcription
    // uses codepoints, identical to the UTF-16 fold on this corpus's
    // BMP-only text (the expression itself handles any string).
    "q72_rolling_fingerprint" -> ((s, dir) =>
      rd(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.rollingFingerprint(col("text")).as("fp"))),

    // shingle→minhash→band→bucket-join over character 5-shingles — the
    // canonical MinHash input (robust to tokenization/word-order noise,
    // unlike the word tokens of q23); same bit-portable signature math.
    // Stays on the DIRECT enumeration deliberately: shingle banding at
    // 16/2 is selective on this corpus (1.5k pairs at 1x, ratio 5.1 at
    // 10x in SCALE10) and the raw (id_a, id_b) contract is the point of
    // the query; the multiplicity form is q23.
    "q58_minhash_shingles" -> ((s, dir) =>
      Dedup.minHashLshPairsDirect(rdPar(s, dir, "documents"), "doc_id", "text",
        numHashes = 16, bands = 2,
        tokensOf = t => TextAnalysis.charShingles(t, 5))),

    // high-threshold dedup through the PPJoin prefix-filtered path (the
    // 100 TB-safe route — candidates from a prefix-token equi-join, never
    // O(block^2)); jaccardPairs auto-dispatches here at threshold >= 0.5.
    // Blocked by (lang, source) — and the blocks constrain candidate
    // GENERATION, not just verification: on this near-dup-saturated corpus
    // that divides the per-token pair enumeration 76x. No rdPar: the
    // token-frequency shuffle already spreads the work
    "q39_jaccard_prefix" -> ((s, dir) =>
      Dedup.jaccardPairs(rd(s, dir, "documents"), "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)),

    // low-threshold dedup through MinHash-LSH candidate buckets + exact
    // verification (recall-approximate; the scale path when the threshold is
    // too low for prefix filtering). bands = numHashes = 16 ⇒ rows-per-band
    // 1, so candidates = pairs sharing any of the 16 minhash values — the
    // oracle replicates that candidate step exactly (bit-portable minhash,
    // proven by q22/q23). rdPar stays HERE (unlike q39): the dominant cost
    // is per-row signature computation BEFORE any shuffle, which a
    // single-row-group scan would serialize onto one core (measured 10x)
    "q40_jaccard_lsh" -> ((s, dir) =>
      Dedup.jaccardPairsLsh(rdPar(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3, blockCols = Seq("lang", "source"),
        numHashes = 16, bands = 16)),

    // embedding near-dup with the pair space bounded by (label x LSH bucket)
    // — the scale contract of embeddingNearDupPairs: a raw metadata block is
    // O(block^2); the hyperplane sub-block keeps enumeration bucket-bounded.
    // Planes are stored vectors (3, 4) so bucket assignment is bit-portable
    // to the oracle (same trick as q44); recall-approximate by contract,
    // exactly like the LSH jaccard path (q40).
    "q20_neardup_cosine" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val bucketed = Ann.withHyperplaneBuckets(emb, "embedding",
        storedVecs(emb, 3, 4))
      Dedup.embeddingNearDupPairs(bucketed, "vec_id", "embedding",
        Seq("label", "lsh_bucket"), threshold = 0.3)
        .select("id_a", "id_b", "cos")
    }),

    // ---- text analysis ----
    // the whole stat battery from ONE fused byte scan (graft.functions
    // .TextStats codegen expression) instead of per-stat regex passes —
    // values identical to the regex forms (TextStatsSpec property), so the
    // oracle keeps its regexp_replace definitions
    "q14_text_stats" -> ((s, dir) => {
      val st = graft.functions.TextStats.textStats(col("text"))
      rdPar(s, dir, "documents")
        .withColumn("_s", st)
        .select(col("doc_id"),
          col("_s.n_chars").as("n_chars"),
          (col("_s.n_spaces") + 1).as("n_tokens"),
          col("_s.n_punct").as("n_punct"),
          col("_s.n_digits").as("n_digits"),
          ((col("_s.n_chars") - col("_s.n_spaces")).cast("double")
            / (col("_s.n_spaces") + 1)).as("avg_token_len"))
    }),

    "q15_lang_id" -> ((s, dir) => {
      rdPar(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langIdGuess(col("text")).as("lang_guess"))
    }),

    "q16_bpeish_tokens" -> ((s, dir) => {
      rdPar(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_tokens_bpeish"))
    }),

    "q25_quality_score" -> ((s, dir) => {
      rdPar(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text")))
          .as("quality_score"))
    }),

    // ---- vector search (SURVEY §2.7) ----
    "q17_vector_topk" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Ann.topK(emb.where(col("vec_id") =!= 0), "vec_id", "embedding", q, 10)
        .select("vec_id", "score")
    }),

    "q18_filtered_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val docs = rd(s, dir, "documents")
      val q = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val corpus = emb.join(docs, emb("vec_id") === docs("doc_id"))
        .where(col("lang") === "en" && col("vec_id") =!= 0)
      Ann.topK(corpus, "vec_id", "embedding", q, 10)
        .select("vec_id", "lang", "score")
    }),

    "q31_topk_batch" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val qs = emb.where(col("vec_id").isin(0L, 1L, 2L))
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
        .sortBy(_._1)
      Ann.topKBatch(emb, "vec_id", "embedding", qs, 5,
        filter = !col("vec_id").isin(0L, 1L, 2L))
    }),

    "q19_cache_decision" -> ((s, dir) => {
      Dedup.jaccardPairs(rd(s, dir, "documents"), "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.3)
        .select(col("id_a"), col("id_b"), col("jaccard"),
          CacheDecision.decision(col("jaccard")).as("decision"),
          CacheDecision.rubricTier(col("jaccard")).as("tier"))
    }),

    // full Method-1 search shape with an oracle: filter DSL -> cosine
    // ranking (stored query vector) -> limit -> stringified projection
    // (01:200-219 contract); scores excluded from output so the string
    // casts stay engine-portable
    "q35_search_stringified" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings"); val docs = rd(s, dir, "documents")
      val qvec = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toSeq
      val index = emb.join(docs, emb("vec_id") === docs("doc_id"))
        .where(col("vec_id") =!= 0)
      val f = FilterDsl.compile(
        """{"@and":[{"@eq":{"lang":"en"}},{"@gte":{"n_chars":100}}]}""")
      new SemanticSearch(index, HashingTfEmbedder(64), "vec_id", "text", "embedding")
        .topKVec(qvec, 10, f)
        .select(Seq("vec_id", "lang", "source", "n_chars")
          .map(c => col(c).cast("string").as(c)): _*)
    }),

    // the reference's top-k -> join-back flow (02:342-348: top-3 search, then
    // JOIN ... ON s.ID = w.ID returning RAW_JSON_STR AS FULL_WORKOUT_JSON):
    // rank over the SLIM stored index (vec_id, embedding only), then fetch
    // the full payload from the base table by key. The 3-row ranked side is
    // broadcast, so the payload fetch is a map-side join — no shuffle of the
    // base table at any scale.
    "q38_topk_joinback" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val docs = rd(s, dir, "documents")
      val qvec = emb.where(col("vec_id") === 2).select("embedding")
        .head().getSeq[Float](0).toSeq
      val top = new SemanticSearch(emb.where(col("vec_id") =!= 2),
          HashingTfEmbedder(64), "vec_id", "text", "embedding")
        .topKVec(qvec, 3)
        .select(col("vec_id"), col("SIMILARITY_SCORE").as("score"))
      docs.join(broadcast(top), top("vec_id") === docs("doc_id"))
        .select(col("vec_id"), col("score"), col("text").as("full_doc"),
          col("lang"), col("source"))
    }),

    // as-of join (point-in-time lookup; union + carry-forward window, one
    // shuffle) — attribute each click to the user's latest prior purchase
    "q37_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
      graft.operators.AsOf.join(clicks, purchases, "user_id", "ts", Seq("purchase_id"))
        .select("event_id", "purchase_id")
    }),

    // explicit skew salting (J-family extension): hot keys scatter over 8
    // replicas of the build side; result provably equals the plain join, so
    // the plain join IS the oracle
    "q41_salted_join" -> ((s, dir) => {
      val o = rd(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
      val c = rd(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Skew.saltedJoin(o, c, "o_custkey", salt = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
    }),

    // point-in-interval range join via domain bucketing (equi-join on bucket
    // id + residual BETWEEN — never a nested-loop plan); overlapping literal
    // price bands exercise interval replication
    "q42_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = (0 until 20).map(i => (i.toLong, i * 25000.0, i * 25000.0 + 40000.0))
        .toDF("band_id", "lo", "hi")
      val o = rd(s, dir, "orders").select("o_orderkey", "o_totalprice")
      RangeJoin.pointInInterval(o, bands, "o_totalprice", "lo", "hi",
          bucketWidth = 25000)
        .groupBy("band_id").agg(count(lit(1)).as("n"))
    }),

    // global aggregates (A2/A3): COUNT(*) vs null-aware COUNT(col) over a
    // permissive JSON path (missing -> null, G3/C4), COUNT(DISTINCT), and
    // ROUND (C7; summing integer-valued doubles keeps the float exact in
    // any partition order). The repartition is load-bearing at 10x: the
    // per-row get_json_object x2 dominates, and the single-row-group
    // testdata parquet is otherwise ONE unsplittable task — the r12
    // battery measured 7.35 s (ratio 11.5) for this 1-row agg on one core
    // (the q39 lesson, ROUND_NOTES round 1).
    "q43_global_agg" -> ((s, dir) =>
      events(s, dir).select(col("props"), col("event_type"), col("value"))
        .repartition(s.sessionState.conf.numShufflePartitions).agg(
        count(lit(1)).as("n_rows"),
        count(get_json_object(col("props"), "$.missing")).as("n_missing"),
        count(get_json_object(col("props"), "$.k")).as("n_k"),
        countDistinct(col("event_type")).as("n_types"),
        sum(round(col("value"))).as("sum_round_value"))),

    // sign-bit hyperplane-LSH bucketed search (the ANN scale path, oracled:
    // stored vectors double as the query AND the hyperplanes, so bucket
    // assignment is deterministic and bit-portable to the oracle — the
    // bucket filter prunes the corpus before any scoring)
    "q44_lsh_bucket_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val Seq(qvec, p1, p2) = storedVecs(emb, 0, 3, 4)
      val planes = Seq(p1, p2)
      val corpus = Ann.withHyperplaneBuckets(
        emb.where(col("vec_id") =!= 0), "embedding", planes)
      // dot-product sign, NOT cosine sign: corpus bucketing and the oracle
      // both test dot >= 0, and the two differ for a zero-norm vector
      // (cosine NaN vs dot 0.0)
      val qBucket = planes.zipWithIndex
        .map { case (p, i) => if (Ann.dot(qvec, p) >= 0) 1L << i else 0L }.sum
      Ann.topK(corpus, "vec_id", "embedding", qvec, 5,
          col("lsh_bucket") === qBucket)
        .select("vec_id", "score")
    }),

    // IVF-pruned approximate search (the other ANN scale path, oracled:
    // deterministic first-n centroids, per-row argmax assignment, query
    // probes its 2 nearest cells; the oracle replicates assignment and
    // probing with the same fold order and tie-breaks)
    "q45_ivf_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 0)
      val qvec = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toSeq
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val withCells = Ann.withIvfAssignment(corpus, "embedding", cents)
      Ann.topKIvf(withCells, "vec_id", "embedding", "ivf_cell", cents,
          qvec, k = 5, nProbe = 2)
        .select("vec_id", "score")
    }),

    // set operators (engine extension; absent from the reference per SURVEY
    // §2.5 but part of a complete relational surface)
    "q34_set_ops" -> ((s, dir) => {
      val building = rd(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
      val bigSpenders = rd(s, dir, "orders")
        .where(col("o_totalprice") > 300000).select(col("o_custkey").as("k"))
      val inter = building.intersect(bigSpenders)
        .agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
      val exc = building.except(bigSpenders)
        .agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
      val uni = building.union(bigSpenders).distinct()
        .agg(count(lit(1)).as("n")).select(lit("union").as("op"), col("n"))
      inter.unionAll(exc).unionAll(uni)
    }),

    // exact interpolated percentiles (A-family extension) — the Exact leg of
    // the Percentiles router; right at oracle scale, memory-unbounded per
    // group at 100 TB (see q51 for the sketch leg + SCALE.md §percentiles)
    "q36_percentiles" -> ((s, dir) =>
      Percentiles.grouped(rd(s, dir, "orders"), Seq("o_orderpriority"),
        "o_totalprice", Seq(0.5, 0.9), Percentiles.Mode.Exact)),

    // sketch-based percentiles (the 100 TB leg: bounded-size GK sketches,
    // map-side partial merge — the shuffle carries sketches, not values).
    // Oracled via the exactness window: groups <= accuracy never compress,
    // so the sketch returns the ceil(p*n)-th order statistic = DuckDB's
    // quantile_disc, bit-identical raw data values.
    "q51_approx_percentiles" -> ((s, dir) =>
      Percentiles.grouped(rd(s, dir, "orders"), Seq("o_orderpriority"),
        "o_totalprice", Seq(0.5, 0.9, 0.99), Percentiles.Mode.Sketch(1000000))),

    // stateful sessionization, batch form (one shuffle, two window passes
    // sharing the user_id partitioning); streaming twin lives in
    // graft.streaming.Sessionize.streamingSessions
    "q33_sessionize" -> ((s, dir) =>
      graft.streaming.Sessionize.sessionStats(events(s, dir), gapMinutes = 30)),

    // try_cast re-typing (SURVEY §2.8 C3: the Method-1 response decode
    // pattern — stringified values cast back, null on failure). Repartition
    // first: the single-row-group scan would otherwise run on one core, and
    // the deliberately-failing cast pays a real exception-path cost
    // (~7 us/row, 3x a succeeding cast — measured), so spread it.
    "q32_try_cast" -> ((s, dir) => {
      events(s, dir).repartition(s.sessionState.conf.numShufflePartitions)
        .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("string").as("k_str"))
        .select(col("event_id"),
          col("k_str").try_cast("int").as("k"),
          concat(lit("x"), col("k_str")).try_cast("int").as("bad_int"))
    }),

    // ---- filter DSL (SURVEY §2.2 P7, §3.2) ----
    "q28_filter_dsl" -> ((s, dir) => {
      val f = FilterDsl.compile(
        """{"@and":[
          |  {"@eq":{"lang":"en"}},
          |  {"@or":[{"@gte":{"n_chars":200}},{"@contains":{"text":"data"}}]},
          |  {"@not":{"@eq":{"source":"src0"}}},
          |  {"@in":{"source":["src1","src2","src3","src4","src5","src6","src7"]}}
          |]}""".stripMargin)
      rd(s, dir, "documents").where(f)
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // full Method-1 SEARCH_PREVIEW request path (01:200-219) against the
    // PERSISTED index: embeddings.parquet is the precomputed corpus index
    // (02:404-405 — "embed the corpus once in batch; embed only the query
    // on-demand"), so no per-request corpus re-embed happens here. The
    // request carries a stored query vector (query_vector), which also makes
    // the whole request->filter->rank->stringify path DuckDB-oracle-able;
    // live-embedder `query` coverage stays in SemanticSearchSpec.
    "q29_search_preview" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings"); val docs = rd(s, dir, "documents")
      val qvec = emb.where(col("vec_id") === 1).select("embedding")
        .head().getSeq[Float](0)
      val index = emb.join(docs, emb("vec_id") === docs("doc_id"))
        .where(col("vec_id") =!= 1)
      val req =
        s"""{"query_vector":[${qvec.mkString(",")}],
           | "columns":["vec_id","lang","source","n_chars"],
           | "filter":{"@and":[{"@eq":{"lang":"en"}},{"@gte":{"n_chars":50}}]},
           | "limit":7}""".stripMargin
      new SemanticSearch(index, HashingTfEmbedder(64), "vec_id", "text", "embedding")
        .search(req)
    }),

    // the full partition-batched decode pipeline runs (mapPartitions, codec
    // init per partition, features + checksum computed — spec-covered in
    // MultimodalSpec); the projection keeps the metadata features whose
    // values are closed-form in media_id, so the driver oracle can verify
    // the pipeline output end-to-end
    "q30_multimodal_features" -> ((s, dir) => {
      Multimodal.extractFeatures(
          Multimodal.syntheticMedia(s, 300), new Multimodal.StubCodec(64))
        .toDF()
        .select("media_id", "kind", "n_bytes", "frames_sampled",
          "out_width", "out_height")
    }),

    // ---- REAL image decode end-to-end (no stub): deterministic gradient
    // images encoded through the JDK PNG writer on the executors, decoded
    // back with javax.imageio; PNG is lossless so decoded width/height and
    // the integer pixel sum equal the closed form the oracle recomputes
    // analytically. This is the q30 pipeline with the codec made real.
    "q90_imageio_decode" -> ((s, dir) =>
      Multimodal.decodeImageMeta(Multimodal.syntheticPngMedia(s, 200))
        .toDF()
        .select("media_id", "width", "height", "n_px", "px_sum", "decode_ok")),

    // ---- REAL audio decode end-to-end — the q90 pattern for the second
    // modality: deterministic 16-bit PCM waveforms encoded through the JDK
    // WAV writer on the executors, decoded back with javax.sound.sampled;
    // PCM is integer-exact, so format fields and sample stats equal the
    // closed form the oracle recomputes analytically. The multimodal stub
    // now stands in for video only.
    "q101_wav_decode" -> ((s, dir) =>
      Multimodal.decodeAudioMeta(Multimodal.syntheticWavMedia(s, 200))
        .toDF()
        .select("media_id", "sample_rate", "channels", "bits", "n_frames",
          "pcm_sum", "pcm_min", "pcm_max", "decode_ok")),

    // ---- ingest path under the gate (S1/C1: the first thing a reference
    // user runs — ref 01:111-142). Round-trips the reference's own 2,000-row
    // corpus CSV (multiline quoted fields, ""-escaped quotes, empty-string
    // ints) through readCsv's permissive load + typed cast layer, then
    // aggregates the typed columns; the oracle re-reads the same file with
    // DuckDB's CSV reader and explicit types.
    "q49_csv_ingest" -> ((s, dir) =>
      ingestSummary(
        WorkoutCorpus.readCsv(s, "/root/reference/00_sample_workout_data.csv"))),

    // ---- JSONL ingest leg of S1 (same COPY semantics over the other
    // interchange format): the reference corpus's staged string layer is
    // round-tripped through Spark's JSON-lines writer and loaded back via
    // readJsonl's permissive + typed path. Same oracle as q49 (which reads
    // the CSV directly in DuckDB) — proving CSV and JSONL land in ONE
    // canonical typed shape, the readJsonl contract. The temp staging dir
    // is deleted after the bounded summary is materialized (q70 pattern).
    "q73_jsonl_ingest" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q73").toString
      WorkoutCorpus.readCsvRaw(s, "/root/reference/00_sample_workout_data.csv")
        .write.mode("overwrite").json(s"$tmp/corpus")
      val out = ingestSummary(WorkoutCorpus.readJsonl(s, s"$tmp/corpus"))
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- batch cache write-back loop under the gate (S4/T2: ref 02:415-418
    // — generated workouts appended back to the corpus, re-deduped, counted
    // by provenance). Simulates the write-back with deterministic derived
    // rows: every 10th doc re-enters as a cache row, half with genuinely new
    // content (survives) and half duplicating existing content (deduped
    // away); survivors counted per source.
    "q50_writeback_dedup" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select("doc_id", "text", "source")
      // collision-free surrogate ids at ANY corpus size: offset past the
      // real max (a fixed +1e6 would collide once the corpus passes 1M rows
      // and silently double-count survivors in both engines); originals keep
      // the lower ids so min-id survivor semantics still prefers them
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val generated = docs.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(maxId + 1L)).as("doc_id"),
          when(col("doc_id") % 20 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"),
          lit("cache_gen").as("source"))
      Dedup.exactDedup(docs.unionByName(generated), "doc_id", "text")
        .groupBy("source").agg(count(lit(1)).as("n_survivors"))
    }),

    // ---- training-sequence construction: per-user chronological event
    // sequences (the "build documents from event streams" op an LLM data
    // pipeline runs). collect_list is unordered by contract, so the order is
    // pinned by sort_array over (ts, event_id, type) structs BEFORE joining
    // — one shuffle on user_id, sequence built map-side per group.
    "q56_event_sequences" -> ((s, dir) =>
      events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          concat_ws(",", transform(
            sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type"))).as("event_seq"))),

    // ---- end-to-end curation pass: the composite query a training pipeline
    // actually runs — exact-dedup survivors, language gate, quality-score
    // threshold, token-length envelope — then kept-volume stats per source.
    // Every stage is individually oracled (q13/q15/q16/q25); this gates the
    // COMPOSITION. Aggregates avoid order-dependent double sums: counts,
    // exact integer token sums, and min/max of the (bit-identical) score.
    "q57_curation_pipeline" -> ((s, dir) => {
      val survivors = Dedup.exactDedup(rd(s, dir, "documents"), "doc_id", "text")
      survivors.select(col("doc_id"), col("source"),
          TextAnalysis.langIdGuess(col("text")).as("lang_guess"),
          TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text")))
            .as("quality_score"),
          TextAnalysis.bpeishTokenCount(col("text")).as("n_tokens"))
        .where(col("lang_guess") === "en" && col("quality_score") >= 0.5 &&
          col("n_tokens").between(10, 5000))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("quality_score")).as("min_quality"),
          max(col("quality_score")).as("max_quality"))
    }),

    // ---- forward as-of with tolerance (the merge_asof/aj family completed:
    // q37 is the backward leg; this attaches each click's NEXT purchase
    // within one hour, tolerance compared in integer microseconds so the
    // boundary is engine-deterministic)
    "q55_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
      graft.operators.AsOf.join(clicks, purchases, "user_id", "ts",
          Seq("purchase_id"), direction = graft.operators.AsOf.Forward,
          toleranceMicros = Some(3600L * 1000000L))
        .select("event_id", "purchase_id")
    }),

    // ---- corpus profiling (the audit every pipeline stage runs; ref
    // 02:154-162, 02:355-370 generalized). Exact leg of the distinct-count
    // routing under the gate; the HLL leg (bounded sketch per group x
    // partition — the 100 TB default) is error-bound-verified in
    // ProfileSpec, since a sketch estimate has no closed SQL form.
    "q54_profile_exact" -> ((s, dir) =>
      Profile.summary(rd(s, dir, "documents"), Seq("source", "lang"), "text",
        Profile.DistinctMode.Exact)),

    // ---- Structured Streaming under the gate (T1/§2.9: the streaming
    // surface had only ScalaTest verification until now). The SAME
    // watermarked windowed aggregation the streaming module ships
    // (EventStream.windowedCounts) runs as a real StreamingQuery — file
    // source, stateful agg in the state store, AvailableNow trigger —
    // into a complete-mode memory sink, then the sink table is returned
    // for the oracle compare. Complete mode makes the result the full
    // batch-equivalent aggregation (deterministic); the append/watermark
    // eviction path stays spec-verified in StreamingSpec. A memory sink is
    // gate-scale plumbing only — at 100 TB this query writes append-mode
    // parquet per closed window (see SCALE.md §streaming).
    "q53_streaming_windowed_agg" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val sink = "q53_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // the file source lists a directory; pathGlobFilter selects the one
      // events file out of the shared sf dir
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .transform(canonTs)
        val q = windowedCountsSelect(
          graft.streaming.EventStream.windowedCounts(stream, "30 minutes", "2 hours"))
          .writeStream.outputMode("complete").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // copy the (bounded: windows x types) aggregate out and DROP the sink
      // view — otherwise every invocation leaks a driver-memory table into
      // the shared session catalog for the life of the process
      drainSink(s, sink)
    }),

    // ---- streaming APPEND mode under the gate — the production shape q53
    // leaves to specs: watermark-driven eviction decides which windows are
    // EMITTED, not just which state is dropped. With AvailableNow the final
    // watermark is deterministic — ms-truncated max event time minus the 2h
    // delay — so the emitted set (windows whose end <= watermark; the last
    // 2h of windows withheld by design) has a closed batch form the oracle
    // replicates exactly. Sink is real append-mode parquet via a streaming
    // checkpoint; the bounded (windows x types) result is materialized and
    // the temp sink removed, like q53's memory sink.
    "q70_streaming_append_eviction" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val tmp = java.nio.file.Files.createTempDirectory("graft_q70").toString
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .transform(canonTs)
        val q = windowedCountsSelect(
          graft.streaming.EventStream.windowedCounts(stream, "30 minutes", "2 hours"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val out = s.read.parquet(s"$tmp/out")
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- IVF with k-means-refined centroids under the gate (the quality
    // upgrade over q45's first-n coarse quantizer). Two deterministic Lloyd
    // iterations: assignment is an argmax over broadcast centroids (ties to
    // the higher cell id), means are per-(cell,dim) averages L2-normalized
    // and rounded to FLOAT — the float rounding absorbs the last-ulp
    // summation-order differences, which is what makes the refined centroids
    // (and hence the oracle comparison) bit-portable to DuckDB. Residual
    // risk, quantified: a mean landing within 1 double-ulp of a float
    // rounding boundary could round differently across engines — P ~ 2^-29
    // per coordinate, ~1e-6 over the 512 values here; if this gate ever
    // flakes, coarsen the quantization (round to 1e-5 before the float
    // cast, replicated in the oracle) rather than re-deriving the oracle.
    "q52_ivf_kmeans_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 0)
      val qvec = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toSeq
      val cents = Ann.kmeansCentroids(corpus, "vec_id", "embedding", k = 4, iters = 2)
      val withCells = Ann.withIvfAssignment(corpus, "embedding", cents)
      Ann.topKIvf(withCells, "vec_id", "embedding", "ivf_cell", cents,
          qvec, k = 5, nProbe = 2)
        .select("vec_id", "score")
    }),

    // ---- benchmark decontamination (n-gram overlap vs a held-out eval
    // set — the pretraining step that keeps eval scores honest). src19
    // plays the benchmark; output is the contaminated corpus docs. The
    // corpus side is never shuffled: the bench 4-gram hash set broadcasts
    // and the semi-join runs inside the scan stage.
    "q59_decontaminate" -> ((s, dir) => {
      // rdPar: the gram explode is per-row-heavy and the local testdata is
      // one row-group; both filters derive from ONE repartitioned subtree
      // (shared exchange), a no-op rebalance on a real multi-file corpus
      val docs = rdPar(s, dir, "documents")
      val bench = docs.where(col("source") === "src19")
      val corpus = docs.where(col("source") =!= "src19")
      corpus.join(
          graft.operators.Decontaminate.contaminatedIds(
            corpus, bench, "doc_id", "text", n = 4),
          Seq("doc_id"), "left_semi")
        .select("doc_id", "lang", "source")
    }),

    // ---- concat-and-chunk sequence packing (token stream cut every 256
    // tokens; docs keyed to the chunk they start in). The group key is the
    // SHARDED (source, shard) form the Pack Scaladoc prescribes at scale:
    // shard = md5(doc_id) mod 8 multiplies the window parallelism 8× per
    // source, so no single task ever owns a whole source's token stream —
    // gating the sharded form makes the scale-safe usage the verified one.
    // The shard expression is the portable md5-mod-k (integer arithmetic,
    // bit-identical in DuckDB); fill_ratio divides by a power of two, so
    // the double is exact on both engines.
    "q60_sequence_packing" -> ((s, dir) =>
      graft.operators.Pack.packStats(
        rd(s, dir, "documents").withColumn("shard",
          graft.operators.Sampling.shardFromId(col("doc_id"), 8)),
        "doc_id", Seq("source", "shard"),
        TextAnalysis.tokenCount(col("text")), budget = 256)),

    // ---- stratified deterministic sampling: keep iff hash-uniform(doc_id)
    // < rate(lang). Rates are dyadic (exact in binary) so the decimal->double
    // paths of both engines agree bit-exactly; sample_key itself is in the
    // output to pin the hash-uniform construction, not just the filter.
    "q61_stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedSample(rd(s, dir, "documents"),
          "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.125),
          defaultRate = 0.0625)
        .select(col("doc_id"), col("lang"),
          graft.operators.Sampling.uniformFromId(col("doc_id")).as("sample_key"))),

    // ---- near-dup connected components: the q39 prefix-path pair graph
    // collapsed to clusters by iterated min-label propagation (pairs alone
    // under-delete: A~B, B~C must drop to one survivor even when A~C was
    // never emitted). Oracle is a recursive-CTE transitive closure.
    "q62_neardup_components" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      graft.operators.Components.componentStats(
        pairs.select("id_a", "id_b"), docs.select("doc_id"), "doc_id")
    }),

    // ---- near-dup SURVIVORS: the actual "delete the duplicates" step a
    // pipeline runs after pair emission — component closure over the q39
    // pair graph, then keep the min present id per component (q62 gates the
    // cluster stats; this gates the row-level delete).
    "q68_neardup_survivors" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      graft.operators.Components.survivors(
          docs, pairs.select("id_a", "id_b"), "doc_id")
        .select("doc_id", "lang", "source")
    }),

    // ---- per-source adaptive quality gate: keep each source's TOP HALF by
    // quality score (the "best X% of every domain" curation move; a fixed
    // global threshold would empty weak domains and keep noise from strong
    // ones). Two-pass, NOT a percent_rank window: Gate.topHalf computes a
    // per-source order-statistic threshold (bounded hash-agg state,
    // map-side merge), broadcasts the per-source thresholds, and filters
    // map-side — a percent_rank window would sort every source's full
    // score distribution in one task. The keep set is provably identical
    // to `percent_rank >= 0.5 OR n = 1` (Gate Scaladoc has the proof), so
    // the oracle keeps the rank form; tie-stability holds because the
    // decision depends only on (source, q).
    "q64_quality_gate" -> ((s, dir) => {
      val scored = rdPar(s, dir, "documents").select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text"))).as("q"))
      graft.operators.Gate.topHalf(scored, "source", "q")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), min("q").as("min_kept_score"))
    }),

    // ---- exact-size per-stratum sample: exactly min(30, |lang|) docs per
    // language, ranked by id-hash (the fixed-size eval-set primitive —
    // rate samples have binomial variance; eval sets need exact N).
    "q67_exact_size_sample" -> ((s, dir) =>
      graft.operators.Sampling.exactSizeSample(rd(s, dir, "documents"),
          "doc_id", "lang", n = 30)
        .select("doc_id", "lang")),

    // ---- the COMPOSED curation pipeline, one plan end-to-end: exact dedup
    // -> near-dup pair graph -> component survivors -> benchmark
    // decontamination -> per-source quality gate -> deterministic split ->
    // sharded sequence packing -> per-(split, source) envelope. Every stage
    // is individually gated (q46/q39/q68/q59/q64/q65/q60); composing them in
    // ONE query is what surfaces stage-boundary bugs (column collisions,
    // exchange reuse across stages) that per-stage gates cannot.
    "q69_curation_e2e" -> ((s, dir) => {
      // the whole DAG lives in Curation.curate; the seam strategy (eager
      // local checkpoint vs parquet stage dir — the production form) is a
      // parameter, selectable here via GRAFT_SEAM=stage so BOTH modes run
      // under this same gate. CurationSpec asserts mode-equality in-JVM.
      val seam = sys.env.get("GRAFT_SEAM") match {
        case Some("stage") => graft.operators.Curation.StageDir(
          java.nio.file.Files.createTempDirectory("graft_seam").toString)
        case _ => graft.operators.Curation.LocalSeam
      }
      graft.operators.Curation.curate(rdPar(s, dir, "documents"), "src19", seam)
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_seqs"), sum("n_docs").as("n_docs"),
          sum("seq_tokens").as("n_tokens"))
    }),

    // ---- boilerplate detection (C4-style repeated-content pass): 3-grams
    // in >= 5 distinct docs are template text; each doc scored by its
    // boilerplate-gram fraction. One corpus shuffle, shared via
    // ReuseExchange between the frequency agg and the join-back.
    "q66_boilerplate" -> ((s, dir) =>
      graft.operators.Boilerplate.stats(rdPar(s, dir, "documents"),
        "doc_id", "text", n = 3, minDocs = 5)),

    // ---- deterministic train/val/test split by hash ranges (dyadic
    // fractions; ':split' salt keeps it independent of q61/q63 decisions).
    // A doc keeps its split as the corpus grows — rank-based splits don't.
    "q65_split_assign" -> ((s, dir) =>
      graft.operators.Sampling.splitAssign(rd(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625))
        .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))),

    // ---- domain mixing by weighted epochs: weight 2.5 emits 2 full copies
    // + a hash-decided half epoch. Weights dyadic for the same reason as
    // q61; the ':up' salt decouples the fractional-epoch decision from the
    // q61 sampling decision on the same ids.
    "q63_domain_mix" -> ((s, dir) =>
      graft.operators.Sampling.mixDomains(rd(s, dir, "documents"), "doc_id",
          "lang",
          Map("de" -> 2.5, "es" -> 2.0, "fr" -> 0.5, "zh" -> 1.5),
          defaultWeight = 1.0)
        .groupBy("lang", "epoch")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"))),

    // ---- stateful streaming sessionization under the gate (the
    // flatMapGroupsWithState twin of q33, previously spec-only). A real
    // StreamingQuery: file source -> per-user O(1) session state with
    // event-time timeout -> append sink. The emitted set is deterministic
    // under AvailableNow: sessions CLOSED by a later in-batch event emit in
    // the data batch; each user's open last session emits in the trailing
    // no-data batch iff its timeout (session_end + gap) is STRICTLY below
    // the final watermark (ms-truncated max event time - gap) — both rules
    // pinned empirically in StreamingSpec ("event-time timeout rule"), so
    // the eviction semantics are part of the comparison, like q70. State is
    // (start, end, n) per live user — O(users), not O(events).
    "q74_streaming_sessionize" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val sink = "q74_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .transform(canonTs)
          .select("user_id", "ts", "event_type", "value")
          .as[graft.streaming.Sessionize.Event]
        val q = graft.streaming.Sessionize.streamingSessions(stream, gapMinutes = 30)
          .toDF()
          .select(col("user_id"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
            col("n_events").cast("long").as("n_events"))
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drainSink(s, sink)
    }),

    // ---- streaming exact-dedup under the gate: the production form of q13
    // for a corpus that ARRIVES as a stream (the cache write-back loop's
    // continuous shape, ref 02:415-418). dropDuplicatesWithinWatermark keeps
    // the first-seen row per content fingerprint and holds per-key state
    // only until the watermark passes the key's event time + delay — bounded
    // state, unlike a plain streaming dropDuplicates. Under AvailableNow the
    // single data batch sees watermark 0, so no state is evicted mid-batch
    // and the emitted set is exactly one row per distinct fingerprint —
    // which row wins is arrival-order-dependent, so only the fingerprint
    // (identical across any winner) is emitted. Cross-batch eviction and
    // re-admission semantics are spec-pinned in StreamingSpec.
    "q75_streaming_dedup" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val sink = "q75_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val q = s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          // +1 day: an arrival at exactly epoch 0 equals the initial watermark
          // and is discarded by the late-row filter (measured: doc_id 0 was
          // silently dropped) — keep every synthetic arrival strictly above it
          .withColumn("arrival_ts", timestamp_seconds(col("doc_id") + lit(86400L)))
          .withColumn("fingerprint", TextAnalysis.contentFingerprint(col("text")))
          .withWatermark("arrival_ts", "1 hour")
          .dropDuplicatesWithinWatermark("fingerprint")
          .select("fingerprint")
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drainSink(s, sink)
    }),

    // ---- Gopher-style repetition gate (the quality rule q25's score
    // battery misses: degenerate repeated text). Row-level metrics under
    // the gate; zero-shuffle per-row array math (see
    // TextAnalysis.repetitionMetrics).
    "q76_repetition" -> ((s, dir) =>
      // rdPar: the per-row bigram sort+fold is compute-heavy and the
      // testdata is one row-group — same reasoning as q79/q82
      TextAnalysis.repetitionMetrics(rdPar(s, dir, "documents"), "doc_id", "text")),

    // ---- per-doc salient terms by tf/df (tf-idf's monotone core — the
    // log(N/df) factor is engine-specific libm, the RANKING is the
    // contract). One (doc,term) shuffle shared by tf and document
    // frequency; df broadcasts; top-k window partitions by doc_id.
    "q77_tfidf_keywords" -> ((s, dir) =>
      graft.operators.Keywords.topTerms(rd(s, dir, "documents"),
        "doc_id", "text", k = 3)),

    // ---- cross-source mutual-contamination matrix: distinct word 4-grams
    // shared by each source pair (q59's gram definition, source x source) —
    // the provenance report that decides whether a mirrored crawl gets
    // dropped wholesale before pairwise dedup runs. The exact-fingerprint
    // variant (crossSourceOverlap) shares the operator; grams make the
    // matrix non-trivial on a corpus with no full-document mirrors.
    "q78_source_overlap" -> ((s, dir) =>
      Dedup.overlapMatrix(
        // NULL texts diverge between engines here (Spark's wordNgrams
        // yields a '' gram via concat_ws; DuckDB's slice yields NULL which
        // drops out of the join) — exclude them explicitly on both sides
        rdPar(s, dir, "documents").where(col("text").isNotNull)
          .select(explode(Dedup.wordNgrams(col("text"), 4)).as("gram"),
            col("source")),
        "gram", "source")),

    // ---- q64's gate at an arbitrary dyadic fraction: keep each source's
    // top QUARTER (percent_rank >= 0.75) — same two-pass order-statistic
    // plan (Gate.topFraction generalizes the floor(n/2) boundary to
    // ceil(p*(n-1)); proof in Gate.scala, brute-forced over dyadic p in
    // GraftProps).
    "q79_quality_gate_quarter" -> ((s, dir) => {
      val scored = rdPar(s, dir, "documents").select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text"))).as("q"))
      graft.operators.Gate.topFraction(scored, "source", "q", p = 0.75)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), min("q").as("min_kept_score"))
    }),

    // ---- the gate's SKETCH leg — the actual 100 TB path (bounded GK
    // sketch state per stratum instead of a distinct-value map). Inside
    // the sketch's exactness window (every stratum far below the 1e6
    // accuracy) percentile_approx returns the ceil(p*n)-th order statistic
    // = DuckDB quantile_disc (q51's established equivalence), so the kept
    // set is exactly "q strictly above the stratum's discrete median".
    "q88_quality_gate_sketch" -> ((s, dir) => {
      val scored = rdPar(s, dir, "documents").select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text"))).as("q"))
      graft.operators.Gate.topFraction(scored, "source", "q", p = 0.5,
          mode = graft.operators.Percentiles.Mode.Sketch(1000000))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), min("q").as("min_kept_score"))
    }),

    // ---- boilerplate detection, the one-pass Count-Min leg (q66's true-
    // 100 TB form: gram frequencies live in a broadcast sketch, the corpus
    // gram shuffle disappears). Gated against q66's EXACT oracle: the
    // sketch width (2/eps = 200k) is ~7x the corpus's distinct 3-gram
    // count, so no estimate crosses the minDocs boundary and approx ==
    // exact on this data — BoilerplateSpec proves the width argument
    // in-JVM; this row makes the driver see it.
    // eps=2e-5 (width 100k ≈ 3.7× the sf0.1 corpus's 27k distinct grams —
    // still no estimate near minDocs moves, verified equal-to-exact at
    // both SFs) after round 6 flagged the 1e-5 sketch's build cost: sketch
    // bytes dominate the one-pass build (alloc + serialize + merge per
    // task), and halving width cut q89 from 5.6 s to ~2 s at sf0.1.
    "q89_boilerplate_cms" -> ((s, dir) =>
      graft.operators.Boilerplate.statsApprox(rdPar(s, dir, "documents"),
        "doc_id", "text", n = 3, minDocs = 5, eps = 2e-5)),

    // ---- score-weighted deterministic sampling: keep probability = the
    // row's own quality score (bit-portable, q25) decided by the id hash —
    // "sample proportional to quality", between a hard gate (q64/q79) and
    // a flat rate (q61). Row-level membership under the gate. Map-side
    // only: no join, no shuffle.
    "q82_weighted_sample" -> ((s, dir) => {
      val scored = rdPar(s, dir, "documents").select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text"))).as("q"))
      graft.operators.Sampling.weightedSample(scored, "doc_id", "q")
    }),

    // ---- relational reshape: per-user event-type count matrix via
    // `pivot` with an EXPLICIT value list (an implicit list adds a
    // distinct-scan job and makes the output schema data-dependent — never
    // at scale). Pivot-count yields NULL for absent combinations where
    // SQL's conditional count yields 0; coalesced explicitly, since that
    // mismatch is semantic, not cosmetic.
    "q83_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = events(s, dir).groupBy("user_id")
        .pivot("event_type", types).count()
      p.select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
    }),

    // ---- q83's DYNAMIC form: values INFERRED by pivot's internal
    // distinct-scan job (one extra pass + a driver-held value list — fine
    // when the pivot column's domain is small and unknown; the explicit
    // form remains the 100 TB default). Column names derive from the
    // inferred values at plan time — nothing below hardcodes the domain —
    // so this gates that the inference reproduces the explicit result.
    "q91_pivot_dynamic" -> ((s, dir) => {
      val p = events(s, dir).groupBy("user_id").pivot("event_type").count()
      val inferred = p.columns.filter(_ != "user_id").sorted
      p.select(col("user_id") +:
        inferred.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
    }),

    // ---- repeated-SPAN detection (the ExactSubstr dedup family, Lee et
    // al. 2022): verbatim k-token windows shared across docs mark the
    // memorization-prone regions INSIDE otherwise unique documents;
    // overlapping windows merge to maximal spans in-row (no window
    // functions). One positional-gram shuffle shared via ReuseExchange.
    "q92_repeated_spans" -> ((s, dir) =>
      graft.operators.Spans.repeatedSpanStats(rdPar(s, dir, "documents"),
        "doc_id", "text", k = 4, minDocs = 2)),

    // ---- the rewrite half: drop every token covered by a shared 6-token
    // window from every doc (the C4 repeated-line removal at token
    // granularity) — row-level TEXT output, so the gate checks the
    // reconstruction order, not just counts.
    "q93_strip_spans" -> ((s, dir) =>
      graft.operators.Spans.stripRepeatedSpans(rdPar(s, dir, "documents"),
        "doc_id", "text", k = 6, minDocs = 2)),

    // ---- vocabulary fitting + OOV scoring (tokenizer prep): top-V corpus
    // vocabulary by (occurrence count DESC, token ASC — the tie-break that
    // makes membership deterministic), then per-doc fraction of token
    // OCCURRENCES outside it. V=20 of this corpus's 31 distinct tokens, so
    // the OOV path carries real mass. One (doc, token) shuffle shared by
    // totals and join-back via ReuseExchange; vocab broadcasts.
    "q94_vocab_oov" -> ((s, dir) =>
      graft.operators.Vocab.oovStats(rdPar(s, dir, "documents"),
        "doc_id", "text", v = 20)),

    // ---- UNPIVOT/melt — the reshape family's other half (q83/q91 go
    // long→wide; this gates wide→long): the pivoted counts melt back via
    // Dataset.unpivot (an Expand — pure map-side row expansion, no
    // shuffle beyond the pivot's own agg) and, with the zero rows the
    // wide form materialized dropped, must reproduce the plain long-form
    // GROUP BY exactly — the full pivot→unpivot round-trip under the gate.
    "q102_unpivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = events(s, dir).groupBy("user_id")
        .pivot("event_type", types).count()
        .select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      wide.unpivot(Array(col("user_id")),
          types.map(t => col(s"n_$t")).toArray, "event_type", "n_events")
        .withColumn("event_type", substring(col("event_type"), 3, 100))
        .where(col("n_events") > 0L)
    }),

    // ---- equi-width value histogram (profiling's distribution view;
    // width 16 = 2^4, so bucket = floor(value/16) is an exact
    // exponent-shift on both engines). One bucket-keyed hash agg.
    "q103_value_histogram" -> ((s, dir) =>
      graft.operators.Profile.histogram(events(s, dir), "value", 16.0)
        .select("bucket", "lo", "n_rows", "min_v", "max_v")),

    // ---- STREAMING decontamination — the online form of q59/q95 ("check
    // the incoming crawl against the eval suite as it lands"), and the one
    // join mode the streaming surface didn't yet gate: a STREAM-STATIC
    // broadcast semi-join (stateless — no watermark interplay, the static
    // bench gram set broadcasts exactly as in batch). Per-doc distinct
    // hits come from dropDuplicatesWithinWatermark (q75's pinned
    // emission); payload joins back batch-side. Oracle = the exact overlap
    // semantics, q95's shape at n=4 / src17.
    "q100_streaming_decontaminate" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val schema = docs.schema
      val benchGrams = docs.where(col("source") === "src17")
        .select(explode(Dedup.wordNgrams(col("text"), 4)).as("gram"))
        .select(xxhash64(col("gram")).as("gram_h")).distinct()
      val sink = "q100_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val q = s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .where(col("source") =!= "src17")
          // +1 day: strictly above the initial watermark (the q75 trap)
          .withColumn("arrival_ts", timestamp_seconds(col("doc_id") + lit(86400L)))
          .withWatermark("arrival_ts", "1 hour")
          .select(col("doc_id"), col("arrival_ts"),
            explode(Dedup.wordNgrams(col("text"), 4)).as("gram"))
          .select(col("doc_id"), col("arrival_ts"),
            xxhash64(col("gram")).as("gram_h"))
          .join(broadcast(benchGrams), Seq("gram_h"), "left_semi")
          .dropDuplicatesWithinWatermark("doc_id")
          .select("doc_id")
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drainSink(s, sink).join(docs, Seq("doc_id"))
        .select("doc_id", "lang", "source")
    }),

    // ---- deterministic contrastive negatives: two hash-ring rounds per
    // doc (md5-ordered bucketized ring, successor pairing — the partner is
    // a pure function of the id set: reproducible negatives, no
    // rand(seed) partition-order dependence). Row-level pair list under
    // the gate; the ring windows are (round, bucket)-bounded, never a
    // global sort.
    "q99_ring_negatives" -> ((s, dir) =>
      graft.operators.Sampling.ringNegatives(rd(s, dir, "documents"),
        "doc_id", rounds = 2, bucketHexLen = 2)),

    // ---- LEAKAGE-SAFE train/val/test split: q65's hash-range assignment
    // keyed on the near-dup COMPONENT label instead of the doc id, so a
    // cluster of near-duplicates can never straddle train and test — the
    // eval-hygiene rule plain per-doc splitting violates (a test doc's
    // 0.9-Jaccard twin in train is leakage the decontamination pass
    // cannot see). Composition of three individually-gated stages
    // (q39 pairs → q62 components → q65 split arithmetic); split is a
    // pure function of the component, so safety is structural, and the
    // component hash keeps the assignment growth-stable as clusters gain
    // members (a cluster's label is its min id — stable unless an older
    // doc joins it, which is exactly when re-splitting is correct).
    "q98_leakage_safe_split" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      val comp = graft.operators.Components.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select("doc_id"), "doc_id")
      graft.operators.Sampling.splitAssign(comp, "component",
          Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("component")).as("n_components"))
    }),

    // ---- the pipeline's OUTPUT stage under the gate: pack assignments
    // land as directory-partitioned (source, shard), size-bounded,
    // seq-sorted parquet shards (Pack.writeShards), are READ BACK —
    // directory-column reconstruction included (partition-col inference
    // types shard as int; cast back) — and aggregated; the oracle computes
    // the same stats straight from `documents`, so any row lost,
    // duplicated, or mistyped through the write→read round-trip breaks
    // the hash. Layout (file caps, in-file sort) is spec-asserted.
    "q97_shard_writer" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q97").toString
      val docs = rd(s, dir, "documents").withColumn("shard",
        graft.operators.Sampling.shardFromId(col("doc_id"), 8))
      val assigned = graft.operators.Pack.assignSequences(docs, "doc_id",
        Seq("source", "shard"), TextAnalysis.tokenCount(col("text")), budget = 256)
        .select("doc_id", "source", "shard", "n_tokens", "seq_id", "tok_offset")
      graft.operators.Pack.writeShards(assigned, tmp,
        partitionCols = Seq("source", "shard"),
        sortCols = Seq("seq_id", "doc_id"), maxRecordsPerFile = 100)
      s.read.parquet(tmp)
        .groupBy(col("source"), col("shard").cast("long").as("shard"),
          col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("seq_tokens"),
          min("tok_offset").as("first_offset"),
          max("doc_id").as("last_doc"))
    }),

    // ---- q94's SKETCH leg — the one-pass vocabulary (Misra-Gries heavy
    // hitters, mergeable MG merge rule): the exact form's token shuffle
    // disappears; partial O(capacity) buffers merge up one tiny exchange.
    // capacity 1024 >> the corpus's 31 distinct tokens puts the sketch in
    // its exactness window (no eviction ever fires ⇒ counts exact ⇒ the
    // same deterministic top-V), so the q94-shaped oracle gates the SCALE
    // path — the q51/q88/q89 pattern.
    "q96_vocab_oov_sketch" -> ((s, dir) =>
      graft.operators.Vocab.oovStatsApprox(rdPar(s, dir, "documents"),
        "doc_id", "text", v = 20, capacity = 1024)),

    // ---- bloom-routed decontamination: q59's semantics when the bench
    // gram set is too big to broadcast exactly — a Catalyst
    // BloomFilterAggregate sketch of the bench gram hashes broadcasts as a
    // binary literal, might_contain pre-filters the corpus gram stream
    // MAP-SIDE inside its scan stage, and an exact shuffle semi-join
    // strips the false positives. Result provably equals the exact
    // operator (no false negatives); the gate checks exactly that via the
    // plain-SQL oracle. n=5 and src18 keep it a distinct surface from q59.
    "q95_bloom_decontaminate" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      val bench = docs.where(col("source") === "src18")
      val corpus = docs.where(col("source") =!= "src18")
      corpus.join(
          graft.operators.Decontaminate.contaminatedIdsBloom(
            corpus, bench, "doc_id", "text", n = 5, expectedItems = 1L << 16),
          Seq("doc_id"), "left_semi")
        .select("doc_id", "lang", "source")
    }),

    // ---- temperature rebalancing with DATA-DEPENDENT mixing weights
    // (q63's weights are literals; real mixing derives them from corpus
    // stats): language weight = sqrt(n_max / n_lang) — alpha-0.5 sampling,
    // the standard multilingual rebalance that upweights rare languages.
    // Portable because every step is a correctly-rounded IEEE op on exact
    // integers (divide, sqrt) — the FORM sqrt(a/b) is pinned on both
    // sides; sqrt(a)/sqrt(b) would round differently. The scalar n_max is
    // the one driver-held value (constant-size, like the stored query
    // vectors); per-lang weights broadcast.
    "q87_temperature_mix" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val nMax = counts.agg(max("n")).head().getLong(0)
      val weights = counts.withColumn("w",
        sqrt(lit(nMax).cast("double") / col("n"))).drop("n")
      graft.operators.Sampling.upsample(
          docs.join(broadcast(weights), "lang"), "doc_id", col("w"))
        .groupBy("lang", "epoch")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"))
    }),

    // ---- INCREMENTAL multi-batch streaming ≡ batch (q70's aggregation
    // processed one file per trigger instead of one big batch): events are
    // split into time-CONTIGUOUS files, so the watermark ratchets up per
    // batch and state for closed windows is evicted mid-stream — yet the
    // union of emissions must equal the single-batch result (files are
    // time-ordered, so nothing ever arrives below the watermark; a window
    // that closed in batch k gets no data in batch k+1 by construction).
    // This is the property that makes incremental pipeline processing
    // trustworthy at all; the oracle is q70's closed form, unchanged.
    "q86_incremental_windows" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = java.nio.file.Files.createTempDirectory("graft_q86").toString
      // 4 contiguous time slices, written as separate files named in time
      // order (file-source listing processes them oldest-first)
      val ev = s.read.parquet(s"$dir/events.parquet")
      val ntile4 = ntile(4).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id")))
      // materialized once: each slice write would otherwise re-run the
      // global ntile sort over the full events table (4 scans + 4 sorts)
      val sliced = ev.withColumn("slice", ntile4).localCheckpoint(true)
      (1 to 4).foreach { i =>
        sliced.where(col("slice") === i).drop("slice")
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        // the file source orders same-mtime files arbitrarily; the
        // time-ordering argument above NEEDS oldest-slice-first, so pin
        // strictly increasing mtimes (sub-second writes tie otherwise)
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/in"))
        // a filesystem rejecting the mtime update would break the
        // oldest-first ordering SILENTLY (the gate would mismatch with no
        // clue why) — fail fast instead
        try walk.filter(p => p.toString.contains(f"slice_$i%03d"))
          .forEach { p =>
            if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
              sys.error(s"q86: setLastModified failed for $p — the " +
                "strictly-increasing-mtime file ordering cannot be pinned")
          }
        finally walk.close()
      }
      val schema = ev.schema
      val sink = "q86_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
          .transform(canonTs)
        val q = windowedCountsSelect(
          graft.streaming.EventStream.windowedCounts(stream, "30 minutes", "2 hours"))
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val out = s.table(sink)
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      s.catalog.dropTempView(sink)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- edit-distance verified near-dup pairs: the character-level
    // verifier of the fuzzy-dedup toolbox (small in-place edits shift
    // every word n-gram; Jaccard under-scores them). Blocked like every
    // pairwise step; thresholded levenshtein caps the DP per pair.
    "q85_editdist_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(rdPar(s, dir, "documents"), "doc_id", "text",
        Seq("lang", "source"), prefixLen = 64, maxDist = 8)),

    // ---- embedding-space label cohesion (the "are my labels clusters"
    // audit before trusting label-blocked dedup / per-label IVF routing).
    // Centroids use q52's bit-portability trick (normalize, then FLOAT
    // rounding absorbs summation-order ulps); output doubles are
    // min/max of in-order cosine folds — never a row-summed double.
    "q84_label_cohesion" -> ((s, dir) =>
      Ann.labelCohesion(rd(s, dir, "embeddings"), "embedding", "label")),

    // ---- stream-stream interval join under the gate (the last Structured
    // Streaming operator family that was spec-only): clicks joined to the
    // same user's purchases within the following hour, both sides of a
    // stateful symmetric hash join fed by one file source. INNER join
    // emission is watermark-independent (matches emit in the batch they
    // meet; watermarks only bound state retention), so under AvailableNow
    // the emitted set is exactly the batch join — the oracle. The interval
    // condition is what lets Spark prune join state by event time at all;
    // an unconstrained stream-stream join would hold both sides forever.
    "q80_stream_interval_join" -> ((s, dir) =>
      streamIntervalJoin(s, dir, "inner", "q80")),

    // ---- q80's LEFT OUTER form: clicks that never converted emit
    // null-extended — but only once a match has become impossible. The
    // emitted set is deterministic under AvailableNow via three rules
    // pinned in StreamingSpec ("left-outer interval join"): the eviction
    // bound is the JOIN-WINDOW end (click_ts + 1h), the boundary is
    // STRICT, and the watermark is the GLOBAL MIN across both sides'
    // watermark nodes. Unconverted clicks in the trailing hour-plus are
    // withheld by design — that withholding IS the semantics under test.
    "q81_stream_outer_join" -> ((s, dir) =>
      streamIntervalJoin(s, dir, "left_outer", "q81")),

    // ---- PII scrub: the detect+redact pass (emails, IPv4, dashed phones →
    // typed placeholder tokens) every public-crawl pipeline runs first.
    // The synthetic corpus carries no natural PII, so deterministic PII is
    // injected from doc_id arithmetic — REPLICATED IN THE ORACLE, so both
    // engines scrub the same text (the q90/q101 synthetic-fixture pattern,
    // in SQL). Patterns live in the java.regex ∩ RE2 common subset; the
    // gate compares the fully rewritten text row-level. Zero-shuffle
    // map-only projection — the 100 TB shape for a full-corpus rewrite.
    "q104_pii_scrub" -> ((s, dir) => {
      val injected = rdPar(s, dir, "documents").withColumn("text",
        concat_ws(" ", col("text"),
          when(col("doc_id") % 7 === 0, concat(lit("contact user"),
            col("doc_id").cast("string"), lit("@mail.example.com"))),
          when(col("doc_id") % 5 === 0, concat(lit("call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-0142 now"))),
          when(col("doc_id") % 11 === 0, concat(lit("host 10.0."),
            (col("doc_id") % 256).cast("string"), lit(".7")))))
      graft.operators.Pii.scrub(injected, "text")
        .select("doc_id", "n_emails", "n_ipv4", "n_phones", "redacted")
    }),

    // ---- overlapping token-window chunking (doc → passage units for
    // embedding/RAG indexing): 32-token windows every 24 tokens, 8-token
    // overlap; chunk count/offsets are closed-form integer arithmetic
    // replicated in the oracle, and the chunk TEXT itself is gated
    // row-level. Map-side explode inside the scan stage — no shuffle.
    "q105_token_chunks" -> ((s, dir) =>
      graft.operators.Chunk.tokenWindows(rdPar(s, dir, "documents"),
        "doc_id", "text", size = 32, stride = 24)),

    // ---- latest-wins merge (SCD-1 upsert) — the UPDATE half of the cache
    // write-back loop (q50 gates insert-dedup): a refresh batch (every
    // doc_id % 3 == 0 re-scored to lang 'xx', n_chars + 1000, version 2)
    // merges over the version-1 base; exactly the newest version of every
    // key survives. Engine side is ONE hash agg (max_by over (version,
    // prio) — map-side partial, no sort); the oracle keeps the row_number
    // window form, so the gate verifies the agg ≡ rank equivalence on real
    // data (the q64/q67 pattern).
    "q106_latest_wins_merge" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val base = docs.withColumn("version", lit(1L)).withColumn("prio", lit(0))
      val upd = docs.where(col("doc_id") % 3 === 0)
        .withColumn("lang", lit("xx"))
        .withColumn("n_chars", col("n_chars") + 1000L)
        .withColumn("version", lit(2L)).withColumn("prio", lit(1))
      graft.operators.Upsert.latestWins(base, upd, Seq("doc_id"),
        "version", "prio")
    }),

    // ---- GROUPING SETS, the non-hierarchical form: independent marginals
    // ((l_returnflag), (l_linestatus)) — the one grouping-family shape
    // neither ROLLUP (q27) nor CUBE (q48) covers (no combined cell, no
    // grand total). One Expand + hash agg, same scale shape as q27/q48;
    // grouping_id disambiguates NULL-as-data from NULL-as-aggregated.
    // Doubles sum through DECIMAL and cast to DOUBLE at the end (the
    // round-3 bit-portability rule).
    "q107_grouping_sets" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
            .as("sum_qty"),
          grouping_id().cast("long").as("gid"))),

    // ---- NATIVE session windows: Spark's session_window() — the built-in
    // gap-merge operator. Empirically pinned in SessionizeSpec BEFORE the
    // oracle was written (the streaming-surface discipline): two events
    // EXACTLY gap apart MERGE, i.e. sessions merge iff next <= prev + gap
    // and the break rule is strictly `diff > gap` in MICROSECONDS — the
    // same boundary as q33's lag rule (an earlier draft assumed the
    // window end was exclusive; the probe refuted it). Batch plans the
    // dedicated session-merge aggregation; the oracle replicates the
    // micros-exact island algorithm (the q80/q81 epoch pattern) with
    // session_end = last event + gap.
    "q108_session_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"))),

    // ---- FULL OUTER equi-join — the one outer-join flavor not yet gated
    // (q04 inner, q05 semi, q06 anti, q81 streaming left-outer): per-key
    // order counts against high-balance customers, null-extended on BOTH
    // sides (customers without orders; order keys whose customer misses
    // the balance filter). Shuffle join on the key — full outer cannot
    // broadcast either side by definition, so the equi-shuffle IS the
    // 100 TB plan.
    "q109_full_outer" -> ((s, dir) => {
      val o = rd(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val c = rd(s, dir, "customer").where(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"), col("c_mktsegment"))
      o.join(c, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          col("n_orders"), col("c_mktsegment"))
    }),

    // ---- per-GROUP heavy hitters (top tokens per source — the per-domain
    // audit view): one (source)-keyed agg whose state is an O(capacity)
    // Misra-Gries buffer, token stream never shuffles; the top-k ranks the
    // exploded SKETCH (≤ capacity rows/group), not the corpus. capacity
    // 1024 » the corpus's distinct tokens ⇒ inside the exactness window,
    // so the exact per-source counts are the oracle (the q96 pattern,
    // stratified).
    "q110_group_heavy_hitters" -> ((s, dir) =>
      graft.operators.Vocab.heavyHittersByGroup(rdPar(s, dir, "documents"),
        "source", "text", k = 5, capacity = 1024)),

    // ---- RANGE-frame trailing window (the sliding-window feature
    // primitive for training sets: per-event trailing-hour user activity).
    // RANGE frames bound by VALUE distance on the order key — a frame
    // family no other query exercises (q47 is an unbounded running frame,
    // Pack/AsOf are ROWS frames). The order key is integer MICROSECONDS
    // (unix_micros ≡ epoch_ns//1000, the q80/q81 pattern) so the frame
    // arithmetic is exact on both engines; count is exact, min/max are
    // order-free — no order-dependent double sums in the output. Peers
    // (equal keys) share a frame by RANGE semantics on both engines.
    "q111_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_trailing_hour"),
          min(col("value")).over(w).as("min_v_hour"),
          max(col("value")).over(w).as("max_v_hour"))
    }),

    // ---- STREAMING latest-wins upsert — q106's merge as a live stateful
    // query (the continuous cache refresh): versioned rows stream in,
    // mapGroupsWithState holds ONE winner row per key (O(live keys) state),
    // UPDATE mode re-emits a key's winner in every batch it receives data
    // (pinned in StreamingSpec). Base v1 + the doc_id%3 v2 refresh batch
    // derive map-side from one file source (explode + filter); under one
    // AvailableNow batch the emitted set IS the batch merge — q106's
    // oracle, shared verbatim.
    "q112_streaming_upsert" -> ((s, dir) => {
      import graft.streaming.UpsertStream
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val sink = "q112_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val versioned = s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .withColumn("v", explode(array(
            struct(lit(1L).as("version"), lit(0).as("prio"),
              col("lang").as("lang"), col("n_chars").as("n_chars")),
            struct(lit(2L).as("version"), lit(1).as("prio"),
              lit("xx").as("lang"), (col("n_chars") + 1000L).as("n_chars")))))
          .where(col("v.version") === 1L || col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("text"), col("v.lang").as("lang"),
            col("source"), col("v.n_chars").as("n_chars"),
            col("v.version").as("version"), col("v.prio").as("prio"))
          .as[UpsertStream.DocVersion](
            org.apache.spark.sql.Encoders.product[UpsertStream.DocVersion])
        val q = UpsertStream.latestWins(versioned)
          .drop("prio")
          .writeStream.outputMode("update").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drainSink(s, sink)
    }),

    // ---- span-level contamination report: WHICH token regions of each
    // corpus doc overlap the src19 bench at n=4 — q59 flags leaking DOCS;
    // this locates the leaking SPANS for surgical removal. Bench grams
    // broadcast, corpus semi-joined map-side in its scan stage, the only
    // shuffle is the hit-bounded per-doc rollup; maximal-span merge is
    // in-row island math (no window). Bench filtered to non-null text so
    // both engines build the gram set from the same rows.
    "q113_contamination_spans" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      graft.operators.Decontaminate.contaminationSpans(
        docs.where(col("source") =!= "src19"),
        docs.where(col("source") === "src19" && col("text").isNotNull),
        "doc_id", "text", n = 4)
    }),

    // ---- per-stratum quantile binning (curriculum phases): 4 difficulty
    // tiers per source over the quality score. Two-pass broadcast-boundary
    // form (no WindowExec); the rank-form equivalence is all-integer, so
    // the oracle is the windowed rank arithmetic and ANY bin count is
    // cross-engine exact.
    "q114_quantile_bins" -> ((s, dir) => {
      val scored = rdPar(s, dir, "documents").select(col("doc_id"),
        col("source"),
        TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text"))).as("q"))
      graft.operators.Gate.quantileBins(scored, "source", "q", bins = 4)
    }),

    // ---- best-copy survivor selection: q68's component closure with the
    // BEST-quality (not min-id) row kept per cluster — argmax is one
    // max_by hash agg over the (rank, -id) struct, no per-component sort;
    // null-quality rows lose to any ranked row by the null-smallest
    // struct ordering.
    "q115_best_survivors" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      val scored = docs.select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.qualityScore(TextAnalysis.qualityMetrics(col("text"))).as("q"))
      graft.operators.Components.survivorsBy(
        scored, pairs.select("id_a", "id_b"), "doc_id", "q")
    }),

    // ---- dedup-inflation histogram: per (source, cluster_size) doc
    // counts over the near-dup components — the capacity-planning signal
    // ("how much does near-duplication inflate each source") a curation
    // run reads before choosing dedup policy. Cluster sizes join back on
    // the component key (component-bounded shuffle, never a corpus
    // self-join); all outputs are exact integers.
    "q116_dedup_inflation" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      val comp = graft.operators.Components.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select("doc_id"), "doc_id")
      val sizes = comp.groupBy("component")
        .agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, Seq("component"))
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .groupBy("source", "cluster_size")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // ---- cohort retention: users cohorted by first-activity week, then
    // distinct actives per (cohort_week, week_offset) — the classic
    // product-analytics triangle. Weeks are INTEGER epoch arithmetic
    // (micros div day div 7), not calendar truncation, so both engines
    // agree bit-for-bit with no timezone/week-start rules in play. Scale:
    // one (user, week) distinct, a per-user min that reuses the same
    // user-keyed shuffle, a user-keyed join, one final two-phase
    // count-distinct — every stage key-partitioned, nothing global.
    "q117_cohort_retention" -> ((s, dir) => {
      val act = events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000 div 7").as("week"))
        .distinct()
      val cohort = act.groupBy("user_id").agg(min("week").as("cohort_week"))
      act.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // ---- product-quantization search: m=2 subspaces x ksub=4 sampled
    // codebooks (iters=0, the deterministic oracle-portable form), ADC
    // candidate scan over the CODES only (the embeddings are untouched
    // until re-rank), exact-cosine re-rank of the 15 ADC-best. The whole
    // encode -> table-lookup -> re-rank pipeline is pinned bit-exactly by
    // the SQL twin; Lloyd-refined codebooks change recall, not shapes
    // (AnnSpec).
    "q118_pq_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 0)
      val qv = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toSeq
      val books = Ann.pqCodebooks(corpus, "vec_id", "embedding",
        m = 2, ksub = 4)
      val coded = Ann.withPqCodes(corpus, "embedding", books)
      Ann.topKPq(coded, "vec_id", "embedding", "pq_code", books, qv,
          k = 5, rerankFactor = 3)
        .select("vec_id", "score")
    }),

    // ---- STREAMING IVF index maintenance: new vectors stream in, each
    // gets its cell assignment from the broadcast-literal centroids — the
    // stateless map-side projection that keeps a partitioned ANN index
    // current without rebuilds (the online leg of q45's coarse
    // quantizer; its emitted assignment must equal the batch one
    // exactly). Stateless ⇒ one AvailableNow batch emits everything.
    "q119_streaming_ivf_assign" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val cents = Ann.sampleCentroids(emb.where(col("vec_id") =!= 0),
        "vec_id", "embedding", 4)
      val schema = s.read.parquet(s"$dir/embeddings.parquet").schema
      val sink = "q119_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val q = s.readStream.schema(schema)
          .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
          .where(col("vec_id") =!= 0)
          .transform(df => Ann.withIvfAssignment(df, "embedding", cents))
          .select(col("vec_id"), col("ivf_cell"))
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drainSink(s, sink)
    }),

    // ---- robust per-type outlier flags: |v - median| > 3 * MAD over the
    // event values — median/MAD so the anomalies cannot inflate the very
    // spread statistic meant to catch them. Two grouped aggregations,
    // each broadcast back map-side (the Gate two-pass shape, twice); the
    // row stream is never shuffled.
    "q120_robust_outliers" -> ((s, dir) =>
      graft.operators.Outliers.robustFlags(
        events(s, dir).select("event_id", "event_type", "value"),
        "event_type", "value", z = 3.0)),

    // ---- canonical text normalization (NFC → casefold → strip
    // punctuation → collapse whitespace): the step before any content
    // fingerprint, as one codegen span of per-row expressions around the
    // native NfcNormalize — accent-decomposed copies must hash identically
    "q121_normalize_text" -> ((s, dir) =>
      rd(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextNorm.normalized(col("text")).as("norm_text"))),

    // ---- per-type winsorization: clip telemetry to the [p5, p95] band —
    // tails tamed without dropping rows; Gate-shaped two-pass (grouped
    // percentiles broadcast back, clip map-side, row stream unshuffled)
    "q122_winsorize" -> ((s, dir) =>
      graft.operators.Winsorize.clipped(
        events(s, dir).select("event_id", "event_type", "value"),
        "event_type", "value", pLo = 0.05, pHi = 0.95)),

    // ---- robust per-dimension embedding standardization (median/IQR —
    // order statistics, so bit-reproducible where a mean's float summation
    // order is not): long-form (vec_id, dim, z); 64-row stats broadcast,
    // the exploded stream never shuffles
    "q123_robust_scale" -> ((s, dir) =>
      graft.operators.FeatureScale.robustScaleLong(
        rd(s, dir, "embeddings").where(col("vec_id") =!= 0),
        "vec_id", "embedding")),

    // ---- correlated scalar subquery through the spark.sql surface:
    // Catalyst decorrelates into a grouped max + equi-join (PlanAuditSpec
    // proves no nested-loop residue). max, not avg: order-free, so the
    // oracle comparison is exact
    "q124_correlated_max" -> ((s, dir) => {
      rd(s, dir, "orders").createOrReplaceTempView("graft_q124_orders")
      s.sql("""SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
              |FROM graft_q124_orders o
              |WHERE o.o_totalprice = (SELECT max(o2.o_totalprice)
              |  FROM graft_q124_orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
    }),

    // ---- similarity-graph degree histogram: how connected is the
    // near-dup graph (the health check before survivor selection — a
    // heavy-tailed degree histogram means a boilerplate template is
    // stitching unrelated docs into one giant component). Composes the
    // gated q21 pair set; degrees via one explode + two cheap shuffles of
    // already-collapsed rows
    "q125_neardup_degree_hist" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairs(rd(s, dir, "documents"), "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.3)
      pairs.select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_docs"))
    }),

    // ---- ONLINE outlier flagging: the q120 profile trained batch-side
    // (bounded rows, one per event type), applied to the event STREAM as a
    // stream-static broadcast join — stateless, so the online flags must
    // equal the batch ones exactly. The deploy shape for telemetry
    // monitoring: retrain the profile on a cadence, flag in-flight.
    "q126_streaming_outliers" -> ((s, dir) => {
      val batch = events(s, dir).select("event_id", "event_type", "value")
      val profile = graft.operators.Outliers.stats(batch, "event_type", "value")
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val sink = "q126_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .select(col("event_id"), col("event_type"), col("value"))
        val q = graft.operators.Outliers
          .flagAgainst(stream, profile, "event_type", "value", z = 3.0)
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drainSink(s, sink)
    }),

    // ---- SCD-2 validity intervals (the keep-every-version half of the
    // q106 latest-wins merge): each change carries [valid_from, valid_to)
    // via one per-key lead — partitions are per-key change histories,
    // never the corpus. Timestamps stringified for the cross-engine
    // compare (the q33 convention).
    "q127_scd2_history" -> ((s, dir) =>
      graft.operators.Upsert.scd2History(
        events(s, dir).select("user_id", "event_id", "ts", "event_type"),
        Seq("user_id"), Seq("ts", "event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current"))),

    // ---- label co-occurrence lift (PMI's exponential — same ORDER as
    // PMI, but a single division of exact integer counts, so no libm log
    // in the output): which event types cluster in the same users beyond
    // popularity. Pairs bounded by distinct types per user, never users².
    "q128_cooccur_lift" -> ((s, dir) =>
      graft.operators.Cooccur.lift(events(s, dir), "user_id", "event_type")),

    // ---- the COMPOSED ANN scale shape (IVF × PQ, reference 02:438-442):
    // IVF prunes the scan to the query's 2 nearest cells (partition
    // pruning once persisted partitionBy(ivf_cell)), ADC runs over the
    // 2-byte codes WITHIN those cells only, and the 15 ADC-best re-rank
    // with exact cosine. q45 gates the pruning stage, q118 the PQ stage;
    // this gates their composition end-to-end bit-exactly.
    "q129_ivf_pq_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 0)
      val qv = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toSeq
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val books = Ann.pqCodebooks(corpus, "vec_id", "embedding",
        m = 2, ksub = 4)
      val indexed = Ann.withPqCodes(
        Ann.withIvfAssignment(corpus, "embedding", cents), "embedding", books)
      Ann.topKIvfPq(indexed, "vec_id", "embedding", "ivf_cell", "pq_code",
          cents, books, qv, k = 5, nProbe = 2, rerankFactor = 3)
        .select("vec_id", "score")
    }),

    // ---- the PRODUCTION streaming-upsert sink (UpsertSink): q112's
    // latest-wins semantics landing in a foreachBatch-compacted parquet
    // table instead of a memory sink. Base versions arrive in batch 1,
    // updates in batch 2 (mtime-pinned file order, the q86 pattern), so
    // the gate exercises a REAL cross-batch merge: batch 2's compaction
    // reads batch 1's table back and max_by-merges against the stored
    // winners. Final table ≡ q106's batch merge (same oracle).
    "q130_foreachbatch_upsert" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q130").toString
      val docs = rd(s, dir, "documents")
      val base = docs
        .withColumn("version", lit(1L)).withColumn("prio", lit(0))
      val upd = docs.where(col("doc_id") % 3 === 0)
        .withColumn("lang", lit("xx"))
        .withColumn("n_chars", col("n_chars") + 1000L)
        .withColumn("version", lit(2L)).withColumn("prio", lit(1))
      Seq(base -> "slice_001", upd -> "slice_002").foreach { case (df, name) =>
        df.coalesce(1).write.parquet(s"$tmp/in/$name")
      }
      // strictly increasing mtimes pin base-before-updates batch order
      Seq("slice_001", "slice_002").zipWithIndex.foreach { case (name, i) =>
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/in/$name"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q130: setLastModified failed for $p")
        } finally walk.close()
      }
      val schema = base.schema
      val table = s"$tmp/table"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = graft.streaming.UpsertSink.writer(stream, table,
            Seq("doc_id"), "version", "prio")
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val out = s.read.parquet(table).drop("prio")
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      result
    }),

    // ---- bigram LM rarity (the KenLM-style fluency filter): score every
    // doc against a bigram model trained on the corpus itself. Smoothed
    // conditional probability = one exact-integer division (no libm — the
    // q128 rule), so rarity rate / min-probability gate bit-exactly.
    // Occurrence streams (not per-doc-distinct); count tables aggregate
    // map-side; scoring re-joins on the gram keys.
    "q131_bigram_rarity" -> ((s, dir) =>
      graft.operators.LmScore.bigramRarity(rdPar(s, dir, "documents"),
        "doc_id", "text", rareMaxP = 1e-3)),

    // ---- CDC change-log apply: the DELETE verb the merge family lacked.
    // Inserts for every doc, updates for doc_id%3, deletes for doc_id%5 —
    // final state must drop every %5 key, keep %3 updates, and pass the
    // rest through. One max_by hash agg + a winner-set filter (the q106
    // shape; never a window sort over the log).
    "q132_cdc_apply" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val ins = docs.withColumn("version", lit(1L)).withColumn("op", lit("I"))
      val upd = docs.where(col("doc_id") % 3 === 0)
        .withColumn("lang", lit("xx"))
        .withColumn("n_chars", col("n_chars") + 1000L)
        .withColumn("version", lit(2L)).withColumn("op", lit("U"))
      val del = docs.where(col("doc_id") % 5 === 0)
        .withColumn("version", lit(3L)).withColumn("op", lit("D"))
      graft.operators.Upsert.applyChangeLog(
        ins.unionByName(upd).unionByName(del),
        Seq("doc_id"), "version", "op")
    }),

    // ---- Z-order (Morton) clustering key: interleaved-bit layout key for
    // multi-dimensional min/max file pruning (pure codegen'd integer bit
    // arithmetic — the gate pins the key bit-exactly; the LAYOUT effect —
    // per-file bounding boxes tight in BOTH dims vs a 1-D sort — is
    // spec-asserted on written files in PipelineOpsSpec).
    "q133_zorder_key" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      docs.select(col("doc_id"),
        graft.operators.Layout.zValue(
          Seq(pmod(col("doc_id"), lit(256)), pmod(col("n_chars"), lit(256))),
          bitsPerDim = 8).as("zval"))
    }),

    // ---- time-series resampling with forward-fill: per user, project the
    // irregular event stream onto an hourly grid and carry the last
    // observation forward (null before the first fact). Same-instant
    // events collapse by a DECLARED max rule first; per-key window
    // partitions hold one user's events+grid only (the q33 bound); the
    // grid floor is pure integer arithmetic.
    "q134_resample_ffill" -> ((s, dir) =>
      graft.operators.Resample.ffillGrid(events(s, dir),
          "user_id", "ts", "value", stepMinutes = 60)
        .select(col("user_id"),
          date_format(col("grid_ts"), "yyyy-MM-dd HH:mm:ss").as("grid_ts"),
          col("value"))),

    // ---- sweep-line peak concurrency: max simultaneously-open [ts, ts+1h)
    // click windows. The global running sum computes in TWO LEVELS (per-
    // day-bucket totals -> driver prefix -> broadcast offsets; per-bucket
    // windowed sums) — never the whole-table single-task global window.
    "q135_max_concurrency" -> ((s, dir) => {
      val iv = events(s, dir).where(col("event_type") === "click")
        .select(col("ts").as("s"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
      graft.operators.Sweep.maxConcurrency(iv, "s", "e")
        .select(col("max_open"),
          date_format(col("first_peak_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("first_peak_ts"))
    }),

    // ---- the classic 6-table OLAP rollup (TPC-H Q5 shape): local-supplier
    // revenue per nation of one region/year. The 100 TB plan is the POINT:
    // region/nation broadcast (GENUINELY bounded dims — 5 and 25 rows at
    // every SF), but customer/supplier grow linearly with the corpus
    // (TPC-H: 150k×SF / 10k×SF), so they get NO hint: AQE's size check
    // picks broadcast at gate scale and a shuffled hash join at 100 TB —
    // a forced hint there would bypass the check and OOM the broadcast.
    // Orders and lineitem shuffle on their join keys only after the
    // date/region filters push into their scans; revenue sums through
    // DECIMAL (the round-3 bit-portability rule).
    "q136_regional_revenue" -> ((s, dir) => {
      val region = rd(s, dir, "region").where(col("r_name") === "ASIA")
      val nation = rd(s, dir, "nation")
      val customer = rd(s, dir, "customer")
      val supplier = rd(s, dir, "supplier")
      val orders = rd(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      val lineitem = rd(s, dir, "lineitem")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(BigDecimal(1)).cast(DecimalType(3, 2)) -
              col("l_discount").cast(DecimalType(3, 2))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc)
    }),

    // ---- NATIVE streaming session windows: q108's session_window as a
    // real watermarked StreamingQuery in APPEND mode — the dedicated
    // streaming session-merge state operator (q74 gates the custom
    // flatMapGroupsWithState form; this gates Spark's own). Emission rule
    // pinned empirically in StreamingSpec BEFORE the oracle: a session
    // emits iff session_end <= final watermark (boundary INCLUSIVE), wm =
    // ms-truncated max event time - 2 h under AvailableNow.
    "q137_streaming_session_window" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val sink = "q137_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .transform(canonTs)
          .withWatermark("ts", "2 hours")
        val q = stream
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
            col("n_events"))
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drainSink(s, sink)
    }),

    // ---- snapshot diff (change-data-feed between table versions): what
    // did the upstream full refresh actually touch — %7 keys removed, %3
    // updated (changed column names listed), %11 re-keyed copies added.
    // One full-outer key join; comparisons are null-safe codegen.
    "q138_snapshot_diff" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val isUpd = col("doc_id") % 3 === 0
      val current = docs.where(col("doc_id") % 7 =!= 0)
        .withColumn("lang", when(isUpd, lit("xx")).otherwise(col("lang")))
        .withColumn("n_chars",
          when(isUpd, col("n_chars") + 1000L).otherwise(col("n_chars")))
        .unionByName(docs.where(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L))
      graft.operators.Upsert.snapshotDiff(docs, current, Seq("doc_id"))
    }),

    // ---- bounded inverted-index postings: per term, the top-5 docs by tf
    // (ties to lower doc id) via the bounded-heap aggregator — the
    // retrieval index WITHOUT the collect_list-a-stopword's-posting-list
    // time bomb; O(k) state per term, no per-term sort.
    "q139_inverted_postings" -> ((s, dir) =>
      graft.operators.Vocab.topPostings(rdPar(s, dir, "documents"),
        "doc_id", "text", k = 5)),

    // ---- q80/q81's FULL OUTER form — the last stream-stream join flavor:
    // both sides null-extend once a match is impossible. Click side:
    // q81's pinned rule (join-window end strictly below the global min
    // watermark). Purchase side: eviction keys on the purchase's OWN
    // event time (its match window [pus-1h, pus] only closes when the
    // watermark passes pus) — rule pinned against the StreamingSpec probe
    // before the oracle encodes it.
    "q140_stream_full_outer" -> ((s, dir) =>
      streamIntervalJoin(s, dir, "full_outer", "q140")),

    // ---- image average-hash over the REAL decode path (q90's corpus):
    // the image near-dup primitive, bit-gated — every block/global mean
    // comparison is cross-multiplied exact integers through the actual
    // JDK PNG encode→decode round-trip; the oracle recomputes the hash
    // analytically from the closed-form pixels.
    "q141_image_ahash" -> ((s, dir) =>
      Multimodal.imageAHash(Multimodal.syntheticPngMedia(s, 200))
        .toDF()
        .select("media_id", "ahash_lo", "ahash_hi", "decode_ok")),

    // ---- audio content features over the REAL WAV decode (q101's
    // corpus): zero-crossing count (declared rule: zeros carry the prior
    // sign) + summed absolute amplitude — exact integers through the JDK
    // encode→decode round-trip, recomputed analytically by the oracle.
    "q142_audio_features" -> ((s, dir) =>
      Multimodal.audioFeatures(Multimodal.syntheticWavMedia(s, 200))
        .toDF()
        .select("media_id", "n_frames", "zero_crossings", "abs_sum",
          "decode_ok")),

    // ---- image near-dup PAIRS: q141's aHash composed with the chunk-
    // pigeonhole hamming join (complete at maxHamming <= chunks-1, the
    // q71 simhash machinery generalized to a two-half 64-bit signature).
    // The tiny gate corpus lets the oracle brute-force all pairs; the
    // engine side stays bucket-bounded.
    "q143_image_neardup_pairs" -> ((s, dir) =>
      graft.operators.Dedup.hammingPairs64(
        Multimodal.imageAHash(Multimodal.syntheticPngMedia(s, 200))
          .toDF().where(col("decode_ok")),
        "media_id", "ahash_lo", "ahash_hi", maxHamming = 3, chunks = 4)),

    // ---- the PERSISTED IVF index end-to-end: q45's search through a real
    // partitionBy(ivf_cell) parquet index — write, read back (partition
    // column type restored), probe 2 cells. The isin filter on the
    // partition column IS partition pruning on the persisted layout
    // (PlanShapeSpec asserts the pruned scan); the gate proves the
    // round-trip changes nothing (q45's oracle verbatim).
    "q144_ivf_persisted_probe" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 0)
      val qvec = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toSeq
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q144").toString
      Ann.withIvfAssignment(corpus, "embedding", cents)
        .write.mode("overwrite").partitionBy("ivf_cell").parquet(tmp)
      val index = s.read.parquet(tmp)
        .withColumn("ivf_cell", col("ivf_cell").cast("int"))
      Ann.topKIvf(index, "vec_id", "embedding", "ivf_cell", cents,
          qvec, k = 5, nProbe = 2)
        .select("vec_id", "score")
    }),

    // ---- BAG-semantics set ops (q34 gates the DISTINCT forms): customer
    // nations of two order cohorts with multiplicity preserved —
    // INTERSECT ALL keeps min(m, n) copies, EXCEPT ALL subtracts
    // per-copy. Both plan as hash aggregates on (row, count), no sort.
    "q145_set_ops_all" -> ((s, dir) => {
      val cust = rd(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_nationkey").as("n"))
      val big = rd(s, dir, "orders").where(col("o_totalprice") > 200000)
        .join(cust, col("o_custkey") === col("k")).select(col("n"))
      val urgent = rd(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .join(cust, col("o_custkey") === col("k")).select(col("n"))
      val inter = big.intersectAll(urgent)
        .groupBy("n").agg(count(lit(1)).as("copies"))
        .select(lit("intersect_all").as("op"), col("n"), col("copies"))
      val exc = big.exceptAll(urgent)
        .groupBy("n").agg(count(lit(1)).as("copies"))
        .select(lit("except_all").as("op"), col("n"), col("copies"))
      inter.unionAll(exc)
    }),

    // ---- calendar-dimension rollup: month/quarter truncation parity
    // (both engines do calendar math under the pinned UTC session zone —
    // no tz drift) + decimal revenue. The time-dimension face of the OLAP
    // surface q01/q27/q48 cover on categorical keys.
    "q146_monthly_rollup" -> ((s, dir) =>
      rd(s, dir, "orders")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")),
            "yyyy-MM-dd").as("month"),
          date_format(date_trunc("quarter", col("o_orderdate")),
            "yyyy-MM-dd").as("quarter"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
          countDistinct(col("o_custkey")).as("n_customers"))),

    // ---- declarative data-quality constraints (Deequ-style): the
    // validation report a pipeline runs before trusting an upstream drop.
    // Each rule = ONE aggregate (uniqueness via key-grouped counts, FK via
    // broadcast anti count, predicates map-side); output is rule-count
    // rows, constant-size at any corpus.
    "q147_quality_checks" -> ((s, dir) => {
      import graft.operators.Checks
      val orders = rd(s, dir, "orders")
      val docs = rd(s, dir, "documents")
      Checks.report(orders, Seq(
        Checks.Unique("orders_pk_unique", Seq("o_orderkey")),
        Checks.Predicate("orders_price_positive", col("o_totalprice") > 0),
        Checks.RefIntegrity("orders_customer_fk", "o_custkey",
          rd(s, dir, "customer"), "c_custkey")))
        .unionAll(Checks.report(docs, Seq(
          Checks.Unique("docs_pk_unique", Seq("doc_id")),
          Checks.Predicate("docs_text_not_null", col("text").isNotNull))))
    }),

    // ---- the PURE-SQL user path: the flagship vector search written as
    // SQL text calling the registered native cosine_similarity (the
    // GraftExtensions surface), not the Column API — q17's result through
    // a completely different front door. Query vector folds in as a
    // double-array literal (float→double is exact, the expression's own
    // promotion rule), so the plan is still scan+project+TakeOrdered.
    "q148_sql_vector_search" -> ((s, dir) => {
      graft.functions.VectorFunctions.registerAll(s)
      val emb = rd(s, dir, "embeddings")
      val view = "emb_q148_" + java.util.UUID.randomUUID().toString.replace("-", "")
      emb.createOrReplaceTempView(view)
      val qv = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val qArr = qv.map(f => f.toDouble.toString + "D").mkString("array(", ",", ")")
      val out = s.sql(
        // both args one type by the expression's contract; FLOAT→DOUBLE is
        // value-exact so the double-double fold equals the float fold
        s"""SELECT vec_id,
           |  cosine_similarity(CAST(embedding AS ARRAY<DOUBLE>), $qArr) AS score
           |FROM $view WHERE vec_id <> 0
           |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      s.catalog.dropTempView(view)
      result
    }),

    // ---- incremental MATERIALIZED VIEW: per-type event metrics
    // accumulated across micro-batches into a compacted parquet table
    // (UpsertSink.accumulateBatch — merge = re-aggregate of self-mergeable
    // metrics: counts sum, min/max fold; batch partials aggregate FIRST so
    // the merge input is O(keys)). Two mtime-pinned id-parity slices force
    // a REAL cross-batch accumulation; the final table must equal the
    // plain one-shot batch aggregate. The slicer is a deterministic
    // ID-HASH split (event_id parity) — order-free and map-side, where a
    // global-sort ntile would funnel the whole table through one task.
    "q149_incremental_agg" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q149").toString
      val ev = events(s, dir)
      (1 to 2).foreach { i =>
        ev.where(pmod(col("event_id"), lit(2)) === lit(i - 1))
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q149: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/table"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val partial = batch.groupBy("event_type")
              .agg(count(lit(1)).as("n_events"),
                count(col("value")).as("n_valued"),
                min(col("value")).as("min_value"),
                max(col("value")).as("max_value"))
            graft.streaming.UpsertSink.accumulateBatch(table, partial,
              Seq("event_type"), sumCols = Seq("n_events", "n_valued"),
              minCols = Seq("min_value"), maxCols = Seq("max_value"),
              batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val out = s.read.parquet(table)
      s.createDataFrame(out.collectAsList(), out.schema)
    }),

    // ---- the remaining ranking-window family (q09 row_number, q47
    // lead/lag, q111 range frames): percent_rank / cume_dist / ntile,
    // all over a TOTAL order (orderkey tiebreak — ntile is position-
    // assigned, so ties would otherwise be engine-arbitrary). percent_rank
    // and cume_dist are single exact-integer divisions.
    "q150_rank_battery" -> ((s, dir) =>
      rd(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice"), col("o_orderkey"))).as("pr"),
          cume_dist().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice"), col("o_orderkey"))).as("cd"),
          ntile(4).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice"), col("o_orderkey"))).as("quartile"))),

    // ---- STREAM-STATIC broadcast ENRICHMENT (q100 gates the semi form):
    // every streaming purchase event enriched with its user's batch-side
    // activity profile via an inner broadcast join — stateless (no
    // watermark state), the dimension lookup every streaming feature
    // pipeline does per event.
    "q151_stream_enrichment" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val profile = events(s, dir).groupBy(col("user_id").as("p_user"))
        .agg(count(lit(1)).as("user_events"),
          countDistinct(col("event_type")).as("user_types"))
      val sink = "q151_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .transform(canonTs)
          .where(col("event_type") === "purchase")
        val q = stream.join(broadcast(profile),
            col("user_id") === col("p_user"))
          .select(col("event_id"), col("user_id"),
            col("user_events"), col("user_types"))
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drainSink(s, sink)
    }),

    // ---- join-key skew DIAGNOSIS (the decide-before-salting report):
    // per heavy key, row count, share, and the N×-fair-share ratio — all
    // exact-integer products over one map-side-combined key count; top-k
    // via bounded heaps, totals folded back as literals.
    "q152_skew_report" -> ((s, dir) =>
      graft.operators.Skew.keyReport(events(s, dir), "event_type", k = 10)),

    // ---- gazetteer tagging: count each doc's DISTINCT hits against a
    // broadcast term dictionary (domain labeling / topic routing by
    // wordlist — the cheap-and-cheerful classifier every curation stack
    // carries). Dictionary folds in as a literal array; array_intersect
    // on the doc's distinct tokens is pure map-side codegen — zero
    // shuffle beyond the scan.
    "q153_gazetteer_tag" -> ((s, dir) => {
      val sports = Seq("running", "swim", "ride", "tempo", "interval",
        "marathon", "sprint", "track")
      rdPar(s, dir, "documents").select(col("doc_id"),
        coalesce(size(array_intersect(
          graft.operators.Dedup.wordNgrams(col("text"), 1),
          typedlit(sports))), lit(0)).as("n_hits"),
        coalesce(array_join(array_sort(array_intersect(
          graft.operators.Dedup.wordNgrams(col("text"), 1),
          typedlit(sports))), ","), lit("")).as("hits"))
    }),

    // ---- contingency table with expected counts (the independence-test
    // workup, per-cell): observed (lang × source) counts vs expected
    // row_total × col_total / grand_total, plus each cell's chi-square
    // contribution (o-e)²/e. Emitted PER CELL — the summed statistic
    // would be an order-dependent double fold across cells; the per-cell
    // contributions are each a deterministic rational expression. One
    // count shuffle + two broadcast marginal joins.
    "q154_contingency" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val cells = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rowT = docs.groupBy("lang").agg(count(lit(1)).as("row_tot"))
      val colT = docs.groupBy("source").agg(count(lit(1)).as("col_tot"))
      val total = docs.count()
      cells.join(broadcast(rowT), "lang").join(broadcast(colT), "source")
        .withColumn("e",
          (col("row_tot") * col("col_tot")).cast("double") / total)
        .withColumn("chi2_cell",
          (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
        .select("lang", "source", "o", "row_tot", "col_tot", "e", "chi2_cell")
    }),

    // ---- the AUTO-PROBED SQL front door: same user SQL as q148 (ORDER BY
    // cosine_similarity DESC LIMIT k — no API call, no cell filter), but
    // over a self-describing IVF index (AnnIndexMeta sidecar next to the
    // partitionBy(ivf_cell) layout). IvfProbeRule rewrites the plan into a
    // partition-pruned 2-cell probe — "the database picked the index". The
    // builder ASSERTS the rewrite fired (scan must carry the cell probe);
    // the oracle is q144's probe math verbatim, so the gate pins that the
    // automatic rewrite computes exactly the explicit probe's answer.
    "q155_autoprobe_sql_search" -> ((s, dir) => {
      graft.functions.VectorFunctions.registerAll(s)
      if (!s.experimental.extraOptimizations
            .exists(_.isInstanceOf[graft.plans.IvfProbeRule]))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.plans.IvfProbeRule(s)
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 0)
      val qv = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toSeq
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q155").toString
      graft.plans.AnnIndexMeta.buildIvfIndex(corpus, "embedding", cents, tmp,
        nProbe = 2)
      val view = "idx_q155_" + java.util.UUID.randomUUID().toString.replace("-", "")
      s.read.parquet(tmp).createOrReplaceTempView(view)
      val qArr = qv.map(f => f.toDouble.toString + "D").mkString("array(", ",", ")")
      val prev = s.conf.getOption(graft.plans.IvfProbeRule.AutoProbeKey)
      s.conf.set(graft.plans.IvfProbeRule.AutoProbeKey, "true")
      try {
        val out = s.sql(
          s"""SELECT vec_id,
             |  cosine_similarity(CAST(embedding AS ARRAY<DOUBLE>), $qArr) AS score
             |FROM $view ORDER BY score DESC, vec_id LIMIT 5""".stripMargin)
        val pruned = out.queryExecution.executedPlan.collectLeaves()
          .exists(l => "ivf_cell#\\d+ IN ".r.findFirstIn(l.toString).isDefined)
        require(pruned, "q155: IvfProbeRule did not rewrite the scan into a probe")
        val result = s.createDataFrame(out.collectAsList(), out.schema)
        s.catalog.dropTempView(view)
        result
      } finally prev match {
        case Some(v) => s.conf.set(graft.plans.IvfProbeRule.AutoProbeKey, v)
        case None => s.conf.unset(graft.plans.IvfProbeRule.AutoProbeKey)
      }
    }),

    // ---- SemDeDup (arXiv:2303.09540): semantic dedup = cluster the
    // embedding space (8 deterministic IVF cells), tighten with a 2-plane
    // LSH sub-bucket (q20's planes), drop every row with a >=0.3-cosine
    // lower-id neighbor in its block. Survivors carry their cell so the
    // gate pins BOTH the clustering and the removal set. Recall-
    // approximate by contract (blocked, like q20/q44); the survivor rule
    // (min id lives) is exact within blocks.
    "q156_semantic_dedup" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val cents = Ann.sampleCentroids(emb, "vec_id", "embedding", 8)
      val blocked = Ann.withHyperplaneBuckets(
        Ann.withIvfAssignment(emb, "embedding", cents),
        "embedding", storedVecs(emb, 3, 4))
      Dedup.semanticDedup(blocked, "vec_id", "embedding",
          Seq("ivf_cell", "lsh_bucket"), threshold = 0.3)
        .select("vec_id", "ivf_cell")
    }),

    // ---- DSIR importance profile (arXiv:2302.03169): every doc scored by
    // how much its hashed-unigram distribution leans toward the target
    // slice (lang='en'), via smoothed bucket-count ratios — each ratio ONE
    // division of exact integer products (libm-free, the q131 rule).
    // Bucket tables are 512 rows by construction -> broadcast; the only
    // corpus shuffle is the per-doc aggregation.
    "q157_dsir_importance" -> ((s, dir) =>
      graft.operators.Dsir.importanceProfile(rdPar(s, dir, "documents"),
        col("lang") === "en", "doc_id", "text", nBuckets = 512)),

    // ---- the Gopher rule battery (arXiv:2112.11446 App. A): per-doc rule
    // metrics + per-rule verdicts + composite keep, one map-side codegen
    // pass, every ratio an exact-integer division (no shuffle, no UDF).
    "q158_gopher_rules" -> ((s, dir) =>
      graft.operators.GopherRules.profile(rdPar(s, dir, "documents"),
        "doc_id", "text")),

    // ---- deterministic epoch shuffle: (shard, pos) training order for
    // epoch 1 — shard = epoch-salted md5 mod 16, pos = in-shard rank of an
    // independently-salted hash uniform. Pure function of the id set;
    // parallelism = nShards by construction (the per-shard window is the
    // documented contract, not an accident).
    "q159_epoch_shuffle" -> ((s, dir) =>
      graft.operators.Sampling.epochShuffle(rd(s, dir, "documents"),
          "doc_id", nShards = 16, epoch = 1)
        .select("doc_id", "shard", "pos")),

    // ---- HLL cardinality per source (the sketch family's missing member
    // — see operators/Hll.scala): 64 registers per group shuffle instead
    // of every distinct value; the exact count rides along as the gate's
    // measuring stick. Bit-portable end to end (integer comparison-ladder
    // rho, bucket-ordered harmonic fold of exact powers of two, pinned
    // alpha). The counted value is the distinct (doc, token) POSTING —
    // the inverted-index size estimate a pipeline wants before building
    // one (q139) — whose ~1.4k/source cardinality sits in the raw
    // estimator's n >> m regime (the tiny synthetic token vocabulary of
    // ~31 would sit in the small-range regime the reported raw estimator
    // deliberately excludes; see the Hll Scaladoc).
    "q160_hll_distinct" -> ((s, dir) =>
      graft.operators.Hll.distinctEstimate(
        postingsBySource(rdPar(s, dir, "documents")),
        Seq("source"), col("posting"))),

    // ---- INCREMENTAL HLL: the register table is max-mergeable on
    // (group, bucket), so the sketch maintains as a streaming accumulate
    // (q149's incremental-MV machinery with a max-merge) — two id-parity
    // document slices arrive as separate micro-batches, each contributes
    // a partial register table, and the merged state finishes into
    // EXACTLY q160's batch answer (same oracle verbatim). Distinct
    // counting over an unbounded stream in 64 ints of state per group —
    // the form that runs forever at 100 TB where exact streaming
    // count(DISTINCT) state grows without bound.
    "q161_streaming_hll" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q161").toString
      val docs = rd(s, dir, "documents")
      (1 to 2).foreach { i =>
        docs.where(pmod(col("doc_id"), lit(2)) === lit(i - 1))
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q161: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/regs"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val partial = graft.operators.Hll.registers(
              postingsBySource(batch), Seq("source"), col("posting"))
            graft.streaming.UpsertSink.accumulateBatch(table, partial,
              Seq("source", "bucket"), sumCols = Nil, minCols = Nil,
              maxCols = Seq("reg"), batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val est = graft.operators.Hll.estimateFromRegisters(
        s.read.parquet(table), Seq("source"))
      val exact = postingsBySource(docs).groupBy("source")
        .agg(count_distinct(col("posting")).as("n_exact"))
      val out = exact.join(est, Seq("source"))
        .withColumn("rel_err", col("hll_est") / col("n_exact"))
      s.createDataFrame(out.collectAsList(), out.schema)
    }),

    // ---- BM25 keyword ranking (operators/Bm25.scala): the lexical half
    // of hybrid search. 'dup' is the corpus's one rare token (df 25/500 vs
    // ~380 for everything else), so its idf dominates — the gate would
    // catch an idf that ignored df. ln is DetMath's pinned series: library
    // log was MEASURED non-bit-portable on this corpus's own df set
    // (jvm ...276d vs duckdb ...276c at df=398).
    "q162_bm25_search" -> ((s, dir) =>
      graft.operators.Bm25.search(rdPar(s, dir, "documents"), "doc_id",
        "text", Seq("dup", "vector", "query"), k = 10)),

    // ---- hybrid retrieval: reciprocal-rank fusion of the dense leg
    // (cosine top-20, q17's machinery) and the lexical leg (BM25 top-20)
    // — 1/(60+rank) per leg, summed in pinned leg order. Ranks are
    // integers, so fusion adds NO transcendental; the legs' candidate
    // lists bound the join at k rows regardless of corpus size.
    "q163_hybrid_rrf" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val qv = storedVecs(emb, 7).head
      val byRank = Window.orderBy(col("score").desc, col("id"))
      val dense = Ann.topK(emb.where(col("vec_id") =!= 7), "vec_id",
          "embedding", qv, 20)
        .select(col("vec_id").as("id"), col("score"))
        .withColumn("rank", row_number().over(byRank)) // 20 rows — bounded
      val lexical = graft.operators.Bm25.search(rdPar(s, dir, "documents"),
          "doc_id", "text", Seq("dup", "stream"), k = 20)
        .select(col("doc_id").as("id"), col("score"))
        .withColumn("rank", row_number().over(byRank))
      graft.operators.Bm25.rrfFuse(Seq(dense, lexical), "id", "rank",
        c = 60, k = 10)
    }),

    // ---- ordered-step conversion funnel (operators/Funnel.scala):
    // view -> click -> purchase, "strictly after" pinned to the total
    // (us, event_id) order. The funnel entity is (user, day) — per-day
    // journeys leave every depth populated, so the histogram gates all
    // four outcomes, not just "everyone eventually converts". The whole
    // step chain is exclusive-frame running sums sharing ONE
    // (entity, time) sort — a single shuffle for any number of steps,
    // no per-entity event list.
    "q164_funnel_depth" -> ((s, dir) =>
      graft.operators.Funnel.depthHistogram(
        events(s, dir).withColumn("us", unix_micros(col("ts")))
          .withColumn("ukey",
            col("user_id") * lit(1000000L) + expr("us div 86400000000")),
        "ukey", "event_type",
        Seq("view", "click", "purchase"), Seq("us", "event_id"))),

    // ---- MMR diversified rerank (operators/Mmr.scala): greedy
    // lambda*rel - (1-lambda)*max-sim-to-selected over the cosine top-20
    // pool (bounded driver rerank, like every query-vector fetch); the
    // oracle UNROLLS the 5-step greedy into chained CTEs, so selection
    // order, tie rule, and every float op are gate-checked.
    "q165_mmr_rerank" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val qv = storedVecs(emb, 11).head
      val cands = Ann.topK(emb.where(col("vec_id") =!= 11), "vec_id",
        "embedding", qv, 20)
      graft.operators.Mmr.rerank(cands, "vec_id", "embedding", "score",
        k = 5, lambda = 0.7)
    }),

    // ---- SOURCE-level reputation gate (Gate.sourceReputation): judge the
    // whole source by its aggregate signature and drop it wholesale — the
    // C4/RefinedWeb domain move, complementing q64's within-source gate.
    // Integer aggregates + one division per stat; verdict table is
    // source-bounded and broadcasts back (GateSpec asserts the filter leg).
    "q166_source_reputation" -> ((s, dir) =>
      graft.operators.Gate.sourceReputation(rdPar(s, dir, "documents"),
        "source", "n_chars",
        minAvgChars = 295.0, maxShortFrac = 0.21, shortChars = 150L)),

    // ---- recency-weighted activity ranking: per-user score =
    // Σ_age n_events(age) · 2^(−age/7d), the half-life popularity
    // boost every feed/leaderboard wants. 2^(−f) is DetMath's pinned
    // ladder+Taylor (exp/pow are as non-portable as ln). The per-user
    // fold runs over DISTINCT AGES ascending — bounded by the corpus
    // time span, not the user's event count — so the pinned-order
    // summation scales, unlike a per-event collect.
    "q167_decay_ranking" -> ((s, dir) => {
      val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
      // ref instant = corpus max event time: ONE bounded scalar, exact
      val refUs = e.agg(max("us")).head().getLong(0)
      val ages = e.select(col("user_id"),
          expr(s"(${refUs}L - us) div 86400000000").as("age"))
        .groupBy("user_id", "age").agg(count(lit(1)).as("n"))
        .withColumn("f", col("age").cast("double") / lit(7.0))
      val wc = graft.functions.DetMath.withPow2Decay(ages, "f", "dk")
        .withColumn("wc", col("n").cast("double") * col("dk"))
      wc.groupBy("user_id")
        .agg(sum("n").as("n_events"),
          aggregate(sort_array(collect_list(struct(col("age"), col("wc")))),
            lit(0.0), (acc, x) => acc + x.getField("wc")).as("score"))
        .orderBy(col("score").desc, col("user_id")).limit(20)
    }),

    // ---- STREAMING funnel (streaming/StreamingFunnel.scala): q164's
    // automaton over a watermarked stream — events buffer until the
    // watermark finalizes them, then drain through the step machine in
    // (us, event_id) order. Slices are us-RANGE cuts (two scalars, no
    // global sort; equal-us ties can never straddle a drain boundary),
    // plus two far-future sentinel slices that push the watermark past
    // every real event so all buffers drain under AvailableNow. Depth is
    // monotone, so max-per-entity over the update stream is the final
    // depth — the batch oracle verbatim.
    "q168_streaming_funnel" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q168").toString
      val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
        .select("ts", "event_id", "user_id", "event_type", "us")
      val r = e.agg(min("us"), max("us")).head()
      val (minUs, maxUs) = (r.getLong(0), r.getLong(1))
      // slice on MILLISECOND-aligned us ranges: the late-row filter drops a
      // row whose event time is <= the watermark (measured, pinned in
      // StreamingFunnelSpec), and the watermark is ms-truncated — so a
      // later slice's first row must sit in a strictly LATER millisecond
      // than every earlier slice's max, which ms-aligned buckets guarantee
      val widthMs = (maxUs / 1000L - minUs / 1000L) / 4 + 1
      (0 until 4).foreach { i =>
        e.where(expr(s"(us div 1000 - ${minUs / 1000L}L) div ${widthMs}L") === i)
          .drop("us").coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
      }
      (4 to 5).foreach { i => // watermark sentinels, dropped from output
        Seq((new java.sql.Timestamp(maxUs / 1000L + (i - 3) * 86400000L),
            -1L - i, -1L - i, "noop"))
          .toDF("ts", "event_id", "user_id", "event_type")
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
      }
      (0 to 5).foreach { i => // oldest-first listing needs increasing mtimes
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q168: setLastModified failed for $p")
        } finally walk.close()
      }
      val schema = s.read.parquet(s"$tmp/in/slice_000").schema
      val sink = "q168_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      withStreamPartitions(s) {
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("ukey",
            col("user_id") * lit(1000000L) + expr("us div 86400000000"))
          .withColumn("step",
            when(col("event_type") === "view", 0)
              .when(col("event_type") === "click", 1)
              .when(col("event_type") === "purchase", 2).otherwise(-1))
          .select(col("ukey"), col("ts"), col("us"), col("event_id"), col("step"))
          .as[graft.streaming.StreamingFunnel.FEvent]
        val q = graft.streaming.StreamingFunnel.depths(stream, 3)
          .toDF()
          .writeStream.outputMode("update").format("memory").queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val out = drainSink(s, sink)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      out.where(col("ukey") >= 0)
        .groupBy("ukey").agg(max("depth").as("depth"))
        .groupBy("depth").agg(count(lit(1)).as("n_users"))
    }),

    // ---- last-touch attribution: each purchase credits the latest click
    // of the same user at-or-before it, within a 1h window — the as-of
    // join (q37's carry-forward single-shuffle form) put to its canonical
    // marketing use. Gap statistics are integer microseconds, so the
    // rollup is exact; among same-microsecond clicks the carried value is
    // their (equal) timestamp, never an arbitrary row choice.
    "q169_attribution" -> ((s, dir) => {
      val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val purchases = e.where(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("us").as("click_us"))
      graft.operators.AsOf.join(purchases, clicks, "user_id", "ts",
          Seq("click_us"), graft.operators.AsOf.Backward,
          toleranceMicros = Some(3600000000L))
        .withColumn("gap_us", unix_micros(col("ts")) - col("click_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          count(col("click_us")).as("n_attributed"),
          sum("gap_us").as("total_gap_us"),
          min("gap_us").as("min_gap_us"),
          max("gap_us").as("max_gap_us"))
    }),

    // ---- schema-evolution ingest: a corpus written across years drifts —
    // early files lack columns later ones carry. mergeSchema unions the
    // file schemas at scan time (absent columns read as null), so ONE scan
    // spans the drift; the aggregate proves both slices landed and the
    // null-fill behaved. Footer merging is driver-side over file METADATA
    // (not data), the documented cost knob at 100 TB file counts.
    "q170_schema_evolution" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q170").toString
      val docs = rd(s, dir, "documents")
      docs.where(pmod(col("doc_id"), lit(2)) === 0)
        .select("doc_id", "text", "lang") // the old, narrower schema
        .write.parquet(s"$tmp/old")
      docs.where(pmod(col("doc_id"), lit(2)) === 1)
        .write.parquet(s"$tmp/new")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$tmp/old", s"$tmp/new")
      val out = merged.groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          count(col("source")).as("n_with_source"),
          sum("n_chars").as("n_chars_total"))
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- bucketed co-located join: both sides pre-bucketed (8 buckets,
    // sorted) on the join key, so the sort-merge join needs NO exchange
    // and NO sort on either side — the layout that turns the daily
    // fact⋈dim join from the cluster's biggest shuffle into a map-side
    // merge. PlanShapeSpec asserts the exchange-free plan; this gate pins
    // that the bucketed path returns the same answer as the plain join.
    "q171_bucketed_join" -> ((s, dir) => {
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val tmp = java.nio.file.Files.createTempDirectory("graft_q171").toString
      val ot = s"graft_q171_o_$tag"; val ct = s"graft_q171_c_$tag"
      rd(s, dir, "orders").write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/o").saveAsTable(ot)
      rd(s, dir, "customer").write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/c").saveAsTable(ct)
      val out = s.table(ot).join(s.table(ct),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("sum_totalprice"))
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      s.sql(s"DROP TABLE IF EXISTS $ot")
      s.sql(s"DROP TABLE IF EXISTS $ct")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- keyset pagination ("search_after"): page 2 is NOT offset 10 —
    // at serving scale OFFSET re-ranks the whole prefix per page, and a
    // concurrent refresh shifts it. The cursor is the last (score, id) of
    // the previous page; the next page filters strictly beyond it and
    // takes a fresh top-k — same TakeOrderedAndProject cost as page 1.
    // The cursor compare recomputes the codegen cosine on the same rows,
    // so score equality is bit-reliable. Oracle = OFFSET form: keyset and
    // offset pagination must agree under a total (score DESC, id) order.
    "q172_search_cursor" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val qv = storedVecs(emb, 0).head
      val page1 = Ann.topK(emb.where(col("vec_id") =!= 0), "vec_id",
        "embedding", qv, 10).select("vec_id", "score").collect()
      val (curScore, curId) = (page1.last.getDouble(1), page1.last.getLong(0))
      val scored = emb.where(col("vec_id") =!= 0)
        .withColumn("score", graft.functions.VectorFunctions
          .cosineSim(col("embedding"), typedlit(qv)))
      scored
        .where(col("score") < lit(curScore) ||
          (col("score") === lit(curScore) && col("vec_id") > lit(curId)))
        .select("vec_id", "score")
        .orderBy(col("score").desc, col("vec_id")).limit(10)
    }),

    // ---- INCREMENTAL inverted-index maintenance: the serving postings
    // table (q162's tf/dl rows, the reference's TARGET_LAG refresh idea
    // applied to the lexical index) maintained as a streaming accumulate —
    // per-batch partial postings merge by (term, doc) with tf summed and
    // dl maxed (q161's machinery), so two document slices arriving as
    // separate micro-batches finish into EXACTLY the batch-built index.
    "q173_streaming_postings" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q173").toString
      val docs = rd(s, dir, "documents")
      (1 to 2).foreach { i =>
        docs.where(pmod(col("doc_id"), lit(2)) === lit(i - 1))
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q173: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/postings"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val partial = graft.operators.Bm25.buildPostings(
              batch, "doc_id", "text")
            graft.streaming.UpsertSink.accumulateBatch(table, partial,
              Seq("term", "doc_id"), sumCols = Seq("tf"), minCols = Nil,
              maxCols = Seq("dl"), batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val out = s.read.parquet(table).select("term", "doc_id", "tf", "dl")
      s.createDataFrame(out.collectAsList(), out.schema)
    }),

    // ---- SQ8 scalar quantization audit (operators/Quantize.scala): the
    // codebook-free 4x embedding compression, per-vector affine int8 —
    // quantize, reconstruct, and gate the max reconstruction error AND
    // the original-vs-reconstruction cosine, all pinned IEEE ops (the
    // DetMath rule applied to a codec).
    "q174_sq8_quantize" -> ((s, dir) =>
      graft.operators.Quantize.sq8Report(rd(s, dir, "embeddings"),
        "vec_id", "embedding")),

    // ---- write-audit-publish (streaming/Wap.scala): stage -> audit the
    // merged candidate -> publish only if clean. A clean batch commits
    // (version advances); a batch with planted empty-text rows fails its
    // audit and the table STAYS at the previous version — the final
    // snapshot_rows row proves readers never saw the dirty batch.
    "q175_write_audit_publish" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q175").toString
      val table = s"$tmp/docs"
      val docs = rd(s, dir, "documents").select("doc_id", "text")
      val rules = Seq(
        graft.operators.Checks.Predicate("text_nonempty", length(col("text")) > 0),
        graft.operators.Checks.Unique("unique_doc_id", Seq("doc_id")))
      def stamp(df: DataFrame, v: Int) =
        df.withColumn("version", lit(v)).withColumn("prio", lit(0))
      val b1 = stamp(docs.where(pmod(col("doc_id"), lit(3)) > 0), 1)
      val a1 = graft.streaming.Wap.publishIfClean(table, b1, Seq("doc_id"),
          "version", "prio", rules)
        .withColumn("batch", lit("clean_batch"))
      val b2 = stamp(docs.where(pmod(col("doc_id"), lit(3)) === 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(6)) === 0, lit(""))
          .otherwise(col("text"))), 2)
      val a2 = graft.streaming.Wap.publishIfClean(table, b2, Seq("doc_id"),
          "version", "prio", rules)
        .withColumn("batch", lit("dirty_batch"))
      val snapRows = s.read.parquet(table).count()
      val snap = Seq(("final", "snapshot_rows", snapRows, 0L, true, true))
        .toDF("batch", "rule", "n_checked", "n_violations", "pass", "published")
      val cols = Seq("batch", "rule", "n_checked", "n_violations", "pass", "published")
      val out = a1.select(cols.map(col): _*)
        .unionByName(a2.select(cols.map(col): _*))
        .unionByName(snap)
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- convex score fusion (Bm25.normFuseLocal): the other hybrid
    // combiner next to q163's RRF — per-leg min-max normalization over
    // each leg's own candidate list, then 0.6·dense + 0.4·lexical in
    // pinned leg order. Preserves score magnitude where RRF keeps only
    // rank; both fuse k-bounded lists on the driver.
    "q176_norm_fusion" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val qv = storedVecs(emb, 3).head
      val dense = Ann.topK(emb.where(col("vec_id") =!= 3), "vec_id",
          "embedding", qv, 20)
        .select("vec_id", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val lex = graft.operators.Bm25.search(rdPar(s, dir, "documents"),
          "doc_id", "text", Seq("dup", "query"), k = 20)
        .select("doc_id", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      graft.operators.Bm25.normFuseLocal(Seq((dense, 0.6), (lex, 0.4)), k = 10)
        .toDF("id", "fused")
    }),

    // ---- KMV bottom-k sketch (operators/Kmv.scala): the SET-OPERATION
    // sketch HLL cannot be — per-source bottom-64 distinct hashes, then
    // pairwise union/Jaccard ESTIMATES next to their exact twins (the
    // "how much do these sources overlap" audit, affordable at 100 TB
    // where the exact pairwise join is not). Sketches are bounded min-k
    // heap aggregates (O(k)/partition shuffled); pair arithmetic is
    // driver-side over the groups x k collected table.
    "q177_kmv_overlap" -> ((s, dir) => {
      // item = token TRIGRAM shingle: unlike the doc-scoped postings
      // (disjoint across sources by id construction), shingles genuinely
      // overlap between sources (~0.01-0.08 jaccard), so the estimator
      // and its exact twin are both exercised on non-zero ground truth
      val posts = trigramShingles(rdPar(s, dir, "documents"))
      val sk = graft.operators.Kmv.sketch(posts, Seq("source"),
        col("posting"), k = 64)
      val est = graft.operators.Kmv.pairEstimates(sk, "source", k = 64)
      val d = posts.distinct()
      val sizes = d.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = d.as("x").join(d.as("y"),
          col("x.posting") === col("y.posting")
            && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      est.join(inter, Seq("source_a", "source_b"), "left")
        .na.fill(0L, Seq("n_inter"))
        .join(broadcast(sizes.select(col("source").as("source_a"),
          col("n").as("na"))), Seq("source_a"))
        .join(broadcast(sizes.select(col("source").as("source_b"),
          col("n").as("nb"))), Seq("source_b"))
        .withColumn("exact_union", col("na") + col("nb") - col("n_inter"))
        .withColumn("exact_jaccard",
          col("n_inter").cast("double") / col("exact_union").cast("double"))
        .select("source_a", "source_b", "n_merged", "est_union",
          "est_jaccard", "n_inter", "exact_union", "exact_jaccard")
    }),

    // ---- INCREMENTAL KMV (streaming/KmvStream.scala): bottom-k-of-
    // distinct is closed under merge, so the per-source sketch table
    // accumulates across micro-batches with a pure-builtin
    // slice(sort(distinct(flatten))) merge — two document slices finish
    // into EXACTLY the batch sketch, and the pair estimates match q177's
    // estimate legs verbatim. k longs of state per source, forever.
    "q178_streaming_kmv" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q178").toString
      val docs = rd(s, dir, "documents")
      (1 to 2).foreach { i =>
        docs.where(pmod(col("doc_id"), lit(2)) === lit(i - 1))
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q178: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/kmv"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val partial = graft.operators.Kmv.sketch(
              trigramShingles(batch), Seq("source"), col("posting"), k = 64)
            graft.streaming.KmvStream.accumulateBatch(table, partial,
              "source", k = 64, batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val est = graft.operators.Kmv.pairEstimates(
        s.read.parquet(table), "source", k = 64)
      val result = s.createDataFrame(est.collectAsList(), est.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- SQ8-accelerated search (Quantize.topKSq8): approximate cosine
    // over the dequantized int8 codes (the 4x-smaller scan), exact rerank
    // of the 3k best — q174's codec joining the ANN family next to PQ
    // (q118/q129), same prune-then-rerank contract.
    "q179_sq8_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 5)
      val qv = storedVecs(emb, 5).head
      graft.operators.Quantize.topKSq8(
        graft.operators.Quantize.withSq8(corpus, "embedding"),
        "vec_id", "embedding", qv, k = 5, rerankFactor = 3)
        .select("vec_id", "score")
    }),

    // ---- search-result snippets: a 7-token window centered on the first
    // occurrence of the highest-priority matching query term — the
    // serving layer's result presentation, pure map-side over the
    // (broadcast) ranked ids.
    "q180_snippets" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      val top = graft.operators.Bm25.search(docs, "doc_id", "text",
        Seq("dup", "stream"), k = 10).select("doc_id", "score")
      val toks = split(col("text"), " ")
      val posDup = array_position(toks, "dup")
      val pos = when(posDup > 0, posDup)
        .otherwise(array_position(toks, "stream"))
      val start = greatest(lit(1L), pos - lit(3L))
      broadcast(top).join(docs.select("doc_id", "text"), Seq("doc_id"))
        .withColumn("snippet",
          concat_ws(" ", slice(toks, start.cast("int"), lit(7))))
        .select("doc_id", "score", "snippet")
    }),

    // ---- IVF x SQ8 composed search (Quantize.topKIvfSq8): cell-pruned
    // scan + dequantized-code approximate pass + exact rerank — the q129
    // composition with the codebook-free codec; per-vector quantization
    // commutes with the cell filter, so the oracle quantizes after
    // pruning and must land on the same bits.
    "q181_ivf_sq8_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 9)
      val qv = storedVecs(emb, 9).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val indexed = graft.operators.Quantize.withSq8(
        Ann.withIvfAssignment(corpus, "embedding", cents), "embedding")
      graft.operators.Quantize.topKIvfSq8(indexed, "vec_id", "embedding",
          "ivf_cell", cents, qv, k = 5, nProbe = 2, rerankFactor = 3)
        .select("vec_id", "score")
    }),

    // ---- INCREMENTAL source reputation: q166's verdict over counts that
    // are pure SUMS — partials from sliced arrival accumulate (q149's
    // machinery) into exactly the whole-corpus aggregate, and the final
    // verdict projection shares q166's oracle verbatim. The 100 TB form:
    // the corpus never re-scans; each day's delta adds three longs per
    // source.
    "q182_streaming_reputation" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q182").toString
      val docs = rd(s, dir, "documents")
      (1 to 2).foreach { i =>
        docs.where(pmod(col("doc_id"), lit(2)) === lit(i - 1))
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q182: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/rep"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val partial = graft.operators.Gate.reputationAggregate(
              batch, "source", "n_chars", shortChars = 150L)
            graft.streaming.UpsertSink.accumulateBatch(table, partial,
              Seq("source"), sumCols = Seq("n_docs", "tot_chars", "n_short"),
              minCols = Nil, maxCols = Nil, batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val out = graft.operators.Gate.reputationVerdicts(
        s.read.parquet(table), minAvgChars = 295.0, maxShortFrac = 0.21)
        .select("source", "n_docs", "avg_chars", "short_frac", "keep")
      val result = s.createDataFrame(out.collectAsList(), out.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- time-to-convert (Funnel.stepTimes): for user-days completing
    // the whole view->click->purchase funnel, the lag from the FIRST
    // qualifying view to the FIRST qualifying purchase, bucketed by hour
    // — integers end to end, and the step-time mins ride the same
    // single per-entity aggregate as the depth flags.
    "q183_conversion_lag" -> ((s, dir) => {
      val st = graft.operators.Funnel.stepTimes(
        events(s, dir).withColumn("us", unix_micros(col("ts")))
          .withColumn("ukey",
            col("user_id") * lit(1000000L) + expr("us div 86400000000")),
        "ukey", "event_type",
        Seq("view", "click", "purchase"), Seq("us", "event_id"), "us")
      st.where(col("reached_3") === 1)
        .select(expr("(t_3 - t_1) div 3600000000").as("lag_hours"))
        .groupBy("lag_hours").agg(count(lit(1)).as("n_conversions"))
    }),

    // ---- video container metadata (multimodal/Multimodal.scala): the
    // third modality's header decode made real — duration/dimensions/
    // track-count parsed from the MP4 box tree and the MKV EBML tree
    // (q90/q101's pattern; frame decode stays out of scope, which is
    // where ffmpeg-in-mapPartitions slots at production). Both synthetic
    // corpora are integer closed forms the oracle recomputes; parse
    // failures are data (decode_ok=false), pinned by MultimodalSpec's
    // corrupt-bytes cases.
    "q184_video_meta" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val mp4 = Multimodal.syntheticMp4Media(s, 150)
      val mkv = Multimodal.syntheticMkvMedia(s, 150)
        .map(m => m.copy(media_id = m.media_id + 1000))(
          org.apache.spark.sql.Encoders.product[Multimodal.MediaFile])
      Multimodal.decodeVideoMeta(mp4.unionByName(mkv)).toDF()
        .select("media_id", "container", "duration_ms", "width", "height",
          "n_tracks", "decode_ok")
    }),

    // ---- MEMORY serving tier through the oracle gate (serve/
    // MemoryIndex.scala): the job-free runtime's exact top-k must carry
    // the SAME bits as the DataFrame scan — ServeSpec pins tier parity;
    // this pins the tier against the INDEPENDENT engine. The index loads
    // from the IVF-assigned corpus the way a serving node loads the
    // persisted artifact, then answers with zero Spark jobs.
    "q185_memory_search" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 13)
      val qv = storedVecs(emb, 13).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val mem = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents)
      mem.topK(qv, 10).toDF("vec_id", "score")
    }),

    // ---- memory HYBRID through the gate: dense exact top-20 + BM25
    // top-20 from the loaded postings index, RRF-fused driver-side —
    // q163's semantics served entirely from memory structures (the
    // serving tier's fused request path, end-to-end against DuckDB).
    "q186_memory_hybrid" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 7)
      val qv = storedVecs(emb, 7).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val docs = rdPar(s, dir, "documents")
      val postings = graft.operators.Bm25.buildPostings(docs, "doc_id", "text")
      val stats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val avgdl = stats.getLong(0).toDouble / stats.getLong(1).toDouble
      val dfMap = postings.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val idfMap = graft.operators.Bm25.idfByTerm(dfMap, stats.getLong(1), s)
      val server = new graft.serve.MemoryServer(
        graft.serve.MemoryAnnIndex.fromDataFrame(
          Ann.withIvfAssignment(corpus, "embedding", cents),
          "vec_id", "embedding", "ivf_cell", cents),
        Some(graft.serve.MemoryPostingsIndex.fromDataFrame(
          postings, "doc_id", idfMap, avgdl)))
      server.searchHybrid(qv, Seq("dup", "stream"), k = 10, poolK = 20)
        .toDF("id", "rrf")
    }),

    // ---- memory SQ8 serving (serve/MemorySq8Index): the compressed
    // replica — byte-packed codes (a REAL 4× resident-set cut; int[]
    // codes would be 4 B/element and save nothing) scored with q179's
    // exact algebra, then exact rerank over the retained floats. Shares
    // q179's oracle transcription at a different query vector.
    "q187_memory_sq8" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 17)
      val qv = storedVecs(emb, 17).head
      val mem = graft.serve.MemorySq8Index.fromDataFrame(
        graft.operators.Quantize.withSq8(corpus, "embedding"),
        "vec_id", "embedding")
      mem.topK(qv, k = 5, rerankFactor = 3).toDF("vec_id", "score")
    }),

    // ---- FILTERED memory search (serve/MetaFilter): the reference's
    // notebook queries are filtered semantic searches (sport/difficulty
    // @eq/@and — ipynb Q2/Q3); the serving tier pre-filters on loaded
    // numeric metadata BEFORE scoring (the memory analog of predicate
    // pushdown, 02:406's "filter before similarity"), here a label
    // range over the exact scan.
    "q188_memory_filtered_search" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 21)
      val qv = storedVecs(emb, 21).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val mem = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents, metaCols = Seq("label"))
      mem.topK(qv, 8, Seq(graft.serve.MetaFilter("label", 2, 5)))
        .toDF("vec_id", "score")
    }),

    // ---- STRING-filtered memory search: the notebook's actual filter
    // shape ({"@eq":{"sport_type":"run"}} — ipynb Q2) over a
    // dictionary-encoded string column: the doc source joins onto the
    // embedding corpus at index-build time, encodes to dense codes at
    // load, and the request's string @eq resolves through the
    // dictionary before the scan.
    "q189_memory_string_filter" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val docs = rd(s, dir, "documents")
        .select(col("doc_id").as("vec_id"), col("source"))
      val corpus = emb.where(col("vec_id") =!= 29).join(docs, "vec_id")
      val qv = storedVecs(emb, 29).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val mem = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents, metaCols = Seq("source"))
      mem.topK(qv, 8, Seq(mem.stringFilter("source", "src3")))
        .toDF("vec_id", "score")
    }),

    // ---- MEMORY PQ serving (serve/MemoryPqIndex): the 32×-compression
    // tier — m byte codes per vector, per-request ADC table, subspace-
    // ordered fold identical to q118's plan, exact rerank over retained
    // floats. Shares q118's oracle transcription at another query.
    "q190_memory_pq" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 23)
      val qv = storedVecs(emb, 23).head
      val books = Ann.pqCodebooks(corpus, "vec_id", "embedding",
        m = 2, ksub = 4)
      val mem = graft.serve.MemoryPqIndex.fromDataFrame(
        Ann.withPqCodes(corpus, "embedding", books),
        "vec_id", "embedding", "pq_code", books)
      mem.topK(qv, k = 5, rerankFactor = 3).toDF("vec_id", "score")
    }),

    // ---- BINARY (1-bit sign) quantized search (operators/Quantize
    // .topKBinary): the far end of the compression ladder — 32× smaller
    // codes, integer Hamming popcount approximate pass (functions/
    // SignPack + HammingDist, both codegen), exact cosine rerank. The
    // Hamming leg has NO float ops, so the oracle twin is exact by
    // construction; only the rerank carries the pinned cosine fold.
    "q191_binary_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 31)
      val qv = storedVecs(emb, 31).head
      graft.operators.Quantize.topKBinary(
        graft.operators.Quantize.withBinary(corpus, "embedding"),
        "vec_id", "embedding", qv, k = 5, rerankFactor = 3)
        .select("vec_id", "score")
    }),

    // ---- MEMORY binary serving (serve/MemoryBinaryIndex): the
    // 32×-smaller replica — sign codes in packed longs, xor+popcount
    // scan, exact rerank over retained floats; bit-identical to q191's
    // DataFrame path (same oracle transcription at another query).
    "q192_memory_binary" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 37)
      val qv = storedVecs(emb, 37).head
      val mem = graft.serve.MemoryBinaryIndex.fromDataFrame(
        graft.operators.Quantize.withBinary(corpus, "embedding"),
        "vec_id", "embedding")
      mem.topK(qv, k = 5, rerankFactor = 3).toDF("vec_id", "score")
    }),

    // ---- INCREMENTAL serving (serve/DeltaAnnIndex): the live half of
    // TARGET_LAG — the published index stays immutable, writes land in
    // a delta segment, deletes tombstone, a search merges the tiers.
    // Here: base = 4/5 of the corpus, the remaining fifth ADDED live,
    // every id ≡ 0 (mod 7) DELETED live; the merged result must equal
    // plain SQL over the final logical corpus.
    "q193_delta_serving" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 41)
      val qv = storedVecs(emb, 41).head
      val baseDf = corpus.where(col("vec_id") % 5 =!= 0)
      val cents = Ann.sampleCentroids(baseDf, "vec_id", "embedding", 4)
      val base = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(baseDf, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents)
      val delta = new graft.serve.DeltaAnnIndex(base)
      corpus.where(col("vec_id") % 5 === 0)
        .select("vec_id", "embedding").collect()
        .foreach(r => delta.add(r.getLong(0), r.getSeq[Float](1)))
      corpus.where(col("vec_id") % 7 === 0)
        .select("vec_id").collect()
        .foreach(r => delta.delete(r.getLong(0)))
      delta.topK(qv, 8).toDF("vec_id", "score")
    }),

    // ---- LATE-INTERACTION retrieval (operators/LateInteraction): the
    // query is a BAG of vectors and so is each doc (here: consecutive
    // fours of the embedding corpus); score = Σ over query vectors of
    // the max cosine per doc — computed as codegen cosine columns in
    // the scan + ONE per-doc hash agg of maxes (map-side partials).
    "q194_maxsim" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val qbag = storedVecs(emb, 0, 1, 2, 3)
      val docs = emb.where(col("vec_id") >= 4)
        .withColumn("doc_id", expr("vec_id div 4"))
      graft.operators.LateInteraction.maxSimTopK(
        docs, "doc_id", "embedding", qbag, 10)
    }),

    // ---- PAYLOAD-INDEXED filtered serving (MemoryAnnIndex
    // .topKFilteredIndexed): the most selective filter's sorted-row
    // range enumerates candidates directly (scored rows = its match
    // count, not the corpus) — the serving conclusion of 02:406's
    // "filter before similarity"; results identical to the scan path.
    "q195_indexed_filter" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val docs = rd(s, dir, "documents")
        .select(col("doc_id").as("vec_id"), col("source"))
      val corpus = emb.where(col("vec_id") =!= 43).join(docs, "vec_id")
      val qv = storedVecs(emb, 43).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val mem = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents,
        metaCols = Seq("source", "label"))
      mem.topKFilteredIndexed(qv, 8,
        Seq(mem.stringFilter("source", "src2"),
          graft.serve.MetaFilter("label", 1, 6)))
        .toDF("vec_id", "score")
    }),

    // ---- IVF x BINARY composed search (Quantize.topKIvfBinary): cell
    // pruning x the 1-bit codec — q181's composition at the far end of
    // the compression ladder; sign packing is training-free so it
    // commutes with the cell filter.
    "q196_ivf_binary_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 47)
      val qv = storedVecs(emb, 47).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val indexed = graft.operators.Quantize.withBinary(
        Ann.withIvfAssignment(corpus, "embedding", cents), "embedding")
      graft.operators.Quantize.topKIvfBinary(indexed, "vec_id", "embedding",
          "ivf_cell", cents, qv, k = 5, nProbe = 2, rerankFactor = 3)
        .select("vec_id", "score")
    }),

    // ---- MEMORY MaxSim serving (serve/MemoryMaxSimIndex): the
    // late-interaction tier served job-free — per-doc contiguous part
    // vectors, the same pinned per-part cosine + order-free max +
    // query-ascending sum as q194's DataFrame plan.
    "q197_memory_maxsim" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val qbag = storedVecs(emb, 8, 9, 10, 11)
      val docs = emb.where(col("vec_id") >= 4 && expr("vec_id div 4") =!= 2)
        .withColumn("doc_id", expr("vec_id div 4"))
      val mem = graft.serve.MemoryMaxSimIndex.fromDataFrame(
        docs, "doc_id", "embedding")
      mem.topK(qbag, 10).toDF("doc_id", "score")
    }),

    // ---- KEYSET pagination on the memory tier (q172's contract served
    // job-free): page 2 = the k rows strictly after page 1's last
    // (score, id) cursor in the (score DESC, id ASC) total order — the
    // cursor IS the state, equal to OFFSET k of the same ranking.
    "q198_memory_pagination" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 53)
      val qv = storedVecs(emb, 53).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val mem = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents)
      val page1 = mem.topK(qv, 5)
      val (lastId, lastScore) = (page1.last._1, page1.last._2)
      mem.topKAfter(qv, 5, lastScore, lastId).toDF("vec_id", "score")
    }),

    // ---- SEMANTIC decontamination (Decontaminate.byEmbedding): the
    // embedding-space leak detector next to the n-gram ones (q59/q95/
    // q100/q113) — benchmark vectors ride into the scan as literal
    // codegen cosine columns, greatest() folds the max; pure map-side
    // projection, zero shuffle.
    "q199_embedding_decontamination" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val bench = emb.where(col("vec_id") % 50 === 0)
        .orderBy("vec_id").select("embedding").collect()
        .map(_.getSeq[Float](0).toSeq).toSeq
      graft.operators.Decontaminate.byEmbedding(
        emb.where(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
        bench, tau = 0.25)
    }),

    // ---- MEMORY convex-fusion hybrid (MemoryServer.searchHybridNorm):
    // q176's min-max-normalized combiner served job-free — per-leg
    // normalization over each leg's own pool, 0.6·dense + 0.4·lexical
    // in pinned leg order, bit-identical to the batch normFuseLocal.
    "q203_memory_norm_fusion" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 19)
      val qv = storedVecs(emb, 19).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val docs = rdPar(s, dir, "documents")
      val postings = graft.operators.Bm25.buildPostings(docs, "doc_id", "text")
      val stats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val avgdl = stats.getLong(0).toDouble / stats.getLong(1).toDouble
      val dfMap = postings.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val idfMap = graft.operators.Bm25.idfByTerm(dfMap, stats.getLong(1), s)
      val server = new graft.serve.MemoryServer(
        graft.serve.MemoryAnnIndex.fromDataFrame(
          Ann.withIvfAssignment(corpus, "embedding", cents),
          "vec_id", "embedding", "ivf_cell", cents),
        Some(graft.serve.MemoryPostingsIndex.fromDataFrame(
          postings, "doc_id", idfMap, avgdl)))
      server.searchHybridNorm(qv, Seq("dup", "query"), k = 10, poolK = 20)
        .toDF("id", "fused")
    }),

    // ---- SERVING PIPELINE E2E (the retrieval capstone): metadata
    // filter (lang) pushed BEFORE retrieval → dense + lexical legs over
    // the SAME filtered corpus → RRF fusion to a 20-candidate pool →
    // MMR diversification to the final 5. Every stage is an
    // already-gated operator (q18 filter, q17 dense, q162 BM25, q163
    // RRF, q165 MMR); this gates their COMPOSITION — stage coupling,
    // not stage correctness, is what e2e oracles catch (the q69 lesson).
    "q200_serving_pipeline_e2e" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val docs = rdPar(s, dir, "documents")
      val qv = storedVecs(emb, 13).head
      val byRank = Window.orderBy(col("score").desc, col("id"))
      val en = docs.where(col("lang") === "en")
      val corpus = emb.join(en.select(col("doc_id").as("vec_id")), "vec_id")
        .where(col("vec_id") =!= 13)
      val dense = Ann.topK(corpus, "vec_id", "embedding", qv, 20)
        .select(col("vec_id").as("id"), col("score"))
        .withColumn("rank", row_number().over(byRank))
      val lexical = graft.operators.Bm25.search(en, "doc_id", "text",
          Seq("dup", "vector"), k = 20)
        .select(col("doc_id").as("id"), col("score"))
        .withColumn("rank", row_number().over(byRank))
      val fused = graft.operators.Bm25.rrfFuse(Seq(dense, lexical),
        "id", "rank", c = 60, k = 20)
      val pool = fused.join(
        emb.select(col("vec_id").as("id"), col("embedding")), "id")
      graft.operators.Mmr.rerank(pool, "id", "embedding", "rrf",
        k = 5, lambda = 0.7)
    }),

    // ---- DELETION PROPAGATION, corpus side (operators/Forget): the
    // "right to be forgotten" sweep — the purge set broadcasts and the
    // corpus anti-joins map-side; the post-purge aggregate must equal
    // SQL over the remaining docs.
    "q201_forget_purge" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      val purged = docs.where(col("doc_id") % 13 === 0).select("doc_id")
      graft.operators.Forget.purgeCorpus(docs, "doc_id", purged, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
    }),

    // ---- DELETION PROPAGATION, lexical-index side: the postings amend
    // INCREMENTALLY (only purged docs' rows drop; N/Σdl/df update by
    // exact integer subtraction, idf recomputes from the amended df) and
    // the served BM25 scores must equal a full rebuild over the
    // remaining corpus, bit-for-bit.
    "q202_forget_postings_search" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      val postings = graft.operators.Bm25.buildPostings(docs, "doc_id", "text")
      val dstats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val (sumDl, n) = (dstats.getLong(0), dstats.getLong(1))
      val dfMap = postings.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val purgedIds = docs.where(col("doc_id") % 13 === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val deltas = graft.operators.Forget.lexDeltas(postings, docs,
        "doc_id", "text", purgedIds)
      val n2 = n - deltas.docsDropped
      val avgdl2 = (sumDl - deltas.dlDropped).toDouble / n2.toDouble
      val idf2 = graft.operators.Bm25.idfByTerm(
        graft.operators.Forget.updatedDf(dfMap, deltas), n2, s)
      graft.operators.Bm25.searchPostings(
        graft.operators.Forget.purgePostings(postings, "doc_id", purgedIds),
        "doc_id", Seq("dup", "stream"), idf2, avgdl2, k = 10)
    }),

    // ---- IR EVALUATION as a first-class operator (operators/Eval): the
    // engine grades its own retrieval — per-query recall@10 / reciprocal
    // rank / nDCG@10 of the exact top-10 against label relevance. ONE
    // (query,doc) join + ONE query-keyed agg, nothing collected but the
    // bounded query set; the DCG weights are fdlibm literals embedded on
    // both engines' sides, so no transcendental runs in either.
    "q204_ir_metrics" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      // FIXED query panel (vec_id < 500 covers the whole smallest SF): the
      // eval workload must not grow with the corpus, or the (query, doc)
      // judged join scales quadratically in SF while measuring nothing new
      val qset = emb.where(col("vec_id") % 25 === 0 && col("vec_id") < 500)
      val corpus = emb.where(col("vec_id") % 25 =!= 0)
      val queries = qset.orderBy("vec_id")
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      val ranked = Ann.topKBatch(corpus, "vec_id", "embedding", queries, k = 10)
      val qrels = qset.select(col("vec_id").as("qid"), col("label"))
        .join(corpus.select(col("vec_id"), col("label")), "label")
        .select("qid", "vec_id")
      graft.operators.Eval.rankingMetrics(ranked, qrels,
        "qid", "vec_id", "rank", k = 10)
    }),

    // ---- LEARNED-SPARSE retrieval (operators/Sparse): SPLADE-family
    // weighted sparse dot product — the postings scan prunes to the
    // query's terms (partition pruning under a term-partitioned layout),
    // products are map-side, ONE groupBy(id) sum; integer weights make
    // the score exact on both engines with no fold pinning.
    "q205_sparse_search" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      val sv = graft.operators.Sparse.tfVectors(docs, "doc_id", "text")
      graft.operators.Sparse.topKSparse(sv, "doc_id",
        Map("dup" -> 2L, "vector" -> 1L, "stream" -> 3L), k = 10)
    }),

    // ---- MEMORY sparse serving (serve/MemorySparseIndex): the same
    // integer dot product served job-free from term→(id,w) postings —
    // must equal plain SQL over the corpus exactly.
    "q206_memory_sparse" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val sv = graft.operators.Sparse.tfVectors(docs, "doc_id", "text")
      val mem = graft.serve.MemorySparseIndex.fromDataFrame(sv, "doc_id")
      mem.topK(Map("query" -> 3L, "dup" -> 1L), 10).toDF("doc_id", "score")
    }),

    // ---- PSEUDO-RELEVANCE-FEEDBACK expansion (operators/Rm3): BM25
    // round 1 → top-3 feedback docs (bounded, collected — they
    // parameterize the next plan) → top-2 non-query terms by summed tf
    // (ties alphabetical) → integer-weighted sparse re-query. The whole
    // two-round pipeline is oracle-exact: integer term mining + the
    // q205 dot product.
    "q207_rm3_expansion" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      graft.operators.Rm3.searchExpanded(docs, "doc_id", "text",
        Seq("dup", "query"), k = 10, fbK = 3, m = 2)
    }),

    // ---- PARENT-DOCUMENT retrieval (Ann.topKParents): the RAG
    // two-granularity pattern — retrieve precise CHUNKS, return deduped
    // PARENTS scored by their best chunk. Stage 2's window runs over the
    // bounded chunk pool, never the corpus.
    "q208_parent_retrieval" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val qv = storedVecs(emb, 29).head
      val chunks = emb.where(expr("vec_id div 4") =!= 7)
        .withColumn("parent_id", expr("vec_id div 4"))
      Ann.topKParents(chunks, "vec_id", "parent_id", "embedding",
        qv, k = 5, chunkPool = 20)
    }),

    // ---- TIME TRAVEL over the versioned sink (UpsertSink.readVersion):
    // version dirs are immutable, so "as of version N" is a plain scan of
    // the retained dir — no log replay. The query publishes v1 then v2 and
    // reads BOTH: v1's aggregate must show the pre-merge corpus even
    // though the current pointer moved on.
    "q209_time_travel" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q209").toString
      val table = s"$tmp/table"
      val docs = rd(s, dir, "documents")
      val b1 = docs.where(col("doc_id") % 3 === 0)
        .withColumn("version", lit(1L)).withColumn("prio", lit(0))
      val b2 = docs.where(col("doc_id") % 3 === 1)
        .withColumn("version", lit(2L)).withColumn("prio", lit(0))
      graft.streaming.UpsertSink.compactBatch(table, b1, Seq("doc_id"),
        "version", "prio", retainVersions = 3)
      graft.streaming.UpsertSink.compactBatch(table, b2, Seq("doc_id"),
        "version", "prio", retainVersions = 3)
      def summarize(df: DataFrame, v: Int): DataFrame =
        df.agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .select(lit(v).as("as_of"), col("n_docs"), col("total_chars"))
      summarize(graft.streaming.UpsertSink.readVersion(s, table, 1), 1)
        .unionByName(summarize(graft.streaming.UpsertSink.snapshot(s, table), 2))
    }),

    // ---- ANN SELF-EVALUATION (Ann.topKBatchIvf × Eval): the engine
    // measures its OWN index's recall, exactly — per-query recall@10 /
    // rr / nDCG of the IVF nProbe=2 retrieval against the exact top-10 as
    // the relevance set, the whole pipeline (assignment, probing, both
    // rankings, the metrics) oracle-gated. RECALL.md measures curves as a
    // tool; this is the same question as a first-class governed query.
    "q210_ann_eval" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      // FIXED query panel (vec_id < 500 covers the whole smallest SF): the
      // eval workload must not grow with the corpus, or the (query, doc)
      // judged join scales quadratically in SF while measuring nothing new
      val qset = emb.where(col("vec_id") % 25 === 0 && col("vec_id") < 500)
      val corpus = emb.where(col("vec_id") % 25 =!= 0)
      val queries = qset.orderBy("vec_id")
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val indexed = Ann.withIvfAssignment(corpus, "embedding", cents)
      val approx = Ann.topKBatchIvf(indexed, "vec_id", "embedding",
        "ivf_cell", cents, queries, k = 10, nProbe = 2)
      val exact = Ann.topKBatch(corpus, "vec_id", "embedding", queries, k = 10)
      graft.operators.Eval.rankingMetrics(approx,
        exact.select("qid", "vec_id"), "qid", "vec_id", "rank", k = 10)
    }),

    // ---- INDEX DRIFT monitor (operators/IndexDrift): the QUALITY half
    // of index maintenance — per-cell integer counters of vectors poorly
    // described by EVERY centroid (best cosine < tau), with the rebuild
    // flag tested by integer cross-multiplication against a rational
    // threshold (no float division). Counters are sum-mergeable, so the
    // streaming form is UpsertSink.accumulateBatch with no new machinery.
    "q211_index_drift" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val cents = Ann.sampleCentroids(emb, "vec_id", "embedding", 4)
      graft.operators.IndexDrift.rebuildFlags(
        graft.operators.IndexDrift.cellCounters(emb, "embedding", cents,
          tau = 0.2),
        minN = 5L, p = 1L, q = 4L)
    }),

    // ---- FUZZY term matching (operators/Fuzzy): the "did you mean"
    // front end — typo'd query terms route to their edit-distance-1
    // vocabulary neighbors via the SymSpell deletion-neighborhood
    // EQUI-join (vocab exploded once, query variants broadcast; exact
    // levenshtein verifies only the join survivors — never an all-pairs
    // scan of the vocabulary).
    "q212_fuzzy_terms" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      val vocab = graft.operators.Sparse.tfVectors(docs, "doc_id", "text")
        .groupBy("term").agg(count(lit(1)).as("df"))
      graft.operators.Fuzzy.matchTerms(vocab, "term",
        Seq("strem", "dup", "qury", "zzzz"))
    }),

    // ---- OPTIMIZE compaction (streaming/Optimize): small-file rewrite
    // as a crash-safe VERSIONED PUBLISH — readers keep snapshot
    // isolation, time travel keeps the pre-compaction version, a crash
    // leaves the old version current. The gate pins content invariance
    // through the rewrite; the layout effect (file count collapses to
    // the byte-budget target) is spec-asserted.
    "q213_optimize_compaction" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q213").toString
      val table = s"$tmp/table"
      val b = rd(s, dir, "documents")
        .withColumn("version", lit(1L)).withColumn("prio", lit(0))
      graft.streaming.UpsertSink.compactBatch(table, b, Seq("doc_id"),
        "version", "prio")
      graft.streaming.Optimize.optimize(s, table, targetBytes = Long.MaxValue)
      graft.streaming.UpsertSink.snapshot(s, table)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
    }),

    // ---- MACRO eval metrics (Eval.macroMetrics): q204's per-query
    // report folded to the headline numbers (mean recall@10 / MRR / mean
    // nDCG@10) with a pinned TWO-LEVEL summation — per-bucket in-query
    // order, then bucket-ascending — so the means are bit-exact without
    // ever collecting all queries into one row.
    "q214_ir_macro" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      // FIXED query panel (vec_id < 500 covers the whole smallest SF): the
      // eval workload must not grow with the corpus, or the (query, doc)
      // judged join scales quadratically in SF while measuring nothing new
      val qset = emb.where(col("vec_id") % 25 === 0 && col("vec_id") < 500)
      val corpus = emb.where(col("vec_id") % 25 =!= 0)
      val queries = qset.orderBy("vec_id")
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      val ranked = Ann.topKBatch(corpus, "vec_id", "embedding", queries, k = 10)
      val qrels = qset.select(col("vec_id").as("qid"), col("label"))
        .join(corpus.select(col("vec_id"), col("label")), "label")
        .select("qid", "vec_id")
      graft.operators.Eval.macroMetrics(
        graft.operators.Eval.rankingMetrics(ranked, qrels,
          "qid", "vec_id", "rank", k = 10),
        "qid", Seq("recall", "rr", "ndcg"), bucketSize = 16L)
    }),

    // ---- VIDEO FRAME decode (Multimodal.videoFrames): real frame-level
    // decode of per-frame-coded AVI (Motion PNG here — lossless, so the
    // per-frame luma sums are a closed form the oracle states exactly;
    // MJPG rides the same RIFF walk, spec-verified). Every 2nd frame
    // sampled — the training-pipeline frame sampler.
    "q215_video_frames" -> ((s, dir) => {
      val media = Multimodal.syntheticAviMedia(s, 200)
      Multimodal.videoFrames(media, sampleEvery = 2).toDF()
    }),

    // ---- RESIDUAL IVF-PQ (Ann.withResiduals/topKIvfResidualPq): the
    // FAISS IndexIVFPQ layout — codes quantize r = x − centroid(cell)
    // (residuals cluster near zero, so the same codebook budget buys
    // lower distortion than raw-vector PQ, q129's form), ADC tables are
    // per-probed-cell (query residual vs the shared residual codebooks),
    // selected per row by a codegen when-ladder; exact rerank restores
    // exact ordering of the candidate set.
    "q216_ivf_rpq_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 7)
      val qv = storedVecs(emb, 7).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val resid = Ann.withResiduals(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "embedding", "ivf_cell", cents)
      val books = Ann.pqCodebooks(resid, "vec_id", "residual", m = 2, ksub = 4)
      val coded = Ann.withPqCodes(resid, "residual", books)
      Ann.topKIvfResidualPq(coded, "vec_id", "embedding", "ivf_cell",
          "pq_code", cents, books, qv, k = 5, nProbe = 2, rerankFactor = 3)
        .select("vec_id", "score")
    }),

    // ---- TYPO-CORRECTED lexical search (Fuzzy × Bm25): the "did you
    // mean" stage COMPOSED into retrieval — each typo'd term routes to
    // its best vocabulary neighbor (exact match first, then highest df,
    // then term asc — a pinned integer policy) and the corrected term
    // set drives BM25. Stage coupling gated end to end (the q200 lesson).
    "q217_corrected_search" -> ((s, dir) => {
      val docs = rdPar(s, dir, "documents")
      val vocab = graft.operators.Sparse.tfVectors(docs, "doc_id", "text")
        .groupBy("term").agg(count(lit(1)).as("df"))
      val matches = graft.operators.Fuzzy.matchTerms(vocab, "term",
        Seq("strem", "qury"))
      val w = Window.partitionBy("query_term").orderBy(
        (col("term") === col("query_term")).desc, col("df").desc, col("term"))
      val corrected = matches.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select("term").collect().map(_.getString(0)).toSeq.distinct.sorted
      graft.operators.Bm25.search(docs, "doc_id", "text", corrected, k = 10)
        .select("doc_id", "score")
    }),

    // ---- MEMORY residual IVF-PQ serving (serve/MemoryRpqIndex): the
    // FAISS IndexIVFPQ layout served job-free — per-cell inverted code
    // lists, one ADC table per probed cell from the query's residual,
    // bounded candidate pool ACROSS probed cells, exact rerank.
    "q218_memory_rpq" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 23)
      val qv = storedVecs(emb, 23).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val resid = Ann.withResiduals(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "embedding", "ivf_cell", cents)
      val books = Ann.pqCodebooks(resid, "vec_id", "residual", m = 2, ksub = 4)
      val coded = Ann.withPqCodes(resid, "residual", books)
      val mem = graft.serve.MemoryRpqIndex.fromDataFrame(coded, "vec_id",
        "embedding", "ivf_cell", "pq_code", cents, books)
      mem.topK(qv, 5, nProbe = 2, rerankFactor = 3).toDF("vec_id", "score")
    }),

    // ---- MULTI-PROBE LSH (Ann.multiProbeBuckets): q44's sign-bucket
    // search plus every single-bit-flip bucket — the buckets just across
    // each hyperplane boundary, where near-boundary true neighbors land.
    // Recall insurance without more hash tables; on a bucket-partitioned
    // layout the probe isin is partition pruning.
    "q219_lsh_multiprobe" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val Seq(qvec, p1, p2, p3) = storedVecs(emb, 0, 3, 4, 5)
      val planes = Seq(p1, p2, p3)
      val corpus = Ann.withHyperplaneBuckets(
        emb.where(col("vec_id") =!= 0), "embedding", planes)
      Ann.topKLshMultiProbe(corpus, "vec_id", "embedding", "lsh_bucket",
          planes, qvec, k = 5)
        .select("vec_id", "score")
    }),

    // ---- WAND dynamic pruning (Broder et al., CIKM'03) on the memory
    // postings tier: document-at-a-time top-k that skips documents whose
    // per-term upper-bound sum cannot reach the running k-th best score.
    // The corpus's own skew is the test: 'dup' matches 26 docs at high
    // idf while 'merge'/'sort' match ~450 each at low idf, so once the
    // heap fills with dup-bearing docs the common-only tail is never
    // scored. Pruning is answer-preserving by construction (guarded
    // bound comparison, full evals fold term-ascending) — the oracle is
    // q162's exhaustive transcription, unchanged.
    "q220_wand_search" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val postings = graft.operators.Bm25.buildPostings(docs, "doc_id", "text")
      val stats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val avgdl = stats.getLong(0).toDouble / stats.getLong(1).toDouble
      val dfMap = postings.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val idfMap = graft.operators.Bm25.idfByTerm(dfMap, stats.getLong(1), s)
      val mem = graft.serve.MemoryPostingsIndex.fromDataFrame(
        postings, "doc_id", idfMap, avgdl)
      val (hits, evaluated, _) = mem.searchWandCounted(
        Seq("dup", "merge", "sort"), 10)
      require(evaluated < stats.getLong(1),
        s"WAND evaluated every corpus doc ($evaluated) — pruning inert")
      hits.toDF("doc_id", "score")
    }),

    // ---- semi-supervised label propagation over the q39 near-dup pair
    // graph: seed labels (every 7th doc, labeled by id parity so
    // CONFLICTING labels meet inside components) spread for 3 synchronous
    // rounds — majority vote, argmax by (votes DESC, label ASC). All
    // integer decisions, so the full propagation is bit-portable; the
    // oracle replays the 3 rounds as chained CTEs on the shared pair
    // fragment. The curation use: extend sparse human quality labels to
    // near-duplicate neighborhoods before training a classifier.
    "q221_label_propagation" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      val seeds = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, lit("even"))
            .otherwise(lit("odd")).as("label"))
      graft.operators.Components.labelPropagate(
        pairs.select("id_a", "id_b"), seeds, "doc_id", "label", rounds = 3)
    }),

    // ---- skyline (Pareto frontier) document selection: keep every doc
    // no other doc beats on chars AND tokens AND vocabulary richness at
    // once — the multi-criteria curation selector where any weighted
    // score would impose an arbitrary trade-off. Distributed SFS: the
    // dim-sum-DESC sort makes each partition's frontier append-only
    // (strict dominators have strictly larger sums over integers), so
    // phase 1 is map-side and only local frontiers reach the final
    // task. All comparisons integer -> the oracle is the literal
    // NOT EXISTS dominance definition.
    "q222_skyline_docs" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_kinds",
          size(array_distinct(split(col("text"), " "))).cast("long"))
      graft.operators.Skyline.skyline(docs, "doc_id",
        Seq("n_chars", "n_toks", "n_kinds"))
    }),

    // ---- PageRank over the customer→supplier purchase graph (link
    // analysis joins the surface): 3 power iterations of the simple
    // form, dangling mass not redistributed. Node ids disambiguate the
    // two key spaces as cust·2 / supp·2+1; every float step is either a
    // correctly-rounded divide or an ORDER-PINNED in-neighbor fold
    // (src ascending), so 3 chained iterations hash-compare exactly.
    "q223_pagerank_purchase_graph" -> ((s, dir) => {
      val orders = rd(s, dir, "orders")
      val li = rd(s, dir, "lineitem")
      val edges = orders
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      graft.operators.PageRank.pageRank(edges, iters = 3)
    }),

    // ---- MIPS (max inner product) retrieval: the un-normalized metric
    // recommendation/LTR scores live in — magnitude carries signal, so
    // cosine is the WRONG metric (AnnSpec plants a long-vector row that
    // MIPS must rank first and cosine must not). Exact scan here; the
    // Bachrach RecSys'14 augmentation (spec'd) lets the same queries
    // ride the cosine IVF/HNSW index stack at scale.
    "q224_mips_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val qv = storedVecs(emb, 11).head
      Ann.topKMips(emb.where(col("vec_id") =!= 11), "vec_id", "embedding",
          qv, 10)
        .select("vec_id", "score")
    }),

    // ---- STREAMING Misra-Gries heavy hitters (streaming/MgStream): the
    // per-group counter table accumulates across micro-batches with the
    // mergeable-summaries rule (sum by token, subtract the (cap+1)-th
    // largest, drop non-positives) replayed relationally. Inside the
    // exactness window (capacity >= per-group distinct tokens) the
    // accumulated table equals exact counts, so sliced arrival lands on
    // q110's batch oracle VERBATIM — the q161/q173/q178 accumulate
    // discipline for the MG family.
    "q225_streaming_heavy_hitters" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q225").toString
      val docs = rd(s, dir, "documents")
      (1 to 2).foreach { i =>
        docs.where(pmod(col("doc_id"), lit(2)) === lit(i - 1))
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q225: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/mg"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            graft.streaming.MgStream.accumulateBatch(table,
              graft.streaming.MgStream.mgPartial(batch, "source", "text",
                capacity = 1024),
              "source", capacity = 1024, batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val byRank = Window.partitionBy(col("source"))
        .orderBy(col("n").desc, col("token"))
      val top = s.read.parquet(table)
        .withColumn("rnk", row_number().over(byRank).cast("long"))
        .where(col("rnk") <= 5)
        .select(col("source"), col("token"), col("n").as("n_occ"), col("rnk"))
      val result = s.createDataFrame(top.collectAsList(), top.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- LTR training-set construction (operators/Ltr): candidate
    // generation (BM25-matched ∪ dense top-pool, self excluded) +
    // per-candidate features (bm25 with 0.0-for-unmatched, codegen
    // cosine, dl, n_chars) + weak labels from the exact dense top-10 —
    // the ranking pipeline's nightly feature job, every fragment an
    // already-gated transcription composed under ONE hash.
    "q226_ltr_features" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val Seq(qv1, qv2) = storedVecs(emb, 7, 13)
      graft.operators.Ltr.featureTable(
        rdPar(s, dir, "documents"), emb, "doc_id", "vec_id",
        Seq((1L, Seq("dup", "stream"), qv1, 7L),
          (2L, Seq("merge", "sort"), qv2, 13L)),
        labelK = 10, densePool = 20)
    }),

    // ---- triangle counting / clustering coefficients over the q39
    // near-dup pair graph: the graph-SHAPE diagnostic component closure
    // (q62) is blind to — high-coefficient components are tight template
    // families (collapse freely), zero-triangle stars are one hub
    // spuriously similar to many unrelated docs (collapse over-deletes).
    // Degree-ordered node-iterator: each triangle counted at its
    // order-minimum vertex, wedge volume O(E^1.5), hubs root no wedges.
    // All-integer decisions; the oracle is the same wedge-close join
    // chain on the shared pair fragment.
    "q227_triangle_counts" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      graft.operators.Triangles.triangleCounts(pairs.select("id_a", "id_b"))
        .withColumnRenamed("id", "doc_id")
    }),

    // ---- cohort retention matrix over events: users grouped by
    // first-seen ISO week, distinct-active counts at each week offset.
    // The raw stream is touched ONCE (map-side project + partial-dedup
    // distinct); the per-user min, offset join, and matrix agg all run
    // on the compacted (user, week) relation — bounded by users×weeks,
    // never event count. All-integer (week starts exact, offsets exact
    // multiples of 7 days), so the matrix is bit-portable.
    "q228_cohort_retention" -> ((s, dir) =>
      graft.operators.Retention.cohortRetention(
        events(s, dir), "user_id", "ts")),

    // ---- hard-negative mining for contrastive training: per anchor,
    // the top-10 most-cosine-similar rows with a DIFFERENT label — the
    // decision-boundary lookalikes a margin loss learns from (q99's ring
    // draws negatives uniformly; this draws them adversarially). One
    // topKBatch-shaped job: anchors broadcast, codegen cosine map-side,
    // label exclusion BEFORE the bounded heap.
    "q229_hard_negatives" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val anchors = emb.where(col("vec_id").isin(7L, 13L))
        .select("vec_id", "embedding", "label").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq, r.getInt(2)))
        .sortBy(_._1).toSeq
      Ann.hardNegatives(emb, "vec_id", "embedding", "label",
        anchors, nNeg = 10)
        .select("qid", "vec_id", "score")
    }),

    // ---- market-basket association rules over order⋈part baskets:
    // directional brand⇒brand rules with support and confidence floors.
    // q128's lift is symmetric surprise; rules add DIRECTION and the
    // Apriori pruning pushed into the plan — the frequent-item set
    // broadcast-semi-joins onto occurrences BEFORE pair generation, so
    // the long tail never reaches the self-join. Confidence gate =
    // integer cross-multiplication; reported confidence/lift are each
    // one correctly-rounded division.
    "q230_association_rules" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
      val part = rd(s, dir, "part")
      val baskets = li.join(part, col("p_partkey") === col("l_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      graft.operators.Cooccur.associationRules(baskets,
        "l_orderkey", "p_brand", minSupport = 20L, confP = 1L, confQ = 8L)
    }),

    // ---- JL sign-projection search: 64→16 deterministic ±1 projection
    // (map-side codegen folds, no shuffle — the scan-byte lever at
    // 100 TB), candidate top-50 in projected space, exact cosine rerank
    // over the ORIGINAL vectors on the bounded pool. The query projects
    // through the ENGINE's own fold (its stored proj row), so projected
    // scores are bit-identical to the oracle's transcription.
    "q231_jl_projection_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val signs = Ann.signMatrix(dim = 64, outDim = 16)
      val proj = Ann.withSignProjection(emb, "embedding", signs, "proj")
      val qp = proj.where(col("vec_id") === 11L)
        .select("proj").head.getSeq[Float](0).toSeq
      val qv = storedVecs(emb, 11).head
      val cands = Ann.topK(proj.where(col("vec_id") =!= 11L),
        "vec_id", "proj", qp, 50)
      cands.select("vec_id").join(emb, "vec_id")
        .select(col("vec_id"),
          graft.functions.VectorFunctions.cosineSim(
            col("embedding"), typedlit(qv)).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(10)
    }),

    // ---- streaming cohort retention: the accumulate state IS the
    // compacted distinct (uid, wk) relation — distinct-union is the
    // textbook mergeable summary, so the accumulate is EXACT under any
    // slicing (no exactness window) and the derived matrix lands on the
    // batch oracle verbatim. State bounded by users×weeks; published
    // through UpsertSink's crash-safe swap.
    "q232_streaming_retention" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q232").toString
      val ev = events(s, dir)
      (1 to 3).foreach { i =>
        ev.where(pmod(col("event_id"), lit(3)) === lit(i - 1))
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q232: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/uw"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            graft.streaming.RetentionStream.accumulateBatch(table,
              graft.streaming.RetentionStream.uwPartial(batch, "user_id", "ts"),
              batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val matrix = graft.streaming.RetentionStream.matrix(s, table)
      val result = s.createDataFrame(matrix.collectAsList(), matrix.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- first-order Markov transition matrix over per-user event
    // sequences: the funnels (q164+) CHECK a hypothesized step order;
    // this FINDS the orders worth hypothesizing. ONE per-entity window
    // shuffle (lead over the pinned (ts, event_id) total order — ts
    // alone would be tie-nondeterministic), then a hash agg over the
    // bounded state×state key space. Integer counts; p = one division.
    "q233_event_transitions" -> ((s, dir) =>
      graft.operators.Transitions.transitionMatrix(
        events(s, dir), "user_id",
        Seq(col("ts"), col("event_id")), "event_type")),

    // ---- 2-core of the near-dup graph: the density filter — tight
    // template families survive the peel, chains and stars dissolve
    // (the "collapse only the dense part" curation selector; q227
    // scores closure, this extracts the dense subgraph). Each round ONE
    // degree agg + two node-key semi-joins on a strictly shrinking edge
    // set; 6-round contract, early-exit ≡ fixed-round replay once
    // converged. All-integer.
    "q234_kcore_docs" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 1, threshold = 0.9)
      graft.operators.KCore.kCore(pairs.select("id_a", "id_b"),
        k = 2, maxRounds = 6)
        .withColumnRenamed("id", "doc_id")
    }),

    // ---- entity resolution across two derived "source systems" of the
    // customer table (billing: odd keys only, name uppercased and
    // missing for every 3rd, balance rounded to dollars, segment
    // degraded for every 5th): Fellegi-Sunter integer agree/disagree/
    // missing weights summed and thresholded into match / possible —
    // the possible band IS the clerical-review queue. Candidates from
    // the nation-block equi-join (never A×B), scoring map-side codegen,
    // non-matches dropped before anything downstream.
    // NOTE: this nation-only blocking is the COARSE-KEY DEMO — its own
    // audit (q236) flags every block oversized as data grows; q260 is
    // the production form (banded key, audit-gated). Like q238, the
    // demo runs on an explicit BOUNDED SAMPLE (custkey <= 15,000, in
    // the oracle too): the match/possible/clerical-queue semantics are
    // input-size-free, so the coarse key never inherits corpus growth —
    // the nation blocks stay audit-sized by construction instead of
    // going quadratic with SF.
    "q235_entity_resolution" -> ((s, dir) => {
      val (a, b) = erSides(s, dir, sampleCap = 15000L)
      graft.operators.EntityResolution.scorePairs(a, b, Seq("nation"),
        erFieldScores, matchMin = 7L, possibleMin = 3L)
        .select("a_key", "b_key", "score", "cls")
    }),

    // ---- blocking-quality audit of q235's linkage: per block, both
    // sides' counts and the pair volume the equi-join WOULD generate
    // (from counts — no pair materialized), oversized blocks named for
    // salting, one-sided blocks surfaced as coverage gaps. The
    // pre-flight a 100 TB blocked join runs before committing.
    "q236_blocking_audit" -> ((s, dir) => {
      val cust = rd(s, dir, "customer")
      val a = cust.select(col("c_nationkey").as("nation"))
      val b = cust.where(col("c_custkey") % 2 === 1)
        .select(col("c_nationkey").as("nation"))
      graft.operators.EntityResolution.blockingAudit(a, b, Seq("nation"),
        maxPairs = 50000L)
    }),

    // ---- streaming transition matrix: the first carry-state
    // accumulate — a transition can straddle a batch boundary, so each
    // user's latest event rides in a one-row-per-user `last` table and
    // prepends to the next batch; counts stay sum-mergeable. Slices are
    // event-time ranges (the exactness contract), so the accumulated
    // matrix lands on q233's batch oracle verbatim.
    "q237_streaming_transitions" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q237").toString
      val ev = events(s, dir)
      val cuts = Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00")
        .map(t => lit(t).cast("timestamp"))
      val slices = Seq(
        ev.where(col("ts") < cuts(0)),
        ev.where(col("ts") >= cuts(0) && col("ts") < cuts(1)),
        ev.where(col("ts") >= cuts(1)))
      slices.zipWithIndex.foreach { case (sl, i) =>
        sl.coalesce(1).write.parquet(f"$tmp/in/slice_${i + 1}%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_${i + 1}%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + (i + 1) * 60000L))
            sys.error(s"q237: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/trans"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            graft.streaming.TransitionStream.accumulateBatch(table, batch,
              "user_id", "ts", "event_id", "event_type",
              batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val matrix = graft.streaming.TransitionStream.matrix(s, table)
      val result = s.createDataFrame(matrix.collectAsList(), matrix.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- ER threshold calibration: q235's scorer re-run unfiltered
    // against ground truth (same-custkey), collapsed to one row per
    // DISTINCT SCORE map-side, then cumulative precision/recall per
    // threshold over the score-alphabet-sized relation. The flag marks
    // thresholds clearing precision >= 95/100 by exact
    // cross-multiplication — pick the smallest to maximize recall.
    // NOTE: nation-only calibration on a BOUNDED LABELED SAMPLE
    // (custkey <= 15,000 — explicit, in the oracle too). Threshold
    // calibration is a TRAINING step: it needs representative ground
    // truth, not the whole corpus, so the coarse-key readout runs at
    // demo scale by construction and never inherits the corpus's
    // growth. The full-corpus, scale-safe calibration is q261 (banded).
    "q238_er_calibration" -> ((s, dir) => {
      val (a, b) = erSides(s, dir, sampleCap = 15000L)
      val scored = graft.operators.EntityResolution.scorePairs(a, b,
        Seq("nation"), erFieldScores, matchMin = 7L, possibleMin = -100L)
      graft.operators.EntityResolution.thresholdReport(scored,
        col("a_key") === col("b_key"), precP = 95L, precQ = 100L)
    }),

    // ---- feature-distribution drift: per event_type, did the value
    // distribution move between the month's halves? Discretized KS over
    // a literal grid — ONE aggregation pass per side (n + a conditional
    // codegen sum per grid point; no sort, no explode), max gap over
    // integer cross-products, verdict by rational cross-multiplication;
    // ks = one division. IndexDrift (q211) watches embeddings, this
    // watches scalar features.
    "q239_feature_drift" -> ((s, dir) => {
      val ev = events(s, dir)
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val cuts = (1 to 20).map(_ * 25.0)
      graft.operators.Drift.ksDrift(
        ev.where(col("ts") < cut), ev.where(col("ts") >= cut),
        "event_type", "value", cuts, tauP = 3L, tauQ = 100L)
    }),

    // ---- leave-one-out target encoding of market segment by order
    // value: the leakage control applied to feature engineering — a
    // row's own target never reaches its own feature, so the encoding
    // computes on the training table without a fold split. One bounded
    // per-category (sum, count) agg joined back (no broadcast hint —
    // high-cardinality categories are the point; AQE decides); exact
    // integer cents, enc = one division.
    "q240_target_encoding" -> ((s, dir) => {
      val oc = rd(s, dir, "orders")
        .join(rd(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      graft.operators.TargetEncode.looMean(oc, "seg", "cents", "enc")
        .select("o_orderkey", "seg", "enc")
    }),

    // ---- streaming drift monitor: the live half-month accumulates its
    // grid summary across 3 micro-batches by PLAIN COLUMN SUMS (exact
    // under any slicing — the simplest member of the accumulate
    // family), then the KS verdict against the frozen reference summary
    // derives from state and lands on q239's batch oracle verbatim.
    "q241_streaming_drift" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q241").toString
      val ev = events(s, dir)
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val cuts = (1 to 20).map(_ * 25.0)
      val live = ev.where(col("ts") >= cut)
      (1 to 3).foreach { i =>
        live.where(pmod(col("event_id"), lit(3)) === lit(i - 1))
          .coalesce(1).write.parquet(f"$tmp/in/slice_$i%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_$i%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + i * 60000L))
            sys.error(s"q241: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/grid"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(live.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            graft.streaming.DriftStream.accumulateBatch(table,
              graft.streaming.DriftStream.partial(batch, "event_type",
                "value", cuts),
              "event_type", cuts, batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val reference = graft.operators.Drift.summarize(
        ev.where(col("ts") < cut), "event_type", "value", cuts)
      val rep = graft.streaming.DriftStream.verdict(s, table, reference,
        "event_type", cuts, tauP = 3L, tauQ = 100L)
      val result = s.createDataFrame(rep.collectAsList(), rep.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- CUSUM change-point: q239 asks WHETHER two windows differ;
    // this localizes WHEN one stream drifted. The sequential recursion
    // reduces to two running window aggregates (prefix sum + prefix
    // min) — one hash shuffle by group, in-partition sort, all integer
    // cents, |groups| rows out.
    "q242_cusum_changepoint" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.operators.ChangePoint.cusumReport(ev, "event_type", "us",
        "event_id", "cents", allowance = 5000L, threshold = 400000L)
        .withColumnRenamed("first_alarm_ts", "first_alarm_us")
    }),

    // ---- k-anonymity / l-diversity audit: what the QUASI-identifiers
    // still reveal after q33's PII scrub — per (nation, segment,
    // balance-band) cell, group size vs k=5 and sensitive-value
    // diversity vs l=3. One hash agg; |cells| rows.
    "q243_k_anonymity_audit" -> ((s, dir) => {
      val c = rd(s, dir, "customer").select(col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0d).as("bal_band"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      graft.operators.Anonymity.audit(c,
        Seq("c_nationkey", "c_mktsegment", "bal_band"), col("cents"),
        k = 5L, l = 3L)
    }),

    // ---- local-recoding generalization: each row lands on the FINEST
    // ladder level whose cell reaches k=5 (last bucket = suppression);
    // the release report is the row distribution over levels.
    "q244_anonymity_recoding" -> ((s, dir) => {
      val c = rd(s, dir, "customer").select(col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0d).as("bal_band"))
      val ladder = Seq(
        Seq("c_nationkey", "c_mktsegment", "bal_band"),
        Seq("c_nationkey", "c_mktsegment"),
        Seq("c_mktsegment"))
      graft.operators.Anonymity.withRecodeLevel(c, ladder, k = 5L)
        .groupBy("anon_level").agg(count(lit(1)).as("rows_at"))
    }),

    // ---- interval union (gaps-and-islands): per part, merge the
    // overlapping-or-touching transit windows [shipdate, shipdate +
    // quantity days] and report in-flight coverage — the RANGE sibling
    // of sessionization; two windows + one agg, no self-join, no
    // day-explode.
    "q245_interval_union" -> ((s, dir) => {
      val iv = rd(s, dir, "lineitem").select(col("l_partkey"),
        to_date(col("l_shipdate")).as("st"),
        date_add(to_date(col("l_shipdate")),
          col("l_quantity").cast("int")).as("en"),
        col("l_orderkey"), col("l_linenumber"))
      graft.operators.Intervals
        .mergeIntervals(iv, Seq("l_partkey"), "st", "en",
          Seq(col("l_orderkey"), col("l_linenumber")))
        .groupBy("l_partkey")
        .agg(sum("n_merged").as("n_shipments"),
          count(lit(1)).as("n_islands"),
          sum(datediff(col("island_end"), col("island_start")) + 1)
            .as("covered_days"),
          max(datediff(col("island_end"), col("island_start")) + 1)
            .cast("long").as("longest_days"))
    }),

    // ---- personalized PageRank (random walk with restart): q223's
    // machinery with the teleport mass pinned to a 2-customer seed set
    // over the SYMMETRIZED purchase graph — ranks become multi-hop
    // proximity to the seeds (the related-items form), unreachable
    // components stay exactly 0. Same pinned folds, hash-green chained.
    "q246_personalized_pagerank" -> ((s, dir) => {
      val orders = rd(s, dir, "orders")
      val li = rd(s, dir, "lineitem")
      val fwd = orders
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // symmetrize with ONE explode (a union's two branches would run
      // the join+distinct twice inside PageRank's edge checkpoint)
      val edges = fwd.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      graft.operators.PageRank.personalizedPageRank(edges,
        seeds = Seq(2L, 4L), iters = 3)
    }),

    // ---- ε-DP noisy release: per-(type, day) event counts with
    // SEEDED Laplace(1/ε) noise — md5 hash-uniform of the group key →
    // inverse CDF through the pinned DetMath ln, so the same release
    // reproduces bit-for-bit on both engines (re-randomizing per run
    // would let an observer average the noise away). ε = 0.5.
    "q247_dp_noisy_counts" -> ((s, dir) => {
      val ev = events(s, dir).where(col("event_type").isNotNull)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_idx"))
      // public demo salt: the oracle must replay identical noise, so
      // this is a reproducible mechanism DEMO — a real release passes a
      // secret per-epoch key here (see Privacy.noisyCounts contract)
      graft.operators.Privacy
        .noisyCounts(ev, Seq("event_type", "day_idx"), epsilon = 0.5,
          salt = ":dp")
        .select("event_type", "day_idx", "noisy_n", "released_n")
    }),

    // ---- exact equi-depth binning: the quantile discretizer with the
    // dictionary trick — ranks come from the 50-value distinct relation
    // (the only thing sorted), rows join their bin back map-side; ties
    // are atomic by construction (bins go honest-unequal instead of
    // splitting a value). All integer cut math.
    "q248_equidepth_binning" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("qty"))
      graft.operators.Binning.withEquiDepthBin(li, "qty", 8)
        .groupBy("bin").agg(count(lit(1)).as("n_rows"),
          min("qty").as("lo"), max("qty").as("hi"))
    }),

    // ---- exact-k weighted sampling without replacement (A-ES):
    // "exactly 100 docs, length-weighted" — each row draws e =
    // −ln(u)/w through the pinned series, the 100 smallest win; one
    // map-side key + one TakeOrdered, no global sort.
    "q249_weighted_sample" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      graft.operators.Sampling
        .weightedSampleExactK(docs, "doc_id", "n_chars", k = 100)
        .select("doc_id", "n_chars", "aes_key")
    }),

    // ---- CUBE grouping sets: all four (returnflag × linestatus)
    // granularities in ONE pass with grouping_id disambiguating the
    // subtotal level — the OLAP rollup surface; Spark expands the sets
    // before the hash agg, so it stays one shuffle, not four queries.
    "q250_cube_rollup" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_linestatus"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum("qty").as("sum_qty"), sum("cents").as("sum_cents"))
    }),

    // ---- STREAMING CUSUM: order-dependent, so plain sums do NOT
    // suffice (contrast q241) — the carry state is four integers per
    // group (c_end, min_c, peak_s, first_alarm) composed batch-by-batch
    // via the prefix-min identity. Three event-time slices (the q237
    // contract) land on q242's batch oracle verbatim.
    "q251_streaming_cusum" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q251").toString
      val ev = events(s, dir).select(col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      val c1 = lit("2024-01-11 00:00:00").cast("timestamp")
      val c2 = lit("2024-01-21 00:00:00").cast("timestamp")
      val cutsUs = Seq(unix_micros(c1), unix_micros(c2))
      val ranges = Seq(
        col("us") < cutsUs.head,
        col("us") >= cutsUs.head && col("us") < cutsUs(1),
        col("us") >= cutsUs(1))
      ranges.zipWithIndex.foreach { case (cond, i) =>
        ev.where(cond).coalesce(1)
          .write.parquet(f"$tmp/in/slice_${i + 1}%03d")
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(f"$tmp/in/slice_${i + 1}%03d"))
        try walk.forEach { p =>
          if (!p.toFile.setLastModified(1000000000000L + (i + 1) * 60000L))
            sys.error(s"q251: setLastModified failed for $p")
        } finally walk.close()
      }
      val table = s"$tmp/state"
      withStreamPartitions(s) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$tmp/in/*")
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            graft.streaming.CusumStream.accumulateBatch(table, batch,
              "event_type", "us", "event_id", "cents",
              allowance = 5000L, threshold = 400000L, batchId = Some(bid))
        }
          .option("checkpointLocation", s"$tmp/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val rep = graft.streaming.CusumStream
        .verdict(s, table, "event_type", threshold = 400000L)
        .withColumnRenamed("first_alarm_ts", "first_alarm_us")
      val result = s.createDataFrame(rep.collectAsList(), rep.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- STREAMING k-anonymity gate: cell counts sum-merge (exact),
    // l-diversity via the max-mergeable HLL register table (q160's
    // sketch — exact ndv is the one thing that can't stream in bounded
    // state); both order-free, so ANY batch slicing lands on the batch
    // sketch bit-for-bit.
    "q252_streaming_anonymity" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q252").toString
      val c = rd(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").cast("string").as("sv"))
      (0 to 2).foreach { i =>
        graft.streaming.AnonymityStream.accumulateBatch(tmp,
          c.where(pmod(col("c_custkey"), lit(3)) === lit(i)),
          Seq("c_nationkey", "c_mktsegment"), col("sv"))
      }
      val rep = graft.streaming.AnonymityStream
        .audit(s, tmp, Seq("c_nationkey", "c_mktsegment"), k = 10L,
          lTau = 8.0)
        .select("c_nationkey", "c_mktsegment", "n", "hll_est", "k_ok",
          "l_ok_est")
      val result = s.createDataFrame(rep.collectAsList(), rep.schema)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      result
    }),

    // ---- Kaplan-Meier time-to-conversion: death = first big purchase
    // (value > 150, ~46% of users), censored at last observed event —
    // the estimator that gets conversion lag RIGHT under censoring. The
    // survival product rides 2^(−Σ lnDet(1/f)/LN2) so both engines
    // produce the same bits; Σ uses the rank-explode equi-join prefix
    // (measured: DuckDB window sums are segment-tree folds, not left
    // folds — a window Σ would diverge by ulps).
    "q253_kaplan_meier" -> ((s, dir) => {
      val e = events(s, dir)
      val base = e.groupBy("user_id").agg(
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      val deaths = e
        .where(col("event_type") === "purchase" && col("value") > 150)
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("p_us"))
      val subj = base.join(deaths, Seq("user_id"), "left")
        .select(
          expr("(coalesce(p_us, last_us) - first_us) div 3600000000")
            .as("dur_h"),
          when(col("p_us").isNotNull, 1).otherwise(0).as("ev"))
      graft.operators.Survival.kaplanMeier(subj, "dur_h", "ev")
    }),

    // ---- A/B readout: Welch z per event_type over a deterministic
    // hash split of users (growth-stable assignment, the splitAssign
    // idiom) — exact integer moments in one conditional agg, then a
    // pinned double chain ending in correctly-rounded sqrt; on this
    // untreated corpus the expected readout is "no effect", which is
    // exactly what an A/A run should say.
    "q254_ab_welch" -> ((s, dir) => {
      val ev = events(s, dir)
      val arm = (graft.operators.Sampling
        .uniformFromId(col("user_id"), ":ab") < lit(0.5)).cast("int")
      graft.operators.AbTest.welchReadout(
        ev.select(col("event_type"), arm.as("arm"),
          round(col("value") * 100).cast("long").as("cents")),
        "event_type", col("arm"), "cents")
    }),

    // ---- Poisson-bootstrap CI: the error bar on the per-type mean —
    // 100 coordination-free resamples (row-local Poisson(1) weights
    // from the seeded hash), each mean a ratio of integer sums, the
    // 95% interval the (3rd, 98th) order statistics of the 100.
    "q255_bootstrap_ci" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.operators.Bootstrap.meanCi(ev, "event_type", "event_id",
        "cents", b = 100, rankLo = 3, rankHi = 98)
    }),

    // ---- STREAMING interval union: the carry is the OPEN island per
    // key — with start-ordered arrival a new interval can only merge
    // into the last island (closed islands are immutable, the
    // relational form of the append-mode watermark argument). Three
    // shipdate-ranged slices land on q245's batch oracle verbatim.
    "q256_streaming_intervals" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q256").toString
      val table = s"$tmp/islands"
      val iv = rd(s, dir, "lineitem").select(col("l_partkey"),
        to_date(col("l_shipdate")).as("st"),
        date_add(to_date(col("l_shipdate")),
          col("l_quantity").cast("int")).as("en"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("tie"))
      val cuts = Seq(lit("1994-01-01").cast("date"),
        lit("1996-07-01").cast("date"))
      Seq(col("st") < cuts.head,
        col("st") >= cuts.head && col("st") < cuts(1),
        col("st") >= cuts(1)).foreach { cond =>
        graft.streaming.IntervalStream.accumulateBatch(table,
          iv.where(cond), "l_partkey", "st", "en", "tie")
      }
      // the report is O(|l_partkey|) rows — too big to ride the driver:
      // persist it and return the LAZY scan; only the state versions are
      // reclaimed (the report dir lives until the tmp filesystem does)
      try {
        graft.streaming.IntervalStream.islands(s, table)
          .groupBy("l_partkey")
          .agg(sum("n_merged").as("n_shipments"),
            count(lit(1)).as("n_islands"),
            sum(datediff(col("island_end"), col("island_start")) + 1)
              .as("covered_days"),
            max(datediff(col("island_end"), col("island_start")) + 1)
              .cast("long").as("longest_days"))
          .write.mode("overwrite").parquet(s"$tmp/report")
      } catch {
        case e: Throwable =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
          throw e
      }
      new java.io.File(tmp).listFiles().filter(_.getName != "report")
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      s.read.parquet(s"$tmp/report")
    }),

    // ---- exact tie-aware AUC: grade "n_chars predicts English" per
    // source with the Mann-Whitney U over the score dictionary —
    // 2·midrank keeps rank arithmetic integral, one divide at the end,
    // no pairwise work (the U identity IS the n⁺·n⁻ shortcut).
    "q257_auc_readout" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      graft.operators.Auc.groupedAuc(docs, "source", "n_chars",
        col("lang") === "en")
    }),

    // ---- split-conformal intervals: per segment, fit the train-half
    // mean, calibrate |y − ŷ| on the disjoint half, q̂ = the exact
    // ⌈(n+1)(1−α)⌉-th order statistic over the per-group residual
    // dictionary — a distribution-free ±q̂ band with the finite-sample
    // ≥90% guarantee. Where q255 bounds ESTIMATOR noise, this bounds
    // PREDICTION error.
    "q258_conformal_intervals" -> ((s, dir) => {
      val oc = rd(s, dir, "orders")
        .join(rd(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      graft.operators.Conformal.splitMeanIntervals(oc, "seg",
        "o_orderkey", "cents", alphaNum = 1, alphaDen = 10)
    }),

    // ---- CUPED variance reduction (Deng/Xu/Kohavi/Walker WSDM'13):
    // q254's Welch z with each unit's FIRST-half-month spend as the
    // covariate — θ pooled, every adjusted moment pure algebra over
    // one pass of integer sums (Σx Σy Σxy Σx² Σy² per arm), the
    // report carries raw z, CUPED z, and the measured variance ratio.
    "q259_cuped_readout" -> ((s, dir) => {
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val e = events(s, dir)
        .where(col("event_type").isNotNull && col("value").isNotNull &&
          col("user_id").isNotNull)
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val units = e.groupBy("user_id", "event_type").agg(
        sum(when(col("ts") < cut, col("cents")).otherwise(lit(0L)))
          .as("x"),
        sum(when(col("ts") >= cut, col("cents")).otherwise(lit(0L)))
          .as("y"))
      val arm = (graft.operators.Sampling
        .uniformFromId(col("user_id"), ":ab") < lit(0.5)).cast("int")
      graft.operators.Cuped.readout(units.withColumn("arm", arm),
        "event_type", col("arm"), "x", "y")
    }),

    // ---- q235's linkage with the blocking its OWN audit demands: the
    // nation-only key has a fixed 25-block alphabet, so blocks grow
    // linearly with the data and candidate pairs quadratically (q236
    // flags every block oversized at 10x). Refined key = (nation,
    // dollar-band) with a ±1-band union — a pure equi-join (b
    // replicated into its 3 admissible bands), exactly preserving the
    // ≤100-cent balScore agreement window; pairs further apart could
    // only ever score the -3 disagree weight and are never candidates.
    // The audit RUNS FIRST as a gate: any oversized refined block
    // fails the query (FullScaleBench enforces this at 10x too).
    "q260_er_banded_blocking" -> ((s, dir) => {
      val (a, b) = erSides(s, dir)
      val audit = graft.operators.EntityResolution.blockingAudit(
        a.select(col("nation"), col("a_band").as("band")),
        b.withColumn("band", explode(array(
          col("b_cents") - 100L, col("b_cents"), col("b_cents") + 100L)))
          .select("nation", "band"),
        Seq("nation", "band"), maxPairs = 2000L)
      require(audit.where(col("oversized")).isEmpty,
        "q260: refined blocking key produced an oversized block")
      graft.operators.EntityResolution.scorePairsBanded(a, b,
        Seq("nation"), "a_band", "b_cents", step = 100L,
        erFieldScores, matchMin = 7L, possibleMin = 3L)
        .select("a_key", "b_key", "score", "cls")
    }),

    // ---- threshold calibration over the BANDED candidate stream (the
    // scale-sane replacement for q238's nation-only calibration whose
    // pair volume SCALE10 flagged at 101.8x): same trained
    // Fellegi-Sunter readout, computed over candidates a production
    // linkage would actually generate. Score alphabet bounded, windows
    // over the alphabet-sized relation, precision flag by exact
    // cross-multiplication.
    "q261_er_banded_calibration" -> ((s, dir) => {
      val (a, b) = erSides(s, dir)
      val scored = graft.operators.EntityResolution.scorePairsBanded(a, b,
        Seq("nation"), "a_band", "b_cents", step = 100L,
        erFieldScores, matchMin = 7L, possibleMin = -100L)
      graft.operators.EntityResolution.thresholdReport(scored,
        col("a_key") === col("b_key"), precP = 95L, precQ = 100L)
    }),

    // ---- the notebook's Q3/Q5 request shape served JOB-FREE: an
    // @and[@eq, @or[@eq, @eq]] filtered search through the memory
    // tier's JSON front door. The parser compiles the boolean tree to
    // DNF; each conjunction branch probes k-bounded and the union
    // re-ranks — bit-identical to a per-row disjunction test (the
    // oracle IS that per-row test in SQL). Previously this exact
    // reference workload had to fall back to the job-per-request tier.
    "q262_memory_or_filter" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val docs = rd(s, dir, "documents")
        .select(col("doc_id").as("vec_id"), col("source"), col("lang"))
      val corpus = emb.where(col("vec_id") =!= 33).join(docs, "vec_id")
      val qv = storedVecs(emb, 33).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val mem = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents,
        metaCols = Seq("source", "lang"))
      val server = new graft.serve.MemoryServer(mem, None)
      val resp = server.search(
        s"""{"query_vector":[${qv.mkString(",")}],"limit":8,
           |"filter":{"@and":[
           |  {"@eq":{"source":"src3"}},
           |  {"@or":[{"@eq":{"lang":"en"}},{"@eq":{"lang":"de"}}]}]}}"""
          .stripMargin)
      val hit = """\{"id":"(-?\d+)","score":"([^"]+)"\}""".r
      hit.findAllMatchIn(resp)
        .map(m => (m.group(1).toLong, m.group(2).toDouble))
        .toSeq.toDF("vec_id", "score")
    }),

    // ---- @ne + @contains through the same front door: @ne compiles to
    // the two ranges around the excluded dictionary code, @contains to
    // one equality branch per matching dictionary value (bounded by the
    // categorical alphabet) — the request expands to a 22-branch DNF
    // and still serves k-bounded per branch.
    "q263_memory_ne_contains" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val docs = rd(s, dir, "documents")
        .select(col("doc_id").as("vec_id"), col("source"), col("lang"))
      val corpus = emb.where(col("vec_id") =!= 34).join(docs, "vec_id")
      val qv = storedVecs(emb, 34).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val mem = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents,
        metaCols = Seq("source", "lang"))
      val server = new graft.serve.MemoryServer(mem, None)
      val resp = server.search(
        s"""{"query_vector":[${qv.mkString(",")}],"limit":8,
           |"filter":{"@and":[
           |  {"@ne":{"lang":"en"}},
           |  {"@contains":{"source":"1"}}]}}""".stripMargin)
      val hit = """\{"id":"(-?\d+)","score":"([^"]+)"\}""".r
      hit.findAllMatchIn(resp)
        .map(m => (m.group(1).toLong, m.group(2).toDouble))
        .toSeq.toDF("vec_id", "score")
    }),

    // ---- seasonal-naive forecast backtest: per event_type, daily
    // event counts graded against ŷ_t = y_{t-7} (weekly seasonality).
    // The forecast joins on the TIME INDEX (t-7), never a row lag —
    // calendar gaps produce unscored points (n_scored < n_points), not
    // misalignment. Errors are integer diffs; mae/wape/bias are each
    // ONE correctly-rounded division of exact integer sums.
    "q264_backtest_seasonal" -> ((s, dir) => {
      val daily = events(s, dir).where(col("event_type").isNotNull)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_idx"))
        .agg(count(lit(1)).as("n_events"))
      graft.operators.Backtest.seasonalNaive(daily, "event_type",
        "day_idx", "n_events", season = 7)
    }),

    // ---- SHARDED flat-tier serving (serve/ShardedAnnIndex): the
    // 10 M-doc deployment form made executable — rows hash-shard by id
    // into disjoint MemoryAnnIndex slices (one per replica in a real
    // deployment), the query fans out, k-bounded lists merge under the
    // global (score DESC, id ASC) order. Bit-identical to the unsharded
    // scan, which is what the brute-force oracle checks.
    "q265_sharded_search" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 35)
      val qv = storedVecs(emb, 35).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val sharded = graft.serve.ShardedAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents, nShards = 4)
      sharded.topK(qv, 10).toDF("vec_id", "score")
    }),

    // ---- exact-dedup-FIRST LSH (q23's scale-order rule, executable):
    // collapse exact duplicate texts to a min-id representative + count
    // in ONE hash agg, run MinHash-LSH over DISTINCT texts, and return
    // replica mass as integer multiplicities (within-group C(n,2),
    // cross-group n_a·n_b) instead of materialized pair rows. On a
    // replica-dense corpus the candidate join shrinks by the squared
    // replication factor while Σ n_pairs still equals q23's row count.
    "q266_lsh_dedup_first" -> ((s, dir) =>
      Dedup.minHashLshPairsDedupFirst(rdPar(s, dir, "documents"),
        "doc_id", "text", numHashes = 16, bands = 2)),

    // ---- source-mixture plan: natural crawl proportions → target
    // training proportions. Integer quotas k_s = (N·w_s) div Σw over a
    // full-outer (data sources × allowlist): unlisted sources weight 0
    // (nothing leaks into the mix unnamed), listed-but-absent sources
    // surface as n_in=0 coverage gaps, short sources keep everything
    // and flag under_quota (upsampling is a deliberate decision, never
    // silent duplication). One bounded agg; all-integer.
    "q267_mixture_plan" -> ((s, dir) =>
      graft.operators.Mixture.quotas(rd(s, dir, "documents"), "source",
        mixTargets, budget = 300L)),

    // ---- the mix executed: within each source, rows rank by the
    // deterministic (md5-uniform, id) key and rank <= n_keep survive —
    // growth-stable membership (a new crawl shard changes only its own
    // source's tail). One window shuffle partitioned by source.
    "q268_mixture_sample" -> ((s, dir) =>
      graft.operators.Mixture.sampleToMixture(rd(s, dir, "documents"),
        "doc_id", "source", mixTargets, budget = 300L, salt = ":mix")
        .select("doc_id", "source", "lang")),

    // ---- the upsampling half the q267 under_quota flag points at,
    // executed deliberately: every listed source lands on EXACTLY its
    // quota — short sources via whole-corpus epochs + a deterministic
    // fractional remainder (the low-resource repetition recipe), long
    // sources via the q268 rank downsample. Copies carry a 1-based
    // epoch index. Map-side explode of a per-row copy count.
    "q269_mixture_upsample" -> ((s, dir) =>
      graft.operators.Mixture.upsampleToQuota(rd(s, dir, "documents"),
        "doc_id", "source", mixTargets, budget = 300L, salt = ":mix")
        .select("doc_id", "source", "epoch")),

    // ---- mixing by TOKEN budget (what a training run provisions):
    // per-source token quota (B·w_s) div Σw, greedy (uniform, id)-rank
    // prefix whose cumulative n_chars stays within quota. Rank and
    // running sum share one window frame — one shuffle, not two.
    "q270_mixture_token_budget" -> ((s, dir) =>
      graft.operators.Mixture.sampleToTokenBudget(rd(s, dir, "documents"),
        "doc_id", "source", "n_chars", mixTargets, tokenBudget = 60000L,
        salt = ":mix")
        .select("doc_id", "source", "n_chars")),

    // ---- WAND over the learned-sparse tier (q206's scan with dynamic
    // pruning): integer scores make the pivot rule EXACT — skip iff the
    // UB prefix sum is strictly below θ, no float guard at all. The
    // oracle is the same per-row dot product; the `require` proves the
    // pruning actually skipped postings (not a vacuous pass).
    "q271_sparse_wand" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val sv = graft.operators.Sparse.tfVectors(docs, "doc_id", "text")
      val mem = graft.serve.MemorySparseIndex.fromDataFrame(sv, "doc_id")
      val (res, _, skipped) =
        mem.topKWandCounted(Map("data" -> 2L, "dup" -> 1L), 10)
      require(skipped > 0L, "q271: WAND pruned nothing — vacuous")
      res.toDF("doc_id", "score")
    }),

    // ---- FILTERED search on the sharded tier: the q189 string-@eq
    // shape through the replica deployment form. Dictionaries are
    // PER-SHARD (codes depend on each shard's value set), so the
    // filter resolves through each shard's own dictionary before its
    // probe — the composition a fanned-out deployment actually runs.
    "q272_sharded_filtered_search" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val docs = rd(s, dir, "documents")
        .select(col("doc_id").as("vec_id"), col("source"))
      val corpus = emb.where(col("vec_id") =!= 36).join(docs, "vec_id")
      val qv = storedVecs(emb, 36).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val sharded = graft.serve.ShardedAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(corpus, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents, nShards = 4,
        metaCols = Seq("source"))
      sharded.topKStringEq(qv, 8, "source", "src5")
        .toDF("vec_id", "score")
    }),

    // ---- isotonic calibration (PAV) of the banded ER match score: the
    // step from "Fellegi-Sunter weight" to "P(match)" a threshold can be
    // set against on a NEW corpus. The pair stream collapses to one row
    // per integer score in one map-side-combined aggregate; the PAV fit
    // is the minimax closed form over that bounded alphabet (|A|² rows
    // via explode — no nested-loop join, no driver loop). rate is the
    // raw empirical rate; fit is its monotone regression.
    "q273_isotonic_calibration" -> ((s, dir) => {
      val (a, b) = erSides(s, dir)
      val scored = graft.operators.EntityResolution.scorePairsBanded(a, b,
        Seq("nation"), "a_band", "b_cents", step = 100L,
        erFieldScores, matchMin = 7L, possibleMin = -100L)
      graft.operators.Calibrate.isotonicFit(scored, "score",
        col("a_key") === col("b_key"))
    }),

    // ---- reliability diagram + ECE of that calibrator on a held-out
    // half: fit on even a_keys, audit on odd a_keys. Unseen eval scores
    // take the fit of the greatest trained score below them (step-
    // function carry-forward over the bounded alphabet); the ECE fold is
    // order-pinned over score-sorted bins (the q167 list_sum discipline),
    // so the scalar lands bit-for-bit in both engines.
    "q274_calibration_ece" -> ((s, dir) => {
      val (a, b) = erSides(s, dir)
      val scored = graft.operators.EntityResolution.scorePairsBanded(a, b,
        Seq("nation"), "a_band", "b_cents", step = 100L,
        erFieldScores, matchMin = 7L, possibleMin = -100L)
      val isMatch = col("a_key") === col("b_key")
      val fit = graft.operators.Calibrate.isotonicFit(
        scored.where(col("a_key") % 2 === 0), "score", isMatch)
      graft.operators.Calibrate.reliability(
        scored.where(col("a_key") % 2 === 1), "score", isMatch, fit)
    }),

    // ---- SUBSTRING-level dedup (Lee et al. ACL'22, relationally): maximal
    // cross-doc runs of consecutive shared 5-shingles found as diagonal
    // islands of the shingle-join match matrix — catches a copied
    // paragraph inside an otherwise-novel doc, which doc-level MinHash
    // (q23) scores far below any dedup threshold. Fan-out bounded by the
    // shingle df-cap BEFORE the join; no suffix array, no sequential pass.
    // rdPar: per-row shingle hashing dominates before the first shuffle.
    "q275_substring_runs" -> ((s, dir) =>
      Dedup.sharedShingleRuns(rdPar(s, dir, "documents"), "doc_id", "text")),

    // ---- the ACTION over q275: one row per document, the longest span
    // shared with any earlier doc, earliest copy unflagged — the
    // conservation-checkable purge list. Since round 13 the default entry
    // IS the dedup-first form (identical texts collapse to a min-id
    // representative BEFORE the shingle machinery — the q266 ordering
    // rule, ratio 1.0 at 10x where the direct form paid 11.1x), so the
    // caps read document frequency over DISTINCT texts; the raw-corpus
    // baseline remains q281.
    "q276_substring_dedup" -> ((s, dir) =>
      Dedup.substringDupReport(rd(s, dir, "documents"), "doc_id", "text")),

    // ---- STREAMING exact percentiles: the (value → count) dictionary is
    // sum-mergeable, so it accumulates order-free across slices (q161/
    // q178 discipline) and the percentile_disc readout over the stored
    // dictionary is ALL-INTEGER (cum·100 ≥ n·p) — exact, no sketch error,
    // any slicing lands on the batch oracle bit-for-bit. State =
    // O(groups × distinct cents), the honest bounded-domain contract.
    // The fold is batch-id FENCED: each slice carries its foreachBatch id,
    // recorded atomically with the published state, so the deliberate
    // redeliveries below (crash-replay of the last batch, plus an older
    // one) are no-ops — the sum-merge family's exactly-once, exercised
    // against the batch oracle (a single re-add would shift every count).
    "q277_streaming_percentiles" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q277").toString
      try {
        val ev = events(s, dir).select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        def slice(i: Int) = ev.where(pmod(col("event_id"), lit(3)) === lit(i))
        (0 to 2).foreach { i =>
          graft.streaming.PercentileStream.accumulateBatch(s"$tmp/state",
            slice(i), "event_type", "cents", batchId = Some(i.toLong))
        }
        // redelivery: the crash-replayed last batch, then an older slice
        graft.streaming.PercentileStream.accumulateBatch(s"$tmp/state",
          slice(2), "event_type", "cents", batchId = Some(2L))
        graft.streaming.PercentileStream.accumulateBatch(s"$tmp/state",
          slice(1), "event_type", "cents", batchId = Some(1L))
        val rep = graft.streaming.PercentileStream
          .percentiles(s, s"$tmp/state", "event_type", "cents", Seq(50, 90, 99))
        s.createDataFrame(rep.collectAsList(), rep.schema)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      }
    }),

    // ---- STREAMING uniform sample: bottom-k of the md5-uniform key per
    // group — closed under merge like the KMV sketch but keeping row
    // identity, so it IS a sample; membership is id-keyed, so slice 1 is
    // deliberately re-delivered below and the final state still equals
    // the batch bottom-k (at-least-once safe WITHOUT batch fencing —
    // contrast the sum-merge accumulates, which fence by batch id: q277).
    "q278_streaming_sample" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q278").toString
      try {
        val ev = events(s, dir).select(col("event_id"), col("event_type"))
        def slice(i: Int) = ev.where(pmod(col("event_id"), lit(3)) === lit(i))
        (0 to 2).foreach { i =>
          graft.streaming.SampleStream.accumulateBatch(s"$tmp/state", slice(i),
            "event_type", "event_id", k = 20)
        }
        graft.streaming.SampleStream.accumulateBatch(s"$tmp/state", slice(1),
          "event_type", "event_id", k = 20) // redelivery: must be a no-op
        val rep = graft.streaming.UpsertSink.snapshot(s, s"$tmp/state")
        s.createDataFrame(rep.collectAsList(), rep.schema)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      }
    }),

    // ---- q29's front door ROUTED onto the memory tier: the SAME JSON
    // request (integral/string columns, @and/@eq/@gte filter — fully
    // covered by the loaded index) now serves job-free. The require pins
    // that the router actually chose memory (the result plans as a
    // driver-local relation — no scan, no job); the oracle (q29's SQL
    // verbatim) pins that routing changed NOTHING about the result.
    "q279_routed_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings"); val docs = rd(s, dir, "documents")
      val qvec = storedVecs(emb, 1).head
      val index = emb.join(docs, emb("vec_id") === docs("doc_id"))
        .where(col("vec_id") =!= 1)
      val cents = Ann.sampleCentroids(index, "vec_id", "embedding", 4)
      val mem = graft.serve.MemoryAnnIndex.fromDataFrame(
        Ann.withIvfAssignment(index, "embedding", cents),
        "vec_id", "embedding", "ivf_cell", cents,
        metaCols = Seq("lang", "source", "n_chars"))
      val server = new graft.serve.MemoryServer(mem, None)
      val req =
        s"""{"query_vector":[${qvec.mkString(",")}],
           | "columns":["vec_id","lang","source","n_chars"],
           | "filter":{"@and":[{"@eq":{"lang":"en"}},{"@gte":{"n_chars":50}}]},
           | "limit":7}""".stripMargin
      val out = new SemanticSearch(index, HashingTfEmbedder(64),
        "vec_id", "text", "embedding", memory = Some(server)).search(req)
      require(out.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        "q279: the covered request must be memory-served, not job-backed")
      out
    }),

    // ---- the HYBRID front door (api/HybridSearch): ONE JSON request
    // carrying both retrieval legs — dense query_vector + lexical terms —
    // served job-free through the memory tier (exact dense scan + WAND
    // postings + rrfFuseLocal). The oracle is q163/q186's SQL verbatim:
    // putting a request API and a route in front of the fusion changes
    // nothing about the result; the require pins that the route was
    // actually taken (driver-local relation, no job).
    "q280_hybrid_front_door" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 7)
      val qv = storedVecs(emb, 7).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val docs = rdPar(s, dir, "documents")
      val postings = graft.operators.Bm25.buildPostings(docs, "doc_id", "text")
      val stats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val avgdl = stats.getLong(0).toDouble / stats.getLong(1).toDouble
      val dfMap = postings.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val idfMap = graft.operators.Bm25.idfByTerm(dfMap, stats.getLong(1), s)
      val server = new graft.serve.MemoryServer(
        graft.serve.MemoryAnnIndex.fromDataFrame(
          Ann.withIvfAssignment(corpus, "embedding", cents),
          "vec_id", "embedding", "ivf_cell", cents),
        Some(graft.serve.MemoryPostingsIndex.fromDataFrame(
          postings, "doc_id", idfMap, avgdl)))
      val door = new graft.api.HybridSearch(corpus, "vec_id", "embedding",
        postings, "doc_id", idfMap, avgdl, memory = Some(server))
      val out = door.search(
        s"""{"query_vector":[${qv.mkString(",")}],
           | "terms":["dup","stream"],"limit":10,"pool_k":20}""".stripMargin)
      require(out.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        "q280: the hybrid request must be memory-served, not job-backed")
      out
    }),

    // ---- the DIRECT (exhaustive, no exact-collapse) substring report —
    // the measured BASELINE q276's unified entry is graded against, kept
    // as a bounded demo: its shingle join pays C(N,2) full-length
    // diagonal runs per replicated page (11.1x at 10x in SCALE10 r12
    // when it was the default), so the demo pins the corpus to a FIXED
    // 500-document slice (the whole sf0.01 corpus; scale-flat by
    // construction at any SF). Production callers use q276's entry.
    "q281_substring_dedup_direct" -> ((s, dir) =>
      Dedup.substringDupReportDirect(
        rd(s, dir, "documents").where(col("doc_id") < 500),
        "doc_id", "text")),

    // ---- CLUSTER-BALANCED sampling: semantic clusters AS mixture
    // sources — the topic-balancing recipe (assign each embedding to its
    // nearest deterministic centroid, then draw an equal per-cluster
    // quota with the growth-stable rank membership). Pure composition of
    // two oracled operators (Ann.withIvfAssignment x Mixture
    // .sampleToMixture): the assignment is one codegen greatest() over
    // centroid literals (map-side, no shuffle), the mixture adds one
    // bounded count agg + one cluster-partitioned window — at 100 TB the
    // only full-data shuffle is the window's, keyed by cluster.
    "q282_cluster_balanced_sample" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val cents = Ann.sampleCentroids(emb, "vec_id", "embedding", 4)
      val assigned = Ann.withIvfAssignment(emb, "embedding", cents)
        .withColumn("cell", col("ivf_cell").cast("string"))
      graft.operators.Mixture.sampleToMixture(assigned, "vec_id", "cell",
        (0 to 3).map(c => c.toString -> 1L), budget = 200L, salt = ":cb")
        .select("vec_id", "cell", "label")
    }),

    // ---- the q277 redelivery protocol EXTENDED with the checkpoint-wipe
    // recovery event: epoch A folds batch ids 0 and 1 (plus a crash-
    // replay of 1, fenced), then the checkpoint is "lost" and the
    // restarted query delivers the remaining slice as batch 0 under
    // epoch B. An id-only fence would read that batch as already-folded
    // (0 <= stored 1) and silently drop it — exactly the data-loss hole
    // the round-12 verdict named; the epoch-scoped fence folds it and
    // the oracle (the batch truth over ALL events) proves no slice went
    // missing and no redelivery re-added.
    "q283_fenced_restart" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q283").toString
      try {
        val ev = events(s, dir).select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        def slice(i: Int) = ev.where(pmod(col("event_id"), lit(3)) === lit(i))
        val st = s"$tmp/state"
        def fold(i: Int, id: Long, ep: String): Unit =
          graft.streaming.PercentileStream.accumulateBatch(st, slice(i),
            "event_type", "cents", batchId = Some(id), epoch = Some(ep))
        fold(0, 0L, "cpA"); fold(1, 1L, "cpA")
        fold(1, 1L, "cpA") // crash-replay before the wipe: fenced no-op
        fold(2, 0L, "cpB") // fresh checkpoint: ids restart, MUST fold
        fold(2, 0L, "cpB") // and the new epoch's own redelivery fences
        val rep = graft.streaming.PercentileStream
          .percentiles(s, st, "event_type", "cents", Seq(25, 75, 95))
        s.createDataFrame(rep.collectAsList(), rep.schema)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      }
    }),

    // ---- the LEXICAL tier's replica deployment form (the postings twin
    // of q265's ShardedAnnIndex, closing the gap the 10x serving battery
    // named): documents hash-shard disjointly, each shard WAND-walks its
    // own postings slice under the GLOBAL (idf, avgdl) stats, k-bounded
    // lists merge under (score DESC, id ASC) — bit-identical to the
    // unsharded walk because a doc's BM25 score depends only on its own
    // postings plus the global stats. The require pins that per-shard
    // WAND still actually skipped postings through the fan-out.
    "q285_sharded_lexical" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val postings = graft.operators.Bm25.buildPostings(docs, "doc_id", "text")
      val stats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val avgdl = stats.getLong(0).toDouble / stats.getLong(1).toDouble
      val dfMap = postings.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val idfMap = graft.operators.Bm25.idfByTerm(dfMap, stats.getLong(1), s)
      val sharded = graft.serve.ShardedPostingsIndex.fromDataFrame(
        postings, "doc_id", idfMap, avgdl, nShards = 4)
      val (hits, evaluated, skipped) = sharded.searchCounted(
        Seq("dup", "merge", "sort"), 10)
      require(skipped > 0 && evaluated < stats.getLong(1),
        s"sharded WAND lost its pruning (evaluated=$evaluated, skipped=$skipped)")
      hits.toDF("doc_id", "score")
    }),

    // ---- q276's conservation contract under NULL texts (the corpus has
    // none, so nulls are injected deterministically): a null text can
    // never share a span, but the text-keyed group join of the
    // dedup-first form would silently DROP those rows — the operator
    // routes them around and unions them back unflagged, and this oracle
    // checks one row per input document survives, nulls unflagged.
    "q284_substring_null_safe" -> ((s, dir) => {
      val src = rd(s, dir, "documents").select(col("doc_id"),
        when(pmod(col("doc_id"), lit(50)) === 0, lit(null).cast("string"))
          .otherwise(col("text")).as("text"))
      Dedup.substringDupReport(src, "doc_id", "text")
    }),

    // ---- the learned-sparse replica fan-out (q285's rule on the THIRD
    // tier): documents hash-shard disjointly, each shard WAND-walks its
    // own postings slice — NO global statistics to broadcast at all
    // (the sparse dot product is per-document), so the fan-out is the
    // simplest of the family. Oracle = the exhaustive per-row dot
    // product; the require proves per-shard pruning still skipped.
    "q286_sharded_sparse" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val sv = graft.operators.Sparse.tfVectors(docs, "doc_id", "text")
      val sharded = graft.serve.ShardedSparseIndex.fromDataFrame(
        sv, "doc_id", nShards = 4)
      val (res, _, skipped) = sharded.topKWandCounted(
        Map("vector" -> 2L, "dup" -> 1L, "merge" -> 1L), 10)
      require(skipped > 0L, "q286: sharded WAND pruned nothing — vacuous")
      res.toDF("doc_id", "score")
    }),

    // ---- hybrid serving over SHARDED legs (serve/ShardedHybridServer):
    // q186's fused request where BOTH legs fan out to disjoint doc
    // shards and the k-bounded lists merge before the local RRF fold —
    // the deployment form for the tier the 10× battery showed QPS-bound
    // on its lexical walk. Oracle is q163/q186's SQL verbatim at a
    // different query vector: the fan-out changes nothing.
    "q287_sharded_hybrid" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 11)
      val qv = storedVecs(emb, 11).head
      val cents = Ann.sampleCentroids(corpus, "vec_id", "embedding", 4)
      val docs = rdPar(s, dir, "documents")
      val postings = graft.operators.Bm25.buildPostings(docs, "doc_id", "text")
      val stats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val avgdl = stats.getLong(0).toDouble / stats.getLong(1).toDouble
      val dfMap = postings.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val idfMap = graft.operators.Bm25.idfByTerm(dfMap, stats.getLong(1), s)
      val server = new graft.serve.ShardedHybridServer(
        graft.serve.ShardedAnnIndex.fromDataFrame(
          Ann.withIvfAssignment(corpus, "embedding", cents),
          "vec_id", "embedding", "ivf_cell", cents, nShards = 4),
        graft.serve.ShardedPostingsIndex.fromDataFrame(
          postings, "doc_id", idfMap, avgdl, nShards = 4))
      server.searchHybrid(qv, Seq("dup", "merge"), k = 10, poolK = 20)
        .toDF("id", "rrf")
    }),

    // ---- temperature-flattened mixing (operators/Mixture
    // .sampleToTemperature): sample share ∝ n_s^α at the α = 1/2 point —
    // the one temperature whose weights (⌊√n_s⌋, IEEE sqrt is correctly
    // rounded) transcribe bit-stably into any engine; head sources
    // flatten, tail sources boost, membership is the same deterministic
    // (uniform, id) rank as q268.
    "q288_mixture_temperature" -> ((s, dir) =>
      graft.operators.Mixture.sampleToTemperature(rd(s, dir, "documents"),
        "doc_id", "source", budget = 300L, salt = ":mix")
        .select("doc_id", "source", "lang")),

    // ---- Matryoshka prefix search (operators/Ann.topKMatryoshka):
    // candidates rank on the first 16 of 64 coordinates, the 3k pool
    // reranks under the exact full-dim cosine — the prune-and-rerank
    // pattern (SQ8/PQ/binary) with dimension truncation as the codec.
    // Returned scores are the exact full-dim fold; the candidate SET is
    // the only approximation, and the oracle transcribes BOTH stages.
    "q289_matryoshka_search" -> ((s, dir) => {
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 23)
      val qv = storedVecs(emb, 23).head
      Ann.topKMatryoshka(corpus, "vec_id", "embedding", qv, k = 8,
        prefixDim = 16, rerankFactor = 3)
        .select("vec_id", "score")
    }),

    // ---- the matryoshka MEMORY tier (serve/MemoryMrlIndex): q289's
    // two-stage semantics served job-free from a resident prefix array
    // (prefixDim/dim of the candidate-scan bytes — the SQ8 resident-set
    // argument with truncation as the codec). Same oracle transcription
    // at a different query vector; ServeSpec pins bit-parity to the
    // DataFrame path across k/rerankFactor.
    "q290_memory_mrl" -> ((s, dir) => {
      import s.implicits._
      val emb = rd(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") =!= 29)
      val qv = storedVecs(emb, 29).head
      val mem = graft.serve.MemoryMrlIndex.fromDataFrame(
        corpus, "vec_id", "embedding", prefixDim = 16)
      mem.topK(qv, k = 8, rerankFactor = 3).toDF("vec_id", "score")
    }),

    // ---- the DELTA LEXICAL tier (serve/DeltaPostingsIndex): 80% of the
    // corpus publishes as the immutable base, the held-out 20% STREAMS
    // in doc-by-doc — and the tier must land on the batch SQL over the
    // FULL corpus bit-for-bit, because it re-derives the merged
    // (idf, avgdl) per query instead of serving the stale published
    // stats (BM25 couples every score to N/df — the hard part of
    // lexical freshness, and the reason this tier is adds-only: a
    // delete shifts the stats too, which is exactly a rebuild).
    "q291_delta_lexical" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val baseDocs = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
      val stats = baseDocs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val tier = graft.serve.DeltaPostingsIndex.fromDataFrame(
        graft.operators.Bm25.buildPostings(baseDocs, "doc_id", "text"),
        "doc_id", baseN = stats.getLong(1), baseSumDl = stats.getLong(0))
      // the streaming arrivals (bounded: one lag window of docs)
      docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .select("doc_id", "text").collect()
        .sortBy(_.getLong(0))
        .foreach(r => tier.addDoc(r.getLong(0), r.getString(1)))
      // the SERVING read path: WAND over the base under merged stats
      // (avgdl-free bounds, delta-seeded θ) — and it must still skip
      val (res, evaluated, skipped) =
        tier.topKWandCounted(Seq("dup", "stream", "query"), 10)
      require(skipped > 0L && evaluated < stats.getLong(1),
        s"q291: delta WAND lost pruning (evaluated=$evaluated, skipped=$skipped)")
      res.toDF("doc_id", "score")
    }),

    // ---- delta RETRACTION (DeltaPostingsIndex.retractDoc): the one
    // lexical delete that needs no republish — an UNPUBLISHED add's
    // term vector is fully known, so retracting it reverses every
    // integer the merged stats derive from, and the tier lands on the
    // batch SQL over the SURVIVING corpus bit-for-bit (the in-flight
    // GDPR purge: q293 measures the published doc's republish cutover;
    // this is the other half, immediate and exact). Half the streamed
    // window retracts here; published-base deletes stay rejected.
    "q294_delta_retract" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val baseDocs = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
      val stats = baseDocs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val tier = graft.serve.DeltaPostingsIndex.fromDataFrame(
        graft.operators.Bm25.buildPostings(baseDocs, "doc_id", "text"),
        "doc_id", baseN = stats.getLong(1), baseSumDl = stats.getLong(0))
      val arrivals = docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .select("doc_id", "text").collect().sortBy(_.getLong(0))
      arrivals.foreach(r => tier.addDoc(r.getLong(0), r.getString(1)))
      // the purge slice: every streamed doc with doc_id % 10 == 0
      // retracts before it ever publishes
      arrivals.map(_.getLong(0)).filter(_ % 10L == 0L)
        .foreach(tier.retractDoc)
      val (res, evaluated, skipped) =
        tier.topKWandCounted(Seq("dup", "stream", "query"), 10)
      require(skipped > 0L && evaluated < stats.getLong(1),
        s"q294: delta WAND lost pruning (evaluated=$evaluated, skipped=$skipped)")
      res.toDF("doc_id", "score")
    }),

    // ---- the DELTA SPARSE tier (serve/DeltaSparseIndex) — the third
    // and last member of the delta family, and the structurally
    // simplest: the integer dot product has NO corpus statistics, so
    // freshness is the fan-out lemma (base WAND + exhaustive delta,
    // k-bounded merge) and retraction is symmetric with addition. Same
    // protocol as q294: 80% publishes, 20% streams in, half the stream
    // retracts pre-publish — and the tier must land on the batch SQL
    // over the survivors exactly.
    "q295_delta_sparse" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val baseDocs = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
      val tier = graft.serve.DeltaSparseIndex.fromDataFrame(
        graft.operators.Sparse.tfVectors(baseDocs, "doc_id", "text"),
        "doc_id")
      val arrivals = docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .select("doc_id", "text").collect().sortBy(_.getLong(0))
      arrivals.foreach(r =>
        // the ONE driver-side tokenization twin (Sparse.tfWeights)
        tier.addDoc(r.getLong(0),
          graft.operators.Sparse.tfWeights(r.getString(1))))
      arrivals.map(_.getLong(0)).filter(_ % 10L == 0L)
        .foreach(tier.retractDoc)
      val (res, evaluated, skipped) =
        tier.topKWandCounted(Map("dup" -> 2L, "stream" -> 1L, "query" -> 3L), 10)
      require(skipped > 0L,
        s"q295: base WAND pruned nothing (evaluated=$evaluated)")
      res.toDF("doc_id", "score")
    }),

    // ---- MOTION-JPEG frame decode (multimodal/Multimodal.videoFrames
    // over syntheticMjpegMedia): the compressed-video seam opened — the
    // RIFF walk hands each '00dc' chunk to the SAME plugin-dispatched
    // ImageIO path the image pipeline uses (zero new codec code, the
    // G.711 precedent), and the JDK's baseline JPEG reader decodes it.
    // JPEG is LOSSY, so per-pixel sums are decoder-relative (pinned
    // bit-equal to the direct decode in MultimodalSpec); what the oracle
    // CAN check exactly — and does — is the structural contract:
    // dimensions survive the codec, the sampler picks every 2nd frame,
    // and every sampled frame decodes (decode_ok). Scale: one task per
    // partition batch of videos, frames never leave their executor.
    "q296_mjpeg_frames" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.syntheticMjpegMedia(s, 150)
      val frames = graft.multimodal.Multimodal.videoFrames(media, sampleEvery = 2)
      frames.toDF()
        .select(col("media_id"), col("frame_idx"), col("width"),
          col("height"), col("n_px"), col("decode_ok"))
    }),

    // ---- BOUNDED delta under churn (serve/BoundedDelta + the round-15
    // republish protocol): the q294 stream runs through a handle whose
    // delta segment FOLDS into a new immutable base every 25 docs
    // (DeltaTier.republish — old handle sealed, nothing discarded), with
    // the in-flight purges (doc_id % 10 = 0) retracting atomically
    // inside their own write. After MANY folds the serving handle must
    // STILL land on the batch SQL over the survivors bit-for-bit —
    // folding is result-invisible; only the per-query delta cost is
    // bounded. This is the oracle-level pin for what the ServeBench
    // churn rows measure and DeltaPostingsSpec/GraftProps prove
    // structurally.
    "q297_bounded_republish" -> ((s, dir) => {
      import s.implicits._
      val docs = rdPar(s, dir, "documents")
      val baseDocs = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
      val stats = baseDocs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum("dl"), count(lit(1))).head()
      val bounded = new graft.serve.BoundedDelta(
        graft.serve.DeltaPostingsIndex.fromDataFrame(
          graft.operators.Bm25.buildPostings(baseDocs, "doc_id", "text"),
          "doc_id", baseN = stats.getLong(1), baseSumDl = stats.getLong(0)),
        maxDeltaDocs = 25L)
      docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .select("doc_id", "text").collect().sortBy(_.getLong(0))
        .foreach { r =>
          bounded.write { h =>
            h.addDoc(r.getLong(0), r.getString(1))
            if (r.getLong(0) % 10L == 0L) h.retractDoc(r.getLong(0))
          }
        }
      val tier = bounded.get
      require(bounded.republishCount > 0L,
        "q297: the delta bound was never crossed — the fold went unexercised")
      require(tier.deltaSize < 25L,
        s"q297: delta ${tier.deltaSize} exceeds the 25-doc bound")
      val (res, evaluated, skipped) =
        tier.topKWandCounted(Seq("dup", "stream", "query"), 10)
      require(skipped > 0L,
        s"q297: folded-base WAND pruned nothing (evaluated=$evaluated)")
      res.toDF("doc_id", "score")
    }),

    // ---- the GRAPH tier joins the bounded-delta family
    // (serve/DeltaHnswIndex + BoundedDelta — r15 verdict item 1): the
    // q297 protocol run over HNSW, the serving tier with the measured
    // QPS ceiling and previously the only rebuild-only one. 80% of the
    // embeddings publish as the immutable base GRAPH; 20% stream in
    // through the bounded handle (fold every 25 live docs —
    // DeltaHnswIndex.republish rebuilds the graph deterministically);
    // half the stream retracts atomically inside its own write. The
    // graph walk is approximate (RECALL.md's verification class — no
    // SQL expresses it), so the ORACLE pins what IS exact: VISIBILITY.
    // Every surviving streamed row must surface itself (its own vector
    // as the query — the TARGET_LAG freshness contract, reference
    // 01:173, 01:228-231) and every purged row must not, across
    // however many folds ran; the output is exactly the surviving
    // stream slice, which DuckDB computes in closed form. The FOLD pin
    // (folded graph ≡ from-scratch build over the survivors,
    // adjacency-for-adjacency) runs in-query on a final republish —
    // bit-determinism makes the in-band fold and the batch rebuild
    // converge on the same artifact, HnswSpec proves it at test scale.
    "q298_delta_hnsw" -> ((s, dir) => {
      import s.implicits._
      val emb = rdPar(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val baseRows = emb.where(pmod(col("vec_id"), lit(5)) =!= 0)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
      val arrivals = emb.where(pmod(col("vec_id"), lit(5)) === 0)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
        .sortBy(_._1)
      val base = graft.serve.MemoryHnswIndex.build(baseRows)
      val bounded = new graft.serve.BoundedDelta(
        new graft.serve.DeltaHnswIndex(base), maxDeltaDocs = 25L)
      arrivals.foreach { case (id, v) =>
        bounded.write { h =>
          h.add(id, v)
          if (id % 10L == 0L) h.delete(id) // in-flight purge, atomic
        }
      }
      val tier = bounded.get
      require(bounded.republishCount > 0L,
        "q298: the delta bound was never crossed — the fold went unexercised")
      require(tier.deltaSize < 25L,
        s"q298: delta ${tier.deltaSize} exceeds the 25-doc bound")
      // visibility over the MERGED view (live delta + folded graph)
      arrivals.foreach { case (id, v) =>
        val hit = tier.topK(v, 5, ef = 200).exists(_._1 == id)
        if (id % 10L == 0L)
          require(!hit, s"q298: purged $id still servable")
        else require(hit, s"q298: streamed $id lost across folds")
      }
      // fold pin: one final republish folds the tail; the resulting
      // graph must be bit-identical to a from-scratch build over ALL
      // survivors — same adjacency, same answers
      val folded = tier.republish()
      // survivors: base never purges (%5 != 0 => %10 != 0); the streamed
      // slice keeps %10 != 0 — so one predicate covers both
      val logical = (baseRows ++ arrivals).filter(_._1 % 10L != 0L)
      val scratch = graft.serve.MemoryHnswIndex.build(logical)
      logical.foreach { case (id, _) =>
        require(folded.base.maxLevelOf(id) == scratch.maxLevelOf(id) &&
          (0 to scratch.maxLevelOf(id)).forall(l =>
            folded.base.neighborsOf(id, l) == scratch.neighborsOf(id, l)),
          s"q298: folded adjacency differs from the batch rebuild at $id")
      }
      arrivals.take(10).foreach { case (_, v) =>
        require(folded.topK(v, 10, ef = 100) == scratch.topK(v, 10, ef = 100),
          "q298: folded answers differ from the batch rebuild")
      }
      arrivals.collect { case (id, _) if id % 10L != 0L => id }
        .toSeq.toDF("vec_id").orderBy("vec_id")
    }),

    // ---- INTER-coded video through the EXTERNAL-decoder seam
    // (multimodal/Multimodal.videoFramesExternal — r15 verdict item 3):
    // the last real media stub closed. Per-frame-coded video decodes
    // in-JVM (q90 Motion-PNG, q296 MJPEG); H.264-class codecs need a
    // stateful external decoder, and this query PROVES that harness —
    // one decoder PROCESS per partition (spawn amortized, the
    // mapPartitions codec rule), a length-prefixed pipe per video,
    // corrupt-bytes-are-data — hermetically: the corpus is the q90
    // closed form re-encoded in GDIF (the repo's trivial delta-frame
    // format, frame k meaningless without k−1), decoded by a REAL
    // spawned subprocess (graft.tools.GdifDecoder). GDIF is lossless,
    // so every sampled frame's pixel sum is the exact closed form —
    // DuckDB computes it in SQL, including the every-2nd-frame sampler.
    // Swapping the command for ffmpeg changes no Spark-side line.
    "q299_video_external_decode" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.syntheticGdifMedia(s, 150)
      val frames = graft.multimodal.Multimodal.videoFramesExternal(
        media, graft.multimodal.Multimodal.selfJvmDecoderCmd, sampleEvery = 2)
      frames.toDF()
        .select(col("media_id"), col("frame_idx"), col("width"),
          col("height"), col("n_px"), col("px_sum"), col("decode_ok"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys => driver records a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  l_extendedprice / 100.0 AS price_hundreds,
        |  substring(l_linestatus, 1, 1) AS flag
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity BETWEEN 30 AND 40 AND l_discount > 0.05""".stripMargin,

    "q03_join_agg" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q04_join_topk" ->
      """SELECT l_orderkey, l_linenumber, p_name, l_extendedprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size > 40
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,

    "q05_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity = 50)
        |GROUP BY o_orderpriority""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY c_mktsegment""".stripMargin,

    "q07_conditional_agg" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
        |  count(*) AS n_rows,
        |  100.0 * sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) / count(*) AS pct_high_disc
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q08_histogram" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |  WHEN o_totalprice < 200000 THEN 'medium' ELSE 'large' END AS bucket,
        |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,

    "q09_window_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2""".stripMargin,

    "q10_token_explode" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY token HAVING count(*) >= 5""".stripMargin,

    "q11_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin,

    "q12_time_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q26_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q27_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,

    "q13_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q21_jaccard_pairs" ->
      """WITH g AS (SELECT doc_id, lang, source,
        |    list_distinct(string_split(text, ' ')) AS grams FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS jaccard
        |FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.3""".stripMargin,

    "q22_minhash_signatures" ->
      """WITH th AS (
        |  SELECT d.doc_id, CAST(('0x' || substring(md5(t.t), 1, 8)) AS BIGINT) AS h
        |  FROM documents d, unnest(list_distinct(string_split(d.text, ' '))) AS t(t))
        |SELECT doc_id, CAST(i.i AS INT) AS hash_idx,
        |  min(((2 * i.i + 1) * h + i.i * 40503) % 4294967311) AS minhash
        |FROM th, range(16) i(i)
        |GROUP BY 1, 2""".stripMargin,

    // the unified dedup-first contract (see the entry comment): LSH over
    // DISTINCT texts' min-id reps + integer multiplicities — byte-equal
    // to q266's oracle (the alias-name pin) by construction
    "q23_minhash_lsh_pairs" -> lshDedupFirstSql,

    // the raw expanded-pair enumeration over the fixed 500-doc demo slice
    "q292_lsh_pairs_direct" ->
      """WITH s AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
        |th AS (
        |  SELECT d.doc_id, CAST(('0x' || substring(md5(t.t), 1, 8)) AS BIGINT) AS h
        |  FROM s d, unnest(list_distinct(string_split(d.text, ' '))) AS t(t)),
        |mh AS (
        |  SELECT doc_id, i.i AS hash_idx,
        |    min(((2 * i.i + 1) * h + i.i * 40503) % 4294967311) AS minhash
        |  FROM th, range(16) i(i)
        |  GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(minhash ORDER BY hash_idx) AS s FROM mh GROUP BY doc_id),
        |bands AS (SELECT doc_id, b.b AS band,
        |    md5(array_to_string(s[b.b * 8 + 1 : b.b * 8 + 8], ',')) AS bucket
        |  FROM sig, range(2) b(b))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_bands
        |FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
        |  AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    "q24_simhash" ->
      s"""WITH $simhashSql
        |SELECT doc_id, simhash FROM sh""".stripMargin,

    // the pair step over the q24 signatures: the oracle is the BRUTE-FORCE
    // O(n^2) hamming join — the engine's chunk-pigeonhole candidates must
    // be COMPLETE at maxHamming <= chunks-1, so the sets match exactly
    "q71_simhash_pairs" ->
      s"""WITH $simhashSql
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    // per-char fold h -> (h*257 + code) mod (2^31-1); ord() is the
    // codepoint — equal to the engine's UTF-16 unit on BMP-only text
    "q72_rolling_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split_regex(text, ''), c -> CAST(ord(c) AS BIGINT))),
        |      (h, c) -> (h * 257 + c) % 2147483647) END AS fp
        |FROM documents""".stripMargin,

    "q39_jaccard_prefix" ->
      s"""WITH $prefixPairsSql
        |SELECT id_a, id_b, jaccard FROM jp WHERE jaccard >= 0.9""".stripMargin,

    // candidate step = pairs sharing any of the 16 minhash values (Spark's
    // bands=numHashes=16 bucketing), then blocked exact-jaccard verification
    "q40_jaccard_lsh" ->
      """WITH th AS (
        |  SELECT d.doc_id, CAST(('0x' || substring(md5(t.t), 1, 8)) AS BIGINT) AS h
        |  FROM documents d, unnest(list_distinct(string_split(d.text, ' '))) AS t(t)),
        |mh AS (
        |  SELECT doc_id, i.i AS hash_idx,
        |    min(((2 * i.i + 1) * h + i.i * 40503) % 4294967311) AS minhash
        |  FROM th, range(16) i(i) GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM mh a JOIN mh b ON a.hash_idx = b.hash_idx AND a.minhash = b.minhash
        |    AND a.doc_id < b.doc_id),
        |g AS (SELECT doc_id, lang, source,
        |  list_distinct(string_split(text, ' ')) AS grams FROM documents)
        |SELECT c.id_a, c.id_b,
        |  CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
        |    / CAST(len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) AS jaccard
        |FROM cand c JOIN g ga ON c.id_a = ga.doc_id JOIN g gb ON c.id_b = gb.doc_id
        |WHERE ga.lang = gb.lang AND ga.source = gb.source
        |  AND CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
        |    / CAST(len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) >= 0.3""".stripMargin,

    "q20_neardup_cosine" -> {
      def dot(a: String, b: String) =
        s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
      val cos = cosSql("a.embedding", "b.embedding")
      s"""WITH p1 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 3),
         |p2 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 4),
         |e AS (
         |  SELECT e.vec_id, e.label, e.embedding,
         |    (CASE WHEN ${dot("e.embedding", "p1.pv")} >= 0 THEN 1 ELSE 0 END)
         |    + (CASE WHEN ${dot("e.embedding", "p2.pv")} >= 0 THEN 2 ELSE 0 END) AS bucket
         |  FROM embeddings e CROSS JOIN p1 CROSS JOIN p2)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cos AS cos
         |FROM e a JOIN e b
         |  ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE $cos >= 0.3""".stripMargin
    },

    "q14_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digits,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents""".stripMargin,

    "q15_lang_id" ->
      s"""WITH h AS (SELECT doc_id,
         |  $langHitsSql
         | FROM documents)
         |SELECT doc_id, $langCaseSql AS lang_guess
         |FROM h""".stripMargin,

    "q16_bpeish_tokens" ->
      s"""SELECT doc_id,
         |  $bpeishCountSql AS n_tokens_bpeish
         |FROM documents""".stripMargin,

    "q25_quality_score" ->
      s"""WITH m AS (SELECT doc_id,
         |  $qualityMetricsSql
         | FROM documents)
         |SELECT doc_id,
         |  $qualityScoreSql AS quality_score
         |FROM m""".stripMargin,

    "q17_vector_topk" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin
    },

    "q18_filtered_search" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, d.lang, $cos AS score
         |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id CROSS JOIN q
         |WHERE d.lang = 'en' AND e.vec_id <> 0
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin
    },

    "q31_topk_batch" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |s AS (SELECT q.qid, e.vec_id, $cos AS score
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id NOT IN (0, 1, 2)),
         |r AS (SELECT qid, vec_id, score,
         |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM s)
         |SELECT qid, CAST(rank AS INT) AS rank, vec_id, score FROM r WHERE rank <= 5""".stripMargin
    },

    "q19_cache_decision" ->
      """WITH g AS (SELECT doc_id, lang, source,
        |    list_distinct(string_split(text, ' ')) AS grams FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS jaccard
        |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard,
        |  CASE WHEN jaccard > 0.8 THEN 'CACHE HIT - Excellent Match'
        |    WHEN jaccard > 0.7 THEN 'CACHE HIT - Good Match'
        |    ELSE 'CACHE MISS - Generate New' END AS decision,
        |  CASE WHEN jaccard > 0.9 THEN 'excellent'
        |    WHEN jaccard >= 0.8 THEN 'very good'
        |    WHEN jaccard >= 0.7 THEN 'good'
        |    ELSE 'miss' END AS tier
        |FROM p WHERE jaccard >= 0.3""".stripMargin,

    "q35_search_stringified" -> {
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |ranked AS (
         |  SELECT e.vec_id, d.lang, d.source, d.n_chars,
         |    (list_sum(list_transform(list_zip(e.embedding, q.qv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         | / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |    * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS score
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id CROSS JOIN q
         |  WHERE e.vec_id <> 0 AND d.lang = 'en' AND d.n_chars >= 100
         |  ORDER BY score DESC, e.vec_id LIMIT 10)
         |SELECT CAST(vec_id AS VARCHAR) AS vec_id, CAST(lang AS VARCHAR) AS lang,
         |  CAST(source AS VARCHAR) AS source, CAST(n_chars AS VARCHAR) AS n_chars
         |FROM ranked""".stripMargin
    },

    "q29_search_preview" -> {
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
         |ranked AS (
         |  SELECT e.vec_id, d.lang, d.source, d.n_chars,
         |    ${cosSql("e.embedding", "q.qv")} AS score
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id CROSS JOIN q
         |  WHERE e.vec_id <> 1 AND d.lang = 'en' AND d.n_chars >= 50
         |  ORDER BY score DESC, e.vec_id LIMIT 7)
         |SELECT CAST(vec_id AS VARCHAR) AS vec_id, CAST(lang AS VARCHAR) AS lang,
         |  CAST(source AS VARCHAR) AS source, CAST(n_chars AS VARCHAR) AS n_chars
         |FROM ranked""".stripMargin
    },

    "q38_topk_joinback" -> {
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2),
         |top AS (
         |  SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS score
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 2
         |  ORDER BY score DESC, e.vec_id LIMIT 3)
         |SELECT t.vec_id, t.score, d.text AS full_doc, d.lang, d.source
         |FROM top t JOIN documents d ON t.vec_id = d.doc_id""".stripMargin
    },

    "q37_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.event_id, p.purchase_id
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "q46_exact_dedup_rows" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (
        |  SELECT min(doc_id) FROM documents
        |  GROUP BY md5(regexp_replace(lower(text), '\s+', ' ', 'g')))""".stripMargin,

    "q47_window_funcs" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
        |  lag(event_id) OVER w AS prev_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q48_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,

    "q41_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q42_range_join" -> {
      val bands = (0 until 20)
        .map(i => s"($i, ${i * 25000.0}, ${i * 25000.0 + 40000.0})").mkString(", ")
      s"""WITH bands(band_id, lo, hi) AS (VALUES $bands)
         |SELECT CAST(band_id AS BIGINT) AS band_id, count(*) AS n
         |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice <= hi
         |GROUP BY 1""".stripMargin
    },

    "q43_global_agg" ->
      """SELECT count(*) AS n_rows,
        |  count(json_extract_string(props, '$.missing')) AS n_missing,
        |  count(json_extract_string(props, '$.k')) AS n_k,
        |  count(DISTINCT event_type) AS n_types,
        |  sum(round(value)) AS sum_round_value
        |FROM events""".stripMargin,

    "q44_lsh_bucket_search" -> {
      def dot(a: String, b: String) =
        s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |p1 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 3),
         |p2 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 4),
         |corp AS (
         |  SELECT e.vec_id, e.embedding,
         |    (CASE WHEN ${dot("e.embedding", "p1.pv")} >= 0 THEN 1 ELSE 0 END)
         |    + (CASE WHEN ${dot("e.embedding", "p2.pv")} >= 0 THEN 2 ELSE 0 END) AS bucket
         |  FROM embeddings e CROSS JOIN p1 CROSS JOIN p2 WHERE e.vec_id <> 0),
         |qb AS (
         |  SELECT (CASE WHEN ${dot("q.qv", "p1.pv")} >= 0 THEN 1 ELSE 0 END)
         |    + (CASE WHEN ${dot("q.qv", "p2.pv")} >= 0 THEN 2 ELSE 0 END) AS bucket
         |  FROM q CROSS JOIN p1 CROSS JOIN p2)
         |SELECT c.vec_id, ${cosSql("c.embedding", "q.qv")} AS score
         |FROM corp c JOIN qb ON c.bucket = qb.bucket CROSS JOIN q
         |ORDER BY score DESC, c.vec_id LIMIT 5""".stripMargin
    },

    "q45_ivf_search" -> {
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id <> 0 ORDER BY vec_id LIMIT 4),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <> 0),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
         |    FROM scored) WHERE rn = 1),
         |qcents AS (
         |  SELECT c.cid FROM cents c CROSS JOIN q
         |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cid ASC LIMIT 2)
         |SELECT a.vec_id, ${cosSql("a.embedding", "q.qv")} AS score
         |FROM assign a JOIN qcents ON a.cid = qcents.cid CROSS JOIN q
         |ORDER BY score DESC, a.vec_id LIMIT 5""".stripMargin
    },

    "q34_set_ops" ->
      """WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |s AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
        |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM b INTERSECT SELECT * FROM s)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM b EXCEPT SELECT * FROM s)
        |UNION ALL
        |SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM b UNION SELECT * FROM s)""".stripMargin,

    "q36_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q33_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS is_break
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    // the PNG round-trip's closed-form truth: pixel(x, y) = (7x+13y+id)%256
    // on a w x h grid — lossless encode/decode means the REAL javax.imageio
    // pipeline must reproduce these exact integers
    "q90_imageio_decode" ->
      """WITH dims AS (SELECT i AS media_id,
        |    CAST(8 + i % 16 AS INT) AS width,
        |    CAST(8 + (3 * i) % 16 AS INT) AS height
        |  FROM range(200) t(i)),
        |px AS (SELECT media_id, width, height,
        |    (7 * x.x + 13 * y.y + media_id) % 256 AS v
        |  FROM dims,
        |    unnest(generate_series(0, width - 1)) AS x(x),
        |    unnest(generate_series(0, height - 1)) AS y(y))
        |SELECT media_id, width, height,
        |  CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
        |  TRUE AS decode_ok
        |FROM px GROUP BY media_id, width, height""".stripMargin,

    // the WAV round-trip's closed-form truth: sample(k) =
    // ((31·id + 17·k) mod 65536) − 32768 over 64 + id%64 frames — lossless
    // PCM means the REAL javax.sound pipeline must reproduce these exact
    // integers (and the 8 kHz / mono / 16-bit header fields)
    "q101_wav_decode" ->
      """WITH dims AS (SELECT i AS media_id,
        |    CAST(64 + i % 64 AS BIGINT) AS n_frames FROM range(200) t(i)),
        |s AS (SELECT media_id, n_frames,
        |    ((31 * media_id + 17 * k.k) % 65536) - 32768 AS v
        |  FROM dims, unnest(generate_series(0, n_frames - 1)) AS k(k))
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(16 AS INT) AS bits, n_frames,
        |  CAST(sum(v) AS BIGINT) AS pcm_sum,
        |  CAST(min(v) AS INT) AS pcm_min, CAST(max(v) AS INT) AS pcm_max,
        |  TRUE AS decode_ok
        |FROM s GROUP BY media_id, n_frames""".stripMargin,

    // replays the synthetic-media metadata arithmetic (sizes, frame
    // sampling, aspect-preserving resize) in SQL; checksum/features are
    // codec-bound and stay spec-verified
    "q30_multimodal_features" ->
      """WITH m AS (
        |  SELECT i AS media_id,
        |    CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(128 + i % 256 AS INT) AS n_bytes,
        |    CAST(640 + (i % 7) * 80 AS INT) AS w,
        |    CAST(480 + (i % 5) * 60 AS INT) AS h,
        |    1000 * (1 + i % 30) AS duration_ms
        |  FROM range(300) t(i))
        |SELECT media_id, kind, n_bytes,
        |  CASE WHEN kind = 'video' THEN CAST(ceil(duration_ms / 1000.0 * 1.0) AS INT)
        |       ELSE 1 END AS frames_sampled,
        |  CAST(CASE WHEN w >= h THEN 224
        |       ELSE GREATEST(1, CAST(round(w * 224.0 / h) AS INT)) END AS INT) AS out_width,
        |  CAST(CASE WHEN w >= h THEN GREATEST(1, CAST(round(h * 224.0 / w) AS INT))
        |       ELSE 224 END AS INT) AS out_height
        |FROM m""".stripMargin,

    "q32_try_cast" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  TRY_CAST('x' || json_extract_string(props, '$.k') AS INT) AS bad_int
        |FROM events""".stripMargin,

    "q28_filter_dsl" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang = 'en'
        |  AND (n_chars >= 200 OR text LIKE '%data%')
        |  AND NOT (source = 'src0')
        |  AND source IN ('src1','src2','src3','src4','src5','src6','src7')""".stripMargin,

    "q49_csv_ingest" -> csvIngestOracleSql,

    // the JSONL leg must produce the SAME canonical result as the CSV leg
    "q73_jsonl_ingest" -> csvIngestOracleSql,

    "q50_writeback_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
        |    CASE WHEN doc_id % 20 = 0 THEN text || ' v2' ELSE text END,
        |    'cache_gen'
        |  FROM documents WHERE doc_id % 10 = 0),
        |k AS (SELECT min(doc_id) AS keep FROM u
        |      GROUP BY md5(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |SELECT source, count(*) AS n_survivors
        |FROM u WHERE doc_id IN (SELECT keep FROM k)
        |GROUP BY source""".stripMargin,

    // sketch exactness window: every sf0.01/sf0.1 group is far below the
    // 1e6 accuracy, so percentile_approx == the ceil(p*n)-th order statistic
    // == DuckDB quantile_disc (raw data values, bit-exact)
    "q51_approx_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.9) AS p90,
        |  quantile_disc(o_totalprice, 0.99) AS p99,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q58_minhash_shingles" ->
      """WITH th AS (
        |  SELECT d.doc_id, CAST(('0x' || substring(md5(t.t), 1, 8)) AS BIGINT) AS h
        |  FROM documents d, unnest(list_distinct(list_transform(
        |    range(1, greatest(length(d.text) - 4, 1) + 1),
        |    i -> substr(d.text, CAST(i AS INT), 5)))) AS t(t)),
        |mh AS (
        |  SELECT doc_id, i.i AS hash_idx,
        |    min(((2 * i.i + 1) * h + i.i * 40503) % 4294967311) AS minhash
        |  FROM th, range(16) i(i)
        |  GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(minhash ORDER BY hash_idx) AS s FROM mh GROUP BY doc_id),
        |bands AS (SELECT doc_id, b.b AS band,
        |    md5(array_to_string(s[b.b * 8 + 1 : b.b * 8 + 8], ',')) AS bucket
        |  FROM sig, range(2) b(b))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_bands
        |FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
        |  AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    "q56_event_sequences" ->
      """SELECT user_id, count(*) AS n_events,
        |  string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq
        |FROM events GROUP BY user_id""".stripMargin,

    // composed from the SAME fragment vals the stage oracles (q13/q15/q16/
    // q25) use — a stage-formula edit cannot leave a stale copy here
    "q57_curation_pipeline" ->
      s"""WITH surv AS (
         |  SELECT doc_id, source, text FROM documents WHERE doc_id IN (
         |    SELECT min(doc_id) FROM documents
         |    GROUP BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
         |l AS (SELECT doc_id,
         |  $langHitsSql
         |  FROM surv),
         |lang AS (SELECT doc_id, $langCaseSql AS lang_guess FROM l),
         |m AS (SELECT doc_id,
         |  $qualityMetricsSql
         | FROM surv),
         |q AS (SELECT doc_id,
         |  $qualityScoreSql AS quality_score
         |FROM m),
         |t AS (SELECT doc_id,
         |  $bpeishCountSql AS n_tokens
         |FROM surv)
         |SELECT s.source, count(*) AS n_kept,
         |  CAST(sum(t.n_tokens) AS BIGINT) AS sum_tokens,
         |  min(q.quality_score) AS min_quality,
         |  max(q.quality_score) AS max_quality
         |FROM surv s JOIN lang USING (doc_id) JOIN q USING (doc_id) JOIN t USING (doc_id)
         |WHERE lang.lang_guess = 'en' AND q.quality_score >= 0.5
         |  AND t.n_tokens BETWEEN 10 AND 5000
         |GROUP BY s.source""".stripMargin,

    "q55_asof_forward" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.event_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        |    THEN p.purchase_id END AS purchase_id
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin,

    "q54_profile_exact" ->
      """SELECT source, lang, count(*) AS n_rows, count(text) AS n_nonnull,
        |  count(DISTINCT text) AS n_distinct,
        |  CAST(min(length(text)) AS INTEGER) AS min_len,
        |  CAST(max(length(text)) AS INTEGER) AS max_len,
        |  CAST(sum(length(text)) AS DOUBLE) / count(text) AS avg_len
        |FROM documents GROUP BY source, lang""".stripMargin,

    // Spark's tumbling window is epoch-aligned: start = floor(ts / len) * len
    "q53_streaming_windowed_agg" ->
      """SELECT strftime(make_timestamp((epoch_ns(ts) // 1800000000000) * 1800000000),
        |    '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // q53's aggregation + Spark's append-mode emission rule: a window is
    // emitted iff window_end <= watermark, where the final watermark is the
    // MS-TRUNCATED max event time minus the 2h delay (Spark tracks event
    // time stats in milliseconds) — all in integer nanos here, exact
    "q70_streaming_append_eviction" ->
      """WITH w AS (SELECT (epoch_ns(ts) // 1800000000000) * 1800000000000 AS ws_ns,
        |    event_type, value FROM events),
        |wm AS (SELECT (max(epoch_ns(ts)) // 1000000) * 1000000
        |    - 7200000000000 AS wm_ns FROM events)
        |SELECT strftime(make_timestamp(ws_ns // 1000), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w, wm WHERE ws_ns + 1800000000000 <= wm_ns
        |GROUP BY 1, 2""".stripMargin,

    // two Lloyd iterations replicated closed-form: assignment = argmax
    // cosine (ties to higher cid), means = per-(cell,pos) AVG, L2-normalize,
    // round to FLOAT (absorbs engine-specific summation-order ulps; empty
    // cells keep the previous centroid), then q45's probe-and-scan
    "q52_ivf_kmeans_search" -> {
      def cos(a: String, b: String) = cosSql(a, b)
      def iter(prev: String, a: String, m: String, v: String, n: String, next: String) =
        s"""$a AS (SELECT vec_id, embedding, cid FROM (
           |    SELECT corp.vec_id, corp.embedding, $prev.cid,
           |      row_number() OVER (PARTITION BY corp.vec_id
           |        ORDER BY ${cos("corp.embedding", s"$prev.cv")} DESC, $prev.cid DESC) AS rn
           |    FROM corp CROSS JOIN $prev) WHERE rn = 1),
           |$m AS (SELECT cid, pos, avg(val) AS m FROM (
           |    SELECT cid, generate_subscripts(embedding, 1) AS pos,
           |      unnest(embedding) AS val FROM $a) GROUP BY cid, pos),
           |$v AS (SELECT cid, list(m ORDER BY pos) AS mv FROM $m GROUP BY cid),
           |$n AS (SELECT cid, mv, sqrt(list_sum(list_transform(mv, x -> x * x))) AS nrm FROM $v),
           |$next AS (SELECT $prev.cid,
           |    COALESCE(CASE WHEN $n.nrm > 0
           |      THEN list_transform($n.mv, x -> CAST(x / $n.nrm AS FLOAT)) END,
           |      $prev.cv) AS cv
           |  FROM $prev LEFT JOIN $n ON $prev.cid = $n.cid)""".stripMargin
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |corp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
         |       FROM corp ORDER BY vec_id LIMIT 4),
         |${iter("c0", "a0", "m1", "v1", "n1", "c1")},
         |${iter("c1", "a1", "m2", "v2", "n2", "c2")},
         |assign AS (SELECT vec_id, embedding, cid FROM (
         |    SELECT corp.vec_id, corp.embedding, c2.cid,
         |      row_number() OVER (PARTITION BY corp.vec_id
         |        ORDER BY ${cos("corp.embedding", "c2.cv")} DESC, c2.cid DESC) AS rn
         |    FROM corp CROSS JOIN c2) WHERE rn = 1),
         |qc AS (SELECT c2.cid FROM c2 CROSS JOIN q
         |       ORDER BY ${cos("q.qv", "c2.cv")} DESC, c2.cid ASC LIMIT 2)
         |SELECT a.vec_id, ${cos("a.embedding", "q.qv")} AS score
         |FROM assign a JOIN qc ON a.cid = qc.cid CROSS JOIN q
         |ORDER BY score DESC, a.vec_id LIMIT 5""".stripMargin
    },

    // word 4-grams with the same truncation rule as Dedup.wordNgrams (a
    // text shorter than 4 tokens yields its single truncated gram); bench
    // grams compared as strings — the Spark side's xxhash64 is a pure
    // membership-preserving compression.
    "q59_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id, array_to_string(t[i.i : i.i + 3], ' ') AS g
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i(i)),
        |bench AS (SELECT DISTINCT g FROM grams JOIN documents USING (doc_id)
        |  WHERE source = 'src19'),
        |hits AS (SELECT DISTINCT doc_id FROM grams JOIN documents USING (doc_id)
        |  WHERE source <> 'src19' AND g IN (SELECT g FROM bench))
        |SELECT doc_id, lang, source FROM documents JOIN hits USING (doc_id)""".stripMargin,

    "q60_sequence_packing" ->
      s"""WITH d AS (SELECT doc_id, source,
        |    ${shardSql("doc_id", 8)} AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT source, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok FROM d)
        |SELECT source, shard, CAST(floor(start_tok / 256.0) AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / 256 AS fill_ratio
        |FROM c GROUP BY 1, 2, 3""".stripMargin,

    "q61_stratified_sample" ->
      s"""WITH u AS (SELECT doc_id, lang,
        |    ${uniformSql("doc_id")} AS sample_key FROM documents)
        |SELECT doc_id, lang, sample_key FROM u
        |WHERE sample_key < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |  WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.125 ELSE 0.0625 END""".stripMargin,

    // transitive closure over the q39 pair graph: reach(id, lab) holds every
    // (vertex, candidate label) pair; min per vertex is the component id.
    "q62_neardup_components" ->
      s"""WITH RECURSIVE $prefixPairsSql,
        |pairs AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
        |SELECT component, count(*) AS n_members FROM comp GROUP BY 1""".stripMargin,

    // the composed pipeline: every CTE transcribes an individually-gated
    // stage oracle (q46 dedup, q39/q68 pairs+closure over the DEDUPED set,
    // q59 decontamination, q64 rank-form gate, q65 split, q60 sharded pack)
    "q69_curation_e2e" ->
      s"""WITH RECURSIVE
        |fp AS (SELECT doc_id, lang, source, text,
        |    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS f FROM documents),
        |exact AS (SELECT doc_id, lang, source, text FROM fp
        |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
        |${prefixPairsSqlOn("exact")},
        |pairs AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM exact
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        |keep AS (SELECT min(id) AS doc_id FROM comp GROUP BY component),
        |uniq AS (SELECT exact.* FROM exact JOIN keep USING (doc_id)),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams4 AS (SELECT doc_id, array_to_string(t[i.i : i.i + 3], ' ') AS g4
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i(i)),
        |bgrams AS (SELECT DISTINCT g4 FROM grams4 JOIN documents USING (doc_id)
        |  WHERE source = 'src19'),
        |contaminated AS (SELECT DISTINCT doc_id FROM grams4
        |  WHERE g4 IN (SELECT g4 FROM bgrams)),
        |clean AS (SELECT * FROM uniq WHERE source <> 'src19'
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |m AS (SELECT doc_id, lang, source, text,
        |  $qualityMetricsSql
        | FROM clean),
        |sc AS (SELECT doc_id, lang, source, text,
        |  $qualityScoreSql AS q
        | FROM m),
        |r AS (SELECT *, percent_rank() OVER (PARTITION BY source ORDER BY q) AS pr,
        |  count(*) OVER (PARTITION BY source) AS n_src FROM sc),
        |gated AS (SELECT doc_id, source, text FROM r WHERE pr >= 0.5 OR n_src = 1),
        |sp AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CASE WHEN ${uniformSql("doc_id", ":split")} < 0.875 THEN 'train'
        |         WHEN ${uniformSql("doc_id", ":split")} < 0.9375 THEN 'val'
        |         ELSE 'test' END AS split,
        |    ${shardSql("doc_id", 8)} AS shard
        |  FROM gated),
        |c AS (SELECT split, source, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY split, source, shard
        |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
        |  FROM sp),
        |seqs AS (SELECT split, source, shard,
        |    CAST(floor(start_tok / 256.0) AS BIGINT) AS seq_id,
        |    count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
        |  FROM c GROUP BY 1, 2, 3, 4)
        |SELECT split, source, count(*) AS n_seqs,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(seq_tokens) AS BIGINT) AS n_tokens
        |FROM seqs GROUP BY 1, 2""".stripMargin,

    // same closure as q62; survivor = min id per component (all labels name
    // present docs here — nodes are the full documents table)
    "q68_neardup_survivors" ->
      s"""WITH RECURSIVE $prefixPairsSql,
        |pairs AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        |keep AS (SELECT min(id) AS doc_id FROM comp GROUP BY component)
        |SELECT doc_id, lang, source FROM documents JOIN keep USING (doc_id)""".stripMargin,

    "q64_quality_gate" ->
      s"""WITH m AS (SELECT doc_id, source,
         |  $qualityMetricsSql
         | FROM documents),
         |sc AS (SELECT doc_id, source,
         |  $qualityScoreSql AS q
         | FROM m),
         |r AS (SELECT source, q,
         |  percent_rank() OVER (PARTITION BY source ORDER BY q) AS pr,
         |  count(*) OVER (PARTITION BY source) AS n_src FROM sc)
         |SELECT source, count(*) AS n_kept, min(q) AS min_kept_score
         |FROM r WHERE pr >= 0.5 OR n_src = 1 GROUP BY source""".stripMargin,

    "q67_exact_size_sample" ->
      s"""WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ${uniformSql("doc_id", ":exact")}, doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rk <= 30""".stripMargin,

    // distinct 3-grams per doc (wordNgrams is array_distinct), boilerplate
    // = grams in >= 5 distinct docs; frac divides the same two BIGINTs in
    // both engines, so the double is bit-identical
    "q66_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT DISTINCT doc_id, array_to_string(t[i.i : i.i + 2], ' ') AS g
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i(i)),
        |common AS (SELECT g FROM grams GROUP BY g
        |  HAVING count(DISTINCT doc_id) >= 5)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(*) FILTER (WHERE g IN (SELECT g FROM common)) AS BIGINT) AS n_boiler,
        |  CAST(count(*) FILTER (WHERE g IN (SELECT g FROM common)) AS DOUBLE)
        |    / count(*) AS boiler_frac
        |FROM grams GROUP BY doc_id""".stripMargin,

    "q65_split_assign" ->
      s"""WITH u AS (SELECT doc_id, lang,
        |    ${uniformSql("doc_id", ":split")} AS u FROM documents)
        |SELECT lang,
        |  CASE WHEN u IS NULL THEN NULL
        |    WHEN u < 0.875 THEN 'train' WHEN u < 0.9375 THEN 'val'
        |    ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM u GROUP BY 1, 2""".stripMargin,

    "q63_domain_mix" ->
      s"""WITH w AS (SELECT doc_id, lang,
        |    CAST(CASE lang WHEN 'de' THEN 2.5 WHEN 'es' THEN 2.0
        |      WHEN 'fr' THEN 0.5 WHEN 'zh' THEN 1.5 ELSE 1.0 END AS DOUBLE) AS wt,
        |    ${uniformSql("doc_id", ":up")} AS u FROM documents),
        |n AS (SELECT doc_id, lang,
        |    CAST(floor(wt) AS BIGINT)
        |      + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END AS n_copies FROM w),
        |e AS (SELECT doc_id, lang, CAST(ep.ep AS BIGINT) AS epoch
        |  FROM n, unnest(generate_series(1, n_copies)) AS ep(ep)
        |  WHERE n_copies > 0)
        |SELECT lang, epoch, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs
        |FROM e GROUP BY 1, 2""".stripMargin,

    // q33's session assignment in the STREAM's arithmetic (integer ms, the
    // precision of the state's Timestamp.getTime), then the emission rule
    // StreamingSpec pins: every non-last session per user emits; the last
    // (open) session emits iff end_ms + gap < watermark, STRICT, where the
    // final watermark is the ms-truncated max event time minus the gap.
    // Equal-ms tie order can't matter: break decisions depend only on
    // consecutive distinct-ms gaps, so session membership/min/max/count are
    // tie-order-invariant in both engines.
    "q74_streaming_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_ns(ts) // 1000000 AS ms FROM events),
        |g AS (SELECT user_id, ms, event_id,
        |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
        |      THEN 1 ELSE 0 END AS is_break
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (SELECT user_id, ms,
        |    sum(is_break) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS sid
        |  FROM g),
        |agg AS (SELECT user_id, sid, count(*) AS n_events,
        |    min(ms) AS start_ms, max(ms) AS end_ms
        |  FROM sess GROUP BY user_id, sid),
        |wm AS (SELECT max(epoch_ns(ts) // 1000000) - 1800000 AS wm_ms FROM events),
        |last AS (SELECT user_id, max(sid) AS last_sid FROM agg GROUP BY user_id)
        |SELECT a.user_id,
        |  strftime(make_timestamp(a.start_ms * 1000), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(make_timestamp(a.end_ms * 1000), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  a.n_events
        |FROM agg a JOIN last USING (user_id), wm
        |WHERE a.sid < last.last_sid OR a.end_ms + 1800000 < wm.wm_ms""".stripMargin,

    // one emitted row per distinct content fingerprint (q13's key); the
    // winner's payload is arrival-order-dependent so only the key is output
    "q75_streaming_dedup" ->
      """SELECT DISTINCT md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |  AS fingerprint FROM documents""".stripMargin,

    // bigram multiplicity via unnest + group (the oracle need not be
    // shuffle-free); DuckDB lists are 1-based, range(1, n) = 1..n-1. Both
    // fractions divide exact integers -> bit-identical doubles.
    "q76_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |base AS (SELECT doc_id, len(words) AS n_words,
        |    len(list_distinct(words)) AS n_distinct_words FROM w),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(words)),
        |    i -> words[i] || ' ' || words[i + 1])) AS bigram FROM w),
        |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS top_c FROM bc GROUP BY 1)
        |SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
        |  CAST(b.n_distinct_words AS BIGINT) AS n_distinct_words,
        |  CAST(b.n_words - b.n_distinct_words AS DOUBLE) / b.n_words AS dup_word_frac,
        |  CASE WHEN b.n_words < 2 THEN 0.0
        |    ELSE CAST(top.top_c AS DOUBLE) / (b.n_words - 1) END AS top_bigram_frac,
        |  (CAST(b.n_words - b.n_distinct_words AS DOUBLE) / b.n_words > 0.5
        |   OR CASE WHEN b.n_words < 2 THEN 0.0
        |     ELSE CAST(top.top_c AS DOUBLE) / (b.n_words - 1) END > 0.25) AS repetitive
        |FROM base b LEFT JOIN top USING (doc_id)""".stripMargin,

    // (term, doc) is unique in tf, so df = count(*) over tf; the tie-break
    // (score DESC, term ASC) is total per doc -> deterministic top-3
    "q77_tfidf_keywords" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |    CAST(tf.tf AS DOUBLE) / dfq.df AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf AS DOUBLE) / dfq.df DESC, tf.term) AS rank
        |  FROM tf JOIN dfq USING (term))
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
        |FROM s WHERE rank <= 3""".stripMargin,

    // q59's gram definition (4-token slices, short texts yield one
    // truncated gram), distinct per source; each shared gram contributes
    // each unordered source pair once, so the gram self-join counts the
    // same pairs the in-row expansion emits
    "q78_source_overlap" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT DISTINCT d.source, array_to_string(t[i.i : i.i + 3], ' ') AS g
        |  FROM toks JOIN documents d USING (doc_id),
        |    unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i(i)
        |  WHERE d.text IS NOT NULL)
        |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    // q64's oracle at pr >= 0.75 (the rank form; the engine runs the
    // two-pass boundary plan the gate proves equivalent)
    "q79_quality_gate_quarter" ->
      s"""WITH m AS (SELECT doc_id, source,
         |  $qualityMetricsSql
         | FROM documents),
         |sc AS (SELECT doc_id, source,
         |  $qualityScoreSql AS q
         | FROM m),
         |r AS (SELECT source, q,
         |  percent_rank() OVER (PARTITION BY source ORDER BY q) AS pr,
         |  count(*) OVER (PARTITION BY source) AS n_src FROM sc)
         |SELECT source, count(*) AS n_kept, min(q) AS min_kept_score
         |FROM r WHERE pr >= 0.75 OR n_src = 1 GROUP BY source""".stripMargin,

    // the sketch-mode gate inside the exactness window: keep iff q is
    // strictly above the stratum's DISCRETE median (quantile_disc ==
    // percentile_approx at group sizes << accuracy, per q51), singletons
    // always kept
    "q88_quality_gate_sketch" ->
      s"""WITH m AS (SELECT doc_id, source,
         |  $qualityMetricsSql
         | FROM documents),
         |sc AS (SELECT doc_id, source,
         |  $qualityScoreSql AS q
         | FROM m),
         |th AS (SELECT source, quantile_disc(q, 0.5) AS t, count(*) AS n
         |  FROM sc WHERE q IS NOT NULL GROUP BY source)
         |SELECT sc.source, count(*) AS n_kept, min(q) AS min_kept_score
         |FROM sc JOIN th ON sc.source = th.source
         |WHERE th.n = 1 OR sc.q > th.t GROUP BY sc.source""".stripMargin,

    // q66's exact oracle verbatim: the wide-sketch CMS form is exact-equal
    // on this corpus (width >> distinct grams; no estimate crosses minDocs)
    "q89_boilerplate_cms" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT DISTINCT doc_id, array_to_string(t[i.i : i.i + 2], ' ') AS g
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i(i)),
        |common AS (SELECT g FROM grams GROUP BY g
        |  HAVING count(DISTINCT doc_id) >= 5)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(*) FILTER (WHERE g IN (SELECT g FROM common)) AS BIGINT) AS n_boiler,
        |  CAST(count(*) FILTER (WHERE g IN (SELECT g FROM common)) AS DOUBLE)
        |    / count(*) AS boiler_frac
        |FROM grams GROUP BY doc_id""".stripMargin,

    // inner stream-stream join emission == the batch join (watermarks only
    // bound state); micros comparison mirrors q55's integer-us rule
    "q80_stream_interval_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000""".stripMargin,

    // q80's matches plus null-extended unconverted clicks whose join window
    // (click_ts + 1h) closed STRICTLY below the global min watermark =
    // min(max click ms, max purchase ms) - 1h delay. The ms-truncated form
    // equals the engine's micro-precision comparison because the watermark
    // is ms-quantized (proof: cms*1000 + frac + 3.6e9 < wm_ms*1000 iff
    // cms + 3600000 < wm_ms for 0 <= frac < 1000).
    // q63's epoch-explode machinery with sqrt(nmax/n) weights; the sqrt-of-
    // quotient FORM matches the Spark side exactly (sqrt(a)/sqrt(b) rounds
    // differently), so the doubles — and the fractional-epoch decisions
    // they drive — are bit-identical
    "q87_temperature_mix" ->
      s"""WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |mx AS (SELECT max(n) AS nmax FROM cnt),
         |wt AS (SELECT lang, sqrt(CAST(nmax AS DOUBLE) / n) AS w FROM cnt, mx),
         |d AS (SELECT doc_id, documents.lang, w,
         |    ${uniformSql("doc_id", ":up")} AS u
         |  FROM documents JOIN wt ON documents.lang = wt.lang),
         |n AS (SELECT doc_id, lang,
         |    CAST(floor(w) AS BIGINT)
         |      + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS n_copies FROM d),
         |e AS (SELECT doc_id, lang, CAST(ep.ep AS BIGINT) AS epoch
         |  FROM n, unnest(generate_series(1, n_copies)) AS ep(ep)
         |  WHERE n_copies > 0)
         |SELECT lang, epoch, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs
         |FROM e GROUP BY 1, 2""".stripMargin,

    // q70's closed form UNCHANGED: incremental per-file processing with a
    // ratcheting watermark must emit exactly the single-batch set (files
    // are time-contiguous, so nothing arrives late)
    "q86_incremental_windows" ->
      """WITH w AS (SELECT (epoch_ns(ts) // 1800000000000) * 1800000000000 AS ws_ns,
        |    event_type, value FROM events),
        |wm AS (SELECT (max(epoch_ns(ts)) // 1000000) * 1000000
        |    - 7200000000000 AS wm_ns FROM events)
        |SELECT strftime(make_timestamp(ws_ns // 1000), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w, wm WHERE ws_ns + 1800000000000 <= wm_ns
        |GROUP BY 1, 2""".stripMargin,

    // integer edit distances are engine-portable; DuckDB computes the full
    // DP and filters where Spark's thresholded form early-outs — same set
    "q85_editdist_pairs" ->
      """WITH s AS (SELECT doc_id, lang, source,
        |    substr(text, 1, 64) AS p FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.p, b.p) AS INT) AS edit_dist
        |FROM s a JOIN s b ON a.lang = b.lang AND a.source = b.source
        |  AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.p, b.p) <= 8""".stripMargin,

    // q52's centroid CTE shape per label: per-(label,pos) AVG, list in pos
    // order, L2-normalize, FLOAT-round; then min/max of the same in-order
    // cosine fold both engines share
    "q84_label_cohesion" -> {
      s"""WITH m AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
         |    unnest(embedding) AS val FROM embeddings),
         |a AS (SELECT label, pos, avg(val) AS m FROM m GROUP BY 1, 2),
         |v AS (SELECT label, list(m ORDER BY pos) AS mv FROM a GROUP BY 1),
         |n AS (SELECT label, mv,
         |    sqrt(list_sum(list_transform(mv, x -> x * x))) AS nrm FROM v),
         |c AS (SELECT label,
         |    list_transform(mv, x -> CAST(x / nrm AS FLOAT)) AS cv
         |  FROM n WHERE nrm > 0)
         |SELECT e.label, count(*) AS n_vecs,
         |  min(${cosSql("e.embedding", "c.cv")}) AS min_cos,
         |  max(${cosSql("e.embedding", "c.cv")}) AS max_cos
         |FROM embeddings e JOIN c USING (label)
         |GROUP BY e.label""".stripMargin
    },

    "q83_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        |FROM events GROUP BY user_id""".stripMargin,

    // positional 4-gram coverage + island count via lag (the engine does
    // islands in-row; the oracle may use the window — semantics, not plan)
    "q92_repeated_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id, i.i - 1 AS gpos,
        |    md5(array_to_string(t[i.i : i.i + 3], ' ')) AS g
        |  FROM toks, unnest(generate_series(1, len(t) - 3)) AS i(i)
        |  WHERE len(t) >= 4),
        |shared AS (SELECT g FROM grams GROUP BY g
        |  HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT gr.doc_id, gr.gpos + o.o AS cpos
        |  FROM grams gr JOIN shared s USING (g),
        |    unnest(generate_series(0, 3)) AS o(o)),
        |isl AS (SELECT doc_id, cpos,
        |    CASE WHEN cpos - lag(cpos) OVER (PARTITION BY doc_id
        |      ORDER BY cpos) = 1 THEN 0 ELSE 1 END AS new_span FROM cov),
        |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_tokens,
        |    CAST(sum(new_span) AS BIGINT) AS n_spans FROM isl GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
        |  coalesce(a.n_dup_tokens, 0) AS n_dup_tokens,
        |  CASE WHEN d.text IS NULL THEN NULL
        |    ELSE CAST(coalesce(a.n_dup_tokens, 0) AS DOUBLE)
        |      / len(string_split(d.text, ' ')) END AS dup_frac,
        |  coalesce(a.n_spans, 0) AS n_spans
        |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,

    // kept tokens re-joined in original order — a full text reconstruction
    // under the gate; fully-covered docs become '' (not NULL)
    "q93_strip_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id, i.i - 1 AS gpos,
        |    md5(array_to_string(t[i.i : i.i + 5], ' ')) AS g
        |  FROM toks, unnest(generate_series(1, len(t) - 5)) AS i(i)
        |  WHERE len(t) >= 6),
        |shared AS (SELECT g FROM grams GROUP BY g
        |  HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT gr.doc_id, gr.gpos + o.o AS cpos
        |  FROM grams gr JOIN shared s USING (g),
        |    unnest(generate_series(0, 5)) AS o(o)),
        |tk AS (SELECT doc_id, t[i.i] AS tok, i.i - 1 AS p
        |  FROM toks, unnest(generate_series(1, len(t))) AS i(i)),
        |kept AS (SELECT k.doc_id, k.tok, k.p FROM tk k
        |  LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.p = c.cpos
        |  WHERE c.cpos IS NULL),
        |ct AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
        |  FROM kept GROUP BY doc_id),
        |rm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |  FROM cov GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL
        |    ELSE coalesce(ct.clean_text, '') END AS clean_text,
        |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
        |  coalesce(rm.n_removed, 0) AS n_removed
        |FROM documents d LEFT JOIN ct USING (doc_id)
        |  LEFT JOIN rm USING (doc_id)""".stripMargin,

    // top-20 vocabulary by (count DESC, token ASC); per-doc OOV counts over
    // token OCCURRENCES; oov_frac is one exact-int double division. Docs
    // with NULL text have no token stream and are absent (both sides).
    "q94_vocab_oov" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |tot AS (SELECT token, sum(tf) AS n_occ FROM tf GROUP BY 1),
        |vocab AS (SELECT token FROM tot ORDER BY n_occ DESC, token ASC LIMIT 20),
        |agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN token NOT IN (SELECT token FROM vocab)
        |      THEN tf ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_frac FROM agg""".stripMargin,

    // the pivot→unpivot round-trip must land back on the plain long form
    "q102_unpivot" ->
      """SELECT user_id, event_type, count(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,

    // bucket = floor(value/16): dividing by 2^4 is an exact exponent
    // shift, so the bucket ids and carried min/max match bit-for-bit
    "q103_value_histogram" ->
      """WITH b AS (SELECT CAST(floor(value / 16.0) AS BIGINT) AS bucket, value
        |  FROM events WHERE value IS NOT NULL)
        |SELECT bucket, CAST(bucket AS DOUBLE) * 16.0 AS lo, count(*) AS n_rows,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM b GROUP BY bucket""".stripMargin,

    // q59's exact overlap semantics at n=4 over the src17 bench — the
    // streaming form must emit exactly the contaminated-doc set (stateless
    // stream-static semi + first-seen dedup, one AvailableNow batch)
    "q100_streaming_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id, array_to_string(t[i.i : i.i + 3], ' ') AS g
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i(i)),
        |bench AS (SELECT DISTINCT g FROM grams JOIN documents USING (doc_id)
        |  WHERE source = 'src17'),
        |hits AS (SELECT DISTINCT doc_id FROM grams JOIN documents USING (doc_id)
        |  WHERE source <> 'src17' AND g IN (SELECT g FROM bench))
        |SELECT doc_id, lang, source FROM documents JOIN hits USING (doc_id)""".stripMargin,

    // the ring replicated verbatim: same md5 key, same bucket substring,
    // lead + first_value wraparound per (round, bucket), self-pairs (bucket
    // singletons) dropped on both sides
    "q99_ring_negatives" ->
      """WITH r AS (SELECT j FROM unnest(generate_series(1, 2)) AS t(j)),
        |h AS (SELECT doc_id, j,
        |    md5(CAST(doc_id AS VARCHAR) || ':neg' || CAST(j AS VARCHAR)) AS hh
        |  FROM documents, r WHERE doc_id IS NOT NULL),
        |hb AS (SELECT doc_id, j, hh, substring(hh, 1, 2) AS b FROM h),
        |w AS (SELECT doc_id, j,
        |    coalesce(
        |      lead(doc_id) OVER (PARTITION BY j, b ORDER BY hh, doc_id),
        |      first_value(doc_id) OVER (PARTITION BY j, b ORDER BY hh, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |      AS neg_id
        |  FROM hb)
        |SELECT doc_id, CAST(j AS BIGINT) AS round, neg_id FROM w
        |WHERE neg_id <> doc_id""".stripMargin,

    // q68's recursive closure for the component labels + q65's split
    // arithmetic applied to the COMPONENT (same md5 uniform, same cuts)
    "q98_leakage_safe_split" ->
      s"""WITH RECURSIVE $prefixPairsSql,
        |pairs AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        |u AS (SELECT id, component,
        |    ${uniformSql("component", ":split")} AS u FROM comp)
        |SELECT CASE WHEN u IS NULL THEN NULL
        |    WHEN u < 0.875 THEN 'train' WHEN u < 0.9375 THEN 'val'
        |    ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(count(DISTINCT component) AS BIGINT) AS n_components
        |FROM u GROUP BY 1""".stripMargin,

    // q60's packing arithmetic recomputed from `documents` directly — the
    // Spark side must deliver the identical stats THROUGH the partitioned
    // write + read-back, or rows were lost/duplicated/mistyped in the sink
    "q97_shard_writer" ->
      s"""WITH d AS (SELECT doc_id, source,
        |    ${shardSql("doc_id", 8)} AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, source, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok FROM d)
        |SELECT source, CAST(shard AS BIGINT) AS shard,
        |  CAST(floor(start_tok / 256.0) AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  CAST(min(start_tok % 256) AS BIGINT) AS first_offset,
        |  CAST(max(doc_id) AS BIGINT) AS last_doc
        |FROM c GROUP BY 1, 2, 3""".stripMargin,

    // q94's oracle with the per-doc rollup phrased over token occurrences
    // (the sketch leg never builds tf) — inside the exactness window the
    // MG vocabulary is the exact top-20, so the same SQL applies
    "q96_vocab_oov_sketch" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents),
        |tot AS (SELECT token, count(*) AS n_occ FROM tok GROUP BY 1),
        |vocab AS (SELECT token FROM tot ORDER BY n_occ DESC, token ASC LIMIT 20),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN token NOT IN (SELECT token FROM vocab)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM tok GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_frac FROM agg""".stripMargin,

    // q59's oracle shape at n=5 over the src18 bench — the bloom route must
    // reproduce the EXACT overlap semantics (the sketch only pre-filters;
    // the verify join strips its false positives)
    "q95_bloom_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id, array_to_string(t[i.i : i.i + 4], ' ') AS g
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i(i)),
        |bench AS (SELECT DISTINCT g FROM grams JOIN documents USING (doc_id)
        |  WHERE source = 'src18'),
        |hits AS (SELECT DISTINCT doc_id FROM grams JOIN documents USING (doc_id)
        |  WHERE source <> 'src18' AND g IN (SELECT g FROM bench))
        |SELECT doc_id, lang, source FROM documents JOIN hits USING (doc_id)""".stripMargin,

    // the inferred value list must land on the same columns the explicit
    // q83 names (the events domain is exactly these five types at every SF)
    "q91_pivot_dynamic" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        |FROM events GROUP BY user_id""".stripMargin,

    // the same uniform + score fragments as q61/q25; both sides clamp and
    // compare the identical doubles, so the kept set is bit-identical
    "q82_weighted_sample" ->
      s"""WITH m AS (SELECT doc_id, source,
         |  $qualityMetricsSql
         | FROM documents),
         |sc AS (SELECT doc_id, source,
         |  $qualityScoreSql AS q
         | FROM m)
         |SELECT doc_id, source, q FROM sc
         |WHERE ${uniformSql("doc_id", ":wt")} < LEAST(GREATEST(q, 0.0), 1.0)""".stripMargin,

    "q81_stream_outer_join" ->
      """WITH c AS (SELECT event_id AS cid, user_id,
        |    epoch_ns(ts) // 1000000 AS cms, epoch_us(ts) AS cus
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS pid, user_id,
        |    epoch_ns(ts) // 1000000 AS pms, epoch_us(ts) AS pus
        |  FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(cms) FROM c), (SELECT max(pms) FROM p))
        |    - 3600000 AS w),
        |m AS (SELECT c.cid, p.pid FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.pus >= c.cus AND p.pus <= c.cus + 3600000000)
        |SELECT cid AS click_id, pid AS purchase_id FROM m
        |UNION ALL
        |SELECT c.cid, CAST(NULL AS BIGINT) FROM c, wm
        |WHERE c.cid NOT IN (SELECT cid FROM m) AND c.cms + 3600000 < wm.w""".stripMargin,

    // the PII injection replicated verbatim (concat_ws skips NULL branches
    // on both engines); identical pattern strings (java.regex ∩ RE2 common
    // subset), DuckDB needs the explicit 'g' flag to match Spark's
    // replace-all default; counts via len(regexp_extract_all)
    "q104_pii_scrub" ->
      """WITH inj AS (SELECT doc_id, concat_ws(' ', text,
        |  CASE WHEN doc_id % 7 = 0 THEN 'contact user' ||
        |    CAST(doc_id AS VARCHAR) || '@mail.example.com' END,
        |  CASE WHEN doc_id % 5 = 0 THEN 'call 555-' ||
        |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0142 now' END,
        |  CASE WHEN doc_id % 11 = 0 THEN 'host 10.0.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.7' END) AS text
        |FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM inj""".stripMargin,

    // chunk count = 1 + ceil((n-32)/24) clamped at 1 (closed form; ceil of
    // an exact small-integer quotient, so the rounding DuckDB applies when
    // casting doubles cannot bite); DuckDB list slices are 1-based
    // inclusive and truncate at the end like Spark's slice
    "q105_token_chunks" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, t, len(t) AS n FROM toks),
        |c AS (SELECT doc_id, t, n, i.i AS chunk_idx FROM n,
        |  unnest(generate_series(0, CASE WHEN n <= 32 THEN 0
        |    ELSE CAST(ceil((n - 32) / 24.0) AS BIGINT) END)) AS i(i))
        |SELECT doc_id, chunk_idx,
        |  array_to_string(t[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')
        |    AS chunk_text,
        |  least(32, n - chunk_idx * 24) AS n_tokens
        |FROM c""".stripMargin,

    // the window (rank) form of latest-wins: the engine's max_by hash agg
    // must pick exactly the row_number()=1 row per key — (version, prio)
    // is unique per key by construction, so both forms are deterministic
    "q106_latest_wins_merge" -> latestWinsOracleSql,

    // q112 shares q106's oracle verbatim (one transcription): under a
    // single AvailableNow batch, UPDATE-mode mapGroupsWithState emits each
    // key's post-merge winner exactly once = the batch merge result
    // (multi-batch re-emission pinned in StreamingSpec)
    "q112_streaming_upsert" -> latestWinsOracleSql,
    "q130_foreachbatch_upsert" -> latestWinsOracleSql,

    // independent marginals; GROUPING's bitmask convention (first arg =
    // high bit, 1 = aggregated-away) matches Spark's grouping_id
    "q107_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

    // the native gap-merge rule in exact MICROSECONDS: break at
    // diff > 30 min (merge AT the boundary — pinned empirically in
    // SessionizeSpec, same rule as q33's lag form), session_end = last
    // event + gap; epoch_ns//1000 mirrors events()'s nanos→micros
    // truncation (the q80/q81 pattern), strftime/date_format both floor
    // to whole seconds
    "q108_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |g AS (SELECT user_id, us, event_id,
        |  CASE WHEN lag(us) OVER w IS NULL
        |    OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_break
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |  sum(is_break) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id,
        |  strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(make_timestamp(max(us) + 1800000000),
        |    '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // null-extended on BOTH sides: order-bearing keys below the balance
    // filter, and high-balance customers with no orders
    "q109_full_outer" ->
      """WITH o AS (SELECT o_custkey, count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |c AS (SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_acctbal > 5000.0)
        |SELECT coalesce(o.o_custkey, c.c_custkey) AS custkey,
        |  o.n_orders, c.c_mktsegment
        |FROM o FULL OUTER JOIN c ON o.o_custkey = c.c_custkey""".stripMargin,

    // capacity 1024 >> distinct tokens => the Misra-Gries sketch is exact,
    // so the exact per-source counts + deterministic (n_occ DESC, token
    // ASC) rank are the oracle (q96's exactness window, stratified)
    "q110_group_heavy_hitters" -> groupHeavyHittersOracleSql,

    // trailing-hour RANGE frame over integer micros; count exact, min/max
    // order-free — frame membership is the thing under test
    "q111_range_frame" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
        |  value FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER w AS n_trailing_hour,
        |  min(value) OVER w AS min_v_hour,
        |  max(value) OVER w AS max_v_hour
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // span-level q59: positional 4-grams, bench = non-null src19 text,
    // coverage clamped inside the doc; gaps-and-islands via
    // cpos - row_number gives the maximal merged spans
    "q113_contamination_spans" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |grams AS (SELECT doc_id, source, len(t) AS n_toks, i.i - 1 AS gpos,
        |    array_to_string(t[i.i : i.i + 3], ' ') AS g
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i(i)),
        |bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src19'),
        |cov AS (SELECT DISTINCT gr.doc_id, gr.gpos + o.o AS cpos
        |  FROM grams gr, unnest(generate_series(0, 3)) AS o(o)
        |  WHERE gr.source <> 'src19' AND gr.g IN (SELECT g FROM bench)
        |    AND gr.gpos + o.o <= gr.n_toks - 1),
        |isl AS (SELECT doc_id, cpos,
        |    cpos - row_number() OVER (PARTITION BY doc_id ORDER BY cpos) AS grp
        |  FROM cov)
        |SELECT doc_id, CAST(min(cpos) AS INT) AS span_start,
        |  CAST(max(cpos) AS INT) AS span_end,
        |  count(*) AS span_tokens
        |FROM isl GROUP BY doc_id, grp""".stripMargin,

    // the rank form of quantileBins: bin = least((cntLess*bins)//(n-1),
    // bins-1) with cntLess = rank-1 — all-integer arithmetic on both
    // engines, so exact for ANY bin count (not just dyadic)
    "q114_quantile_bins" ->
      s"""WITH m AS (SELECT doc_id, source,
         |  $qualityMetricsSql
         | FROM documents),
         |sc AS (SELECT doc_id, source,
         |  $qualityScoreSql AS q
         | FROM m),
         |r AS (SELECT doc_id, source, q,
         |    CAST(rank() OVER (PARTITION BY source ORDER BY q) - 1 AS BIGINT) AS cl,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM sc WHERE q IS NOT NULL)
         |SELECT doc_id, source, q,
         |  CAST(CASE WHEN n = 1 THEN 0
         |    ELSE least((cl * 4) // (n - 1), 3) END AS INT) AS bin
         |FROM r""".stripMargin,

    // q68's closure with the argmax-by-quality keep rule: ORDER BY q DESC
    // NULLS LAST, doc_id ASC replicates the (rank, -id) struct argmax —
    // null rank loses to any ranked row; all-null falls back to min id
    "q115_best_survivors" ->
      s"""WITH RECURSIVE $prefixPairsSql,
        |pairs AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        |m AS (SELECT doc_id, source,
        |  $qualityMetricsSql
        | FROM documents),
        |sc AS (SELECT doc_id,
        |  $qualityScoreSql AS q
        | FROM m),
        |rk AS (SELECT c.id AS doc_id, sc.q,
        |    row_number() OVER (PARTITION BY c.component
        |      ORDER BY sc.q DESC NULLS LAST, c.id ASC) AS rn
        |  FROM comp c JOIN sc ON sc.doc_id = c.id)
        |SELECT d.doc_id, d.lang, d.source, rk.q
        |FROM rk JOIN documents d USING (doc_id) WHERE rk.rn = 1""".stripMargin,

    // the same closure rolled up to per-(source, cluster-size) doc counts
    "q116_dedup_inflation" ->
      s"""WITH RECURSIVE $prefixPairsSql,
        |pairs AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        |sz AS (SELECT component, count(*) AS cluster_size
        |  FROM comp GROUP BY component)
        |SELECT d.source, sz.cluster_size, count(*) AS n_docs
        |FROM comp c JOIN sz USING (component)
        |  JOIN documents d ON d.doc_id = c.id
        |GROUP BY d.source, sz.cluster_size""".stripMargin,

    // integer epoch weeks (micros // day // 7): no calendar/timezone
    // truncation rules to disagree on
    "q117_cohort_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    (epoch_us(ts) // 86400000000) // 7 AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1)
        |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN c USING (user_id)
        |GROUP BY c.cohort_week, a.week - c.cohort_week""".stripMargin,

    // the full PQ pipeline replicated: sampled codebooks = slices of the
    // first-4 vectors; per-subspace argmin codes (dist ASC, cid ASC); ADC
    // = the query's distance to each ASSIGNED sub-centroid, summed sub-0
    // then sub-1 (the engine's in-order fold); 15 ADC-best re-ranked by
    // exact cosine
    "q118_pq_search" -> pqSearchOracleSql(qid = 0),

    // the MEMORY PQ tier (byte codes + the same ADC table/fold) must
    // land on the identical prune-and-rerank result
    "q190_memory_pq" -> pqSearchOracleSql(qid = 23),

    "q191_binary_search" -> binarySearchOracleSql(qid = 31),

    "q192_memory_binary" -> binarySearchOracleSql(qid = 37),

    // the payload-indexed serving path ≡ a WHERE over the joined corpus
    // — which candidate-enumeration strategy ran must be invisible
    "q195_indexed_filter" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 43)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |CROSS JOIN q
         |WHERE e.vec_id <> 43 AND d.source = 'src2'
         |  AND e.label BETWEEN 1 AND 6
         |ORDER BY score DESC, e.vec_id LIMIT 8""".stripMargin
    },

    // MaxSim: per-(doc, qtok) max cosine is order-free exact IEEE; the
    // only order-sensitive fold is the final sum over query vectors,
    // pinned qtok-ascending on both sides (Spark: left-assoc m0+m1+m2+m3;
    // DuckDB: list_sum(list(m ORDER BY qtok))). q194 = DataFrame plan,
    // q197 = memory tier at another query bag — one transcription.
    "q194_maxsim" ->
      maxSimOracleSql(qCond = "vec_id < 4", dCond = "vec_id >= 4"),

    "q197_memory_maxsim" ->
      maxSimOracleSql(qCond = "vec_id BETWEEN 8 AND 11",
        dCond = "vec_id >= 4 AND vec_id // 4 <> 2"),

    // IVF x binary: q181's cell-selection transcription with the
    // integer Hamming pass in place of the SQ8 algebra
    "q196_ivf_binary_search" -> {
      val cos = cosSql("c.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 47),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id <> 47 ORDER BY vec_id LIMIT 4),
         |cscored AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <> 47),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
         |    FROM cscored) WHERE rn = 1),
         |qcents AS (
         |  SELECT c.cid FROM cents c CROSS JOIN q
         |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cid ASC LIMIT 2),
         |v AS (SELECT a.vec_id, a.embedding
         |  FROM assign a JOIN qcents ON a.cid = qcents.cid),
         |ham AS (SELECT v.vec_id, v.embedding,
         |  list_sum(list_transform(list_zip(v.embedding, q.qv),
         |    p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END)) AS h
         |  FROM v CROSS JOIN q),
         |cand AS (SELECT vec_id, embedding FROM ham ORDER BY h, vec_id LIMIT 15)
         |SELECT c.vec_id, $cos AS score
         |FROM cand c CROSS JOIN q
         |ORDER BY score DESC, c.vec_id LIMIT 5""".stripMargin
    },

    // the e2e composition: q18's filter + q17's dense leg + q162's BM25
    // (stats over the FILTERED corpus on both sides) + q163's RRF +
    // q165's unrolled greedy MMR — one transcription per stage, chained
    "q200_serving_pipeline_e2e" -> {
      val lam = 0.7
      val lc = (1.0 - lam).toString
      val cos = cosSql("e.embedding", "q.qv")
      val csel = cosSql("c.emb", "s.emb")
      val steps = (2 to 5).map { k =>
        s"""s$k AS (SELECT $k AS sel_rank, c.id, c.emb,
           |  c.rel - CAST($lc AS DOUBLE) * (SELECT max($csel) FROM sel${k - 1} s) AS mmr
           |  FROM cand2 c WHERE c.id NOT IN (SELECT id FROM sel${k - 1})
           |  ORDER BY mmr DESC, c.id LIMIT 1),
           |sel$k AS (SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM s$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH qd AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 13),
         |dense AS (
         |  SELECT e.vec_id AS id, $cos AS score
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  CROSS JOIN qd q
         |  WHERE d.lang = 'en' AND e.vec_id <> 13
         |  ORDER BY score DESC, e.vec_id LIMIT 20),
         |dr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM dense),
         |lex AS (
         |  SELECT doc_id, score
         |  FROM ${bm25ScoredSql(Seq("dup", "vector"), docCond = "lang = 'en'")} s
         |  ORDER BY score DESC, doc_id LIMIT 20),
         |lr AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM lex),
         |rrf AS (
         |  SELECT coalesce(dr.id, lr.id) AS id,
         |    coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(dr.rank AS DOUBLE)), CAST(0 AS DOUBLE))
         |      + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(lr.rank AS DOUBLE)), CAST(0 AS DOUBLE)) AS rrf
         |  FROM dr FULL OUTER JOIN lr ON dr.id = lr.id
         |  ORDER BY rrf DESC, id LIMIT 20),
         |cand2 AS (
         |  SELECT r.id, e.embedding AS emb, CAST($lam AS DOUBLE) * r.rrf AS rel
         |  FROM rrf r JOIN embeddings e ON r.id = e.vec_id),
         |sel1 AS (SELECT 1 AS sel_rank, id, emb, rel AS mmr FROM cand2
         |  ORDER BY rel DESC, id LIMIT 1),
         |$steps
         |SELECT sel_rank, id, mmr FROM sel5""".stripMargin
    },

    // corpus purge ≡ a WHERE over the remaining docs (integer aggregate)
    "q201_forget_purge" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE doc_id % 13 <> 0
        |GROUP BY source""".stripMargin,

    // incremental postings purge ≡ a FULL REBUILD over the remaining
    // corpus: the amended stats (N/Σdl by subtraction, df by
    // subtraction, idf re-derived) must land on the rebuild's bits
    "q202_forget_postings_search" ->
      s"""SELECT doc_id, score
         |FROM ${bm25ScoredSql(Seq("dup", "stream"), docCond = "doc_id % 13 <> 0")} s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // the serving-tier purge protocol lands on the SAME full-rebuild
    // truth as q202: the memory tier's WAND walk over the amended
    // artifact under subtraction-amended stats ≡ the rebuild SQL
    "q293_purge_republish_serve" ->
      s"""SELECT doc_id, score
         |FROM ${bm25ScoredSql(Seq("dup", "stream"), docCond = "doc_id % 13 <> 0")} s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // recall@10 / reciprocal-rank / nDCG@10 per query: exact integer
    // divisions + a literal-weight DCG chain (fdlibm constants embedded
    // on BOTH sides) — see irMetricsOracleSql
    "q204_ir_metrics" -> irMetricsOracleSql,

    // ANN self-evaluation: IVF retrieval graded against the exact top-10
    // (assignment + probing + both rankings + metrics all transcribed)
    "q210_ann_eval" -> annEvalOracleSql,

    // drift counters: q155's assignment transcription + an order-free
    // max for the best-centroid score; the rebuild test is exact integer
    // cross-multiplication (4*n_far > 1*n at n >= 5)
    "q211_index_drift" -> {
      val cos = cosSql("e.embedding", "cc.cv")
      s"""WITH cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         |    embedding AS cv
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)),
         |scored AS (SELECT e.vec_id, cc.cid, $cos AS cs
         |  FROM embeddings e CROSS JOIN cents cc),
         |a AS (SELECT vec_id, cid, best FROM (
         |    SELECT vec_id, cid, cs,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY cs DESC, cid DESC) AS rn,
         |      max(cs) OVER (PARTITION BY vec_id) AS best
         |    FROM scored) WHERE rn = 1),
         |cnt AS (SELECT CAST(cid AS INTEGER) AS ivf_cell, count(*) AS n,
         |    CAST(sum(CASE WHEN best < CAST(0.2 AS DOUBLE) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_far
         |  FROM a GROUP BY cid)
         |SELECT ivf_cell, n, n_far,
         |  (n >= 5 AND 4 * n_far > 1 * n) AS rebuild FROM cnt""".stripMargin
    },

    // fuzzy matching: the oracle verifies the CONTRACT (all vocab terms
    // within levenshtein 1) by the naive scan the deletion join avoids;
    // df = docs containing the term (distinct doc_id per term)
    "q212_fuzzy_terms" ->
      """WITH toks AS (SELECT DISTINCT doc_id,
        |    unnest(string_split(text, ' ')) AS term FROM documents),
        |vocab AS (SELECT term, count(*) AS df FROM toks GROUP BY term)
        |SELECT q.query_term, v.term, v.df
        |FROM (VALUES ('strem'), ('dup'), ('qury'), ('zzzz')) q(query_term)
        |JOIN vocab v ON levenshtein(q.query_term, v.term) <= 1""".stripMargin,

    // macro averages: q204's per-query oracle as a nested subquery, the
    // same two-level pinned summation (list_sum over qid order per
    // bucket, then bucket order), one exact division by the count
    "q214_ir_macro" ->
      s"""WITH b AS (SELECT qid // 16 AS bucket, count(*) AS n,
         |    list_sum(list(recall ORDER BY qid)) AS pr,
         |    list_sum(list(rr ORDER BY qid)) AS pp,
         |    list_sum(list(ndcg ORDER BY qid)) AS pn
         |  FROM ($irMetricsOracleSql) pq GROUP BY bucket)
         |SELECT CAST(sum(n) AS BIGINT) AS n_queries,
         |  list_sum(list(pr ORDER BY bucket)) / CAST(sum(n) AS DOUBLE) AS mean_recall,
         |  list_sum(list(pp ORDER BY bucket)) / CAST(sum(n) AS DOUBLE) AS mean_rr,
         |  list_sum(list(pn ORDER BY bucket)) / CAST(sum(n) AS DOUBLE) AS mean_ndcg
         |FROM b""".stripMargin,

    // typo correction composed into BM25: corrections mined by the q212
    // contract, one winner per typo by (exact, df DESC, term ASC), the
    // corrected set driving the gated bm25ScoredSql via a data-dependent
    // term filter
    "q217_corrected_search" -> {
      val scored = bm25ScoredSql(Nil,
        termCond = "term IN (SELECT term FROM corr)")
      s"""WITH toks AS (SELECT DISTINCT doc_id,
         |    unnest(string_split(text, ' ')) AS term FROM documents),
         |vocab AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
         |m AS (SELECT q.query_term, v.term, v.df
         |  FROM (VALUES ('strem'), ('qury')) q(query_term)
         |  JOIN vocab v ON levenshtein(q.query_term, v.term) <= 1),
         |corr AS (SELECT DISTINCT term FROM (SELECT *, row_number() OVER (
         |    PARTITION BY query_term ORDER BY (term = query_term) DESC,
         |      df DESC, term ASC) AS rn FROM m) WHERE rn = 1)
         |SELECT doc_id, score FROM $scored s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
    },

    // residual IVF-PQ: q129's transcription with the PQ stage moved onto
    // REAL-rounded residuals (double subtract → float32 cast, identical
    // IEEE rounding both engines) and per-probed-cell query-residual ADC;
    // one transcription serves the DataFrame path (q216) and the memory
    // tier (q218) at different stored queries
    "q216_ivf_rpq_search" -> rpqSearchOracleSql(qid = 7),
    "q218_memory_rpq" -> rpqSearchOracleSql(qid = 23),

    // multi-probe LSH: q44's transcription at 3 planes, probing the home
    // bucket plus its three single-bit flips (xor against VALUES 0,1,2,4)
    "q219_lsh_multiprobe" -> {
      def dot(a: String, b: String) =
        s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
      def bucket(v: String) =
        s"""(CASE WHEN ${dot(v, "p1.pv")} >= 0 THEN 1 ELSE 0 END)
           |    + (CASE WHEN ${dot(v, "p2.pv")} >= 0 THEN 2 ELSE 0 END)
           |    + (CASE WHEN ${dot(v, "p3.pv")} >= 0 THEN 4 ELSE 0 END)""".stripMargin
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |p1 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 3),
         |p2 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 4),
         |p3 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 5),
         |corp AS (SELECT e.vec_id, e.embedding,
         |    ${bucket("e.embedding")} AS bucket
         |  FROM embeddings e CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN p3
         |  WHERE e.vec_id <> 0),
         |qb AS (SELECT ${bucket("q.qv")} AS bucket
         |  FROM q CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN p3),
         |probes AS (SELECT xor(qb.bucket, v.f) AS b
         |  FROM qb, (VALUES (0), (1), (2), (4)) v(f))
         |SELECT c.vec_id, ${cosSql("c.embedding", "q.qv")} AS score
         |FROM corp c JOIN probes ON c.bucket = probes.b CROSS JOIN q
         |ORDER BY score DESC, c.vec_id LIMIT 5""".stripMargin
    },

    // WAND prunes, it must not re-rank: the oracle is the EXHAUSTIVE
    // BM25 transcription (q162's), and the gate proves the pruned scan
    // returns the same bits
    "q220_wand_search" ->
      s"""SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "merge", "sort"))} s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // 3 synchronous label-propagation rounds replayed as chained CTEs on
    // the shared q39 pair fragment; argmax = row_number (votes DESC,
    // label ASC) — all-integer, so no fold pinning is needed anywhere
    "q221_label_propagation" -> {
      def round(prev: String, k: Int): String =
        s"""v$k AS (SELECT e.dst AS id, r.lab, count(*) AS c
           |  FROM edges e JOIN $prev r ON r.id = e.src GROUP BY 1, 2),
           |b$k AS (SELECT id, lab FROM (SELECT id, lab,
           |    row_number() OVER (PARTITION BY id ORDER BY c DESC, lab) AS rn
           |  FROM v$k) WHERE rn = 1),
           |r$k AS (SELECT * FROM seeds UNION ALL
           |  SELECT b.id, b.lab FROM b$k b
           |  WHERE b.id NOT IN (SELECT id FROM seeds))""".stripMargin
      s"""WITH $prefixPairsSql,
         |pairs AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.9),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |seeds AS (SELECT doc_id AS id,
         |    CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS lab
         |  FROM documents WHERE doc_id % 7 = 0),
         |r0 AS (SELECT id, lab FROM seeds),
         |${round("r0", 1)},
         |${round("r1", 2)},
         |${round("r2", 3)}
         |SELECT id AS doc_id, lab AS label FROM r3""".stripMargin
    },

    // the MG exactness window makes the streaming accumulate land on the
    // exact batch oracle — q110's transcription verbatim
    "q225_streaming_heavy_hitters" -> groupHeavyHittersOracleSql,

    // the DEFINITIONAL triangle enumeration (each triangle once as
    // x<y<z over the canonical a<b edge set) — deliberately NOT the
    // engine's degree-ordered orientation, so the oracle checks the
    // node-iterator rather than replaying it; all counts integer, the
    // coefficient one correctly-rounded division both engines share
    "q227_triangle_counts" ->
      s"""WITH $prefixPairsSql,
         |e AS (SELECT id_a AS a, id_b AS b FROM jp WHERE jaccard >= 0.9),
         |deg AS (SELECT id, count(*) AS degree FROM
         |  (SELECT a AS id FROM e UNION ALL SELECT b FROM e) u GROUP BY 1),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e e1 JOIN e e2 ON e2.a = e1.b
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |tn AS (SELECT id, count(*) AS t FROM
         |  (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
         |   UNION ALL SELECT z FROM tri) u GROUP BY 1)
         |SELECT deg.id AS doc_id, deg.degree,
         |  CAST(coalesce(tn.t, 0) AS BIGINT) AS triangles,
         |  CASE WHEN deg.degree < 2 THEN 0.0
         |    ELSE CAST(coalesce(tn.t, 0) AS DOUBLE) * 2.0
         |      / CAST(deg.degree * (deg.degree - 1) AS DOUBLE) END AS coeff
         |FROM deg LEFT JOIN tn ON tn.id = deg.id""".stripMargin,

    // same compaction replayed: distinct (user, week) -> per-user min ->
    // integer week offsets; Monday week starts on both engines
    "q228_cohort_retention" -> cohortRetentionOracleSql,

    // the distinct-union accumulate is EXACT under any slicing, so the
    // streaming form lands on the batch oracle verbatim
    "q232_streaming_retention" -> cohortRetentionOracleSql,

    // lead over the same pinned (ts, event_id) order; counts integer,
    // p the shared single division
    "q233_event_transitions" -> eventTransitionsOracleSql,

    // the carry-state accumulate is exact under time-partitioned
    // arrival, so the streaming form lands on the batch oracle verbatim
    "q237_streaming_transitions" -> eventTransitionsOracleSql,

    // the fixed 6-round peel replayed as chained CTEs (extra rounds
    // no-op after convergence, so the engine's early exit lands here);
    // MATERIALIZED is load-bearing — inlined CTEs would re-expand the
    // whole prior round at every reference, exponentially
    "q234_kcore_docs" -> {
      def round(i: Int): String =
        s"""d$i AS MATERIALIZED (SELECT id, count(*) AS dg FROM
           |  (SELECT a AS id FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) u
           |  GROUP BY 1),
           |s$i AS MATERIALIZED (SELECT id FROM d$i WHERE dg >= 2),
           |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
           |  WHERE a IN (SELECT id FROM s$i) AND b IN (SELECT id FROM s$i))""".stripMargin
      s"""WITH $prefixPairsSql,
         |e0 AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM jp WHERE jaccard >= 0.9),
         |${(1 to 6).map(round).mkString(",\n")}
         |SELECT id AS doc_id, count(*) AS core_degree FROM
         |  (SELECT a AS id FROM e6 UNION ALL SELECT b FROM e6) u
         |GROUP BY 1""".stripMargin
    },

    // the same derivations, weights, and thresholds transcribed; the
    // floor-to-dollar subtraction is textually identical on both sides
    // (bounded sample: same custkey cap as the Spark entry)
    "q235_entity_resolution" ->
      s"""WITH ${erCtesSql(" WHERE c_custkey <= 15000")},
        |p AS (SELECT a_key, b_key,
        |    $erScoreSql AS score
        |  FROM a JOIN b USING (nation))
        |SELECT a_key, b_key, CAST(score AS BIGINT) AS score,
        |  CASE WHEN score >= 7 THEN 'match' ELSE 'possible' END AS cls
        |FROM p WHERE score >= 3""".stripMargin,

    // counts, products, and the flag — all integer
    "q236_blocking_audit" ->
      """WITH ca AS (SELECT c_nationkey AS nation, count(*) AS n_a
        |  FROM customer GROUP BY 1),
        |cb AS (SELECT c_nationkey AS nation, count(*) AS n_b
        |  FROM customer WHERE c_custkey % 2 = 1 GROUP BY 1)
        |SELECT coalesce(ca.nation, cb.nation) AS nation,
        |  CAST(coalesce(ca.n_a, 0) AS BIGINT) AS n_a,
        |  CAST(coalesce(cb.n_b, 0) AS BIGINT) AS n_b,
        |  CAST(coalesce(ca.n_a, 0) * coalesce(cb.n_b, 0) AS BIGINT) AS n_pairs,
        |  coalesce(ca.n_a, 0) * coalesce(cb.n_b, 0) > 50000 AS oversized
        |FROM ca FULL OUTER JOIN cb ON ca.nation = cb.nation""".stripMargin,

    // q235's scorer unfiltered + truth, one row per distinct score,
    // cumulative windows (ROWS == RANGE: scores distinct), exact flag
    "q238_er_calibration" -> erCalibrationSql(pairFilter = "",
      sampleFilter = " WHERE c_custkey <= 15000"),

    // same grid, same integer cross-products, same single division
    "q239_feature_drift" -> featureDriftOracleSql,

    // the summary accumulates by plain column sums — exact under any
    // slicing, so the streaming verdict lands on the batch oracle
    "q241_streaming_drift" -> featureDriftOracleSql,

    // the prefix-min identity s_i = c_i - min(0, min_{j<=i} c_j) in the
    // same two windows; everything integer cents, so no fold pinning
    "q242_cusum_changepoint" -> cusumOracleSql,

    // the four-integer carry state composes batches exactly, so the
    // streaming verdict lands on the batch oracle
    "q251_streaming_cusum" -> cusumOracleSql,

    // integer group sizes and exact distinct-cents counts per QI cell
    "q243_k_anonymity_audit" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |  count(*) AS n,
        |  count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT)) AS ndv,
        |  count(*) >= 5 AS k_ok,
        |  count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT)) >= 3 AS l_ok
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,

    // per-level counts joined back on their own QI keys, finest-first
    // CASE — the recode-level assignment transcribed
    "q244_anonymity_recoding" ->
      """WITH c AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    floor(c_acctbal / 1000.0) AS bb FROM customer),
        |n0 AS (SELECT nk, seg, bb, count(*) AS f0 FROM c GROUP BY 1, 2, 3),
        |n1 AS (SELECT nk, seg, count(*) AS f1 FROM c GROUP BY 1, 2),
        |n2 AS (SELECT seg, count(*) AS f2 FROM c GROUP BY 1),
        |lv AS (SELECT CASE WHEN f0 >= 5 THEN 0 WHEN f1 >= 5 THEN 1
        |    WHEN f2 >= 5 THEN 2 ELSE 3 END AS anon_level
        |  FROM c JOIN n0 USING (nk, seg, bb) JOIN n1 USING (nk, seg)
        |    JOIN n2 USING (seg))
        |SELECT anon_level, count(*) AS rows_at FROM lv GROUP BY 1""".stripMargin,

    // q223's transcription with a seeded restart vector: the teleport
    // CASE lands only on nodes 2 and 4 (custkeys 1,2), edges symmetrized
    "q246_personalized_pagerank" -> {
      val seedMass = "CASE WHEN v IN (2, 4) THEN CAST(0.15 AS DOUBLE)" +
        " / CAST(2 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
      def it(prev: String, k: Int): String =
        s"""c$k AS (SELECT e.dst, e.src, p.pr / CAST(od.odeg AS DOUBLE) AS c
           |  FROM e JOIN od USING (src) JOIN $prev p ON p.v = e.src),
           |s$k AS (SELECT dst, list_sum(list(c ORDER BY src)) AS s
           |  FROM c$k GROUP BY dst),
           |p$k AS (SELECT v, $seedMass
           |    + CAST(0.85 AS DOUBLE) * coalesce(s.s, CAST(0 AS DOUBLE)) AS pr
           |  FROM nodes LEFT JOIN s$k s ON s.dst = v)""".stripMargin
      s"""WITH fwd AS (SELECT DISTINCT o_custkey * 2 AS src,
         |    l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |e AS (SELECT src, dst FROM fwd
         |  UNION ALL SELECT dst, src FROM fwd),
         |nodes AS (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |od AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
         |p0 AS (SELECT v, CASE WHEN v IN (2, 4)
         |    THEN CAST(1 AS DOUBLE) / CAST(2 AS DOUBLE)
         |    ELSE CAST(0 AS DOUBLE) END AS pr
         |  FROM nodes),
         |${it("p0", 1)},
         |${it("p1", 2)},
         |${it("p2", 3)}
         |SELECT v AS node_id, pr FROM p3""".stripMargin
    },

    // the seeded-Laplace release transcribed: the same md5 uniform, the
    // exact w lattice (no rounding before the clamp), the pinned ln
    // series, and the identical multiply/add order
    "q247_dp_noisy_counts" -> {
      val u = uniformSql("event_type || '|' || CAST(day_idx AS VARCHAR)",
        ":dp")
      val lnSub = graft.functions.DetMath.lnDetSubquery(
        """(SELECT event_type, day_idx, n, u,
          |   CAST(1 AS DOUBLE) / greatest(
          |     CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)
          |       * abs(u - CAST(0.5 AS DOUBLE)),
          |     CAST(2.3283064365386963e-10 AS DOUBLE)) AS winv
          | FROM k)""".stripMargin,
        Seq("event_type", "day_idx", "n", "u"), "winv", "lnw")
      s"""WITH g AS (SELECT event_type,
         |    epoch_us(ts) // 86400000000 AS day_idx, count(*) AS n
         |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
         |k AS (SELECT event_type, day_idx, n, $u AS u FROM g),
         |l AS (SELECT * FROM $lnSub)
         |SELECT event_type, day_idx, noisy_n,
         |  greatest(CAST(round(noisy_n) AS BIGINT), CAST(0 AS BIGINT))
         |    AS released_n
         |FROM (SELECT event_type, day_idx,
         |    CAST(n AS DOUBLE)
         |      + CASE WHEN u >= CAST(0.5 AS DOUBLE) THEN CAST(1 AS DOUBLE)
         |          ELSE CAST(-1 AS DOUBLE) END
         |        * (CAST(1 AS DOUBLE) / CAST(0.5 AS DOUBLE)) * lnw
         |      AS noisy_n
         |  FROM l)""".stripMargin
    },

    // one pass of integer moments per arm, then the identical pinned
    // algebra: pooled theta, adjusted first/second moments, Welch z on
    // raw and adjusted, and the variance ratio
    "q259_cuped_readout" -> {
      val u = uniformSql("user_id", ":ab")
      def D(c: String) = s"CAST($c AS DOUBLE)"
      val (na, nb) = (D("n_a"), D("n_b"))
      def vr(s2: String, s1: String, nn: String) =
        s"(($s2 - $s1 * $s1 / $nn) / ($nn - CAST(1 AS DOUBLE)))"
      def zf(s1a: String, s2a: String, s1b: String, s2b: String) =
        s"(($s1b / $nb - $s1a / $na) / sqrt(${vr(s2a, s1a, na)} / $na" +
          s" + ${vr(s2b, s1b, nb)} / $nb))"
      def adj1(sy: String, sx: String) = s"($sy - theta * $sx)"
      def adj2(syy: String, sxy: String, sxx: String) =
        s"($syy - CAST(2 AS DOUBLE) * theta * $sxy" +
          s" + theta * theta * $sxx)"
      val (a1a, a1b) = (adj1(D("sy_a"), D("sx_a")), adj1(D("sy_b"), D("sx_b")))
      val a2a = adj2(D("syy_a"), D("sxy_a"), D("sxx_a"))
      val a2b = adj2(D("syy_b"), D("sxy_b"), D("sxx_b"))
      def cond(a: Int, e: String) =
        s"CAST(sum(CASE WHEN arm = $a THEN $e ELSE 0 END) AS BIGINT)"
      s"""WITH e AS (SELECT user_id, event_type, ts,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type IS NOT NULL
         |    AND value IS NOT NULL AND user_id IS NOT NULL),
         |un AS (SELECT user_id, event_type,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
         |      THEN cents ELSE 0 END) AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
         |      THEN cents ELSE 0 END) AS BIGINT) AS y
         |  FROM e GROUP BY 1, 2),
         |ua AS (SELECT event_type, CAST($u < 0.5 AS INTEGER) AS arm, x, y
         |  FROM un),
         |a AS (SELECT event_type,
         |    ${cond(0, "1")} AS n_a, ${cond(1, "1")} AS n_b,
         |    ${cond(0, "x")} AS sx_a, ${cond(1, "x")} AS sx_b,
         |    ${cond(0, "y")} AS sy_a, ${cond(1, "y")} AS sy_b,
         |    ${cond(0, "x * y")} AS sxy_a, ${cond(1, "x * y")} AS sxy_b,
         |    ${cond(0, "x * x")} AS sxx_a, ${cond(1, "x * x")} AS sxx_b,
         |    ${cond(0, "y * y")} AS syy_a, ${cond(1, "y * y")} AS syy_b
         |  FROM ua GROUP BY 1),
         |m AS (SELECT *,
         |    (($na + $nb) * (${D("sxy_a")} + ${D("sxy_b")})
         |       - (${D("sx_a")} + ${D("sx_b")})
         |         * (${D("sy_a")} + ${D("sy_b")}))
         |    / (($na + $nb) * (${D("sxx_a")} + ${D("sxx_b")})
         |       - (${D("sx_a")} + ${D("sx_b")})
         |         * (${D("sx_a")} + ${D("sx_b")})) AS theta
         |  FROM a),
         |f AS (SELECT event_type, n_a, n_b, theta,
         |    CASE WHEN n_a > 1 AND n_b > 1 THEN
         |      ${zf(D("sy_a"), D("syy_a"), D("sy_b"), D("syy_b"))} END
         |      AS z_raw,
         |    CASE WHEN n_a > 1 AND n_b > 1 THEN
         |      ${zf(a1a, a2a, a1b, a2b)} END AS z_cuped,
         |    CASE WHEN n_a > 1 AND n_b > 1 THEN
         |      ($a2a + $a2b - ($a1a * $a1a / $na + $a1b * $a1b / $nb))
         |      / (${D("syy_a")} + ${D("syy_b")}
         |         - (${D("sy_a")} * ${D("sy_a")} / $na
         |            + ${D("sy_b")} * ${D("sy_b")} / $nb)) END AS var_ratio
         |  FROM m)
         |SELECT event_type, n_a, n_b, theta, z_raw, z_cuped, var_ratio,
         |  CASE WHEN z_cuped IS NOT NULL
         |    THEN abs(z_cuped) > CAST(1.96 AS DOUBLE) END AS significant
         |FROM f""".stripMargin
    },

    // same hash split, same single-divide mean, |y − mu| residual
    // dictionary, integer ceil-rank, min-r-at-rank order statistic
    "q258_conformal_intervals" -> {
      val u = uniformSql("o_orderkey", ":conf")
      s"""WITH oc AS (SELECT o_orderkey, c_mktsegment AS seg,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders JOIN customer ON c_custkey = o_custkey),
         |sp AS (SELECT seg, cents, $u < 0.5 AS tr FROM oc),
         |mu AS (SELECT seg, count(*) AS n_train,
         |    CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu
         |  FROM sp WHERE tr GROUP BY 1),
         |calr AS (SELECT s.seg, abs(CAST(s.cents AS DOUBLE) - mu.mu) AS r
         |  FROM sp s JOIN mu USING (seg) WHERE NOT s.tr),
         |nc AS (SELECT seg, count(*) AS n_cal FROM calr GROUP BY 1),
         |d AS (SELECT seg, r, count(*) AS cnt FROM calr GROUP BY 1, 2),
         |rkd AS (SELECT seg, r,
         |    CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY r
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum,
         |    CAST(sum(cnt) OVER (PARTITION BY seg) AS BIGINT) AS ncal
         |  FROM d),
         |qh AS (SELECT seg, min(r) AS qhat
         |  FROM rkd WHERE cum >= ((ncal + 1) * 9 + 9) // 10 GROUP BY 1)
         |SELECT mu.seg, mu.n_train, coalesce(nc.n_cal, 0) AS n_cal,
         |  mu.mu, qh.qhat, mu.mu - qh.qhat AS lo, mu.mu + qh.qhat AS hi
         |FROM mu LEFT JOIN nc USING (seg) LEFT JOIN qh USING (seg)""".stripMargin
    },

    // the U statistic over the score dictionary: integer 2·midranks,
    // one division; degenerate classes -> null
    "q257_auc_readout" ->
      """WITH d AS (SELECT source, n_chars AS s, count(*) AS cnt,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS np
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |    AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (SELECT source, cnt, np,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - cnt AS cb
        |  FROM d),
        |a AS (SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
        |    CAST(sum(cnt - np) AS BIGINT) AS n_neg,
        |    CAST(sum(np * (2 * cb + cnt + 1)) AS BIGINT) AS smr2
        |  FROM r GROUP BY 1)
        |SELECT source, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST(smr2 - n_pos * (n_pos + 1) AS DOUBLE)
        |      / CAST(2 * n_pos * n_neg AS DOUBLE) END AS auc
        |FROM a""".stripMargin,

    // same seeded draws (md5 of id#resample), same literal CDF ladder,
    // integer resample sums, rank-3/98 order statistics
    "q255_bootstrap_ci" -> {
      val u = uniformSql(
        "CAST(event_id AS VARCHAR) || '#' || CAST(b AS VARCHAR)", ":boot")
      val ladder = graft.operators.Bootstrap.poissonWeightSql(u)
      s"""WITH x AS (SELECT event_type, event_id,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type IS NOT NULL
         |    AND event_id IS NOT NULL AND value IS NOT NULL),
         |pt AS (SELECT event_type, count(*) AS n,
         |    CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |      AS mean_hat
         |  FROM x GROUP BY 1),
         |ex AS (SELECT event_type, event_id, cents,
         |    unnest(generate_series(1, 100)) AS b FROM x),
         |dw AS (SELECT event_type, b, cents, $ladder AS w FROM ex),
         |ms AS (SELECT event_type, b, CAST(sum(w) AS BIGINT) AS sw,
         |    CAST(sum(w * cents) AS BIGINT) AS swx
         |  FROM dw GROUP BY 1, 2),
         |mm AS (SELECT event_type, b,
         |    CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS m
         |  FROM ms WHERE sw > 0),
         |rk AS (SELECT event_type, m, row_number() OVER (
         |    PARTITION BY event_type ORDER BY m, b) AS r FROM mm),
         |ci AS (SELECT event_type,
         |    min(CASE WHEN r = 3 THEN m END) AS ci_lo,
         |    min(CASE WHEN r = 98 THEN m END) AS ci_hi
         |  FROM rk GROUP BY 1)
         |SELECT pt.event_type, pt.n, pt.mean_hat, ci.ci_lo, ci.ci_hi
         |FROM pt JOIN ci USING (event_type)""".stripMargin
    },

    // integer moments, then the identical double chain: means, the
    // (s2 - s1*s1/n)/(n-1) variances, z over the sqrt'd pooled se
    "q254_ab_welch" -> {
      val u = uniformSql("user_id", ":ab")
      s"""WITH x AS (SELECT event_type,
         |    CAST($u < 0.5 AS INTEGER) AS arm,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events
         |  WHERE event_type IS NOT NULL AND value IS NOT NULL
         |    AND user_id IS NOT NULL),
         |a AS (SELECT event_type,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT)
         |      AS s1_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT)
         |      AS s1_b,
         |    CAST(sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END)
         |      AS BIGINT) AS s2_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END)
         |      AS BIGINT) AS s2_b
         |  FROM x GROUP BY 1),
         |m AS (SELECT event_type, n_a, n_b,
         |    CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
         |    CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
         |    (CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE)
         |      * CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE))
         |      / CAST(n_a - 1 AS DOUBLE) AS va,
         |    (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE)
         |      * CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         |      / CAST(n_b - 1 AS DOUBLE) AS vb
         |  FROM a),
         |zz AS (SELECT event_type, n_a, n_b, mean_a, mean_b,
         |    CASE WHEN n_a > 1 AND n_b > 1 THEN
         |      (mean_b - mean_a) / sqrt(va / CAST(n_a AS DOUBLE)
         |        + vb / CAST(n_b AS DOUBLE)) END AS z
         |  FROM m)
         |SELECT event_type, n_a, n_b, mean_a, mean_b, z,
         |  CASE WHEN z IS NOT NULL THEN abs(z) > CAST(1.96 AS DOUBLE) END
         |    AS significant
         |FROM zz""".stripMargin
    },

    // the KM chain transcribed: integer risk sets from the duration
    // dictionary, f by single divides, lnDet + pow2Decay twins, and the
    // rank-explode prefix with the identical sorted fold
    "q253_kaplan_meier" -> {
      val lnSub = graft.functions.DetMath.lnDetSubquery(
        "(SELECT t, d, n_risk, k, CAST(1 AS DOUBLE) / f AS finv FROM live)",
        Seq("t", "d", "n_risk", "k"), "finv", "lnf")
      val p2Sub = graft.functions.DetMath.pow2DecaySubquery(
        "base2", Seq("t", "n_risk", "d"), "gsum", "surv")
      s"""WITH base AS (SELECT user_id, min(epoch_us(ts)) AS first_us,
         |    max(epoch_us(ts)) AS last_us FROM events GROUP BY 1),
         |dth AS (SELECT user_id, min(epoch_us(ts)) AS p_us FROM events
         |  WHERE event_type = 'purchase' AND value > 150 GROUP BY 1),
         |subj AS (SELECT
         |    (coalesce(p_us, last_us) - first_us) // 3600000000 AS dur_h,
         |    CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS ev
         |  FROM base LEFT JOIN dth USING (user_id)),
         |hist AS (SELECT dur_h AS t, count(*) AS c,
         |    CAST(sum(CASE WHEN ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d
         |  FROM subj WHERE dur_h IS NOT NULL GROUP BY 1),
         |rk AS (SELECT t, c, d,
         |    CAST(sum(c) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_le,
         |    CAST(sum(c) OVER () AS BIGINT) AS nn
         |  FROM hist),
         |deaths AS (SELECT t, d, nn - cum_le + c AS n_risk
         |  FROM rk WHERE d > 0),
         |fs AS (SELECT t, d, n_risk,
         |    CAST(1 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
         |      AS f,
         |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS k
         |  FROM deaths),
         |live AS (SELECT * FROM fs WHERE f > CAST(0 AS DOUBLE)),
         |lnt AS (SELECT * FROM $lnSub),
         |gg AS (SELECT t, d, n_risk, k,
         |    lnf / CAST(${graft.functions.DetMath.Ln2} AS DOUBLE) AS g
         |  FROM lnt),
         |ex AS (SELECT t, unnest(generate_series(1, k)) AS j FROM gg),
         |pref AS (SELECT ex.t, list_sum(list(c.g ORDER BY c.k)) AS gsum
         |  FROM ex JOIN gg c ON c.k = ex.j GROUP BY ex.t),
         |base2 AS (SELECT gg.t, gg.n_risk, gg.d, pref.gsum
         |  FROM gg JOIN pref USING (t)),
         |sv AS (SELECT * FROM $p2Sub)
         |SELECT t, n_risk, d, surv FROM sv
         |UNION ALL
         |SELECT t, n_risk, d, CAST(0 AS DOUBLE) AS surv
         |FROM fs WHERE f = CAST(0 AS DOUBLE)""".stripMargin
    },

    // the batch twin of the accumulated state: exact cell counts + the
    // same 64-register HLL formula as hllPostingsOracleSql, per QI cell
    "q252_streaming_anonymity" -> {
      val rhoLadder = (1 to 54)
        .map(r => s"WHEN wv >= ${1L << (54 - r)} THEN $r")
        .mkString("CASE ", " ", " ELSE 55 END")
      s"""WITH c AS (SELECT c_nationkey, c_mktsegment,
         |    CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS sv
         |  FROM customer),
         |nn AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
         |  FROM c GROUP BY 1, 2),
         |h AS (SELECT c_nationkey, c_mktsegment,
         |  CAST(('0x' || substring(md5(sv), 1, 15)) AS BIGINT) AS hv FROM c),
         |br AS (SELECT c_nationkey, c_mktsegment, hv >> 54 AS bucket,
         |    $rhoLadder AS rho
         |  FROM (SELECT c_nationkey, c_mktsegment, hv,
         |    hv & ${(1L << 54) - 1} AS wv FROM h)),
         |regs AS (SELECT c_nationkey, c_mktsegment, bucket, max(rho) AS reg
         |  FROM br GROUP BY 1, 2, 3),
         |spine AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM c),
         |fill AS (SELECT s.c_nationkey, s.c_mktsegment, b.range AS bucket,
         |    coalesce(r.reg, 0) AS reg
         |  FROM spine s CROSS JOIN range(64) b
         |  LEFT JOIN regs r ON r.c_nationkey = s.c_nationkey
         |    AND r.c_mktsegment = s.c_mktsegment AND r.bucket = b.range),
         |vec AS (SELECT c_nationkey, c_mktsegment,
         |    list(reg ORDER BY bucket) AS rv FROM fill GROUP BY 1, 2),
         |est AS (SELECT c_nationkey, c_mktsegment,
         |  CAST(0.709 AS DOUBLE) * 4096 / list_sum(list_transform(rv,
         |    r -> CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << r))) AS hll_est
         |  FROM vec)
         |SELECT nn.c_nationkey, nn.c_mktsegment, nn.n, est.hll_est,
         |  nn.n >= 10 AS k_ok, est.hll_est >= CAST(8 AS DOUBLE) AS l_ok_est
         |FROM nn JOIN est USING (c_nationkey, c_mktsegment)""".stripMargin
    },

    // GROUPING() emits the same (rf,ls)-ordered bitmask as Spark's
    // grouping_id(); measures are integer-exact at every granularity
    "q250_cube_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    // the A-ES key transcribed: clamped md5 uniform, lnDet(1/u), one
    // divide by the double weight; order + limit = the sample
    "q249_weighted_sample" -> {
      val u = uniformSql("doc_id", ":aes")
      val lnSub = graft.functions.DetMath.lnDetSubquery(
        s"""(SELECT doc_id, n_chars,
           |   CAST(1 AS DOUBLE) / greatest($u,
           |     CAST(2.3283064365386963e-10 AS DOUBLE)) AS winv
           | FROM documents
           | WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
           |   AND n_chars > 0)""".stripMargin,
        Seq("doc_id", "n_chars"), "winv", "lnu")
      s"""SELECT doc_id, n_chars,
         |  lnu / CAST(n_chars AS DOUBLE) AS aes_key
         |FROM $lnSub
         |ORDER BY aes_key, doc_id LIMIT 100""".stripMargin
    },

    // same dictionary-rank cut formula, integer floor division
    "q248_equidepth_binning" ->
      """WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
        |d AS (SELECT qty, count(*) AS cnt FROM v GROUP BY 1),
        |c AS (SELECT qty,
        |    sum(cnt) OVER (ORDER BY qty
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cb,
        |    sum(cnt) OVER () AS n
        |  FROM d),
        |m AS (SELECT qty, CAST((cb * 8) // n AS BIGINT) AS bin FROM c)
        |SELECT bin, count(*) AS n_rows, min(qty) AS lo, max(qty) AS hi
        |FROM v JOIN m USING (qty) GROUP BY 1""".stripMargin,

    // identical two-window island reduction; day counts are integer
    // date differences, so the rollup is exact
    "q245_interval_union" -> intervalUnionOracleSql,

    // the open-island carry composes slices exactly, so the streaming
    // state aggregates to the batch oracle
    "q256_streaming_intervals" -> intervalUnionOracleSql,

    // exact integer cents both sides; singleton categories encode NULL
    "q240_target_encoding" ->
      """WITH oc AS (SELECT o_orderkey, c_mktsegment AS seg,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON c_custkey = o_custkey),
        |st AS (SELECT seg, CAST(sum(cents) AS BIGINT) AS s, count(*) AS n
        |  FROM oc GROUP BY 1)
        |SELECT o_orderkey, oc.seg,
        |  CASE WHEN st.n > 1
        |    THEN CAST(st.s - oc.cents AS DOUBLE) / CAST(st.n - 1 AS DOUBLE)
        |  END AS enc
        |FROM oc JOIN st USING (seg)""".stripMargin,

    // per anchor: rank different-label rows by the shared cosine fold,
    // top 10 by (score DESC, id ASC) — the label exclusion in the WHERE
    "q229_hard_negatives" -> {
      def one(vid: Int): String =
        s"""(WITH q AS (SELECT embedding AS qv, label AS ql
           |    FROM embeddings WHERE vec_id = $vid)
           |SELECT CAST($vid AS BIGINT) AS qid, e.vec_id,
           |  ${cosSql("e.embedding", "q.qv")} AS score
           |FROM embeddings e CROSS JOIN q
           |WHERE e.label <> q.ql AND e.label IS NOT NULL
           |  AND e.embedding IS NOT NULL
           |ORDER BY score DESC, e.vec_id LIMIT 10)""".stripMargin
      s"""SELECT * FROM ${one(7)} a
         |UNION ALL SELECT * FROM ${one(13)} b""".stripMargin
    },

    // Apriori replayed: frequent filter before the pair join, HAVING on
    // pair support, integer cross-multiplied confidence gate, the same
    // two single-division floats
    "q230_association_rules" ->
      """WITH occ AS (SELECT DISTINCT l_orderkey AS c, p_brand AS l
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL),
        |tot AS (SELECT l, count(*) AS n FROM occ GROUP BY 1),
        |freq AS (SELECT l, n FROM tot WHERE n >= 20),
        |focc AS (SELECT c, l FROM occ WHERE l IN (SELECT l FROM freq)),
        |pr AS (SELECT a.l AS la, b.l AS lb, count(*) AS n_ab
        |  FROM focc a JOIN focc b ON a.c = b.c AND a.l < b.l
        |  GROUP BY 1, 2 HAVING count(*) >= 20),
        |d AS (SELECT la AS antecedent, lb AS consequent, n_ab FROM pr
        |  UNION ALL SELECT lb, la, n_ab FROM pr),
        |nt AS (SELECT count(DISTINCT c) AS n FROM occ)
        |SELECT d.antecedent, d.consequent, fa.n AS n_ant, fc.n AS n_cons,
        |  d.n_ab,
        |  CAST(d.n_ab AS DOUBLE) / CAST(fa.n AS DOUBLE) AS confidence,
        |  CAST(d.n_ab AS DOUBLE) * CAST(nt.n AS DOUBLE)
        |    / (CAST(fa.n AS DOUBLE) * CAST(fc.n AS DOUBLE)) AS lift
        |FROM d JOIN freq fa ON fa.l = d.antecedent
        |JOIN freq fc ON fc.l = d.consequent CROSS JOIN nt
        |WHERE d.n_ab * 8 >= 1 * fa.n""".stripMargin,

    // the SAME literal ±1 matrix transcribed: each projected coordinate
    // is the dotSql fold rounded once to REAL; candidates ranked by the
    // projected cosine, final order by the exact cosine over originals
    "q231_jl_projection_search" -> {
      val signs = Ann.signMatrix(dim = 64, outDim = 16)
      def lits(s: Seq[Float]): String =
        s.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      val projExprs = signs.map(s =>
        s"CAST(${dotSql("embedding", lits(s))} AS REAL)").mkString(",\n    ")
      s"""WITH pc AS (SELECT vec_id, list_value(
         |    $projExprs) AS proj FROM embeddings),
         |qp AS (SELECT proj AS qproj FROM pc WHERE vec_id = 11),
         |cand AS (SELECT pc.vec_id, ${cosSql("pc.proj", "qp.qproj")} AS ps
         |  FROM pc CROSS JOIN qp WHERE pc.vec_id <> 11
         |  ORDER BY ps DESC, pc.vec_id LIMIT 50),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS score
         |FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id CROSS JOIN q
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin
    },

    // every feature is an existing gated transcription (bm25ScoredSql,
    // cosSql, integer lengths); the composition adds only integer joins
    // and an exact 0.0 coalesce — one subquery per query, UNION ALL
    "q226_ltr_features" -> {
      def one(qid: Int, terms: Seq[String], vid: Int): String =
        s"""(WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $vid),
           |lex AS (SELECT doc_id, score FROM ${bm25ScoredSql(terms)} s),
           |scored AS (SELECT e.vec_id AS id, ${cosSql("e.embedding", "q.qv")} AS cos
           |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> $vid),
           |pool AS (SELECT id FROM scored ORDER BY cos DESC, id LIMIT 20),
           |lab AS (SELECT id FROM scored ORDER BY cos DESC, id LIMIT 10),
           |cands AS (SELECT DISTINCT id FROM
           |  (SELECT doc_id AS id FROM lex UNION ALL SELECT id FROM pool) u
           |  WHERE id <> $vid),
           |d AS (SELECT doc_id, n_chars,
           |  CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents)
           |SELECT CAST($qid AS BIGINT) AS qid, c.id AS doc_id,
           |  coalesce(l.score, CAST(0 AS DOUBLE)) AS bm25,
           |  sc.cos AS cos, d.dl, d.n_chars,
           |  CAST(CASE WHEN t.id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS label
           |FROM cands c
           |LEFT JOIN lex l ON l.doc_id = c.id
           |JOIN scored sc ON sc.id = c.id
           |JOIN d ON d.doc_id = c.id
           |LEFT JOIN lab t ON t.id = c.id)""".stripMargin
      s"""SELECT * FROM ${one(1, Seq("dup", "stream"), 7)} a
         |UNION ALL SELECT * FROM ${one(2, Seq("merge", "sort"), 13)} b""".stripMargin
    },

    // the index-order double fold (dotSql = the codegen DotProduct twin),
    // no normalization anywhere — that absence IS the metric
    "q224_mips_search" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11)
         |SELECT e.vec_id, ${dotSql("e.embedding", "q.qv")} AS score
         |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 11
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,

    // 3 power iterations as chained CTEs: per-iteration contribution =
    // one correctly-rounded divide, in-neighbor sum = list_sum over the
    // src-ascending list (the engine's pinned fold), teleport/damping as
    // shared literals — the whole 3-deep float chain hash-compares
    "q223_pagerank_purchase_graph" -> {
      def it(prev: String, k: Int): String =
        s"""c$k AS (SELECT e.dst, e.src, p.pr / CAST(od.odeg AS DOUBLE) AS c
           |  FROM e JOIN od USING (src) JOIN $prev p ON p.v = e.src),
           |s$k AS (SELECT dst, list_sum(list(c ORDER BY src)) AS s
           |  FROM c$k GROUP BY dst),
           |p$k AS (SELECT v, CAST(0.15 AS DOUBLE) / nd.nD
           |    + CAST(0.85 AS DOUBLE) * coalesce(s.s, CAST(0 AS DOUBLE)) AS pr
           |  FROM nodes CROSS JOIN nd LEFT JOIN s$k s ON s.dst = v)""".stripMargin
      s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
         |    l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |nodes AS (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nD FROM nodes),
         |od AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
         |p0 AS (SELECT v, CAST(1 AS DOUBLE) / nd.nD AS pr
         |  FROM nodes CROSS JOIN nd),
         |${it("p0", 1)},
         |${it("p1", 2)},
         |${it("p2", 3)}
         |SELECT v AS node_id, pr FROM p3""".stripMargin
    },

    // the skyline BY DEFINITION: a row survives iff NO row is >= on all
    // three integer criteria and > on at least one (the quadratic form
    // the SFS implementation avoids; equivalence IS the gate)
    "q222_skyline_docs" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_kinds
        |  FROM documents)
        |SELECT doc_id, n_chars, n_toks, n_kinds FROM d a
        |WHERE NOT EXISTS (SELECT 1 FROM d b
        |  WHERE b.n_chars >= a.n_chars AND b.n_toks >= a.n_toks
        |    AND b.n_kinds >= a.n_kinds
        |    AND (b.n_chars > a.n_chars OR b.n_toks > a.n_toks
        |      OR b.n_kinds > a.n_kinds))""".stripMargin,

    // per-frame closed form (the q90 contract per frame): video i, frame
    // f, pixel (x,y) = (7x + 13y + i + 31f) mod 256 over (8 + i%8) ×
    // (8 + (3i)%8) gray pixels, frames 0, 2, ... of 2 + i%3 sampled
    "q215_video_frames" ->
      """WITH v AS (SELECT i AS media_id,
        |    CAST(8 + i % 8 AS INT) AS width,
        |    CAST(8 + (3 * i) % 8 AS INT) AS height,
        |    CAST(2 + i % 3 AS INT) AS n_frames
        |  FROM range(200) t(i)),
        |f AS (SELECT media_id, width, height, CAST(fi.f AS INT) AS frame_idx
        |  FROM v, unnest(generate_series(0, n_frames - 1)) AS fi(f)
        |  WHERE fi.f % 2 = 0),
        |px AS (SELECT media_id, frame_idx, width, height,
        |    (7 * x.x + 13 * y.y + media_id + 31 * frame_idx) % 256 AS pv
        |  FROM f,
        |    unnest(generate_series(0, width - 1)) AS x(x),
        |    unnest(generate_series(0, height - 1)) AS y(y))
        |SELECT media_id, frame_idx, width, height,
        |  CAST(count(*) AS BIGINT) AS n_px, CAST(sum(pv) AS BIGINT) AS px_sum,
        |  TRUE AS decode_ok
        |FROM px GROUP BY media_id, frame_idx, width, height""".stripMargin,

    // MJPEG: pixel sums are the (real, lossy) codec's — MultimodalSpec
    // pins them against the direct decode; the oracle checks the exact
    // structural closed forms (dims through the codec, sampling, decode_ok)
    "q296_mjpeg_frames" ->
      """WITH v AS (SELECT i AS media_id,
        |    CAST(16 + i % 8 AS INT) AS width,
        |    CAST(16 + (3 * i) % 8 AS INT) AS height,
        |    CAST(2 + i % 3 AS INT) AS n_frames
        |  FROM range(150) t(i))
        |SELECT media_id, CAST(fi.f AS INT) AS frame_idx, width, height,
        |  CAST(width AS BIGINT) * height AS n_px, TRUE AS decode_ok
        |FROM v, unnest(generate_series(0, n_frames - 1)) AS fi(f)
        |WHERE fi.f % 2 = 0""".stripMargin,

    // compaction must be invisible to readers: the post-OPTIMIZE snapshot
    // aggregates exactly like the source relation
    "q213_optimize_compaction" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source""".stripMargin,

    // sparse dot product with integer weights is exact arithmetic —
    // one transcription serves the DataFrame path and the memory tier
    // (different query vectors)
    "q205_sparse_search" ->
      sparseSearchOracleSql(Map("dup" -> 2L, "vector" -> 1L, "stream" -> 3L), 10),
    "q206_memory_sparse" ->
      sparseSearchOracleSql(Map("query" -> 3L, "dup" -> 1L), 10),

    // the exhaustive dot product — WAND must land on it exactly
    "q271_sparse_wand" ->
      sparseSearchOracleSql(Map("data" -> 2L, "dup" -> 1L), 10),

    // per-shard dictionary resolution ≡ one global WHERE in SQL
    "q272_sharded_filtered_search" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 36)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |CROSS JOIN q
         |WHERE e.vec_id <> 36 AND d.source = 'src5'
         |ORDER BY score DESC, e.vec_id LIMIT 8""".stripMargin
    },

    // RM3: BM25 round 1 (the gated bm25ScoredSql transcription) → integer
    // term mining → the q205 integer dot product with the expanded weights
    "q207_rm3_expansion" -> rm3OracleSql(Seq("dup", "query"), fbK = 3, m = 2,
      k = 10, origW = 2L, expW = 1L),

    // time travel: v1 ≡ SQL over batch 1's slice, the current snapshot ≡
    // SQL over the latest-wins union of both slices (disjoint keys here,
    // so the union of the WHERE clauses)
    "q209_time_travel" ->
      """SELECT 1 AS as_of, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT 2 AS as_of, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE doc_id % 3 IN (0, 1)""".stripMargin,

    // parent pooling over the bounded chunk pool: same cosine fold, best
    // chunk per parent by (score DESC, chunk ASC), parents by (score
    // DESC, parent ASC)
    "q208_parent_retrieval" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 29),
         |hits AS (SELECT e.vec_id, e.vec_id // 4 AS parent_id, $cos AS score
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id // 4 <> 7
         |  ORDER BY score DESC, e.vec_id LIMIT 20),
         |best AS (SELECT parent_id, vec_id AS best_chunk, score,
         |    row_number() OVER (PARTITION BY parent_id
         |      ORDER BY score DESC, vec_id) AS rn
         |  FROM hits)
         |SELECT parent_id, best_chunk, score FROM best WHERE rn = 1
         |ORDER BY score DESC, parent_id LIMIT 5""".stripMargin
    },

    // semantic decontamination: per-row max over the benchmark set is
    // order-free exact IEEE (max of identical cosine folds); the
    // threshold compare is then exact on both sides
    "q199_embedding_decontamination" -> {
      val cos = cosSql("e.embedding", "b.bv")
      s"""WITH b AS (SELECT embedding AS bv FROM embeddings WHERE vec_id % 50 = 0),
         |m AS (SELECT e.vec_id, max($cos) AS max_sim
         |  FROM embeddings e CROSS JOIN b
         |  WHERE e.vec_id % 50 <> 0 GROUP BY e.vec_id)
         |SELECT vec_id, max_sim, max_sim >= 0.25 AS contaminated FROM m""".stripMargin
    },

    // keyset page 2 ≡ OFFSET k of the same total order — the cursor
    // carries no information OFFSET doesn't, only O(k) less re-ranking
    "q198_memory_pagination" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 53)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 53
         |ORDER BY score DESC, e.vec_id LIMIT 5 OFFSET 5""".stripMargin
    },

    // the delta-merged serving view ≡ plain SQL over the final logical
    // corpus (base ∖ deletes ∪ adds) — the serving tiers are an
    // implementation detail the result must not betray
    "q193_delta_serving" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 41)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id <> 41 AND e.vec_id % 7 <> 0
         |ORDER BY score DESC, e.vec_id LIMIT 8""".stripMargin
    },

    // the streamed assignment must equal the batch coarse quantizer
    // exactly (stateless map-side projection): centroids = first 4 by
    // vec_id, argmax cosine with ties to the HIGHER cell index (greatest
    // over (s, i) structs)
    "q119_streaming_ivf_assign" ->
      s"""WITH cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id <> 0 ORDER BY vec_id LIMIT 4),
         |scored AS (
         |  SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <> 0)
         |SELECT vec_id, CAST(cid AS INT) AS ivf_cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
         |  FROM scored) WHERE rn = 1""".stripMargin,

    // median/MAD replicated: both medians are interpolated percentiles
    // (Spark `percentile` ≡ DuckDB quantile_cont — the q36-gated pair);
    // the flag arithmetic is the same double ops on bit-equal medians
    "q120_robust_outliers" ->
      """WITH r AS (SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL),
        |m1 AS (SELECT event_type, quantile_cont(value, 0.5) AS group_median
        |  FROM r GROUP BY event_type),
        |j AS (SELECT r.event_id, r.event_type, r.value, m1.group_median
        |  FROM r JOIN m1 USING (event_type)),
        |m2 AS (SELECT event_type, quantile_cont(abs(value - group_median), 0.5) AS group_mad
        |  FROM j GROUP BY event_type)
        |SELECT j.event_id, j.event_type, j.value, j.group_median, m2.group_mad,
        |  abs(j.value - j.group_median) > 3.0 * m2.group_mad AS is_outlier
        |FROM j JOIN m2 USING (event_type)""".stripMargin,

    // NFC is a Unicode standard — nfc_normalize ≡ the engine's codegen
    // Normalizer call; lower/regexp semantics agree on \p classes
    "q121_normalize_text" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(lower(nfc_normalize(text)), '[^\p{L}\p{N}\s]', ' ', 'g'),
        |    '\s+', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,

    // interpolated percentiles (quantile_cont ≡ Spark percentile, the
    // q36-gated pair); clip = identical least/greatest double ops
    "q122_winsorize" ->
      """WITH r AS (SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type, quantile_cont(value, 0.05) AS p5,
        |    quantile_cont(value, 0.95) AS p95
        |  FROM r GROUP BY event_type)
        |SELECT r.event_id, r.event_type, r.value, b.p5, b.p95,
        |  least(greatest(r.value, b.p5), b.p95) AS v_clipped
        |FROM r JOIN b USING (event_type)""".stripMargin,

    // long form (vec_id, dim 0-based, z); medians/IQR are order
    // statistics of the same doubles, the z arithmetic identical ops
    "q123_robust_scale" ->
      """WITH l AS (SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings WHERE vec_id <> 0 AND embedding IS NOT NULL),
        |s AS (SELECT dim, quantile_cont(v, 0.25) AS p25, quantile_cont(v, 0.5) AS p50,
        |    quantile_cont(v, 0.75) AS p75
        |  FROM l GROUP BY dim)
        |SELECT l.vec_id, l.dim,
        |  (l.v - s.p50) / (CASE WHEN s.p75 - s.p25 = 0 THEN 1.0 ELSE s.p75 - s.p25 END) AS z
        |FROM l JOIN s USING (dim)""".stripMargin,

    "q124_correlated_max" ->
      """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice = (SELECT max(o2.o_totalprice)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin,

    // q21's pair CTE verbatim, degrees over both endpoints, then the
    // degree histogram
    "q125_neardup_degree_hist" ->
      """WITH g AS (SELECT doc_id, lang, source,
        |    list_distinct(string_split(text, ' ')) AS grams FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.3),
        |d AS (SELECT doc_id, count(*) AS degree FROM (
        |    SELECT id_a AS doc_id FROM p UNION ALL SELECT id_b AS doc_id FROM p)
        |  GROUP BY doc_id)
        |SELECT degree, count(*) AS n_docs FROM d GROUP BY degree""".stripMargin,

    // stateless stream-static apply ⇒ the online flags ≡ q120's batch
    // flags; the oracle is the same median/MAD SQL
    "q126_streaming_outliers" ->
      """WITH r AS (SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL),
        |m1 AS (SELECT event_type, quantile_cont(value, 0.5) AS group_median
        |  FROM r GROUP BY event_type),
        |j AS (SELECT r.event_id, r.event_type, r.value, m1.group_median
        |  FROM r JOIN m1 USING (event_type)),
        |m2 AS (SELECT event_type, quantile_cont(abs(value - group_median), 0.5) AS group_mad
        |  FROM j GROUP BY event_type)
        |SELECT j.event_id, j.event_type, j.value, j.group_median, m2.group_mad,
        |  abs(j.value - j.group_median) > 3.0 * m2.group_mad AS is_outlier
        |FROM j JOIN m2 USING (event_type)""".stripMargin,

    "q127_scd2_history" ->
      """SELECT user_id, event_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  (lead(ts) OVER w IS NULL) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    // lift arithmetic mirrored op-for-op: (n_ab * N) / (n_a * n_b), every
    // operand an exact integer in double range
    "q128_cooccur_lift" ->
      """WITH occ AS (SELECT DISTINCT user_id AS c, event_type AS l FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |t AS (SELECT l, count(*) AS n FROM occ GROUP BY l),
        |nt AS (SELECT count(DISTINCT c) AS n_total FROM occ),
        |p AS (SELECT a.l AS label_a, b.l AS label_b, count(*) AS n_ab
        |  FROM occ a JOIN occ b ON a.c = b.c AND a.l < b.l GROUP BY 1, 2)
        |SELECT p.label_a, p.label_b, ta.n AS n_a, tb.n AS n_b, p.n_ab,
        |  CAST(p.n_ab AS DOUBLE) * CAST(nt.n_total AS DOUBLE)
        |    / (CAST(ta.n AS DOUBLE) * CAST(tb.n AS DOUBLE)) AS lift
        |FROM p JOIN t ta ON p.label_a = ta.l JOIN t tb ON p.label_b = tb.l
        |CROSS JOIN nt""".stripMargin,

    // q45's IVF CTEs (cosine argmax, ties to HIGHER cid) composed with
    // q118's PQ CTEs (per-subspace L2 argmin, ties to lower cid): the ADC
    // candidate ranking runs over probed-cell rows ONLY, then exact-cosine
    // re-rank — op-for-op the Spark pipeline
    "q129_ivf_pq_search" ->
      s"""WITH q AS (SELECT embedding AS qv, len(embedding) // 2 AS d
         |  FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, embedding, len(embedding) // 2 AS d
         |  FROM embeddings WHERE vec_id <> 0),
         |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         |    embedding AS cv, len(embedding) // 2 AS d
         |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 4)),
         |ivs AS (SELECT e.vec_id, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM e CROSS JOIN cents c),
         |iva AS (SELECT vec_id, cid AS icell FROM (SELECT *, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn FROM ivs)
         |  WHERE rn = 1),
         |qcells AS (SELECT c.cid FROM cents c CROSS JOIN q
         |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cid ASC LIMIT 2),
         |s0 AS (SELECT e.vec_id, c.cid,
         |    ${l2Sql("e.embedding[1 : e.d]", "c.cv[1 : c.d]")} AS dist
         |  FROM e CROSS JOIN cents c),
         |a0 AS (SELECT vec_id, cid FROM (SELECT *, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM s0)
         |  WHERE rn = 1),
         |s1 AS (SELECT e.vec_id, c.cid,
         |    ${l2Sql("e.embedding[e.d + 1 : 2 * e.d]", "c.cv[c.d + 1 : 2 * c.d]")} AS dist
         |  FROM e CROSS JOIN cents c),
         |a1 AS (SELECT vec_id, cid FROM (SELECT *, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM s1)
         |  WHERE rn = 1),
         |qd0 AS (SELECT c.cid,
         |    ${l2Sql("q.qv[1 : c.d]", "c.cv[1 : c.d]")} AS qd
         |  FROM cents c CROSS JOIN q),
         |qd1 AS (SELECT c.cid,
         |    ${l2Sql("q.qv[c.d + 1 : 2 * c.d]", "c.cv[c.d + 1 : 2 * c.d]")} AS qd
         |  FROM cents c CROSS JOIN q),
         |cand AS (SELECT a0.vec_id FROM a0 JOIN a1 USING (vec_id)
         |  JOIN iva USING (vec_id) JOIN qcells ON iva.icell = qcells.cid
         |  JOIN qd0 ON qd0.cid = a0.cid JOIN qd1 ON qd1.cid = a1.cid
         |  ORDER BY qd0.qd + qd1.qd ASC, a0.vec_id ASC LIMIT 15)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS score
         |FROM e JOIN cand USING (vec_id) CROSS JOIN q
         |ORDER BY score DESC, e.vec_id LIMIT 5""".stripMargin,

    // add-one-smoothed conditional probability mirrored as the same
    // single exact-integer division; token/bigram streams occurrence-
    // counted in both engines (string_split ≡ split on ' ', 1-based list
    // index ≡ slice-zip)
    "q131_bigram_rarity" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT unnest(t) AS w FROM toks),
        |uni AS (SELECT w, count(*) AS c1 FROM tok GROUP BY w),
        |v AS (SELECT count(*) AS vocab FROM uni),
        |big AS (SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS i(i)),
        |bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
        |sc AS (SELECT big.doc_id,
        |    CAST(bc.c12 + 1 AS DOUBLE) / CAST(uni.c1 + v.vocab AS DOUBLE) AS p
        |  FROM big JOIN bc USING (w1, w2) JOIN uni ON big.w1 = uni.w CROSS JOIN v),
        |r AS (SELECT doc_id, count(*) AS n_bigrams,
        |    count(*) FILTER (WHERE p < 0.001) AS n_rare, min(p) AS min_p
        |  FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.n_bigrams, 0) AS n_bigrams,
        |  coalesce(r.n_rare, 0) AS n_rare,
        |  CAST(r.n_rare AS DOUBLE) / r.n_bigrams AS rare_frac, r.min_p
        |FROM documents d LEFT JOIN r USING (doc_id)""".stripMargin,

    // rank-form twin of the max_by winner + delete filter
    "q132_cdc_apply" ->
      """WITH log AS (
        |  SELECT doc_id, text, lang, source, n_chars,
        |    CAST(1 AS BIGINT) AS version, 'I' AS op FROM documents
        |  UNION ALL
        |  SELECT doc_id, text, 'xx', source, n_chars + 1000,
        |    CAST(2 AS BIGINT), 'U' FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars,
        |    CAST(3 AS BIGINT), 'D' FROM documents WHERE doc_id % 5 = 0),
        |w AS (SELECT * FROM log QUALIFY row_number() OVER (
        |  PARTITION BY doc_id ORDER BY version DESC) = 1)
        |SELECT doc_id, text, lang, source, n_chars, version
        |FROM w WHERE op <> 'D'""".stripMargin,

    // Morton interleave replicated as the same bit arithmetic (dim j bit i
    // -> position 2i+j); both engines' % on non-negative ints agree
    "q133_zorder_key" ->
      """WITH t AS (SELECT doc_id, doc_id % 256 AS x, n_chars % 256 AS y
        |  FROM documents)
        |SELECT doc_id, CAST(SUM(
        |    (((x >> i.i) & 1) << (2 * i.i)) +
        |    (((y >> i.i) & 1) << (2 * i.i + 1))) AS BIGINT) AS zval
        |FROM t, unnest(generate_series(0, 7)) AS i(i)
        |GROUP BY doc_id""".stripMargin,

    // union + carry-forward window mirrored; hour floor as the same
    // integer (a - a % step) micros arithmetic; IGNORE NULLS fill
    "q134_resample_ffill" ->
      """WITH ev AS (SELECT user_id, ts, max(value) AS v FROM events
        |  WHERE ts IS NOT NULL GROUP BY user_id, ts),
        |b AS (SELECT user_id, min(ts) AS mn, max(ts) AS mx FROM ev GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(
        |    make_timestamp(epoch_us(mn) - (epoch_us(mn) % 3600000000)),
        |    mx, INTERVAL 60 MINUTE)) AS gts FROM b),
        |u AS (
        |  SELECT user_id, ts AS t, 0 AS is_grid, v FROM ev
        |  UNION ALL SELECT user_id, gts, 1, NULL FROM grid),
        |f AS (SELECT user_id, t, is_grid,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY t, is_grid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill
        |  FROM u)
        |SELECT user_id, strftime(t, '%Y-%m-%d %H:%M:%S') AS grid_ts,
        |  fill AS value
        |FROM f WHERE is_grid = 1""".stripMargin,

    // the textbook single global running sum — the twin the two-level
    // prefix must equal; ends sort before starts at equal t ([s, e))
    "q135_max_concurrency" ->
      """WITH iv AS (SELECT ts AS s, ts + INTERVAL 1 HOUR AS e FROM events
        |  WHERE event_type = 'click'),
        |b AS (SELECT s AS t, 1 AS delta FROM iv
        |  UNION ALL SELECT e, -1 FROM iv),
        |r AS (SELECT t, sum(delta) OVER (ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM b),
        |m AS (SELECT CAST(max(running) AS BIGINT) AS max_open FROM r)
        |SELECT m.max_open,
        |  strftime(min(r.t), '%Y-%m-%d %H:%M:%S') AS first_peak_ts
        |FROM r JOIN m ON r.running = m.max_open GROUP BY m.max_open""".stripMargin,

    // TPC-H Q5's own SQL with the engine's decimal-sum portability rule
    "q136_regional_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC""".stripMargin,

    // q108's micros-exact island algorithm + the pinned emission rule:
    // session_end <= ms-truncated(max event time) - 2 h
    "q137_streaming_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |wm AS (SELECT (max(us) // 1000) * 1000 - 7200000000 AS wm_us FROM e),
        |g AS (SELECT user_id, us, event_id,
        |  CASE WHEN lag(us) OVER w IS NULL
        |    OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_break
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |  sum(is_break) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |agg AS (SELECT user_id, min(us) AS mn, max(us) AS mx, count(*) AS n
        |  FROM s GROUP BY user_id, sid)
        |SELECT user_id,
        |  strftime(make_timestamp(mn), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(make_timestamp(mx + 1800000000),
        |    '%Y-%m-%d %H:%M:%S') AS session_end,
        |  n AS n_events
        |FROM agg CROSS JOIN wm WHERE mx + 1800000000 <= wm_us""".stripMargin,

    // full-outer + IS DISTINCT FROM per column, concat_ws skipping
    // non-changed names — null-safe exactly like the engine's <=>
    "q138_snapshot_diff" ->
      """WITH oldt AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
        |cur AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END AS lang,
        |    source,
        |    CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 11 = 0),
        |j AS (SELECT o.doc_id AS ok, c.doc_id AS nk,
        |    o.text AS ot, c.text AS nt, o.lang AS ol, c.lang AS nl,
        |    o.source AS os, c.source AS ns, o.n_chars AS oc, c.n_chars AS nc
        |  FROM oldt o FULL OUTER JOIN cur c ON o.doc_id = c.doc_id)
        |SELECT coalesce(ok, nk) AS doc_id,
        |  CASE WHEN ok IS NULL THEN 'added'
        |       WHEN nk IS NULL THEN 'removed' ELSE 'changed' END AS change,
        |  CASE WHEN ok IS NOT NULL AND nk IS NOT NULL THEN concat_ws(',',
        |    CASE WHEN ot IS DISTINCT FROM nt THEN 'text' END,
        |    CASE WHEN ol IS DISTINCT FROM nl THEN 'lang' END,
        |    CASE WHEN os IS DISTINCT FROM ns THEN 'source' END,
        |    CASE WHEN oc IS DISTINCT FROM nc THEN 'n_chars' END) END AS changed_cols
        |FROM j
        |WHERE ok IS NULL OR nk IS NULL
        |  OR ot IS DISTINCT FROM nt OR ol IS DISTINCT FROM nl
        |  OR os IS DISTINCT FROM ns OR oc IS DISTINCT FROM nc""".stripMargin,

    // rank-form twin of the bounded-heap prefix
    "q139_inverted_postings" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE doc_id IS NOT NULL),
        |tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
        |r AS (SELECT term, doc_id, tf, row_number() OVER (
        |    PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rank FROM tf)
        |SELECT term, rank, doc_id, tf FROM r WHERE rank <= 5""".stripMargin,

    // q81's click rule + the purchase rule pinned by the boundary probe:
    // unmatched purchase emits iff pms STRICTLY below the global min
    // watermark (its own event time, not a window end — the match window
    // [pus-1h, pus] closes when the wm passes pus)
    "q140_stream_full_outer" ->
      """WITH c AS (SELECT event_id AS cid, user_id,
        |    epoch_ns(ts) // 1000000 AS cms, epoch_us(ts) AS cus
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS pid, user_id,
        |    epoch_ns(ts) // 1000000 AS pms, epoch_us(ts) AS pus
        |  FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(cms) FROM c), (SELECT max(pms) FROM p))
        |    - 3600000 AS w),
        |m AS (SELECT c.cid, p.pid FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.pus >= c.cus AND p.pus <= c.cus + 3600000000)
        |SELECT cid AS click_id, pid AS purchase_id FROM m
        |UNION ALL
        |SELECT c.cid, CAST(NULL AS BIGINT) FROM c, wm
        |WHERE c.cid NOT IN (SELECT cid FROM m) AND c.cms + 3600000 < wm.w
        |UNION ALL
        |SELECT CAST(NULL AS BIGINT), p.pid FROM p, wm
        |WHERE p.pid NOT IN (SELECT pid FROM m) AND p.pms < wm.w""".stripMargin,

    // q90's closed-form pixels -> the same integer block map (x*8 // w)
    // and cross-multiplied mean comparisons; bits OR'd per 32-bit half
    "q141_image_ahash" ->
      """WITH dims AS (SELECT i AS media_id,
        |    CAST(8 + i % 16 AS INT) AS w,
        |    CAST(8 + (3 * i) % 16 AS INT) AS h
        |  FROM range(200) t(i)),
        |px AS (SELECT media_id, w, h, x.x AS x, y.y AS y,
        |    (7 * x.x + 13 * y.y + media_id) % 256 AS v
        |  FROM dims,
        |    unnest(generate_series(0, w - 1)) AS x(x),
        |    unnest(generate_series(0, h - 1)) AS y(y)),
        |tot AS (SELECT media_id, sum(v) AS px_sum, count(*) AS n_px
        |  FROM px GROUP BY media_id),
        |blk AS (SELECT media_id,
        |    ((y * 8) // h) * 8 + ((x * 8) // w) AS bi,
        |    sum(v) AS bsum, count(*) AS bcnt
        |  FROM px GROUP BY 1, 2),
        |bits AS (SELECT b.media_id, b.bi FROM blk b JOIN tot USING (media_id)
        |  WHERE b.bsum * tot.n_px > tot.px_sum * b.bcnt)
        |SELECT d.media_id,
        |  CAST(coalesce(sum(CASE WHEN bi < 32
        |    THEN CAST(1 AS BIGINT) << bi END), 0) AS BIGINT) AS ahash_lo,
        |  CAST(coalesce(sum(CASE WHEN bi >= 32
        |    THEN CAST(1 AS BIGINT) << (bi - 32) END), 0) AS BIGINT) AS ahash_hi,
        |  true AS decode_ok
        |FROM dims d LEFT JOIN bits USING (media_id)
        |GROUP BY d.media_id""".stripMargin,

    // q101's closed-form PCM -> carried-sign zero crossings (IGNORE NULLS
    // carry mirrors the zeros-keep-prior-sign rule) + integer abs sum
    "q142_audio_features" ->
      """WITH dims AS (SELECT i AS media_id,
        |    CAST(64 + i % 64 AS BIGINT) AS n_frames FROM range(200) t(i)),
        |s AS (SELECT media_id, n_frames, k.k AS k,
        |    ((31 * media_id + 17 * k.k) % 65536) - 32768 AS v
        |  FROM dims, unnest(generate_series(0, n_frames - 1)) AS k(k)),
        |g AS (SELECT media_id, n_frames, k, v,
        |    last_value(CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 END
        |      IGNORE NULLS) OVER (PARTITION BY media_id ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM s),
        |h AS (SELECT media_id, n_frames, v, sgn,
        |    lag(sgn) OVER (PARTITION BY media_id ORDER BY k) AS prev_sgn
        |  FROM g)
        |SELECT media_id, n_frames,
        |  CAST(coalesce(sum(CASE WHEN sgn IS NOT NULL AND prev_sgn IS NOT NULL
        |    AND sgn <> prev_sgn THEN 1 END), 0) AS BIGINT) AS zero_crossings,
        |  CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
        |  true AS decode_ok
        |FROM h GROUP BY media_id, n_frames""".stripMargin,

    // brute-force hamming join over the q141 analytic hashes (fine at
    // oracle scale; the engine side is the bucketed pigeonhole form)
    "q143_image_neardup_pairs" ->
      """WITH dims AS (SELECT i AS media_id,
        |    CAST(8 + i % 16 AS INT) AS w,
        |    CAST(8 + (3 * i) % 16 AS INT) AS h
        |  FROM range(200) t(i)),
        |px AS (SELECT media_id, w, h, x.x AS x, y.y AS y,
        |    (7 * x.x + 13 * y.y + media_id) % 256 AS v
        |  FROM dims,
        |    unnest(generate_series(0, w - 1)) AS x(x),
        |    unnest(generate_series(0, h - 1)) AS y(y)),
        |tot AS (SELECT media_id, sum(v) AS px_sum, count(*) AS n_px
        |  FROM px GROUP BY media_id),
        |blk AS (SELECT media_id,
        |    ((y * 8) // h) * 8 + ((x * 8) // w) AS bi,
        |    sum(v) AS bsum, count(*) AS bcnt
        |  FROM px GROUP BY 1, 2),
        |bits AS (SELECT b.media_id, b.bi FROM blk b JOIN tot USING (media_id)
        |  WHERE b.bsum * tot.n_px > tot.px_sum * b.bcnt),
        |hsh AS (SELECT d.media_id,
        |    CAST(coalesce(sum(CASE WHEN bi < 32
        |      THEN CAST(1 AS BIGINT) << bi END), 0) AS BIGINT) AS lo,
        |    CAST(coalesce(sum(CASE WHEN bi >= 32
        |      THEN CAST(1 AS BIGINT) << (bi - 32) END), 0) AS BIGINT) AS hi
        |  FROM dims d LEFT JOIN bits USING (media_id) GROUP BY d.media_id)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
        |    AS INT) AS hamming
        |FROM hsh a JOIN hsh b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3""".stripMargin,

    // the persisted-index round-trip must not change q45's answer
    "q144_ivf_persisted_probe" -> {
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id <> 0 ORDER BY vec_id LIMIT 4),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <> 0),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
         |    FROM scored) WHERE rn = 1),
         |qcents AS (
         |  SELECT c.cid FROM cents c CROSS JOIN q
         |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cid ASC LIMIT 2)
         |SELECT a.vec_id, ${cosSql("a.embedding", "q.qv")} AS score
         |FROM assign a JOIN qcents ON a.cid = qcents.cid CROSS JOIN q
         |ORDER BY score DESC, a.vec_id LIMIT 5""".stripMargin
    },

    "q145_set_ops_all" ->
      """WITH cust AS (SELECT c_custkey AS k, c_nationkey AS n FROM customer),
        |big AS (SELECT n FROM orders JOIN cust ON o_custkey = k
        |  WHERE o_totalprice > 200000),
        |urgent AS (SELECT n FROM orders JOIN cust ON o_custkey = k
        |  WHERE o_orderpriority = '1-URGENT')
        |SELECT 'intersect_all' AS op, n, count(*) AS copies FROM
        |  (SELECT * FROM big INTERSECT ALL SELECT * FROM urgent) GROUP BY n
        |UNION ALL
        |SELECT 'except_all' AS op, n, count(*) AS copies FROM
        |  (SELECT * FROM big EXCEPT ALL SELECT * FROM urgent) GROUP BY n""".stripMargin,

    "q146_monthly_rollup" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY 1, 2""".stripMargin,

    // each rule's aggregate mirrored 1:1; violation = failed-or-null cond
    "q147_quality_checks" ->
      """WITH u1 AS (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1),
        |u2 AS (SELECT doc_id, count(*) AS n FROM documents GROUP BY 1)
        |SELECT 'orders_pk_unique' AS rule,
        |  CAST(coalesce(sum(n), 0) AS BIGINT) AS n_checked,
        |  CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS n_violations,
        |  coalesce(sum(CASE WHEN n > 1 THEN n END), 0) = 0 AS pass
        |FROM u1
        |UNION ALL
        |SELECT 'orders_price_positive', count(*),
        |  CAST(coalesce(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END), 0) AS BIGINT),
        |  coalesce(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END), 0) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'orders_customer_fk', count(*),
        |  CAST(coalesce(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  coalesce(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END), 0) = 0
        |FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |  ON o.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'docs_pk_unique',
        |  CAST(coalesce(sum(n), 0) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT),
        |  coalesce(sum(CASE WHEN n > 1 THEN n END), 0) = 0
        |FROM u2
        |UNION ALL
        |SELECT 'docs_text_not_null', count(*),
        |  CAST(coalesce(sum(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END), 0) AS BIGINT),
        |  coalesce(sum(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END), 0) = 0
        |FROM documents""".stripMargin,

    // q17's oracle at k=10 — the SQL front door must not change the answer
    "q148_sql_vector_search" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin
    },

    // the accumulated view must equal the one-shot aggregate (counts and
    // min/max are order-free — no double sums cross the merge)
    "q149_incremental_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(value) AS n_valued,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q150_rank_battery" ->
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    // stateless enrichment: one AvailableNow batch emits every purchase
    // joined to the batch profile — the plain SQL join
    "q151_stream_enrichment" ->
      """WITH p AS (SELECT user_id, count(*) AS user_events,
        |    count(DISTINCT event_type) AS user_types
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, p.user_events, p.user_types
        |FROM events e JOIN p ON e.user_id = p.user_id
        |WHERE e.event_type = 'purchase'""".stripMargin,

    "q152_skew_report" ->
      """WITH c AS (SELECT event_type, count(*) AS n FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS nk FROM c)
        |SELECT c.event_type, c.n,
        |  CAST(c.n AS DOUBLE) / t.total AS frac,
        |  CAST(c.n * t.nk AS DOUBLE) / t.total AS x_fair_share
        |FROM c CROSS JOIN t ORDER BY n DESC, event_type LIMIT 10""".stripMargin,

    // distinct-token ∩ dictionary mirrored via list ops; both engines
    // sort the hit list before joining so the string is order-pinned
    "q153_gazetteer_tag" ->
      """WITH d AS (SELECT doc_id,
        |    list_intersect(list_distinct(string_split(text, ' ')),
        |      ['running','swim','ride','tempo','interval',
        |       'marathon','sprint','track']) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(coalesce(len(h), 0) AS INT) AS n_hits,
        |  coalesce(array_to_string(list_sort(h), ','), '') AS hits
        |FROM d""".stripMargin,

    // same rationals per cell: e = row*col/total (one exact-int division),
    // chi2 contribution = (o-e)^2/e in the identical op order
    "q154_contingency" ->
      """WITH c AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, count(*) AS row_tot FROM documents GROUP BY 1),
        |k AS (SELECT source, count(*) AS col_tot FROM documents GROUP BY 1),
        |t AS (SELECT count(*) AS n FROM documents)
        |SELECT c.lang, c.source, c.o, r.row_tot, k.col_tot,
        |  CAST(r.row_tot * k.col_tot AS DOUBLE) / t.n AS e,
        |  (c.o - CAST(r.row_tot * k.col_tot AS DOUBLE) / t.n) *
        |  (c.o - CAST(r.row_tot * k.col_tot AS DOUBLE) / t.n) /
        |  (CAST(r.row_tot * k.col_tot AS DOUBLE) / t.n) AS chi2_cell
        |FROM c JOIN r USING (lang) JOIN k USING (source) CROSS JOIN t""".stripMargin,

    // q144's probe math verbatim: the automatic rewrite must compute
    // exactly what the explicit 2-cell probe computes
    "q155_autoprobe_sql_search" -> {
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id <> 0 ORDER BY vec_id LIMIT 4),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <> 0),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
         |    FROM scored) WHERE rn = 1),
         |qcents AS (
         |  SELECT c.cid FROM cents c CROSS JOIN q
         |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cid ASC LIMIT 2)
         |SELECT a.vec_id, ${cosSql("a.embedding", "q.qv")} AS score
         |FROM assign a JOIN qcents ON a.cid = qcents.cid CROSS JOIN q
         |ORDER BY score DESC, a.vec_id LIMIT 5""".stripMargin
    },

    // mirrors the engine exactly: 8 first-by-id centroids (ties cid DESC,
    // the greatest-struct rule), q20's 2-plane buckets, dup = lower-id
    // same-block neighbor at cos >= 0.3, survivors keep their cell
    "q156_semantic_dedup" -> {
      def dot(a: String, b: String) =
        s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
      s"""WITH p1 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 3),
         |p2 AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 4),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
         |  FROM embeddings ORDER BY vec_id LIMIT 8),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
         |    FROM scored) WHERE rn = 1),
         |e AS (
         |  SELECT a.vec_id, a.embedding, a.cid,
         |    (CASE WHEN ${dot("a.embedding", "p1.pv")} >= 0 THEN 1 ELSE 0 END)
         |    + (CASE WHEN ${dot("a.embedding", "p2.pv")} >= 0 THEN 2 ELSE 0 END) AS bucket
         |  FROM assign a CROSS JOIN p1 CROSS JOIN p2),
         |dup AS (
         |  SELECT DISTINCT b.vec_id FROM e a JOIN e b
         |    ON a.cid = b.cid AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.3)
         |SELECT e.vec_id, CAST(e.cid AS INT) AS ivf_cell
         |FROM e LEFT JOIN dup ON e.vec_id = dup.vec_id
         |WHERE dup.vec_id IS NULL""".stripMargin
    },

    // same smoothed-ratio arithmetic, same md5-mod-512 buckets; ratio > 1
    // decided on one exact-integer-product division per token
    "q157_dsir_importance" ->
      """WITH s AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |    (lang = 'en') AS is_t
        |  FROM documents),
        |sb AS (SELECT doc_id, is_t,
        |  CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % 512 AS b FROM s),
        |bc AS (SELECT b, count(*) AS cr,
        |  count(*) FILTER (WHERE is_t) AS ct FROM sb GROUP BY b),
        |t AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
        |  CAST(sum(ct) AS BIGINT) AS nt FROM bc),
        |sc AS (SELECT sb.doc_id,
        |  CAST((bc.ct + 1) * (t.nr + 512) AS DOUBLE)
        |    / CAST((bc.cr + 1) * (t.nt + 512) AS DOUBLE) AS ratio
        |  FROM sb JOIN bc USING (b) CROSS JOIN t)
        |SELECT doc_id, count(*) AS n_tokens,
        |  count(*) FILTER (WHERE ratio > 1.0) AS n_favored,
        |  CAST(count(*) FILTER (WHERE ratio > 1.0) AS DOUBLE) / count(*)
        |    AS favored_frac,
        |  min(ratio) AS min_ratio, max(ratio) AS max_ratio
        |FROM sc GROUP BY doc_id""".stripMargin,

    // same split-on-space / split-on-newline counts, same exact-integer
    // ratio arithmetic, same thresholds (the paper defaults)
    "q158_gopher_rules" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT) AS word_chars,
        |    CAST((length(text) - length(regexp_replace(text, '#', '', 'g')))
        |      + (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3
        |      AS BIGINT) AS n_symbols,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> starts_with(l, '-') OR starts_with(l, '*') OR starts_with(l, '•'))) AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> ends_with(l, '...'))) AS BIGINT) AS n_ell,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> list_contains(['the','be','to','of','and','that','have','with'], lower(w)))) AS BIGINT) AS n_stopwords
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_words,
        |    CAST(word_chars AS DOUBLE) / n_words AS mean_word_len,
        |    CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
        |    CAST(n_bullet AS DOUBLE) / n_lines AS bullet_frac,
        |    CAST(n_ell AS DOUBLE) / n_lines AS ellipsis_frac,
        |    CAST(n_alpha AS DOUBLE) / n_words AS alpha_frac,
        |    n_stopwords
        |  FROM g)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        |  ellipsis_frac, alpha_frac, n_stopwords,
        |  (n_words >= 50 AND n_words <= 100000) AS pass_words,
        |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_word_len,
        |  (symbol_ratio <= 0.1) AS pass_symbol,
        |  (bullet_frac <= 0.9) AS pass_bullet,
        |  (ellipsis_frac <= 0.3) AS pass_ellipsis,
        |  (alpha_frac >= 0.8) AS pass_alpha,
        |  (n_stopwords >= 2) AS pass_stopwords,
        |  (n_words >= 50 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        |    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        |    AND n_stopwords >= 2) AS keep
        |FROM m""".stripMargin,

    // shard and order hashes mirrored exactly (md5-mod-k / hash-uniform)
    "q159_epoch_shuffle" -> {
      s"""WITH s AS (SELECT doc_id,
         |  ${shardSql("doc_id", 16, ":epoch1:s")} AS shard,
         |  ${uniformSql("doc_id", ":epoch1:o")} AS u
         |FROM documents)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY u, doc_id) AS BIGINT) AS pos
         |FROM s""".stripMargin
    },

    // same 60-bit md5 hash, same comparison-ladder rho, same bucket-ordered
    // harmonic fold over 1/(1<<reg), same pinned alpha literal
    "q160_hll_distinct" -> hllPostingsOracleSql,

    // the incremental accumulate must land on exactly the batch sketch
    "q161_streaming_hll" -> hllPostingsOracleSql,

    // idf through the SAME pinned ln series (DetMath.lnDetSubquery),
    // avgdl/N as integer-exact aggregates, per-doc score a term-ordered
    // list_sum fold — see bm25ScoredSql for the op-sequence contract
    "q162_bm25_search" ->
      s"""SELECT doc_id, dl, score FROM ${bm25ScoredSql(Seq("dup", "vector", "query"))} s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // rank fusion is transcendental-free: integer ranks -> 1/(60+rank)
    // reciprocals, summed dense-then-lexical (the engine's pinned leg fold)
    "q163_hybrid_rrf" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH qd AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
         |dense AS (
         |  SELECT e.vec_id AS id, $cos AS score
         |  FROM embeddings e CROSS JOIN qd q WHERE e.vec_id <> 7
         |  ORDER BY score DESC, e.vec_id LIMIT 20),
         |dr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM dense),
         |lex AS (
         |  SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "stream"))} s
         |  ORDER BY score DESC, doc_id LIMIT 20),
         |lr AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM lex)
         |SELECT coalesce(dr.id, lr.id) AS id,
         |  coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(dr.rank AS DOUBLE)), CAST(0 AS DOUBLE))
         |    + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(lr.rank AS DOUBLE)), CAST(0 AS DOUBLE)) AS rrf
         |FROM dr FULL OUTER JOIN lr ON dr.id = lr.id
         |ORDER BY rrf DESC, id LIMIT 10""".stripMargin
    },

    // the exclusive frame makes "strictly after" literal: a step row
    // qualifies iff a qualifying predecessor-step row precedes it in the
    // total (us, event_id) order — integer flags end to end, no floats
    "q164_funnel_depth" -> funnelDepthOracleSql,

    // the streaming automaton must land on exactly the batch histogram
    "q168_streaming_funnel" -> funnelDepthOracleSql,

    // q164's window chain extended with first-qualifying instants; lag
    // buckets are integer floor divisions of microsecond differences
    "q183_conversion_lag" -> {
      val w = "PARTITION BY ukey ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
      s"""WITH e AS (SELECT user_id * 1000000 + epoch_us(ts) // 86400000000 AS ukey,
         |  event_type, event_id, epoch_us(ts) AS us FROM events),
         |f0 AS (SELECT *, CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS q0 FROM e),
         |f1 AS (SELECT *, CASE WHEN event_type = 'click' AND sum(q0) OVER ($w) > 0
         |  THEN 1 ELSE 0 END AS q1 FROM f0),
         |f2 AS (SELECT *, CASE WHEN event_type = 'purchase' AND sum(q1) OVER ($w) > 0
         |  THEN 1 ELSE 0 END AS q2 FROM f1),
         |u AS (SELECT ukey, max(q2) AS r3,
         |  min(CASE WHEN q0 = 1 THEN us END) AS t1,
         |  min(CASE WHEN q2 = 1 THEN us END) AS t3
         |  FROM f2 GROUP BY ukey)
         |SELECT (t3 - t1) // 3600000000 AS lag_hours,
         |  CAST(count(*) AS BIGINT) AS n_conversions
         |FROM u WHERE r3 = 1 GROUP BY 1""".stripMargin
    },

    // both synthetic container corpora are integer closed forms on the
    // id; the REAL box/EBML parse must reproduce them exactly
    "q184_video_meta" ->
      """WITH mp4 AS (SELECT i AS media_id, 'mp4' AS container,
        |    CAST(1000 + i % 5000 AS BIGINT) AS duration_ms,
        |    CAST(320 + 16 * (i % 8) AS INT) AS width,
        |    CAST(240 + 16 * (i % 6) AS INT) AS height,
        |    CAST(1 + i % 3 AS INT) AS n_tracks
        |  FROM range(150) t(i)),
        |mkv AS (SELECT 1000 + i AS media_id, 'mkv' AS container,
        |    CAST(2000 + i % 7000 AS BIGINT) AS duration_ms,
        |    CAST(256 + 8 * (i % 16) AS INT) AS width,
        |    CAST(144 + 8 * (i % 9) AS INT) AS height,
        |    CAST(1 + (i + 1) % 3 AS INT) AS n_tracks
        |  FROM range(150) t(i))
        |SELECT media_id, container, duration_ms, width, height, n_tracks,
        |  TRUE AS decode_ok
        |FROM (SELECT * FROM mp4 UNION ALL SELECT * FROM mkv)""".stripMargin,

    // the memory tier's exact scan must land on the brute-force bits
    "q185_memory_search" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 13)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 13
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin
    },

    // q163's hybrid semantics, served from memory structures — the
    // oracle is the same fused form (exact dense top-20 + BM25 top-20,
    // reciprocal ranks summed in leg order)
    "q186_memory_hybrid" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH qd AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
         |dense AS (
         |  SELECT e.vec_id AS id, $cos AS score
         |  FROM embeddings e CROSS JOIN qd q WHERE e.vec_id <> 7
         |  ORDER BY score DESC, e.vec_id LIMIT 20),
         |dr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM dense),
         |lex AS (
         |  SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "stream"))} s
         |  ORDER BY score DESC, doc_id LIMIT 20),
         |lr AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM lex)
         |SELECT coalesce(dr.id, lr.id) AS id,
         |  coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(dr.rank AS DOUBLE)), CAST(0 AS DOUBLE))
         |    + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(lr.rank AS DOUBLE)), CAST(0 AS DOUBLE)) AS rrf
         |FROM dr FULL OUTER JOIN lr ON dr.id = lr.id
         |ORDER BY rrf DESC, id LIMIT 10""".stripMargin
    },

    // the oracle phrases as-of as a range join + argmax; the engine's
    // carry-forward window must land on the same latest-click-within-1h.
    // Both boundaries INCLUSIVE (<= on time, >= on the tolerance edge)
    "q169_attribution" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, us AS cus FROM e WHERE event_type = 'click'),
        |j AS (SELECT p.user_id, p.event_id, p.us, max(c.cus) AS click_us
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id
        |    AND c.cus <= p.us AND c.cus >= p.us - 3600000000
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, count(*) AS n_purchases,
        |  count(click_us) AS n_attributed,
        |  CAST(sum(us - click_us) AS BIGINT) AS total_gap_us,
        |  min(us - click_us) AS min_gap_us,
        |  max(us - click_us) AS max_gap_us
        |FROM j GROUP BY user_id""".stripMargin,

    // the drifted-scan union: old-slice rows carry NULL for the columns
    // only the new schema has
    "q170_schema_evolution" ->
      """WITH u AS (
        |  SELECT lang, NULL AS source, NULL AS n_chars
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT lang, source, n_chars FROM documents WHERE doc_id % 2 = 1)
        |SELECT lang, count(*) AS n_rows, count(source) AS n_with_source,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        |FROM u GROUP BY lang""".stripMargin,

    // the bucketed path must return exactly the plain join's answer
    "q171_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // the incremental accumulate must land on exactly the batch index
    // (each doc's postings arrive whole in one slice, so SUM-merge of tf
    // across batches only ever adds a doc's tf to the zero state)
    "q173_streaming_postings" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
        |  unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT term, doc_id, count(*) AS tf, max(dl) AS dl
        |FROM t GROUP BY term, doc_id""".stripMargin,

    // same affine codec, element by element: round = floor(q + 0.5),
    // clamp via greatest/least, one fused multiply-add back; folds in
    // list order for the cosine
    "q174_sq8_quantize" ->
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs FROM embeddings),
        |m AS (SELECT vec_id, xs, list_min(xs) AS mn, list_max(xs) AS mx FROM v),
        |sc AS (SELECT *, CASE WHEN mx = mn THEN CAST(1 AS DOUBLE)
        |  ELSE (mx - mn) / CAST(255 AS DOUBLE) END AS scale FROM m),
        |qd AS (SELECT vec_id, xs, mn, mx, scale,
        |  list_transform(xs, x -> mn +
        |    greatest(CAST(0 AS DOUBLE), least(CAST(255 AS DOUBLE),
        |      floor((x - mn) / scale + CAST(0.5 AS DOUBLE)))) * scale) AS ds
        |  FROM sc)
        |SELECT vec_id, mn, mx, scale,
        |  list_max(list_transform(list_zip(xs, ds), p -> abs(p[1] - p[2]))) AS max_err,
        |  (list_sum(list_transform(list_zip(xs, ds), p -> p[1] * p[2]))
        |    / (sqrt(list_sum(list_transform(xs, a -> a * a)))
        |       * sqrt(list_sum(list_transform(ds, b -> b * b))))) AS cos_dequant
        |FROM qd""".stripMargin,

    // violation counts computed from the same slices; the `published`
    // literals ARE the gated semantic (clean commits, dirty does not, and
    // the final snapshot still holds exactly the clean batch)
    "q175_write_audit_publish" ->
      """WITH b1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 > 0),
        |b2 AS (SELECT doc_id, CASE WHEN doc_id % 6 = 0 THEN '' ELSE text END AS text
        |  FROM documents WHERE doc_id % 3 = 0),
        |c2 AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
        |n1 AS (SELECT count(*) AS n FROM b1),
        |v1 AS (SELECT count(*) AS v FROM b1 WHERE NOT len(text) > 0),
        |n2 AS (SELECT count(*) AS n FROM c2),
        |v2 AS (SELECT count(*) AS v FROM c2 WHERE NOT len(text) > 0)
        |SELECT 'clean_batch' AS batch, 'text_nonempty' AS rule,
        |  (SELECT n FROM n1) AS n_checked, (SELECT v FROM v1) AS n_violations,
        |  (SELECT v FROM v1) = 0 AS pass, TRUE AS published
        |UNION ALL SELECT 'clean_batch', 'unique_doc_id',
        |  (SELECT n FROM n1), 0, TRUE, TRUE
        |UNION ALL SELECT 'dirty_batch', 'text_nonempty',
        |  (SELECT n FROM n2), (SELECT v FROM v2), (SELECT v FROM v2) = 0, FALSE
        |UNION ALL SELECT 'dirty_batch', 'unique_doc_id',
        |  (SELECT n FROM n2), 0, TRUE, FALSE
        |UNION ALL SELECT 'final', 'snapshot_rows',
        |  (SELECT n FROM n1), 0, TRUE, TRUE""".stripMargin,

    // per-leg min-max over the leg's own 20 candidates, convex sum in
    // pinned leg order, absent legs contribute exactly 0
    "q176_norm_fusion" -> normFusionOracleSql(qid = 3),

    // the memory tier's convex-fusion hybrid — one transcription shared
    // with q176, at another stored query
    "q203_memory_norm_fusion" -> normFusionOracleSql(qid = 19),

    // same 60-bit md5 hash as the HLL family; bottom-64 per source via
    // rank; merged-pair rank + membership joins mirror the estimators
    // (ntot < k => exact regime); exact twins from the distinct postings
    "q177_kmv_overlap" -> kmvOverlapOracleSql(withExact = true),

    // the accumulated sketch table must yield exactly q177's estimates
    "q178_streaming_kmv" -> kmvOverlapOracleSql(withExact = false),

    // q174's codec algebraically: the engine scores codes WITHOUT
    // dequantizing (dot(q,d) = mn·Σq + s·dot(q,c); ‖d‖² = dim·mn² +
    // 2·mn·s·Σc + s²·Σc²) — the oracle mirrors that exact association
    // order (Σc/Σc² are integer-exact; the q,c dot folds in list order),
    // top-15 by (approx DESC, id), exact cosine rerank to top-5
    "q179_sq8_search" -> sq8SearchOracleSql(qid = 5),

    // the MEMORY SQ8 tier (byte-packed codes + the same algebra) must
    // land on the identical prune-and-rerank result
    "q187_memory_sq8" -> sq8SearchOracleSql(qid = 17),

    // the dictionary-encoded string filter ≡ a string WHERE on the join
    "q189_memory_string_filter" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 29)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |CROSS JOIN q
         |WHERE e.vec_id <> 29 AND d.source = 'src3'
         |ORDER BY score DESC, e.vec_id LIMIT 8""".stripMargin
    },

    // the serving-tier metadata pre-filter ≡ a WHERE on the scan
    "q188_memory_filtered_search" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 21)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id <> 21 AND e.label BETWEEN 2 AND 5
         |ORDER BY score DESC, e.vec_id LIMIT 8""".stripMargin
    },

    // the BM25 top-10 joined back to text; snippet = tokens
    // [pos-3, pos+3] (clamped) around the first 'dup', else first
    // 'stream' (both positions 0 when absent in both engines)
    "q180_snippets" -> {
      s"""WITH lexs AS (
         |  SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "stream"))} s
         |  ORDER BY score DESC, doc_id LIMIT 10),
         |j AS (SELECT l.doc_id, l.score, string_split(d.text, ' ') AS t
         |  FROM lexs l JOIN documents d USING (doc_id)),
         |p AS (SELECT doc_id, score, t,
         |  CASE WHEN list_position(t, 'dup') > 0 THEN list_position(t, 'dup')
         |    ELSE list_position(t, 'stream') END AS pos FROM j),
         |w AS (SELECT doc_id, score, greatest(1, pos - 3) AS st, t FROM p)
         |SELECT doc_id, score,
         |  array_to_string(t[st : st + 6], ' ') AS snippet FROM w""".stripMargin
    },

    // keyset page 2 ≡ offset page 2 under the total (score DESC, id) order
    "q172_search_cursor" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
         |ORDER BY score DESC, e.vec_id LIMIT 10 OFFSET 10""".stripMargin
    },

    // the greedy unrolled: sel_k chains k-1 argmax CTEs, each excluding
    // the selected ids and subtracting (1-lambda)*max-cos-to-selected via
    // a correlated subquery over the tiny selected set; candidate pool cut
    // by SCORE (the engine's top-k), rel = lambda*score AFTER the cut
    "q165_mmr_rerank" -> {
      val lam = 0.7
      val lc = (1.0 - lam).toString // 0.30000000000000004 — the engine's bits
      val cos = cosSql("e.embedding", "q.qv")
      val csel = cosSql("c.emb", "s.emb")
      val steps = (2 to 5).map { k =>
        s"""s$k AS (SELECT $k AS sel_rank, c.id, c.emb,
           |  c.rel - CAST($lc AS DOUBLE) * (SELECT max($csel) FROM sel${k - 1} s) AS mmr
           |  FROM cand2 c WHERE c.id NOT IN (SELECT id FROM sel${k - 1})
           |  ORDER BY mmr DESC, c.id LIMIT 1),
           |sel$k AS (SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM s$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH qd AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
         |cand AS (SELECT e.vec_id AS id, e.embedding AS emb, $cos AS score
         |  FROM embeddings e CROSS JOIN qd q WHERE e.vec_id <> 11
         |  ORDER BY score DESC, e.vec_id LIMIT 20),
         |cand2 AS (SELECT id, emb, CAST($lam AS DOUBLE) * score AS rel FROM cand),
         |sel1 AS (SELECT 1 AS sel_rank, id, emb, rel AS mmr FROM cand2
         |  ORDER BY rel DESC, id LIMIT 1),
         |$steps
         |SELECT sel_rank, id AS vec_id, mmr FROM sel5""".stripMargin
    },

    // integer counts, one double division per stat, literal thresholds
    "q166_source_reputation" -> sourceReputationOracleSql,

    // the accumulated sums must produce exactly q166's verdicts
    "q182_streaming_reputation" -> sourceReputationOracleSql,

    // q45's IVF assign/probe + q179's algebraic SQ8 scoring over the
    // probed cells (per-vector codec commutes with the cell filter)
    "q181_ivf_sq8_search" -> {
      val cos = cosSql("c.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qs
         |  FROM embeddings WHERE vec_id = 9),
         |qa AS (SELECT qv, qs, list_sum(qs) AS sq,
         |  sqrt(list_sum(list_transform(qs, a -> a * a))) AS qn,
         |  CAST(len(qs) AS DOUBLE) AS d FROM q),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id <> 9 ORDER BY vec_id LIMIT 4),
         |cscored AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <> 9),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
         |    FROM cscored) WHERE rn = 1),
         |qcents AS (
         |  SELECT c.cid FROM cents c CROSS JOIN q
         |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cid ASC LIMIT 2),
         |v AS (SELECT a.vec_id, a.embedding,
         |  list_transform(a.embedding, x -> CAST(x AS DOUBLE)) AS xs
         |  FROM assign a JOIN qcents ON a.cid = qcents.cid),
         |m AS (SELECT vec_id, embedding, xs, list_min(xs) AS mn, list_max(xs) AS mx FROM v),
         |sc AS (SELECT *, CASE WHEN mx = mn THEN CAST(1 AS DOUBLE)
         |  ELSE (mx - mn) / CAST(255 AS DOUBLE) END AS scale FROM m),
         |cd AS (SELECT vec_id, embedding, mn, scale,
         |  list_transform(xs, x ->
         |    greatest(CAST(0 AS DOUBLE), least(CAST(255 AS DOUBLE),
         |      floor((x - mn) / scale + CAST(0.5 AS DOUBLE))))) AS cs
         |  FROM sc),
         |ag AS (SELECT vec_id, embedding, mn, scale, cs,
         |  list_sum(cs) AS csum,
         |  list_sum(list_transform(cs, c -> c * c)) AS csum2 FROM cd),
         |ap AS (SELECT a.vec_id, a.embedding,
         |  (a.mn * qa.sq + a.scale *
         |     list_sum(list_transform(list_zip(a.cs, qa.qs), p -> p[2] * p[1])))
         |  / (sqrt(qa.d * a.mn * a.mn + CAST(2 AS DOUBLE) * a.mn * a.scale * a.csum
         |      + a.scale * a.scale * a.csum2) * qa.qn) AS approx
         |  FROM ag a CROSS JOIN qa),
         |cand AS (SELECT vec_id, embedding FROM ap
         |  ORDER BY approx DESC, vec_id LIMIT 15)
         |SELECT c.vec_id, $cos AS score
         |FROM cand c CROSS JOIN q
         |ORDER BY score DESC, c.vec_id LIMIT 5""".stripMargin
    },

    // decay through the SAME ladder+Taylor op sequence; the per-user sum
    // is an age-ordered list fold, mirroring the engine's pinned aggregate
    "q167_decay_ranking" -> {
      val decay = graft.functions.DetMath.pow2DecaySubquery(
        "(SELECT user_id, age, n, CAST(age AS DOUBLE) / CAST(7 AS DOUBLE) AS f FROM c)",
        Seq("user_id", "age", "n"), "f", "dk")
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         |mx AS (SELECT max(us) AS mu FROM e),
         |c AS (SELECT user_id, ((SELECT mu FROM mx) - us) // 86400000000 AS age,
         |  count(*) AS n FROM e GROUP BY 1, 2),
         |w AS (SELECT user_id, age, n, CAST(n AS DOUBLE) * dk AS wc FROM $decay d)
         |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
         |  list_sum(list(wc ORDER BY age)) AS score
         |FROM w GROUP BY user_id
         |ORDER BY score DESC, user_id LIMIT 20""".stripMargin
    },

    // the ±1-band window: both band columns are multiples of 100, so
    // |a_band - b_cents| <= 100 is EXACTLY membership of a_band in
    // {b_cents-100, b_cents, b_cents+100} — the equi-join the Spark
    // side runs via 3-way replication
    "q260_er_banded_blocking" ->
      s"""WITH ${erCtesSql()},
        |p AS (SELECT a_key, b_key,
        |    $erScoreSql AS score
        |  FROM a JOIN b USING (nation)
        |  WHERE abs(a_band - b_cents) <= 100)
        |SELECT a_key, b_key, CAST(score AS BIGINT) AS score,
        |  CASE WHEN score >= 7 THEN 'match' ELSE 'possible' END AS cls
        |FROM p WHERE score >= 3""".stripMargin,

    // q238's readout over the banded candidate stream
    "q261_er_banded_calibration" ->
      erCalibrationSql(pairFilter = "\n  WHERE abs(a_band - b_cents) <= 100"),

    // PAV minimax over the bounded score alphabet: A(j,k) is one
    // long→double division per pooled interval, min/max over doubles are
    // order-free IEEE — bit-exact across engines by construction
    "q273_isotonic_calibration" ->
      s"""WITH ${erCtesSql()},
        |p AS (SELECT a_key, b_key,
        |    $erScoreSql AS score
        |  FROM a JOIN b USING (nation)
        |  WHERE abs(a_band - b_cents) <= 100),
        |per AS (SELECT CAST(score AS BIGINT) AS score, count(*) AS n,
        |    CAST(sum(CASE WHEN a_key = b_key THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM p GROUP BY 1),
        |b2 AS (SELECT score, n, pos,
        |    row_number() OVER (ORDER BY score) AS idx,
        |    CAST(sum(n) OVER (ORDER BY score) AS BIGINT) AS cn,
        |    CAST(sum(pos) OVER (ORDER BY score) AS BIGINT) AS cp
        |  FROM per),
        |jx AS (SELECT k.idx AS k, k.cn AS cnk, k.cp AS cpk,
        |    unnest(range(1, k.idx + 1)) AS j FROM b2 k),
        |pr AS (SELECT jx.k, jx.j,
        |    CAST(jx.cpk - coalesce(pj.cp, 0) AS DOUBLE)
        |      / CAST(jx.cnk - coalesce(pj.cn, 0) AS DOUBLE) AS a
        |  FROM jx LEFT JOIN b2 pj ON pj.idx = jx.j - 1),
        |sm AS (SELECT j, k, min(a) OVER (PARTITION BY j ORDER BY k DESC) AS m
        |  FROM pr),
        |f AS (SELECT k, max(m) AS fit FROM sm GROUP BY 1)
        |SELECT b2.score, b2.n, b2.pos,
        |  CAST(b2.pos AS DOUBLE) / CAST(b2.n AS DOUBLE) AS rate, f.fit
        |FROM b2 JOIN f ON f.k = b2.idx""".stripMargin,

    // train/eval split by a_key parity; step-function application =
    // carry-forward over the unioned alphabet; ECE = order-pinned fold
    "q274_calibration_ece" ->
      s"""WITH ${erCtesSql()},
        |p AS (SELECT a_key, b_key,
        |    $erScoreSql AS score
        |  FROM a JOIN b USING (nation)
        |  WHERE abs(a_band - b_cents) <= 100),
        |per AS (SELECT CAST(score AS BIGINT) AS score, count(*) AS n,
        |    CAST(sum(CASE WHEN a_key = b_key THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM p WHERE a_key % 2 = 0 GROUP BY 1),
        |b2 AS (SELECT score, n, pos,
        |    row_number() OVER (ORDER BY score) AS idx,
        |    CAST(sum(n) OVER (ORDER BY score) AS BIGINT) AS cn,
        |    CAST(sum(pos) OVER (ORDER BY score) AS BIGINT) AS cp
        |  FROM per),
        |jx AS (SELECT k.idx AS k, k.cn AS cnk, k.cp AS cpk,
        |    unnest(range(1, k.idx + 1)) AS j FROM b2 k),
        |pr AS (SELECT jx.k, jx.j,
        |    CAST(jx.cpk - coalesce(pj.cp, 0) AS DOUBLE)
        |      / CAST(jx.cnk - coalesce(pj.cn, 0) AS DOUBLE) AS a
        |  FROM jx LEFT JOIN b2 pj ON pj.idx = jx.j - 1),
        |sm AS (SELECT j, k, min(a) OVER (PARTITION BY j ORDER BY k DESC) AS m
        |  FROM pr),
        |f AS (SELECT b2.score, max(sm.m) AS fit
        |  FROM sm JOIN b2 ON b2.idx = sm.k GROUP BY 1),
        |ev AS (SELECT CAST(score AS BIGINT) AS score, count(*) AS n_eval,
        |    CAST(sum(CASE WHEN a_key = b_key THEN 1 ELSE 0 END) AS BIGINT) AS pos_eval
        |  FROM p WHERE a_key % 2 = 1 GROUP BY 1),
        |u AS (SELECT coalesce(ev.score, f.score) AS score,
        |    ev.n_eval, ev.pos_eval, f.fit
        |  FROM ev FULL OUTER JOIN f ON ev.score = f.score),
        |ap AS (SELECT score, n_eval, pos_eval,
        |    CAST(pos_eval AS DOUBLE) / CAST(n_eval AS DOUBLE) AS acc,
        |    last_value(fit IGNORE NULLS) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conf
        |  FROM u),
        |g AS (SELECT score, n_eval, pos_eval, acc, conf, conf - acc AS gap,
        |    CASE WHEN conf IS NULL THEN 0.0
        |      ELSE CAST(n_eval AS DOUBLE) * abs(conf - acc) END AS w
        |  FROM ap WHERE n_eval IS NOT NULL)
        |SELECT score, n_eval, pos_eval, acc, conf, gap,
        |  (SELECT list_sum(list(w ORDER BY score)) FROM g)
        |    / CAST((SELECT sum(n_eval) FROM g) AS DOUBLE) AS ece
        |FROM g""".stripMargin,

    // diagonal gaps-and-islands over the df-capped shingle join; the
    // Spark side joins on xxhash64 of the shingle, the oracle on the
    // string itself — identical result sets absent a 64-bit collision
    // (the q21/q23 hashed-longs convention)
    "q275_substring_runs" ->
      s"""WITH ${substringRunsCtes()}
        |SELECT id_a, id_b,
        |  CAST(max(run) + 4 AS BIGINT) AS max_run_tokens,
        |  CAST(sum(CASE WHEN run >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
        |  CAST(sum(run) AS BIGINT) AS shared_positions
        |FROM runs GROUP BY 1, 2
        |HAVING sum(CASE WHEN run >= 6 THEN 1 ELSE 0 END) > 0""".stripMargin,

    // per-doc longest shared span with any earlier doc, thresholded the
    // same way; every document surfaces, so the flagged + clean split
    // conserves the corpus count. The entry is the DEDUP-FIRST form
    // (round-13 unification): the shingle chain runs over distinct-text
    // representatives, a non-min replica's span is its own length by
    // construction, and cross-text spans come from the rep-pair relation
    // with "some member precedes d" reduced to rep' < d.
    "q276_substring_dedup" ->
      s"""WITH g AS (SELECT text, min(doc_id) AS rep FROM documents GROUP BY text),
        |${substringRunsCtes("(SELECT rep AS doc_id, text FROM g)")},
        |rp AS (SELECT id_a, id_b, max(run) + 4 AS mx FROM runs
        |  GROUP BY 1, 2
        |  HAVING sum(CASE WHEN run >= 6 THEN 1 ELSE 0 END) > 0),
        |sym AS (SELECT id_a AS r1, id_b AS r2, mx FROM rp
        |  UNION ALL SELECT id_b, id_a, mx FROM rp),
        |dd AS (SELECT doc_id, g.rep,
        |    len(string_split_regex(lower(documents.text), '\\s+')) AS L
        |  FROM documents JOIN g USING (text)),
        |cx AS (SELECT dd.doc_id, max(s.mx) AS mx FROM dd JOIN sym s
        |  ON s.r1 = dd.rep AND s.r2 < dd.doc_id GROUP BY 1),
        |best AS (SELECT dd.doc_id,
        |    greatest(coalesce(cx.mx, -1),
        |      CASE WHEN dd.doc_id > dd.rep AND dd.L >= 10 THEN dd.L
        |        ELSE -1 END) AS mx
        |  FROM dd LEFT JOIN cx USING (doc_id))
        |SELECT doc_id,
        |  CAST(CASE WHEN mx >= 0 THEN mx END AS BIGINT) AS max_shared_tokens,
        |  mx >= 0 AS dup_substring
        |FROM best""".stripMargin,

    // the dictionary readout is all-integer (cum·100 >= n·p), so the
    // streamed state and this batch twin agree bit-for-bit
    "q277_streaming_percentiles" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT event_type, cents, count(*) AS cnt FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, cents, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM d)
        |SELECT event_type,
        |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN cents END) AS BIGINT) AS p50,
        |  CAST(min(CASE WHEN cum * 100 >= n * 90 THEN cents END) AS BIGINT) AS p90,
        |  CAST(min(CASE WHEN cum * 100 >= n * 99 THEN cents END) AS BIGINT) AS p99,
        |  CAST(max(n) AS BIGINT) AS n_rows,
        |  count(*) AS n_distinct
        |FROM c GROUP BY 1""".stripMargin,

    // batch bottom-k of the same md5-uniform key — the merge-closure
    // identity makes the streamed sample equal this exactly
    "q278_streaming_sample" -> {
      val u = uniformSql("event_id", ":rsv")
      s"""WITH u AS (SELECT event_type, event_id, $u AS u FROM events),
        |r AS (SELECT event_type, event_id, u,
        |    row_number() OVER (PARTITION BY event_type ORDER BY u, event_id)
        |      AS rn
        |  FROM u)
        |SELECT event_type, event_id, u FROM r WHERE rn <= 20""".stripMargin
    },

    // the DIRECT (no exact-collapse) baseline over the fixed 500-doc
    // demo slice: per-doc longest shared span from the raw-corpus
    // shingle chain, every sliced document surfacing via the left join
    "q281_substring_dedup_direct" -> {
      val sliced = "(SELECT doc_id, text FROM documents WHERE doc_id < 500)"
      s"""WITH ${substringRunsCtes(sliced)},
        |pp AS (SELECT id_b AS doc_id, max(run) + 4 AS mx FROM runs
        |  GROUP BY id_a, id_b
        |  HAVING sum(CASE WHEN run >= 6 THEN 1 ELSE 0 END) > 0),
        |pd AS (SELECT doc_id, CAST(max(mx) AS BIGINT) AS max_shared_tokens
        |  FROM pp GROUP BY 1)
        |SELECT d.doc_id, pd.max_shared_tokens,
        |  pd.max_shared_tokens IS NOT NULL AS dup_substring
        |FROM $sliced d LEFT JOIN pd USING (doc_id)""".stripMargin
    },

    // assignment = the q45/q52 rule (argmax cosine, ties to HIGHER cid,
    // centroids = first 4 by vec_id); membership = the q268 rank window
    // with equal weights (quota = 200 // 4 per cluster)
    "q282_cluster_balanced_sample" -> {
      val cos = cosSql("e.embedding", "c0.cv")
      val u = uniformSql("a.vec_id", ":cb")
      s"""WITH c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         |    embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 4),
         |assign AS (SELECT vec_id, label, CAST(cid AS VARCHAR) AS cell FROM (
         |    SELECT e.vec_id, e.label, c0.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $cos DESC, c0.cid DESC) AS rn
         |    FROM embeddings e CROSS JOIN c0) WHERE rn = 1),
         |cnt AS (SELECT cell, count(*) AS n_in FROM assign GROUP BY 1),
         |q AS (SELECT cell, least(n_in, 200 // 4) AS n_keep FROM cnt),
         |r AS (SELECT a.vec_id, a.cell, a.label,
         |    row_number() OVER (PARTITION BY a.cell ORDER BY $u, a.vec_id)
         |      AS rn, q.n_keep
         |  FROM assign a JOIN q USING (cell))
         |SELECT vec_id, cell, label FROM r WHERE rn <= n_keep""".stripMargin
    },

    // the batch truth over ALL events: if the fresh-checkpoint batch had
    // been wrongly fenced (or a redelivery re-added), every count — and
    // with it each percentile and n_rows — would shift
    "q283_fenced_restart" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT event_type, cents, count(*) AS cnt FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, cents, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM d)
        |SELECT event_type,
        |  CAST(min(CASE WHEN cum * 100 >= n * 25 THEN cents END) AS BIGINT) AS p25,
        |  CAST(min(CASE WHEN cum * 100 >= n * 75 THEN cents END) AS BIGINT) AS p75,
        |  CAST(min(CASE WHEN cum * 100 >= n * 95 THEN cents END) AS BIGINT) AS p95,
        |  CAST(max(n) AS BIGINT) AS n_rows,
        |  count(*) AS n_distinct
        |FROM c GROUP BY 1""".stripMargin,

    // q220's oracle VERBATIM: the shard fan-out + merge changes NOTHING
    // about the result (disjoint cover, per-doc scores shard-blind under
    // the global stats, global top-k contained in the shard top-k union)
    "q285_sharded_lexical" ->
      s"""SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "merge", "sort"))} s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // the exhaustive dot product again — the sparse fan-out must land on
    // it exactly (no global stats, so nothing can even drift per shard)
    "q286_sharded_sparse" ->
      sparseSearchOracleSql(Map("vector" -> 2L, "dup" -> 1L, "merge" -> 1L), 10),

    // q163/q186's oracle VERBATIM at vec_id 11: sharding both legs
    // changes nothing about the fused result
    "q287_sharded_hybrid" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH qd AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
         |dense AS (
         |  SELECT e.vec_id AS id, $cos AS score
         |  FROM embeddings e CROSS JOIN qd q WHERE e.vec_id <> 11
         |  ORDER BY score DESC, e.vec_id LIMIT 20),
         |dr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM dense),
         |lex AS (
         |  SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "merge"))} s
         |  ORDER BY score DESC, doc_id LIMIT 20),
         |lr AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM lex)
         |SELECT coalesce(dr.id, lr.id) AS id,
         |  coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(dr.rank AS DOUBLE)), CAST(0 AS DOUBLE))
         |    + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(lr.rank AS DOUBLE)), CAST(0 AS DOUBLE)) AS rrf
         |FROM dr FULL OUTER JOIN lr ON dr.id = lr.id
         |ORDER BY rrf DESC, id LIMIT 10""".stripMargin
    },

    // q276's dedup-first chain over the null-injected corpus, nulls
    // routed around the text-keyed joins and unioned back unflagged
    "q284_substring_null_safe" ->
      s"""WITH src AS (SELECT doc_id,
        |    CASE WHEN doc_id % 50 = 0 THEN NULL ELSE text END AS text
        |  FROM documents),
        |g AS (SELECT text, min(doc_id) AS rep FROM src
        |  WHERE text IS NOT NULL GROUP BY text),
        |${substringRunsCtes("(SELECT rep AS doc_id, text FROM g)")},
        |rp AS (SELECT id_a, id_b, max(run) + 4 AS mx FROM runs
        |  GROUP BY 1, 2
        |  HAVING sum(CASE WHEN run >= 6 THEN 1 ELSE 0 END) > 0),
        |sym AS (SELECT id_a AS r1, id_b AS r2, mx FROM rp
        |  UNION ALL SELECT id_b, id_a, mx FROM rp),
        |dd AS (SELECT doc_id, g.rep,
        |    len(string_split_regex(lower(src.text), '\\s+')) AS L
        |  FROM src JOIN g USING (text)),
        |cx AS (SELECT dd.doc_id, max(s.mx) AS mx FROM dd JOIN sym s
        |  ON s.r1 = dd.rep AND s.r2 < dd.doc_id GROUP BY 1),
        |best AS (SELECT dd.doc_id,
        |    greatest(coalesce(cx.mx, -1),
        |      CASE WHEN dd.doc_id > dd.rep AND dd.L >= 10 THEN dd.L
        |        ELSE -1 END) AS mx
        |  FROM dd LEFT JOIN cx USING (doc_id))
        |SELECT doc_id,
        |  CAST(CASE WHEN mx >= 0 THEN mx END AS BIGINT) AS max_shared_tokens,
        |  mx >= 0 AS dup_substring
        |FROM best
        |UNION ALL
        |SELECT doc_id, CAST(NULL AS BIGINT) AS max_shared_tokens,
        |  false AS dup_substring
        |FROM src WHERE text IS NULL""".stripMargin,

    // q163/q186's oracle VERBATIM: the hybrid front door + route change
    // nothing about the fused result
    "q280_hybrid_front_door" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH qd AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
         |dense AS (
         |  SELECT e.vec_id AS id, $cos AS score
         |  FROM embeddings e CROSS JOIN qd q WHERE e.vec_id <> 7
         |  ORDER BY score DESC, e.vec_id LIMIT 20),
         |dr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM dense),
         |lex AS (
         |  SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "stream"))} s
         |  ORDER BY score DESC, doc_id LIMIT 20),
         |lr AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM lex)
         |SELECT coalesce(dr.id, lr.id) AS id,
         |  coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(dr.rank AS DOUBLE)), CAST(0 AS DOUBLE))
         |    + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(lr.rank AS DOUBLE)), CAST(0 AS DOUBLE)) AS rrf
         |FROM dr FULL OUTER JOIN lr ON dr.id = lr.id
         |ORDER BY rrf DESC, id LIMIT 10""".stripMargin
    },

    // q268's sampling transcription with COMPUTED weights: ⌊√n_s⌋ —
    // floor∘sqrt over exact-integer doubles is bit-stable (IEEE sqrt is
    // correctly rounded), so both engines land on the same BIGINT quota
    "q288_mixture_temperature" -> {
      val u = uniformSql("d.doc_id", ":mix")
      s"""WITH c AS (SELECT source, count(*) AS n_in FROM documents
        |  WHERE source IS NOT NULL GROUP BY 1),
        |t AS (SELECT source, n_in,
        |    CAST(floor(sqrt(CAST(n_in AS DOUBLE))) AS BIGINT) AS weight
        |  FROM c),
        |sw AS (SELECT sum(weight) AS sumw FROM t),
        |q AS (SELECT t.source,
        |    least(t.n_in, (300 * t.weight) // sw.sumw) AS n_keep
        |  FROM t CROSS JOIN sw),
        |r AS (SELECT d.doc_id, d.source, d.lang, q.n_keep,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY $u, d.doc_id) AS rn
        |  FROM documents d JOIN q ON d.source = q.source
        |  WHERE d.doc_id IS NOT NULL)
        |SELECT doc_id, source, lang FROM r WHERE rn <= n_keep""".stripMargin
    },

    // both matryoshka stages transcribed: prefix-cosine candidate pool
    // (list slices, same pinned fold) then the exact full-dim rerank
    "q289_matryoshka_search" -> matryoshkaOracleSql(23),

    // the same transcription at vec_id 29 — the memory tier changes
    // nothing about the two-stage result
    "q290_memory_mrl" -> matryoshkaOracleSql(29),

    // the FULL-corpus batch transcription (q220's shape): the delta tier
    // streaming in the held-out 20% must land on it exactly — stale
    // stats would re-rank, so this oracle is the freshness contract
    "q291_delta_lexical" ->
      s"""SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "query", "stream"))} s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // the same batch transcription over the SURVIVING corpus: base
    // (doc_id % 5 <> 0) ∪ un-retracted delta (% 5 = 0 but % 10 <> 0)
    // = everything but doc_id % 10 = 0 — retraction must re-derive the
    // stats a rebuild over the survivors computes, or every score here
    // drifts
    "q294_delta_retract" ->
      s"""SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "query", "stream"),
             docCond = "doc_id % 10 <> 0")} s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // q294's oracle VERBATIM: folding the delta into a new base every
    // 25 docs must change NOTHING about the served results — the
    // bounded handle still equals the batch SQL over the survivors
    "q297_bounded_republish" ->
      s"""SELECT doc_id, score FROM ${bm25ScoredSql(Seq("dup", "query", "stream"),
             docCond = "doc_id % 10 <> 0")} s
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // the same surviving-corpus protocol on the sparse tier: the
    // exhaustive dot product over everything but doc_id % 10 = 0 —
    // with no corpus stats there is nothing the stream could even
    // drift, but the merge rule and postings shape still need the pin
    "q295_delta_sparse" ->
      sparseSearchOracleSql(Map("dup" -> 2L, "stream" -> 1L, "query" -> 3L),
        10, docCond = "doc_id % 10 <> 0"),

    // the graph tier's freshness oracle: the WALK is approximate (no
    // SQL expresses it — RECALL.md's verification class), but WHO is
    // servable is exact, and the query requires self-recall for every
    // surviving streamed row and non-servability for every purged one
    // (failing rows abort the query, so a green row here IS the
    // visibility contract). The output is then the surviving stream
    // slice in closed form.
    "q298_delta_hnsw" ->
      """SELECT vec_id FROM embeddings
        |WHERE vec_id % 5 = 0 AND vec_id % 10 <> 0
        |ORDER BY vec_id""".stripMargin,

    // the externally-decoded GDIF corpus in closed form (q90's shape,
    // inter-frame re-encoded: pixel (x,y) of frame f = (7x+13y+i+31f)
    // mod 256 — lossless, so the subprocess must reproduce the integers
    // exactly), with the every-2nd-frame sampler as the frame filter
    "q299_video_external_decode" ->
      """WITH dims AS (SELECT i AS media_id,
        |    CAST(8 + i % 8 AS INT) AS width,
        |    CAST(8 + (3 * i) % 8 AS INT) AS height,
        |    CAST(2 + i % 3 AS INT) AS n_frames
        |  FROM range(150) t(i)),
        |fr AS (SELECT media_id, width, height, CAST(f.f AS INT) AS frame_idx
        |  FROM dims, unnest(generate_series(0, n_frames - 1)) AS f(f)
        |  WHERE f.f % 2 = 0),
        |px AS (SELECT media_id, frame_idx, width, height,
        |    (7 * x.x + 13 * y.y + media_id + 31 * frame_idx) % 256 AS v
        |  FROM fr,
        |    unnest(generate_series(0, width - 1)) AS x(x),
        |    unnest(generate_series(0, height - 1)) AS y(y))
        |SELECT media_id, frame_idx, width, height,
        |  CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
        |  TRUE AS decode_ok
        |FROM px GROUP BY media_id, frame_idx, width, height""".stripMargin,

    // q29's oracle VERBATIM: routing the request onto the memory tier
    // must change nothing about the result
    "q279_routed_search" -> {
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
         |ranked AS (
         |  SELECT e.vec_id, d.lang, d.source, d.n_chars,
         |    ${cosSql("e.embedding", "q.qv")} AS score
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id CROSS JOIN q
         |  WHERE e.vec_id <> 1 AND d.lang = 'en' AND d.n_chars >= 50
         |  ORDER BY score DESC, e.vec_id LIMIT 7)
         |SELECT CAST(vec_id AS VARCHAR) AS vec_id, CAST(lang AS VARCHAR) AS lang,
         |  CAST(source AS VARCHAR) AS source, CAST(n_chars AS VARCHAR) AS n_chars
         |FROM ranked""".stripMargin
    },

    // the DNF branch union ≡ the per-row disjunction test, in SQL
    "q262_memory_or_filter" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 33)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |CROSS JOIN q
         |WHERE e.vec_id <> 33 AND d.source = 'src3'
         |  AND (d.lang = 'en' OR d.lang = 'de')
         |ORDER BY score DESC, e.vec_id LIMIT 8""".stripMargin
    },

    // full-outer allowlist join + integer floor-division quotas
    "q267_mixture_plan" ->
      s"""WITH $mixTargetsSql,
        |c AS (SELECT source, count(*) AS n_in FROM documents
        |  WHERE source IS NOT NULL GROUP BY 1)
        |SELECT coalesce(c.source, t.source) AS source,
        |  CAST(coalesce(c.n_in, 0) AS BIGINT) AS n_in,
        |  CAST(coalesce(t.weight, 0) AS BIGINT) AS weight,
        |  CAST((300 * coalesce(t.weight, 0)) // 12 AS BIGINT) AS quota,
        |  CAST(least(coalesce(c.n_in, 0),
        |    (300 * coalesce(t.weight, 0)) // 12) AS BIGINT) AS n_keep,
        |  coalesce(c.n_in, 0) < (300 * coalesce(t.weight, 0)) // 12
        |    AS under_quota
        |FROM c FULL OUTER JOIN t ON c.source = t.source""".stripMargin,

    // the same quotas + the deterministic (uniform, id) rank membership
    "q268_mixture_sample" -> {
      val u = uniformSql("d.doc_id", ":mix")
      s"""WITH $mixTargetsSql,
        |c AS (SELECT source, count(*) AS n_in FROM documents
        |  WHERE source IS NOT NULL GROUP BY 1),
        |q AS (SELECT c.source,
        |    least(c.n_in, (300 * coalesce(t.weight, 0)) // 12) AS n_keep
        |  FROM c LEFT JOIN t ON c.source = t.source),
        |r AS (SELECT d.doc_id, d.source, d.lang, q.n_keep,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY $u, d.doc_id) AS rn
        |  FROM documents d JOIN q ON d.source = q.source
        |  WHERE d.doc_id IS NOT NULL)
        |SELECT doc_id, source, lang FROM r WHERE rn <= n_keep""".stripMargin
    },

    // epochs = quota // n, remainder to the first quota % n ranked rows,
    // copies expanded by generate_series — all integer
    "q269_mixture_upsample" -> {
      val u = uniformSql("d.doc_id", ":mix")
      s"""WITH $mixTargetsSql,
        |c AS (SELECT source, count(*) AS n_in FROM documents
        |  WHERE source IS NOT NULL GROUP BY 1),
        |q AS (SELECT c.source, c.n_in,
        |    (300 * coalesce(t.weight, 0)) // 12 AS quota
        |  FROM c LEFT JOIN t ON c.source = t.source
        |  WHERE (300 * coalesce(t.weight, 0)) // 12 > 0 AND c.n_in > 0),
        |r AS (SELECT d.doc_id, d.source, q.n_in, q.quota,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY $u, d.doc_id) AS rn
        |  FROM documents d JOIN q ON d.source = q.source
        |  WHERE d.doc_id IS NOT NULL),
        |cp AS (SELECT doc_id, source,
        |    quota // n_in + CASE WHEN rn <= quota % n_in THEN 1 ELSE 0 END
        |      AS copies
        |  FROM r)
        |SELECT cp.doc_id, cp.source, CAST(e.e AS BIGINT) AS epoch
        |FROM cp, unnest(generate_series(1, CAST(cp.copies AS BIGINT))) AS e(e)
        |WHERE cp.copies > 0""".stripMargin
    },

    // same rank, cumulative token sum <= the per-source token quota
    "q270_mixture_token_budget" -> {
      val u = uniformSql("d.doc_id", ":mix")
      s"""WITH $mixTargetsSql,
        |r AS (SELECT d.doc_id, d.source, d.n_chars,
        |    (60000 * t.weight) // 12 AS quota,
        |    sum(d.n_chars) OVER (PARTITION BY d.source
        |      ORDER BY $u, d.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents d JOIN t ON d.source = t.source
        |  WHERE d.doc_id IS NOT NULL AND d.n_chars IS NOT NULL)
        |SELECT doc_id, source, n_chars FROM r WHERE cum <= quota""".stripMargin
    },

    // q23's LSH machinery over DISTINCT texts (min-id reps) + integer
    // multiplicities; all counts integer so the twin is exact. Same SQL
    // as q23 — the unification made dedup-first the default entry and
    // this name pins the pre-unification alias against it.
    "q266_lsh_dedup_first" -> lshDedupFirstSql,

    // the shard fan-out merge ≡ the unsharded scan ≡ brute force
    "q265_sharded_search" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 35)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 35
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin
    },

    // the index self-join and exact-integer-sum divisions transcribed
    "q264_backtest_seasonal" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx
        |  FROM events WHERE event_type IS NOT NULL),
        |d AS (SELECT event_type, day_idx, count(*) AS v FROM e GROUP BY 1, 2),
        |sc AS (SELECT d.event_type, d.v, b.v AS f
        |  FROM d LEFT JOIN d b ON d.event_type = b.event_type
        |    AND d.day_idx = b.day_idx + 7),
        |g AS (SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(count(f) AS BIGINT) AS n_scored,
        |    CAST(sum(abs(v - f)) AS BIGINT) AS sum_abs_err,
        |    CAST(sum(v - f) AS BIGINT) AS sum_err,
        |    CAST(sum(CASE WHEN f IS NOT NULL THEN abs(v) END) AS BIGINT)
        |      AS sum_abs_y
        |  FROM sc GROUP BY 1)
        |SELECT event_type, n_points, n_scored, sum_abs_err, sum_err,
        |  sum_abs_y,
        |  CAST(sum_abs_err AS DOUBLE) / CAST(n_scored AS DOUBLE) AS mae,
        |  CAST(sum_abs_err AS DOUBLE) / CAST(sum_abs_y AS DOUBLE) AS wape,
        |  CAST(sum_err AS DOUBLE) / CAST(sum_abs_y AS DOUBLE) AS bias
        |FROM g""".stripMargin,

    // @ne = <>, @contains = substring membership — per-row in SQL
    "q263_memory_ne_contains" -> {
      val cos = cosSql("e.embedding", "q.qv")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 34)
         |SELECT e.vec_id, $cos AS score
         |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |CROSS JOIN q
         |WHERE e.vec_id <> 34 AND d.lang <> 'en'
         |  AND contains(d.source, '1')
         |ORDER BY score DESC, e.vec_id LIMIT 8""".stripMargin
    }
  )

  /** The PQ (m=2, ksub=4, first-4-by-id sub-centroid seeds) ADC
    * prune-and-rerank oracle, shared by the DataFrame path (q118) and
    * the memory byte-packed ADC tier (q190) — one transcription, two
    * engines against it.
    */
  private def pqSearchOracleSql(qid: Int): String =
    s"""WITH q AS (SELECT embedding AS qv, len(embedding) // 2 AS d
       |  FROM embeddings WHERE vec_id = $qid),
       |e AS (SELECT vec_id, embedding, len(embedding) // 2 AS d
       |  FROM embeddings WHERE vec_id <> $qid),
       |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
       |    embedding AS cv, len(embedding) // 2 AS d
       |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 4)),
       |s0 AS (SELECT e.vec_id, c.cid,
       |    ${l2Sql("e.embedding[1 : e.d]", "c.cv[1 : c.d]")} AS dist
       |  FROM e CROSS JOIN cents c),
       |a0 AS (SELECT vec_id, cid FROM (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM s0)
       |  WHERE rn = 1),
       |s1 AS (SELECT e.vec_id, c.cid,
       |    ${l2Sql("e.embedding[e.d + 1 : 2 * e.d]", "c.cv[c.d + 1 : 2 * c.d]")} AS dist
       |  FROM e CROSS JOIN cents c),
       |a1 AS (SELECT vec_id, cid FROM (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM s1)
       |  WHERE rn = 1),
       |qd0 AS (SELECT c.cid,
       |    ${l2Sql("q.qv[1 : c.d]", "c.cv[1 : c.d]")} AS qd
       |  FROM cents c CROSS JOIN q),
       |qd1 AS (SELECT c.cid,
       |    ${l2Sql("q.qv[c.d + 1 : 2 * c.d]", "c.cv[c.d + 1 : 2 * c.d]")} AS qd
       |  FROM cents c CROSS JOIN q),
       |cand AS (SELECT a0.vec_id FROM a0 JOIN a1 USING (vec_id)
       |  JOIN qd0 ON qd0.cid = a0.cid JOIN qd1 ON qd1.cid = a1.cid
       |  ORDER BY qd0.qd + qd1.qd ASC, a0.vec_id ASC LIMIT 15)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS score
       |FROM e JOIN cand USING (vec_id) CROSS JOIN q
       |ORDER BY score DESC, e.vec_id LIMIT 5""".stripMargin

  /** The SQ8 prune-and-rerank oracle (q179 / q187): quantize every
    * corpus vector with the affine codec, score the codes via the SAME
    * algebra the engine's codegen scan uses (the association order is
    * pinned term by term), take the top-15 approximate candidates, exact
    * cosine rerank to top-5. Shared by the DataFrame path (q179) and the
    * memory byte-packed tier (q187) — one transcription, two engines
    * against it.
    */
  private def sq8SearchOracleSql(qid: Int): String = {
    val cos = cosSql("c.embedding", "q.qv")
    s"""WITH qd AS (SELECT embedding AS qv,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qs
       |  FROM embeddings WHERE vec_id = $qid),
       |qa AS (SELECT qv, qs, list_sum(qs) AS sq,
       |  sqrt(list_sum(list_transform(qs, a -> a * a))) AS qn,
       |  CAST(len(qs) AS DOUBLE) AS d FROM qd),
       |v AS (SELECT vec_id, embedding,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
       |  FROM embeddings WHERE vec_id <> $qid),
       |m AS (SELECT vec_id, embedding, xs, list_min(xs) AS mn, list_max(xs) AS mx FROM v),
       |sc AS (SELECT *, CASE WHEN mx = mn THEN CAST(1 AS DOUBLE)
       |  ELSE (mx - mn) / CAST(255 AS DOUBLE) END AS scale FROM m),
       |cd AS (SELECT vec_id, embedding, mn, scale,
       |  list_transform(xs, x ->
       |    greatest(CAST(0 AS DOUBLE), least(CAST(255 AS DOUBLE),
       |      floor((x - mn) / scale + CAST(0.5 AS DOUBLE))))) AS cs
       |  FROM sc),
       |ag AS (SELECT vec_id, embedding, mn, scale, cs,
       |  list_sum(cs) AS csum,
       |  list_sum(list_transform(cs, c -> c * c)) AS csum2 FROM cd),
       |ap AS (SELECT a.vec_id, a.embedding,
       |  (a.mn * q.sq + a.scale *
       |     list_sum(list_transform(list_zip(a.cs, q.qs), p -> p[2] * p[1])))
       |  / (sqrt(q.d * a.mn * a.mn + CAST(2 AS DOUBLE) * a.mn * a.scale * a.csum
       |      + a.scale * a.scale * a.csum2) * q.qn) AS approx
       |  FROM ag a CROSS JOIN qa q),
       |cand AS (SELECT vec_id, embedding FROM ap
       |  ORDER BY approx DESC, vec_id LIMIT 15)
       |SELECT c.vec_id, $cos AS score
       |FROM cand c CROSS JOIN qd q
       |ORDER BY score DESC, c.vec_id LIMIT 5""".stripMargin
  }

  /** MaxSim twin — q194 (DataFrame plan) and q197 (memory tier) at
    * different query bags/corpora. Per-(doc, qtok) max cosine is
    * order-free exact IEEE; the only order-sensitive fold is the final
    * sum over query vectors, pinned qtok-ascending on both sides.
    */
  private def maxSimOracleSql(qCond: String, dCond: String): String = {
    val cos = cosSql("d.embedding", "q.qv")
    s"""WITH q AS (SELECT vec_id AS qtok, embedding AS qv
       |  FROM embeddings WHERE $qCond),
       |d AS (SELECT vec_id // 4 AS doc_id, embedding
       |  FROM embeddings WHERE $dCond),
       |mx AS (SELECT d.doc_id, q.qtok, max($cos) AS m
       |  FROM d CROSS JOIN q GROUP BY d.doc_id, q.qtok),
       |sc AS (SELECT doc_id, list_sum(list(m ORDER BY qtok)) AS score
       |  FROM mx GROUP BY doc_id)
       |SELECT doc_id, score FROM sc
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }

  /** Sparse-dot-product twin of [[graft.operators.Sparse.topKSparse]] —
    * integer weights, so the score is exact arithmetic on both sides;
    * the tokenizer matches [[graft.operators.Sparse.tfVectors]] (split on
    * single space, same as the BM25 twin).
    */
  /** Both matryoshka stages (q289/q290): prefix-cosine candidate pool
    * over list slices (same pinned fold as the sliced codegen column),
    * then the exact full-dim rerank — k=8, prefixDim=16, pool 24.
    */
  private def matryoshkaOracleSql(qid: Int): String = {
    val pcos = cosSql("e.embedding[1:16]", "q.qv[1:16]")
    val fcos = cosSql("c.embedding", "q.qv")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid),
       |cand AS (SELECT e.vec_id, e.embedding
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> $qid
       |  ORDER BY $pcos DESC, e.vec_id LIMIT 24)
       |SELECT c.vec_id, $fcos AS score
       |FROM cand c CROSS JOIN q
       |ORDER BY score DESC, c.vec_id LIMIT 8""".stripMargin
  }

  private def sparseSearchOracleSql(q: Map[String, Long], k: Int,
                                    docCond: String = "1=1"): String = {
    val caseW = q.toSeq.sortBy(_._1).map { case (t, w) => s"WHEN '$t' THEN $w" }
      .mkString("CASE term ", " ", " END")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents WHERE $docCond),
       |tf AS (SELECT doc_id, term, count(*) AS w FROM toks
       |  WHERE term IN (${sqlList(q.keys.toSeq.sorted)}) GROUP BY doc_id, term)
       |SELECT doc_id, CAST(sum(w * ($caseW)) AS BIGINT) AS score
       |FROM tf GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Residual IVF-PQ twin — q129's transcription with the PQ stage on
    * REAL-rounded residuals (double subtract → float32 cast, the same
    * IEEE rounding both engines) and per-probed-cell query-residual ADC.
    * Shared by the DataFrame path (q216) and the memory tier (q218).
    */
  private def rpqSearchOracleSql(qid: Int): String = {
    val resExpr =
      """list_transform(list_zip(e.embedding, c.cv),
        |      p -> CAST(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) AS REAL))"""
        .stripMargin
    val qresExpr =
      """list_transform(list_zip(q.qv, c.cv),
        |      p -> CAST(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) AS REAL))"""
        .stripMargin
    s"""WITH q AS (SELECT embedding AS qv, len(embedding) // 2 AS d
       |  FROM embeddings WHERE vec_id = $qid),
       |e AS (SELECT vec_id, embedding, len(embedding) // 2 AS d
       |  FROM embeddings WHERE vec_id <> $qid),
       |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
       |    embedding AS cv, len(embedding) // 2 AS d
       |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 4)),
       |ivs AS (SELECT e.vec_id, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS cs
       |  FROM e CROSS JOIN cents c),
       |iva AS (SELECT vec_id, cid AS icell FROM (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn FROM ivs)
       |  WHERE rn = 1),
       |resid AS (SELECT e.vec_id, e.d, iva.icell,
       |    $resExpr AS rv
       |  FROM e JOIN iva USING (vec_id) JOIN cents c ON c.cid = iva.icell),
       |rb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS bid, rv, d
       |  FROM (SELECT * FROM resid ORDER BY vec_id LIMIT 4)),
       |s0 AS (SELECT r.vec_id, b.bid,
       |    ${l2Sql("r.rv[1 : r.d]", "b.rv[1 : b.d]")} AS dist
       |  FROM resid r CROSS JOIN rb b),
       |a0 AS (SELECT vec_id, bid FROM (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY dist ASC, bid ASC) AS rn FROM s0)
       |  WHERE rn = 1),
       |s1 AS (SELECT r.vec_id, b.bid,
       |    ${l2Sql("r.rv[r.d + 1 : 2 * r.d]", "b.rv[b.d + 1 : 2 * b.d]")} AS dist
       |  FROM resid r CROSS JOIN rb b),
       |a1 AS (SELECT vec_id, bid FROM (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY dist ASC, bid ASC) AS rn FROM s1)
       |  WHERE rn = 1),
       |qcells AS (SELECT c.cid FROM cents c CROSS JOIN q
       |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cid ASC LIMIT 2),
       |qr AS (SELECT c.cid AS icell, q.d,
       |    $qresExpr AS qrv
       |  FROM cents c JOIN qcells ON c.cid = qcells.cid CROSS JOIN q),
       |qd0 AS (SELECT qr.icell, b.bid,
       |    ${l2Sql("qr.qrv[1 : qr.d]", "b.rv[1 : b.d]")} AS qd
       |  FROM qr CROSS JOIN rb b),
       |qd1 AS (SELECT qr.icell, b.bid,
       |    ${l2Sql("qr.qrv[qr.d + 1 : 2 * qr.d]", "b.rv[b.d + 1 : 2 * b.d]")} AS qd
       |  FROM qr CROSS JOIN rb b),
       |cand AS (SELECT r.vec_id FROM resid r
       |  JOIN qcells ON r.icell = qcells.cid
       |  JOIN a0 ON a0.vec_id = r.vec_id
       |  JOIN a1 ON a1.vec_id = r.vec_id
       |  JOIN qd0 ON qd0.icell = r.icell AND qd0.bid = a0.bid
       |  JOIN qd1 ON qd1.icell = r.icell AND qd1.bid = a1.bid
       |  ORDER BY qd0.qd + qd1.qd ASC, r.vec_id ASC LIMIT 15)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS score
       |FROM e JOIN cand USING (vec_id) CROSS JOIN q
       |ORDER BY score DESC, e.vec_id LIMIT 5""".stripMargin
  }

  /** RM3 twin of [[graft.operators.Rm3.searchExpanded]]: round 1 is the
    * gated BM25 transcription (ordering parity already proven by
    * q162/q200), term mining and the re-query are integer arithmetic.
    */
  private def rm3OracleSql(terms: Seq[String], fbK: Int, m: Int, k: Int,
                           origW: Long, expW: Long): String = {
    val origVals = terms.sorted.map(t => s"('$t')").mkString(", ")
    s"""WITH r1 AS (SELECT doc_id FROM ${bm25ScoredSql(terms)} s
       |  ORDER BY score DESC, doc_id LIMIT $fbK),
       |ft AS (SELECT unnest(string_split(d.text, ' ')) AS term
       |  FROM documents d JOIN r1 USING (doc_id)),
       |expt AS (SELECT term, count(*) AS c FROM ft
       |  WHERE term NOT IN (${sqlList(terms)})
       |  GROUP BY term ORDER BY c DESC, term LIMIT $m),
       |qw AS (SELECT term, CAST($origW AS BIGINT) AS qww
       |    FROM (VALUES $origVals) v(term)
       |  UNION ALL SELECT term, CAST($expW AS BIGINT) FROM expt),
       |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS w FROM toks
       |  WHERE term IN (SELECT term FROM qw) GROUP BY doc_id, term)
       |SELECT t.doc_id, CAST(sum(t.w * q.qww) AS BIGINT) AS score
       |FROM tf t JOIN qw q USING (term)
       |GROUP BY t.doc_id ORDER BY score DESC, t.doc_id LIMIT $k""".stripMargin
  }

  /** IR-metrics twin of [[graft.operators.Eval.rankingMetrics]]: the same
    * fdlibm DCG-weight and ideal-DCG literals (generated from the SAME
    * Scala constants), the same pinned left-to-right DCG chain, the same
    * single divisions — so recall/rr/ndcg are bit-equal by construction.
    */
  /** The metric computation itself, shared by every eval oracle: consumes
    * caller-defined CTEs `top(qid, vec_id, rel, rnk)` (the ranked rows,
    * rnk 1..k, rel 0/1) and `nrel(qid, n_rel)` (the relevance-set sizes).
    */
  private def irMetricsTailSql(k: Int): String = {
    val ws = graft.operators.Eval.dcgWeights(k)
    val idcg = graft.operators.Eval.idcgPrefix(k)
    val relFlags = (1 to k).map(r =>
      s"max(CASE WHEN rnk = $r THEN rel ELSE 0 END) AS rel_$r").mkString(",\n  ")
    val dcgChain = (1 to k).map(r =>
      s"CAST(${ws(r - 1)} AS DOUBLE) * CAST(rel_$r AS DOUBLE)").mkString(" + ")
    val idcgCase = (s"WHEN n_rel >= $k THEN CAST(${idcg(k - 1)} AS DOUBLE)" +:
      (1 until k).map(n => s"WHEN n_rel = $n THEN CAST(${idcg(n - 1)} AS DOUBLE)"))
      .mkString("CASE ", " ", " ELSE CAST(0 AS DOUBLE) END")
    s"""perq AS (SELECT qid, CAST(sum(rel) AS BIGINT) AS hits,
       |    min(CASE WHEN rel = 1 THEN rnk END) AS first_hit,
       |  $relFlags
       |  FROM top GROUP BY qid)
       |SELECT p.qid,
       |  CASE WHEN coalesce(n.n_rel, 0) > 0
       |    THEN CAST(p.hits AS DOUBLE) / CAST(n.n_rel AS DOUBLE)
       |    ELSE CAST(0 AS DOUBLE) END AS recall,
       |  CASE WHEN p.first_hit IS NOT NULL
       |    THEN CAST(1 AS DOUBLE) / CAST(p.first_hit AS DOUBLE)
       |    ELSE CAST(0 AS DOUBLE) END AS rr,
       |  CASE WHEN coalesce(n.n_rel, 0) > 0 THEN ($dcgChain) / ($idcgCase)
       |    ELSE CAST(0 AS DOUBLE) END AS ndcg
       |FROM perq p LEFT JOIN nrel n ON p.qid = n.qid""".stripMargin
  }

  private def irMetricsOracleSql: String = {
    val k = 10
    val cos = cosSql("c.embedding", "q.qv")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
       |    FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
       |c AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 <> 0),
       |ranked AS (SELECT q.qid, c.vec_id,
       |    CASE WHEN c.label = q.qlabel THEN 1 ELSE 0 END AS rel,
       |    row_number() OVER (PARTITION BY q.qid ORDER BY $cos DESC, c.vec_id ASC) AS rnk
       |  FROM c CROSS JOIN q),
       |top AS (SELECT * FROM ranked WHERE rnk <= $k),
       |nrel AS (SELECT q.qid, count(*) AS n_rel FROM q JOIN c ON c.label = q.qlabel GROUP BY q.qid),
       |${irMetricsTailSql(k)}""".stripMargin
  }

  /** q210 twin: IVF assignment (cosine argmax, ties to HIGHER cid — the
    * greatest-struct rule, as in q155), per-query probe cells (cosine
    * DESC, cid ASC, nProbe=2), approximate top-10 over the probed cells,
    * exact top-10 as the relevance set, the shared metrics tail.
    */
  private def annEvalOracleSql: String = {
    val k = 10
    val cosEC = cosSql("e.embedding", "cc.cv")
    val cosQC = cosSql("q.qv", "cc.cv")
    val cosAQ = cosSql("a.embedding", "q.qv")
    val cosEQ = cosSql("e.embedding", "q.qv")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
       |    FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
       |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 <> 0),
       |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
       |    embedding AS cv
       |  FROM (SELECT * FROM c ORDER BY vec_id LIMIT 4)),
       |scored AS (SELECT e.vec_id, e.embedding, cc.cid, $cosEC AS cs
       |  FROM c e CROSS JOIN cents cc),
       |assign AS (SELECT vec_id, embedding, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cs DESC, cid DESC) AS rn FROM scored) WHERE rn = 1),
       |qc AS (SELECT q.qid, cc.cid, row_number() OVER (PARTITION BY q.qid
       |    ORDER BY $cosQC DESC, cc.cid ASC) AS qrn
       |  FROM q CROSS JOIN cents cc),
       |qcells AS (SELECT qid, cid FROM qc WHERE qrn <= 2),
       |approx AS (SELECT s.qid, s.vec_id, row_number() OVER (
       |    PARTITION BY s.qid ORDER BY s.s DESC, s.vec_id ASC) AS rnk
       |  FROM (SELECT q.qid, a.vec_id, $cosAQ AS s
       |    FROM assign a JOIN qcells kc ON a.cid = kc.cid
       |    JOIN q ON q.qid = kc.qid) s),
       |exact AS (SELECT qid, vec_id FROM (SELECT q.qid, e.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY $cosEQ DESC, e.vec_id ASC) AS xr
       |  FROM c e CROSS JOIN q) WHERE xr <= $k),
       |top AS (SELECT ap.qid, ap.vec_id,
       |    CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel, ap.rnk
       |  FROM approx ap LEFT JOIN exact x
       |    ON x.qid = ap.qid AND x.vec_id = ap.vec_id
       |  WHERE ap.rnk <= $k),
       |nrel AS (SELECT qid, count(*) AS n_rel FROM exact GROUP BY qid),
       |${irMetricsTailSql(k)}""".stripMargin
  }

  /** Convex (min-max normalized) hybrid twin — q176 (batch legs) and
    * q203 (memory tier) at different stored queries, one transcription.
    */
  private def normFusionOracleSql(qid: Int): String = {
    val cos = cosSql("e.embedding", "q.qv")
    s"""WITH qd AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid),
       |dense AS (
       |  SELECT e.vec_id AS id, $cos AS score
       |  FROM embeddings e CROSS JOIN qd q WHERE e.vec_id <> $qid
       |  ORDER BY score DESC, e.vec_id LIMIT 20),
       |dmm AS (SELECT min(score) AS mn, max(score) AS mx FROM dense),
       |dn AS (SELECT id, CASE WHEN (SELECT mx FROM dmm) = (SELECT mn FROM dmm)
       |  THEN CAST(1 AS DOUBLE)
       |  ELSE (score - (SELECT mn FROM dmm))
       |    / ((SELECT mx FROM dmm) - (SELECT mn FROM dmm)) END AS n FROM dense),
       |lexs AS (SELECT doc_id AS id, score FROM ${bm25ScoredSql(Seq("dup", "query"))} s
       |  ORDER BY score DESC, doc_id LIMIT 20),
       |lmm AS (SELECT min(score) AS mn, max(score) AS mx FROM lexs),
       |ln AS (SELECT id, CASE WHEN (SELECT mx FROM lmm) = (SELECT mn FROM lmm)
       |  THEN CAST(1 AS DOUBLE)
       |  ELSE (score - (SELECT mn FROM lmm))
       |    / ((SELECT mx FROM lmm) - (SELECT mn FROM lmm)) END AS n FROM lexs)
       |SELECT coalesce(dn.id, ln.id) AS id,
       |  CAST(0.6 AS DOUBLE) * coalesce(dn.n, CAST(0 AS DOUBLE))
       |    + CAST(0.4 AS DOUBLE) * coalesce(ln.n, CAST(0 AS DOUBLE)) AS fused
       |FROM dn FULL OUTER JOIN ln ON dn.id = ln.id
       |ORDER BY fused DESC, id LIMIT 10""".stripMargin
  }

  /** Binary (sign) quantized search twin — q191 (DataFrame path) and
    * q192 (memory tier) at different stored queries. The Hamming leg is
    * INTEGER (bit i = x_i > 0; distance = count of differing signs), so
    * the approximate cut needs no fold-order pinning at all; only the
    * exact-cosine rerank carries the pinned double fold.
    */
  private def binarySearchOracleSql(qid: Int): String = {
    val cos = cosSql("c.embedding", "q.qv")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid),
       |ham AS (SELECT e.vec_id, e.embedding,
       |  list_sum(list_transform(list_zip(e.embedding, q.qv),
       |    p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END)) AS h
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> $qid),
       |cand AS (SELECT vec_id, embedding FROM ham ORDER BY h, vec_id LIMIT 15)
       |SELECT c.vec_id, $cos AS score
       |FROM cand c CROSS JOIN q
       |ORDER BY score DESC, c.vec_id LIMIT 5""".stripMargin
  }

  /** BM25-scored documents as a parenthesized subquery `(doc_id, dl,
    * score)` — the oracle twin of [[graft.operators.Bm25.scoreAll]]. Every
    * float op mirrors the engine: idf arg association, DetMath series ln,
    * tf-normalization association, term-ordered score fold. k1/b literals
    * are injected from the SAME Scala doubles the engine folds into its
    * plan (Double.toString round-trips, and DuckDB's decimal-literal →
    * DOUBLE cast is exact-value correctly rounded).
    */
  private def bm25ScoredSql(terms: Seq[String],
                            k1: Double = 1.2, b: Double = 0.75,
                            docCond: String = "1=1",
                            termCond: String = ""): String = {
    // default: the literal IN-list; q217 overrides with a data-dependent
    // subquery (outer CTEs are in scope inside this nested WITH)
    val termFilter =
      if (termCond.nonEmpty) termCond else s"term IN (${sqlList(terms)})"
    val idfSub = graft.functions.DetMath.lnDetSubquery(
      s"""(SELECT term,
         |   (CAST((SELECT n FROM st) - df AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |     / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE) AS x
         | FROM dft)""".stripMargin,
      Seq("term"), "x", "idf")
    s"""(WITH b2 AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |    string_split(text, ' ') AS toks
       |  FROM documents WHERE $docCond),
       |st AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
       |  count(*) AS n FROM b2),
       |post AS (SELECT doc_id, dl, unnest(toks) AS term FROM b2),
       |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM post
       |  WHERE $termFilter GROUP BY doc_id, term),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |idf AS (SELECT * FROM $idfSub i),
       |contrib AS (SELECT t.doc_id, t.term, t.dl,
       |  i.idf * ((CAST(t.tf AS DOUBLE) * CAST(${k1 + 1.0} AS DOUBLE))
       |    / (CAST(t.tf AS DOUBLE) + CAST($k1 AS DOUBLE)
       |      * (CAST(${1.0 - b} AS DOUBLE) + CAST($b AS DOUBLE)
       |        * (CAST(t.dl AS DOUBLE) / (SELECT avgdl FROM st))))) AS c
       |  FROM tf t JOIN idf i USING (term))
       |SELECT doc_id, max(dl) AS dl, list_sum(list(c ORDER BY term)) AS score
       |FROM contrib GROUP BY doc_id)""".stripMargin
  }

  /** Shared by q164 (batch window chain) and q168 (streaming automaton):
    * the per-(user, day) view→click→purchase depth histogram. The
    * exclusive window frame IS the "strictly after in (us, event_id)
    * order" rule both engines implement.
    */
  private lazy val funnelDepthOracleSql: String = {
    val w = "PARTITION BY ukey ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    s"""WITH e AS (SELECT user_id * 1000000 + epoch_us(ts) // 86400000000 AS ukey,
       |  event_type, event_id, epoch_us(ts) AS us FROM events),
       |f0 AS (SELECT *, CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS q0 FROM e),
       |f1 AS (SELECT *, CASE WHEN event_type = 'click' AND sum(q0) OVER ($w) > 0
       |  THEN 1 ELSE 0 END AS q1 FROM f0),
       |f2 AS (SELECT *, CASE WHEN event_type = 'purchase' AND sum(q1) OVER ($w) > 0
       |  THEN 1 ELSE 0 END AS q2 FROM f1),
       |u AS (SELECT ukey, max(q0) + max(q1) + max(q2) AS depth FROM f2 GROUP BY ukey)
       |SELECT CAST(depth AS INTEGER) AS depth, CAST(count(*) AS BIGINT) AS n_users
       |FROM u GROUP BY depth""".stripMargin
  }

  /** q110/q225 twin: exact per-group token counts, top-5 by (count DESC,
    * token ASC) — the batch sketch (in its exactness window) and the
    * streaming MG accumulate must BOTH land on it.
    */
  private lazy val groupHeavyHittersOracleSql: String =
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |cnt AS (SELECT source, token, count(*) AS n_occ
      |  FROM tok GROUP BY 1, 2),
      |r AS (SELECT source, token, n_occ,
      |  CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY n_occ DESC, token ASC) AS BIGINT) AS rnk FROM cnt)
      |SELECT source, token, n_occ, rnk FROM r WHERE rnk <= 5""".stripMargin

  /** q228/q232 twin: distinct (user, week) compaction → per-user min →
    * exact day/7 offsets — the batch operator and the streaming
    * distinct-union accumulate must BOTH land on it.
    */
  private lazy val cohortRetentionOracleSql: String =
    """WITH uw AS (SELECT DISTINCT user_id AS uid,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |c AS (SELECT uid, min(wk) AS cohort_wk FROM uw GROUP BY 1)
      |SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort_week,
      |  CAST(date_diff('day', c.cohort_wk, uw.wk) // 7 AS BIGINT) AS week_offset,
      |  count(*) AS n_users
      |FROM uw JOIN c ON c.uid = uw.uid GROUP BY 1, 2""".stripMargin

  /** q233/q237 twin: lead over the pinned (ts, event_id) per-user
    * order; the batch operator and the carry-state streaming accumulate
    * must BOTH land on it.
    */
  private lazy val eventTransitionsOracleSql: String =
    """WITH st AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt
      |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |c AS (SELECT event_type AS from_state, nxt AS to_state, count(*) AS n
      |  FROM st WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |f AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS n_from
      |  FROM c GROUP BY 1)
      |SELECT c.from_state, c.to_state, c.n, f.n_from,
      |  CAST(c.n AS DOUBLE) / CAST(f.n_from AS DOUBLE) AS p
      |FROM c JOIN f ON f.from_state = c.from_state""".stripMargin

  /** q245/q256 twin: the per-part interval-union rollup — the batch
    * two-window reduction and the streaming open-island carry must
    * BOTH land on it.
    */
  private lazy val intervalUnionOracleSql: String =
    """WITH iv AS (SELECT l_partkey, CAST(l_shipdate AS DATE) AS st,
        |    CAST(l_shipdate AS DATE) + CAST(l_quantity AS INTEGER) AS en,
        |    l_orderkey, l_linenumber FROM lineitem),
        |f AS (SELECT l_partkey, st, en, l_orderkey, l_linenumber,
        |    CASE WHEN st > max(en) OVER (PARTITION BY l_partkey
        |      ORDER BY st, en, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS nw
        |  FROM iv),
        |g AS (SELECT l_partkey, st, en,
        |    sum(nw) OVER (PARTITION BY l_partkey
        |      ORDER BY st, en, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |m AS (SELECT l_partkey, island, min(st) AS island_start,
        |    max(en) AS island_end, count(*) AS n_merged
        |  FROM g GROUP BY 1, 2)
        |SELECT l_partkey, CAST(sum(n_merged) AS BIGINT) AS n_shipments,
        |  count(*) AS n_islands,
        |  CAST(sum(date_diff('day', island_start, island_end) + 1) AS BIGINT)
        |    AS covered_days,
        |  CAST(max(date_diff('day', island_start, island_end) + 1) AS BIGINT)
        |    AS longest_days
        |FROM m GROUP BY 1""".stripMargin

  /** q242/q251 twin: the CUSUM report — the batch prefix-min windows
    * and the streaming four-integer carry state must BOTH land on it.
    */
  private lazy val cusumOracleSql: String =
    """WITH x AS (SELECT event_type, epoch_us(ts) AS us, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |c AS (SELECT event_type, us, event_id,
      |    CAST(sum(cents - 5000) OVER (PARTITION BY event_type
      |      ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM x),
      |s AS (SELECT event_type, us,
      |    cum - least(0, min(cum) OVER (PARTITION BY event_type
      |      ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      |  FROM c)
      |SELECT event_type, count(*) AS n, CAST(max(s) AS BIGINT) AS max_s,
      |  max(s) > 400000 AS alarm,
      |  min(CASE WHEN s > 400000 THEN us END) AS first_alarm_us
      |FROM s GROUP BY 1""".stripMargin

  /** q239/q241 twin: the discretized-KS report over the month-half
    * split — the batch operator and the sum-merged streaming accumulate
    * must BOTH land on it.
    */
  private lazy val featureDriftOracleSql: String = {
    val cuts = (1 to 20).map(_ * 25.0)
    def side(sfx: String, cond: String): String = {
      val sums = cuts.zipWithIndex.map { case (c, i) =>
        s"CAST(sum(CASE WHEN value <= $c THEN 1 ELSE 0 END) AS BIGINT) AS c$i$sfx"
      }.mkString(",\n    ")
      s"""(SELECT event_type, count(*) AS n$sfx,
         |    $sums
         |  FROM events WHERE $cond AND event_type IS NOT NULL
         |    AND value IS NOT NULL GROUP BY 1)""".stripMargin
    }
    val diffs = cuts.indices.map(i =>
      s"abs(c${i}_a * n_b - c${i}_b * n_a)").mkString(", ")
    s"""WITH sa AS ${side("_a", "ts < TIMESTAMP '2024-01-16 00:00:00'")},
       |sb AS ${side("_b", "ts >= TIMESTAMP '2024-01-16 00:00:00'")},
       |j AS (SELECT event_type, n_a, n_b,
       |    greatest($diffs) AS max_d
       |  FROM sa JOIN sb USING (event_type))
       |SELECT event_type, n_a, n_b, max_d,
       |  CAST(max_d AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS ks,
       |  max_d * 100 > 3 * n_a * n_b AS drift
       |FROM j""".stripMargin
  }

  /** q166/q182 twin: integer counts, one double division per stat. */
  private lazy val sourceReputationOracleSql: String =
    """WITH s AS (SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
      |  CAST(sum(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS short_frac
      |FROM documents GROUP BY source)
      |SELECT source, n_docs, avg_chars, short_frac,
      |  avg_chars >= 295.0 AND short_frac <= 0.21 AS keep
      |FROM s""".stripMargin

  /** KMV overlap oracle: sketch + pair estimates (q177/q178 share it; the
    * streaming accumulate must land on the batch estimates exactly), with
    * the exact twins appended for q177 only.
    */
  private def kmvOverlapOracleSql(withExact: Boolean): String = {
    val common =
      """WITH tok AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
        |  i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS w FROM tok),
        |d AS (SELECT DISTINCT source, w FROM sh),
        |h AS (SELECT DISTINCT source,
        |  CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) AS hv FROM d),
        |r AS (SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT source, hv FROM r WHERE rn <= 64),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |ps AS (SELECT a.source AS sa, b.source AS sb FROM srcs a
        |  JOIN srcs b ON a.source < b.source),
        |mu0 AS (SELECT DISTINCT p.sa, p.sb, s.hv FROM ps p
        |  JOIN sk s ON s.source = p.sa OR s.source = p.sb),
        |mu AS (SELECT sa, sb, hv,
        |  row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rn,
        |  count(*) OVER (PARTITION BY sa, sb) AS ntot FROM mu0),
        |kth AS (SELECT sa, sb, max(ntot) AS ntot,
        |  max(CASE WHEN rn = 64 THEN hv END) AS kth FROM mu GROUP BY 1, 2),
        |rho AS (SELECT m.sa, m.sb, count(*) AS rho FROM mu m
        |  JOIN sk x ON x.source = m.sa AND x.hv = m.hv
        |  JOIN sk y ON y.source = m.sb AND y.hv = m.hv
        |  WHERE m.rn <= 64 GROUP BY 1, 2),
        |est AS (SELECT k.sa, k.sb, k.ntot,
        |  CASE WHEN k.ntot < 64 THEN CAST(k.ntot AS DOUBLE)
        |    ELSE CAST(63 AS DOUBLE)
        |      / (CAST(k.kth AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE)) END AS est_union,
        |  CASE WHEN k.ntot < 64 THEN (CASE WHEN k.ntot = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE CAST(coalesce(r.rho, 0) AS DOUBLE) / CAST(k.ntot AS DOUBLE) END)
        |    ELSE CAST(coalesce(r.rho, 0) AS DOUBLE) / CAST(64 AS DOUBLE) END AS est_jaccard
        |  FROM kth k LEFT JOIN rho r ON r.sa = k.sa AND r.sb = k.sb)""".stripMargin
    if (withExact)
      common +
        """,
          |sizes AS (SELECT source, count(*) AS n FROM d GROUP BY source),
          |ex AS (SELECT x.source AS sa, y.source AS sb, count(*) AS n_inter
          |  FROM d x JOIN d y ON x.w = y.w AND x.source < y.source GROUP BY 1, 2)
          |SELECT e.sa AS source_a, e.sb AS source_b, e.ntot AS n_merged,
          |  e.est_union, e.est_jaccard,
          |  coalesce(ex.n_inter, 0) AS n_inter,
          |  na.n + nb.n - coalesce(ex.n_inter, 0) AS exact_union,
          |  CAST(coalesce(ex.n_inter, 0) AS DOUBLE)
          |    / CAST(na.n + nb.n - coalesce(ex.n_inter, 0) AS DOUBLE) AS exact_jaccard
          |FROM est e
          |LEFT JOIN ex ON ex.sa = e.sa AND ex.sb = e.sb
          |JOIN sizes na ON na.source = e.sa
          |JOIN sizes nb ON nb.source = e.sb""".stripMargin
    else
      common +
        """
          |SELECT sa AS source_a, sb AS source_b, ntot AS n_merged,
          |  est_union, est_jaccard FROM est""".stripMargin
  }

  private lazy val hllPostingsOracleSql: String = {
    val rhoLadder = (1 to 54)
      .map(r => s"WHEN wv >= ${1L << (54 - r)} THEN $r")
      .mkString("CASE ", " ", " ELSE 55 END")
    s"""WITH tok AS (
         |  SELECT source, CAST(doc_id AS VARCHAR) || ':' ||
         |    unnest(string_split(text, ' ')) AS w FROM documents),
         |h AS (SELECT source, w,
         |  CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) AS hv FROM tok),
         |br AS (SELECT source, hv >> 54 AS bucket, $rhoLadder AS rho
         |  FROM (SELECT source, hv, hv & ${(1L << 54) - 1} AS wv FROM h)),
         |regs AS (SELECT source, bucket, max(rho) AS reg FROM br GROUP BY 1, 2),
         |spine AS (SELECT DISTINCT source FROM documents),
         |fill AS (SELECT s.source, b.range AS bucket, coalesce(r.reg, 0) AS reg
         |  FROM spine s CROSS JOIN range(64) b
         |  LEFT JOIN regs r ON r.source = s.source AND r.bucket = b.range),
         |vec AS (SELECT source, list(reg ORDER BY bucket) AS rv FROM fill GROUP BY source),
         |est AS (SELECT source,
         |  CAST(0.709 AS DOUBLE) * 4096 / list_sum(list_transform(rv,
         |    r -> CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << r))) AS hll_est FROM vec),
         |ex AS (SELECT source, count(DISTINCT w) AS n_exact FROM tok GROUP BY source)
         |SELECT ex.source, ex.n_exact, est.hll_est,
         |  est.hll_est / ex.n_exact AS rel_err
         |FROM ex JOIN est USING (source)""".stripMargin
  }
}
