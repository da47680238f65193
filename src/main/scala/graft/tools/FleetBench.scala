package graft.tools

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Sparse}
import graft.serve.{ShardedAnnIndex, ShardedHybridServer, ShardedPostingsIndex, ShardedSparseIndex}

/** The sharded serving fleet measured as REAL separate processes — the
  * r13 verdict's #1: the in-process fan-out rows measure merge
  * correctness (shards walk sequentially on shared cores), and the
  * per-shard rows justify "fleet QPS ≈ per-shard QPS" only as an
  * argument; this bench stands up N [[FleetShardServer]] JVMs (plain
  * processes, no Spark inside), fans each query out over persistent TCP
  * connections, k-merges the responses client-side, and measures the
  * END-TO-END latency — serialization, socket hop, and the
  * max-over-shards tail included.
  *
  * Bit-identity is enforced, not assumed: during warm-up every request
  * shape's fleet result is compared (score BITS) against the in-process
  * `Sharded*Index` twins built from the same rows.
  *
  * Rows (fleet_dense / fleet_lex / fleet_sparse / fleet_hybrid) print
  * as one JSON line, write FLEET_BENCH.json, and SPLICE into
  * SERVE_BENCH_10X.json (JsonSplice — the per-shard projection rows
  * live there).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.FleetBench
  * Env: SPARK_GRAFT_SERVE_REPL (default 50 — the 10x battery corpus),
  * SPARK_GRAFT_FLEET_SHARDS (default 4, matching the per-shard rows),
  * SPARK_GRAFT_SERVE_LEVELS (default "1,32"),
  * SPARK_GRAFT_SERVE_REQS (per-thread request multiplier base, default 16),
  * SPARK_GRAFT_FLEET_OUT (default SERVE_BENCH_10X.json splice target).
  */
object FleetBench {

  private def pct(sorted: IndexedSeq[Double], p: Double): Double =
    sorted((math.ceil(p * sorted.size).toInt - 1).max(0).min(sorted.size - 1))

  /** One client's persistent connections to every shard. */
  private final class FleetClient(ports: Seq[Int]) {
    private val conns = ports.map { p =>
      val s = new Socket("127.0.0.1", p)
      s.setTcpNoDelay(true)
      (new DataInputStream(new BufferedInputStream(s.getInputStream)),
        new DataOutputStream(new BufferedOutputStream(s.getOutputStream)), s)
    }

    private def readList(in: DataInputStream): Seq[(Long, Double)] =
      Seq.fill(in.readInt())((in.readLong(), in.readDouble()))

    /** Fan-out: write the request to EVERY shard first (they compute
      * concurrently), then read responses — the blocking-socket
      * realization of parallel fan-out; total wait ≈ max over shards.
      */
    def lex(terms: Seq[String], k: Int): Seq[(Long, Double)] = {
      conns.foreach { case (_, out, _) =>
        out.writeByte(0); out.writeInt(k); out.writeInt(terms.length)
        terms.foreach(out.writeUTF); out.flush()
      }
      conns.flatMap { case (in, _, _) => readList(in) }
        .sortBy { case (id, s) => (-s, id) }.take(k)
    }

    def dense(qv: Seq[Float], k: Int): Seq[(Long, Double)] = {
      conns.foreach { case (_, out, _) =>
        out.writeByte(2); out.writeInt(k); out.writeInt(qv.length)
        qv.foreach(out.writeFloat); out.flush()
      }
      conns.flatMap { case (in, _, _) => readList(in) }
        .sortBy { case (id, s) => (-s, id) }.take(k)
    }

    def sparse(q: Map[String, Long], k: Int): Seq[(Long, Long)] = {
      conns.foreach { case (_, out, _) =>
        out.writeByte(1); out.writeInt(k); out.writeInt(q.size)
        q.foreach { case (t, w) => out.writeUTF(t); out.writeLong(w) }
        out.flush()
      }
      conns.flatMap { case (in, _, _) =>
        Seq.fill(in.readInt())((in.readLong(), in.readLong()))
      }.sortBy { case (id, s) => (-s, id) }.take(k)
    }

    def hybrid(qv: Seq[Float], terms: Seq[String], k: Int,
               poolK: Int, c: Int = 60): Seq[(Long, Double)] = {
      conns.foreach { case (_, out, _) =>
        out.writeByte(3); out.writeInt(poolK); out.writeInt(qv.length)
        qv.foreach(out.writeFloat); out.writeInt(terms.length)
        terms.foreach(out.writeUTF); out.flush()
      }
      val per = conns.map { case (in, _, _) => (readList(in), readList(in)) }
      // the ShardedHybridServer fold exactly: merge each leg across
      // shards to poolK, rank 1-based, RRF-fuse locally
      val d = per.flatMap(_._1).sortBy { case (id, s) => (-s, id) }.take(poolK)
        .zipWithIndex.map { case ((id, _), i) => (id, i + 1) }
      val l = per.flatMap(_._2).sortBy { case (id, s) => (-s, id) }.take(poolK)
        .zipWithIndex.map { case ((id, _), i) => (id, i + 1) }
      Bm25.rrfFuseLocal(Seq(d, l), c, k)
    }

    def shutdown(): Unit = conns.foreach { case (_, out, s) =>
      try { out.writeByte(255); out.flush(); s.close() }
      catch { case _: Throwable => () }
    }

    def close(): Unit = conns.foreach { case (_, _, s) =>
      try s.close() catch { case _: Throwable => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_SERVE_REPL", "50").toInt
    val nShards = sys.env.getOrElse("SPARK_GRAFT_FLEET_SHARDS", "4").toInt
    val perThread = sys.env.getOrElse("SPARK_GRAFT_SERVE_REQS", "16").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_SERVE_LEVELS", "1,32")
      .split(",").map(_.trim.toInt).toSeq
    val spliceFile = sys.env.getOrElse("SPARK_GRAFT_FLEET_OUT",
      "SERVE_BENCH_10X.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- corpora, exactly the ServeBench shapes (disjoint-id replicas)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus0 = emb.where(col("vec_id") =!= 0)
    val stride = emb.agg(max("vec_id")).head().getLong(0) + 1
    val corpus = (0 until repl).map(i =>
        corpus0.withColumn("vec_id", col("vec_id") + lit(i * stride)))
      .reduce(_ unionByName _).localCheckpoint(true)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val dstride = docs0.agg(max("doc_id")).head().getLong(0) + 1
    val docsRepl = (0 until repl).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i * dstride)))
      .reduce(_ unionByName _).localCheckpoint(true)

    val postings = Bm25.buildPostings(docsRepl, "doc_id", "text")
      .localCheckpoint(true)
    val dstats = docsRepl
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum("dl"), count(lit(1))).head()
    val avgdl = dstats.getLong(0).toDouble / dstats.getLong(1).toDouble
    val dfMap = postings.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val idfMap = Bm25.idfByTerm(dfMap, dstats.getLong(1), spark)
    val sparseVecs = Sparse.tfVectors(docsRepl, "doc_id", "text")
      .localCheckpoint(true)

    // ---- collect once; shard driver-side; write the shard files
    val workDir = java.nio.file.Files.createTempDirectory("graft-fleet").toString
    val lexRows = postings
      .select(col("term"), col("doc_id").cast("long"), col("tf").cast("long"),
        col("dl").cast("long"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    val sparseRows = sparseVecs
      .select(col("term"), col("doc_id").cast("long"), col("w").cast("long"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
    val denseRows = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
    val dim = denseRows.head._2.length

    (0 until nShards).foreach { sh =>
      def dout(name: String) = new DataOutputStream(new BufferedOutputStream(
        new java.io.FileOutputStream(s"$workDir/${name}_shard_$sh.bin")))
      val lo = dout("lex")
      val lexSlice = lexRows.filter { case (_, (id, _, _)) =>
        ShardedAnnIndex.shardOf(id, nShards) == sh }
      require(lexSlice.nonEmpty, s"empty lex shard $sh")
      lo.writeDouble(avgdl)
      lo.writeInt(idfMap.size)
      idfMap.foreach { case (t, w) => lo.writeUTF(t); lo.writeDouble(w) }
      lo.writeInt(lexSlice.length)
      lexSlice.foreach { case (t, (id, tf, dl)) =>
        lo.writeUTF(t); lo.writeLong(id); lo.writeLong(tf); lo.writeLong(dl)
      }
      lo.close()
      val so = dout("sparse")
      val spSlice = sparseRows.filter { case (_, (id, _)) =>
        ShardedAnnIndex.shardOf(id, nShards) == sh }
      require(spSlice.nonEmpty, s"empty sparse shard $sh")
      so.writeInt(spSlice.length)
      spSlice.foreach { case (t, (id, w)) =>
        so.writeUTF(t); so.writeLong(id); so.writeLong(w)
      }
      so.close()
      val de = dout("dense")
      val dSlice = denseRows.filter { case (id, _) =>
        ShardedAnnIndex.shardOf(id, nShards) == sh }
      require(dSlice.nonEmpty, s"empty dense shard $sh")
      de.writeInt(dim)
      de.writeInt(dSlice.length)
      dSlice.foreach { case (id, v) => de.writeLong(id); v.foreach(de.writeFloat) }
      de.close()
    }

    // ---- in-process twins for the bit-identity cross-check
    val inLex = ShardedPostingsIndex.fromDataFrame(
      postings, "doc_id", idfMap, avgdl, nShards)
    val inSparse = ShardedSparseIndex.fromDataFrame(sparseVecs, "doc_id", nShards)
    val denseCents =
      graft.operators.Ann.sampleCentroids(corpus0, "vec_id", "embedding", 16)
    val inDense = graft.serve.ShardedAnnIndex.fromDataFrame(
      graft.operators.Ann.withIvfAssignment(corpus, "embedding", denseCents),
      "vec_id", "embedding", "ivf_cell", denseCents, nShards)
    val inHybrid = new ShardedHybridServer(inDense, inLex)

    // ---- workload, the ServeBench shapes
    val qvecs = corpus0.orderBy("vec_id").limit(64)
      .select("embedding").collect().map(_.getSeq[Float](0).toSeq).toIndexedSeq
    val termSets = IndexedSeq(Seq("dup", "vector", "query"),
      Seq("dup", "stream"), Seq("vector", "join", "fast"), Seq("scan", "hash"))
    val sparseQueries: IndexedSeq[Map[String, Long]] =
      termSets.map(_.zipWithIndex.map { case (t, i) => t -> (i + 1L) }.toMap)

    // ---- spawn the fleet: one JVM per shard, ephemeral ports via READY
    val cp = System.getProperty("java.class.path")
    val procs = (0 until nShards).map { sh =>
      val pb = new ProcessBuilder("java", "-Xmx2g", "-cp", cp,
        "graft.tools.FleetShardServer", workDir, sh.toString)
      pb.redirectErrorStream(true)
      pb.start()
    }
    val ports = try procs.map { p =>
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var line = br.readLine()
      while (line != null && !line.startsWith("READY ")) line = br.readLine()
      require(line != null, "shard server died before READY")
      // keep draining the pipe so the child never blocks on stdout
      val drainer = new Thread(() => {
        try { while (br.readLine() != null) () } catch { case _: Throwable => () }
      })
      drainer.setDaemon(true); drainer.start()
      line.drop("READY ".length).trim.toInt
    } catch { case e: Throwable => procs.foreach(_.destroyForcibly()); throw e }

    try {
      // ---- bit-identity cross-check: fleet == in-process, score BITS
      val check = new FleetClient(ports)
      try {
        (0 until 8).foreach { i =>
          val terms = termSets(i % termSets.size)
          val qv = qvecs(i % qvecs.size)
          val fd = check.dense(qv, 5)
          val idn = inDense.topK(qv, 5)
          require(fd.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) } ==
            idn.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) },
            s"fleet dense != in-process: $fd vs $idn")
          val fl = check.lex(terms, 5)
          val il = inLex.search(terms, 5)
          require(fl.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) } ==
            il.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) },
            s"fleet lex != in-process for $terms: $fl vs $il")
          val fs = check.sparse(sparseQueries(i % sparseQueries.size), 5)
          val is = inSparse.topKWand(sparseQueries(i % sparseQueries.size), 5)
          require(fs == is, s"fleet sparse != in-process: $fs vs $is")
          val fh = check.hybrid(qv, terms, 10, poolK = 20)
          val ih = inHybrid.searchHybrid(qv, terms, 10, poolK = 20)
          require(fh.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) } ==
            ih.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) },
            s"fleet hybrid != in-process: $fh vs $ih")
        }
      } finally check.close()
      println(s"[fleet] bit-identity cross-check passed over ${ports.size} shard processes")

      // ---- the battery
      final case class Level(requests: Int, failed: Int, p50: Double,
                             p95: Double, mean: Double, qps: Double, wall: Double)
      def runLevel(fire: (FleetClient, Int) => Unit, n: Int): Level = {
        val reqs = perThread * 64
        val lat = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
        val failures = new java.util.concurrent.atomic.AtomicInteger(0)
        val clients = (0 until n).map(_ => new FleetClient(ports))
        try {
          (0 until 4).foreach(i => fire(clients.head, i)) // warm
          val t0 = System.nanoTime()
          val threads = clients.zipWithIndex.map { case (cl, t) =>
            val th = new Thread(() => {
              var i = 0
              while (i < reqs) {
                val s = System.nanoTime()
                try { fire(cl, t * 7 + i); lat.add((System.nanoTime() - s) / 1e6) }
                catch { case e: Throwable =>
                  failures.incrementAndGet()
                  System.err.println(s"[fleet] t$t req$i FAILED: ${e.getMessage}")
                }
                i += 1
              }
            })
            th.start(); th
          }
          threads.foreach(_.join())
          val wall = (System.nanoTime() - t0) / 1e9
          val ls = lat.asScala.toIndexedSeq.sorted
          // an all-failed level (a shard died mid-run) must report as a
          // failed row, not crash the bench on pct(empty)/0-division
          if (ls.isEmpty) Level(0, failures.get(), 0.0, 0.0, 0.0, 0.0, wall)
          else Level(ls.size, failures.get(), pct(ls, 0.50), pct(ls, 0.95),
            ls.sum / ls.size, ls.size / wall, wall)
        } finally clients.foreach(_.close())
      }

      val paths: Seq[(String, (FleetClient, Int) => Unit)] = Seq(
        "fleet_dense" -> { (cl, qi) =>
          val n = cl.dense(qvecs(qi % qvecs.size), 10).length
          require(n == 10, s"fleet_dense returned $n rows")
        },
        "fleet_lex" -> { (cl, qi) =>
          val n = cl.lex(termSets(qi % termSets.size), 5).length
          require(n == 5, s"fleet_lex returned $n rows")
        },
        "fleet_sparse" -> { (cl, qi) =>
          val n = cl.sparse(sparseQueries(qi % sparseQueries.size), 5).length
          require(n == 5, s"fleet_sparse returned $n rows")
        },
        "fleet_hybrid" -> { (cl, qi) =>
          val n = cl.hybrid(qvecs(qi % qvecs.size),
            termSets(qi % termSets.size), 10, poolK = 20).length
          require(n == 10, s"fleet_hybrid returned $n rows")
        })

      // two temporally-separated passes, lower p50 wins (host-stall rule)
      val cells = for { (pname, fire) <- paths; n <- levels } yield (pname, fire, n)
      val pass1 = cells.map { case (_, f, n) => runLevel(f, n) }
      val pass2 = cells.map { case (_, f, n) => runLevel(f, n) }
      val results = cells.zip(pass1.zip(pass2)).map { case ((pname, _, n), (a, b)) =>
        val r = if (a.failed == b.failed) { if (a.p50 <= b.p50) a else b }
                else if (a.failed < b.failed) a else b
        f"""{"path":"$pname","concurrency":$n,"requests":${r.requests},"failed":${r.failed},"p50_ms":${r.p50}%.1f,"p95_ms":${r.p95}%.1f,"mean_ms":${r.mean}%.1f,"qps":${r.qps}%.1f,"wall_s":${r.wall}%.2f}"""
      }

      val line =
        s"""{"metric":"fleet_bench","sf":"$sfDir","replicas":$repl,"shards":$nShards,"dense_docs":${denseRows.length},"lex_docs":${dstats.getLong(1)},"dim":$dim,"cpus":$cpus,"results":[${results.mkString(",")}]}"""
      println(line)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("FLEET_BENCH.json"), line + "\n")
      catch { case _: Throwable => () }
      // splice the fleet rows into the serving battery file next to the
      // per-shard projection rows they were built to test
      val spliceTo = java.nio.file.Paths.get(spliceFile)
      if (java.nio.file.Files.exists(spliceTo)) {
        val prev = java.nio.file.Files.readString(spliceTo).trim
        val prevCells = JsonSplice.elementsOf(
          JsonSplice.member(prev, "results")
            .getOrElse(sys.error(s"$spliceFile has no results member")))
        def pathOf(cell: String): String = JsonSplice.member(cell, "path")
          .getOrElse("").stripPrefix("\"").stripSuffix("\"")
        val kept = prevCells.filterNot(c => pathOf(c).startsWith("fleet_"))
        val merged = JsonSplice.emitObject(JsonSplice.membersOf(prev).map {
          case ("results", _) =>
            "results" -> JsonSplice.emitArray(kept ++ results)
          case kv => kv
        })
        java.nio.file.Files.writeString(spliceTo, merged + "\n")
        println(s"[fleet] spliced ${results.size} rows into $spliceFile")
      }

      // orderly fleet shutdown
      val bye = new FleetClient(ports)
      bye.shutdown()
    } finally {
      procs.foreach { p =>
        if (!p.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
          p.destroyForcibly(): Unit
      }
    }
    spark.stop()
  }
}
