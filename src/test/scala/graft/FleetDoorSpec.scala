package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket

import graft.api.SemanticSearch
import graft.embed.HashingTfEmbedder
import graft.serve.{FleetClient, FleetProtocol, FleetTier, MemoryAnnIndex, MemoryServer, ShardedAnnIndex}

/** The COMPOSED serving door, pinned in the suite (FleetBench requires it
  * at warm-up too, but against live shard processes — this spec proves
  * the same structural fact offline): the SAME `SemanticSearch` front
  * door over a [[FleetTier]] (requests fan out over sockets to shard
  * servers holding disjoint slices) returns byte-identical JSON responses
  * to the door over an in-process [[MemoryServer]] on the full corpus,
  * and routes filtered requests to the SAME fallback decision.
  */
class FleetDoorSpec extends SparkSpec {
  import spark.implicits._

  // a tiny deterministic corpus: 24 vectors, dim 8
  private lazy val rows: Seq[(Long, Seq[Float])] = (1L to 24L).map { i =>
    i -> (0 until 8).map(j => ((i * 7 + j * 3) % 11).toFloat / 11.0f)
  }

  /** A stub shard server speaking the dense opcode, backed by a REAL
    * [[MemoryAnnIndex]] over its slice — so scores are the engine's own
    * fold, and the fan-out merge must land on the monolithic scan's bits.
    */
  private final class Shard(slice: Seq[(Long, Seq[Float])]) {
    private val idx = MemoryAnnIndex.fromRows(
      slice.map { case (id, v) => (id, v, 0) }, centroids = Seq(slice.head._2))
    private val ss = new ServerSocket(0)
    def port: Int = ss.getLocalPort
    private val t = new Thread(() => {
      try {
        while (true) {
          val sock = ss.accept()
          val th = new Thread(() => {
            try {
              val in = new DataInputStream(
                new BufferedInputStream(sock.getInputStream))
              val out = new DataOutputStream(
                new BufferedOutputStream(sock.getOutputStream))
              while (true) {
                assert(in.readUnsignedByte() == FleetProtocol.OpDense)
                val k = in.readInt()
                val qv = Seq.fill(in.readInt())(in.readFloat())
                val hits = idx.topK(qv, k)
                out.writeInt(hits.length)
                hits.foreach { case (id, s) =>
                  out.writeLong(id); out.writeDouble(s)
                }
                out.flush()
              }
            } catch { case _: Throwable => () }
          })
          th.setDaemon(true); th.start()
        }
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    def stop(): Unit = try ss.close() catch { case _: Throwable => () }
  }

  test("door over the fleet ≡ door over memory: response bytes, route decisions") {
    val nShards = 3
    val shards = (0 until nShards).map(sh =>
      new Shard(rows.filter { case (id, _) =>
        ShardedAnnIndex.shardOf(id, nShards) == sh }))
    val cl = new FleetClient(shards.map(_.port), timeoutMs = 2000)
    try {
      val df = rows.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
      val fleetDoor = new SemanticSearch(df, HashingTfEmbedder(8),
        idCol = "vec_id", textCol = "vec_id", embCol = "embedding",
        memory = Some(new FleetTier(cl)))
      val memDoor = new SemanticSearch(df, HashingTfEmbedder(8),
        idCol = "vec_id", textCol = "vec_id", embCol = "embedding",
        memory = Some(new MemoryServer(MemoryAnnIndex.fromRows(
          rows.map { case (id, v) => (id, v, 0) },
          centroids = Seq(rows.head._2)), None)))
      rows.take(5).foreach { case (_, qv) =>
        val req =
          s"""{"query_vector":[${qv.mkString(",")}],"columns":["vec_id"],"limit":4}"""
        // covered on BOTH doors; responses byte-identical
        val (fdf, fCov) = fleetDoor.searchRouted(req)
        val (mdf, mCov) = memDoor.searchRouted(req)
        assert(fCov && mCov, "unfiltered request must be covered on both tiers")
        assert(fleetDoor.searchResponseJson(req) == memDoor.searchResponseJson(req))
        assert(fdf.collect().toSeq == mdf.collect().toSeq)
        // a filter the fleet protocol cannot ship: uncovered there; the
        // memory tier can't serve it either (vec_id is the id, not a
        // loaded metadata column) — SAME fallback decision, and the
        // fallback frames agree (both are the exact Spark scan)
        val freq =
          s"""{"query_vector":[${qv.mkString(",")}],"columns":["vec_id"],"limit":4,"filter":{"@gte":{"vec_id":0}}}"""
        val (ff, fc) = fleetDoor.searchRouted(freq)
        val (mf, mc) = memDoor.searchRouted(freq)
        assert(!fc && !mc, "filtered request must fall back on both doors")
        assert(ff.collect().toSeq == mf.collect().toSeq)
      }
      // k=0 serves empty, job-free, on the fleet tier too
      val (z, zc) = fleetDoor.searchRouted(
        s"""{"query_vector":[${rows.head._2.mkString(",")}],"columns":["vec_id"],"limit":0}""")
      assert(zc && z.collect().isEmpty)
    } finally { cl.close(); shards.foreach(_.stop()) }
  }
}
