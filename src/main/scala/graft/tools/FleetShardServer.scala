package graft.tools

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}

import graft.serve.{FleetProtocol, MemoryAnnIndex, MemoryPostingsIndex, MemorySparseIndex}

/** ONE shard of the serving fleet, as a real separate process — the
  * r13 verdict's ask: the in-process `Sharded*Index` rows measure merge
  * correctness, not deployment (shards walk sequentially on shared
  * cores, no RPC hop, no serialization); this server makes the fleet
  * projection a measurement. [[FleetBench]] spawns N of these (plain
  * JVMs, no Spark — the shard slices arrive as flat binary files the
  * parent wrote), fans every query out over persistent TCP connections, and
  * merges k-bounded responses — so the measured latency INCLUDES
  * serialization, the socket hop, and the max-over-shards tail.
  *
  * Protocol: [[graft.serve.FleetProtocol]] — the ONE opcode definition
  * this server shares with [[graft.serve.FleetClient]]. Per-shard work is
  * EXACTLY what the in-process shard objects do (same index classes, same
  * WAND walks), so fleet results stay bit-identical to the in-process
  * fan-out — FleetBench cross-checks that during warm-up.
  *
  * RELOAD (`OpReload`): the shard re-reads its three index files from the
  * work dir and swaps the serving snapshot atomically (one volatile
  * store) — the shard half of the fleet republish protocol. Requests on
  * OTHER connections keep serving throughout (each request reads the
  * snapshot once); the ack goes out AFTER the swap, so the coordinator's
  * ack receipt IS this shard's cutover instant.
  *
  * Usage: java -cp <classes+scala> graft.tools.FleetShardServer <workDir> <shardId> [port]
  * Binds `port` (or an ephemeral one when absent/0 — the first-launch
  * default) and prints "READY <port>" on stdout. A REPLACEMENT process
  * for a dead shard passes the dead shard's port explicitly, so the
  * coordinator's redial finds it at the address it already knows — the
  * failover contract FleetClientSpec pins with stub shards, here for
  * real processes (the churn row exercises it).
  */
object FleetShardServer {

  def loadLex(path: String): (MemoryPostingsIndex, Map[String, Double]) = {
    val in = new DataInputStream(new BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      val avgdl = in.readDouble()
      val nIdf = in.readInt()
      val idf = (0 until nIdf).map(_ => in.readUTF() -> in.readDouble()).toMap
      val nRows = in.readInt()
      val rows = Array.fill(nRows)(
        (in.readUTF(), (in.readLong(), in.readLong(), in.readLong())))
      (MemoryPostingsIndex.fromRows(rows, idf, avgdl), idf)
    } finally in.close()
  }

  def loadSparse(path: String): MemorySparseIndex = {
    val in = new DataInputStream(new BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      val nRows = in.readInt()
      val rows = Array.fill(nRows)((in.readUTF(), (in.readLong(), in.readLong())))
      MemorySparseIndex.fromRows(rows)
    } finally in.close()
  }

  def loadDense(path: String): MemoryAnnIndex = {
    val in = new DataInputStream(new BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      val dim = in.readInt()
      val n = in.readInt()
      val rows = (0 until n).map { _ =>
        val id = in.readLong()
        val v = Array.fill(dim)(in.readFloat()).toSeq
        (id, v, 0) // single cell: the flat exact scan (topK scans all cells)
      }
      MemoryAnnIndex.fromRows(rows, centroids = Seq(rows.head._2))
    } finally in.close()
  }

  /** The immutable serving snapshot one reload swaps wholesale. */
  private final case class Indexes(lex: MemoryPostingsIndex,
                                   sparse: MemorySparseIndex,
                                   dense: MemoryAnnIndex)

  def main(args: Array[String]): Unit = {
    import FleetProtocol._
    val Array(workDir, shardIdS) = args.take(2)
    val shardId = shardIdS.toInt
    def loadAll(): Indexes = Indexes(
      loadLex(s"$workDir/lex_shard_$shardId.bin")._1,
      loadSparse(s"$workDir/sparse_shard_$shardId.bin"),
      loadDense(s"$workDir/dense_shard_$shardId.bin"))
    // the serving snapshot: requests read it ONCE per frame; OpReload
    // swaps it with a single volatile store (readers mid-request keep
    // the old immutable snapshot — the ServingIndex rule)
    @volatile var indexes: Indexes = loadAll()
    val port0 = if (args.length >= 3) args(2).toInt else 0
    val ss = new ServerSocket(port0, 128)
    // the parent parses this line for the ephemeral port
    println(s"READY ${ss.getLocalPort}")
    System.out.flush()

    def writeList(out: DataOutputStream, xs: Seq[(Long, Double)]): Unit = {
      out.writeInt(xs.length)
      xs.foreach { case (id, s) => out.writeLong(id); out.writeDouble(s) }
    }

    def serve(sock: Socket): Unit = {
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      try {
        while (true) {
          val op = in.readUnsignedByte()
          val idx = indexes
          op match {
            case OpLex =>
              val k = in.readInt()
              val terms = Seq.fill(in.readInt())(in.readUTF())
              writeList(out, idx.lex.searchWand(terms, k))
            case OpSparse =>
              val k = in.readInt()
              val q = Seq.fill(in.readInt())(in.readUTF() -> in.readLong()).toMap
              val hits = idx.sparse.topKWand(q, k)
              out.writeInt(hits.length)
              hits.foreach { case (id, s) => out.writeLong(id); out.writeLong(s) }
            case OpDense =>
              val k = in.readInt()
              val qv = Seq.fill(in.readInt())(in.readFloat())
              writeList(out, idx.dense.topK(qv, k))
            case OpHybrid =>
              val poolK = in.readInt()
              val qv = Seq.fill(in.readInt())(in.readFloat())
              val terms = Seq.fill(in.readInt())(in.readUTF())
              writeList(out, idx.dense.topK(qv, poolK))
              writeList(out, idx.lex.searchWand(terms, poolK))
            case OpReload =>
              // load FIRST, swap, then ack: the ack is the cutover
              indexes = loadAll()
              out.writeByte(1)
            case OpShutdown =>
              out.flush(); sock.close(); System.exit(0)
            case other =>
              throw new IllegalStateException(s"unknown op $other")
          }
          out.flush()
        }
      } catch {
        case _: EOFException => sock.close() // client hung up: done
        case e: java.net.SocketException =>
          sock.close()
          System.err.println(s"[shard $shardId] ${e.getMessage}")
        case scala.util.control.NonFatal(e) =>
          // protocol desync (unknown op, mid-frame read): CLOSE the
          // socket so the client fails loudly on its next read instead
          // of blocking forever on a dead serve thread.
          try sock.close() catch { case scala.util.control.NonFatal(_) => () }
          System.err.println(s"[shard $shardId] serve thread died: $e")
        case fatal: Throwable =>
          // FATAL JVM error (OOM, stack overflow): an uncaught Error on
          // a serve THREAD only kills that thread — the JVM would keep
          // serving other connections from a possibly corrupted heap,
          // and this connection's open socket would block the client to
          // its read timeout (ADVICE r15). halt(1) kills the PROCESS
          // (no finalizers/hooks that could touch the bad heap); the OS
          // closes every socket, so all clients fail fast and the
          // coordinator's redial/backoff takes over.
          System.err.println(s"[shard $shardId] FATAL, halting: $fatal")
          Runtime.getRuntime.halt(1)
      }
    }

    while (true) {
      val sock = ss.accept()
      val t = new Thread(() => serve(sock))
      t.setDaemon(true)
      t.start()
    }
  }
}
