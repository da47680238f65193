package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket

import org.scalatest.funsuite.AnyFunSuite

import graft.serve.{FleetClient, FleetProtocol, FleetTier}

/** The fleet client's PINNED failure semantics (FleetClient class doc):
  * partial results over live shards, mark-dead on timeout/reset, never a
  * hang, failure only when NO shard answers. Stub shard servers here
  * speak just enough of the protocol to exercise each failure mode —
  * including the one a real kill cannot reproduce deterministically: a
  * shard that ACCEPTS the request and never replies (the round-14
  * client's block-forever case).
  */
class FleetClientSpec extends AnyFunSuite {

  /** A stub shard: replies to OpDense with a fixed k-truncated hit list.
    * `hangAfter` = serve that many requests normally, then go silent
    * (socket stays open — only a read timeout can unblock the client).
    */
  private final class StubShard(hits: Seq[(Long, Double)],
                                hangAfter: Int = Int.MaxValue,
                                port0: Int = 0) {
    private val ss = new ServerSocket(port0)
    private val accepted =
      java.util.Collections.synchronizedList(new java.util.ArrayList[java.net.Socket]())
    @volatile private var served = 0
    def port: Int = ss.getLocalPort
    def requestsServed: Int = served

    private val acceptor = new Thread(() => {
      try {
        while (true) {
          val sock = ss.accept()
          accepted.add(sock)
          val th = new Thread(() => {
            try {
              sock.setTcpNoDelay(true)
              val in = new DataInputStream(
                new BufferedInputStream(sock.getInputStream))
              val out = new DataOutputStream(
                new BufferedOutputStream(sock.getOutputStream))
              while (true) {
                val op = in.readUnsignedByte()
                assert(op == FleetProtocol.OpDense, s"stub got op $op")
                val k = in.readInt()
                val n = in.readInt()
                (0 until n).foreach(_ => in.readFloat())
                if (served >= hangAfter) {
                  while (true) Thread.sleep(20) // silent: never replies
                }
                served += 1
                val give = hits.sortBy { case (id, s) => (-s, id) }.take(k)
                out.writeInt(give.length)
                give.foreach { case (id, s) =>
                  out.writeLong(id); out.writeDouble(s)
                }
                out.flush()
              }
            } catch { case _: Throwable => () }
          })
          th.setDaemon(true)
          th.start()
        }
      } catch { case _: Throwable => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    /** The kill: close the listener AND every accepted connection — the
      * client sees resets, like a SIGKILLed shard process.
      */
    def kill(): Unit = {
      try ss.close() catch { case _: Throwable => () }
      accepted.forEach(s => try s.close() catch { case _: Throwable => () })
    }
  }

  private val shardA = Seq((1L, 0.9), (3L, 0.7), (5L, 0.5))
  private val shardB = Seq((2L, 0.8), (4L, 0.7), (6L, 0.4))

  test("fan-out merges disjoint shard slices under (score DESC, id ASC)") {
    val a = new StubShard(shardA)
    val b = new StubShard(shardB)
    val cl = new FleetClient(Seq(a.port, b.port), timeoutMs = 2000)
    try {
      assert(cl.dense(Seq(0.1f, 0.2f), 4) ==
        Seq((1L, 0.9), (2L, 0.8), (3L, 0.7), (4L, 0.7)))
      assert(cl.liveShards == 2)
    } finally { cl.close(); a.kill(); b.kill() }
  }

  test("a killed shard degrades to exact partial results — no hang, no failed request") {
    val a = new StubShard(shardA)
    val b = new StubShard(shardB)
    val cl = new FleetClient(Seq(a.port, b.port), timeoutMs = 1000)
    try {
      assert(cl.dense(Seq(0.1f), 3).length == 3)
      b.kill()
      // the request that DISCOVERS the death already serves partial:
      // exactly shard A's top-k, in order — not an error, not a hang
      val t0 = System.nanoTime()
      val got = cl.dense(Seq(0.1f), 3)
      val ms = (System.nanoTime() - t0) / 1e6
      assert(got == shardA.take(3), s"degraded merge wrong: $got")
      assert(cl.liveShards == 1)
      assert(ms < 5000, f"degraded request took $ms%.0f ms")
      // subsequent requests skip the dead shard entirely
      assert(cl.dense(Seq(0.2f), 2) == shardA.take(2))
      assert(cl.liveShards == 1)
    } finally { cl.close(); a.kill() }
  }

  test("a HUNG shard (accepts, never replies) is bounded by the read timeout") {
    val a = new StubShard(shardA)
    val b = new StubShard(shardB, hangAfter = 1) // first request ok, then silent
    val cl = new FleetClient(Seq(a.port, b.port), timeoutMs = 300)
    try {
      assert(cl.dense(Seq(0.1f), 2).length == 2) // both alive
      val t0 = System.nanoTime()
      val got = cl.dense(Seq(0.1f), 3) // B hangs: timeout → mark dead
      val ms = (System.nanoTime() - t0) / 1e6
      assert(got == shardA.take(3), s"post-timeout merge wrong: $got")
      assert(cl.liveShards == 1)
      assert(ms >= 250 && ms < 5000,
        f"expected ~one 300 ms timeout, took $ms%.0f ms")
    } finally { cl.close(); a.kill(); b.kill() }
  }

  test("redial: a replacement shard on the same address rejoins the fan-out") {
    val a = new StubShard(shardA)
    val b = new StubShard(shardB)
    val bPort = b.port
    val cl = new FleetClient(Seq(a.port, bPort), timeoutMs = 1000)
    try {
      assert(cl.dense(Seq(0.1f), 4).length == 4)
      b.kill()
      assert(cl.dense(Seq(0.1f), 4) == shardA.take(4)) // degraded
      assert(cl.liveShards == 1)
      // nothing listening yet: redial fails, client stays degraded
      assert(!cl.redial(1))
      assert(cl.liveShards == 1)
      assert(cl.dense(Seq(0.1f), 2) == shardA.take(2))
      // a REPLACEMENT process binds the same port (new corpus slice —
      // the failover replica); redial succeeds and the merge is whole
      val b2 = new StubShard(Seq((2L, 0.85), (4L, 0.6)), port0 = bPort)
      try {
        assert(cl.redial(1))
        assert(cl.liveShards == 2)
        assert(cl.dense(Seq(0.1f), 3) ==
          Seq((1L, 0.9), (2L, 0.85), (3L, 0.7)))
      } finally b2.kill()
    } finally { cl.close(); a.kill() }
  }

  test("all shards dead → the request fails loudly (no corpus left)") {
    val a = new StubShard(shardA)
    val cl = new FleetClient(Seq(a.port), timeoutMs = 300)
    try {
      assert(cl.dense(Seq(0.1f), 2).length == 2)
      a.kill()
      intercept[IllegalStateException] { cl.dense(Seq(0.1f), 2) }
      assert(cl.liveShards == 0)
      intercept[IllegalStateException] { cl.dense(Seq(0.1f), 2) }
    } finally cl.close()
  }

  test("FleetTier coverage: unfiltered only — a filter routes to the door's fallback") {
    val a = new StubShard(shardA)
    val cl = new FleetClient(Seq(a.port), timeoutMs = 1000)
    try {
      val tier = new FleetTier(cl)
      assert(tier.servesExactDense)
      assert(tier.tryParseFilter(null).contains(Seq(Nil)))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree("""{"@gte":{"vec_id":0}}""")
      assert(tier.tryParseFilter(node).isEmpty,
        "a filtered request must read as uncovered on the fleet tier")
      assert(tier.tryParseFilter(mapper.readTree("""{"f":null}""").get("f"))
        .contains(Seq(Nil))) // explicit JSON null = no filter
      assert(tier.topKVecDnf(Seq(0.1f), 2, Seq(Nil)) == shardA.take(2))
      intercept[IllegalArgumentException] {
        tier.topKVecDnf(Seq(0.1f), 2,
          Seq(Seq(graft.serve.MetaFilter("x", 0L, 1L))))
      }
    } finally { cl.close(); a.kill() }
  }
}
