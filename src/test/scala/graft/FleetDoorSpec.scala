package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.serve.{FleetClient, FleetDoor}

/** The pooled fleet door's contract (FleetDoor class doc): a bounded
  * pool of per-request-exclusive clients makes the door thread-safe
  * without touching [[FleetClient]]'s not-thread-safe internals —
  * hammered from 32 threads with bit-identity against a solo client,
  * bounded checkout (shed, not queue), and idle-heal.
  */
class FleetDoorSpec extends AnyFunSuite {

  private val shardA = Seq((1L, 0.9), (3L, 0.7), (5L, 0.5))
  private val shardB = Seq((2L, 0.8), (4L, 0.7), (6L, 0.4))

  test("32 threads through a 4-client pool: every answer bit-identical to a solo client") {
    val a = new FleetStubShard(shardA)
    val b = new FleetStubShard(shardB)
    val door = new FleetDoor(Seq(a.port, b.port), poolSize = 4,
      timeoutMs = 2000)
    val solo = new FleetClient(Seq(a.port, b.port), timeoutMs = 2000)
    try {
      val expect = solo.dense(Seq(0.1f, 0.2f), 4)
        .map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) }
      val bad = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 32).map { t =>
        val th = new Thread(() => {
          var i = 0
          while (i < 50) {
            val got = door.withClient(_.dense(Seq(0.1f, 0.2f), 4))
              .map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) }
            if (got != expect) bad.incrementAndGet(): Unit
            i += 1
          }
        })
        th.start(); th
      }
      threads.foreach(_.join())
      assert(bad.get() == 0, s"${bad.get()} of 1600 pooled answers drifted")
    } finally { door.close(); solo.close(); a.kill(); b.kill() }
  }

  test("checkout is bounded: a exhausted pool sheds within the checkout timeout") {
    val a = new FleetStubShard(shardA)
    val door = new FleetDoor(Seq(a.port), poolSize = 1,
      timeoutMs = 2000, checkoutTimeoutMs = 200)
    try {
      val holding = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => {
        door.withClient { _ => holding.countDown(); release.await() }: Unit
      })
      holder.start()
      holding.await()
      val t0 = System.nanoTime()
      val e = intercept[IllegalStateException] {
        door.withClient(_.dense(Seq(0.1f), 1))
      }
      val ms = (System.nanoTime() - t0) / 1e6
      assert(e.getMessage.contains("shed"), e.getMessage)
      assert(ms >= 150 && ms < 2000, f"checkout shed took $ms%.0f ms")
      release.countDown()
      holder.join()
      // the held client is back: the next request serves
      assert(door.withClient(_.dense(Seq(0.1f), 2)) == shardA.take(2))
    } finally { door.close(); a.kill() }
  }

  test("healIdle mends every idle client after a shard comes back") {
    val a = new FleetStubShard(shardA)
    val b = new FleetStubShard(shardB)
    val bPort = b.port
    val door = new FleetDoor(Seq(a.port, bPort), poolSize = 3,
      timeoutMs = 500)
    try {
      // warm every pooled client so each has touched both shards
      (0 until 3).foreach(_ => door.withClient(_.dense(Seq(0.1f), 4)): Unit)
      b.kill()
      // sequential checkouts cycle the FIFO pool: three degraded
      // requests make every client discover the death (each still
      // serves shard A's exact partial — the FleetClient doctrine)
      (0 until 3).foreach { _ =>
        assert(door.withClient(_.dense(Seq(0.1f), 4)) == shardA)
      }
      assert(door.anyDead(1), "no pooled client marked the dead shard")
      assert(door.minLiveShards == 1)
      val b2 = new FleetStubShard(Seq((2L, 0.85)), port0 = bPort)
      try {
        val healed = door.healIdle(1)
        assert(healed >= 1, "healIdle mended nothing")
        assert(!door.anyDead(1), "a pooled client still has the shard dead")
        assert(door.minLiveShards == 2)
        assert(door.withClient(_.dense(Seq(0.1f), 2)) ==
          Seq((1L, 0.9), (2L, 0.85)))
      } finally b2.kill()
    } finally { door.close(); a.kill() }
  }
}
