package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.serve.{FleetCoordinator, FleetDoor}

/** The promoted control plane (FleetCoordinator class doc): the
  * kill → auto-redial → recovery cycle and the republish orchestration
  * that used to live inside FleetBench, proven here with NO bench
  * involvement — a deployment that starts the coordinator gets the
  * measured semantics.
  */
class FleetCoordinatorSpec extends AnyFunSuite {

  private val shardA = Seq((1L, 0.9), (3L, 0.7), (5L, 0.5))
  private val shardB = Seq((2L, 0.8), (4L, 0.7), (6L, 0.4))

  private def awaitUntil(ms: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + ms * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  test("kill -> auto-redial -> recovery, driven by the health loop alone") {
    val a = new FleetStubShard(shardA)
    val b = new FleetStubShard(shardB)
    val bPort = b.port
    val door = new FleetDoor(Seq(a.port, bPort), poolSize = 2, timeoutMs = 500)
    val coord = new FleetCoordinator(Seq(a.port, bPort), door = Some(door),
      timeoutMs = 500, checkIntervalMs = 50, backoffBaseMs = 50,
      backoffMaxMs = 400).start()
    try {
      (0 until 2).foreach(_ => door.withClient(_.dense(Seq(0.1f), 4)): Unit)
      b.kill()
      // both pooled clients discover the death; requests stay partial
      (0 until 2).foreach { _ =>
        assert(door.withClient(_.dense(Seq(0.1f), 4)) == shardA)
      }
      assert(door.anyDead(1))
      // the loop probes (and fails) with backoff while the shard is down
      assert(awaitUntil(2000)(coord.redialAttempts > 0),
        "health loop never probed the dead shard")
      val attemptsWhileDown = coord.redialAttempts
      Thread.sleep(300)
      // backoff caps the probe rate: 300 ms at base 50 doubling can add
      // only a few attempts, not a hot loop's thousands
      assert(coord.redialAttempts - attemptsWhileDown < 10,
        s"backoff broken: ${coord.redialAttempts - attemptsWhileDown} probes in 300 ms")
      // a replacement binds the same port: the loop redials the control
      // plane, heals the pool, and the door's merge is whole again
      val b2 = new FleetStubShard(Seq((2L, 0.85)), port0 = bPort)
      try {
        assert(awaitUntil(3000)(coord.recoveryCount > 0 && !door.anyDead(1)),
          "coordinator never recovered the shard")
        assert(door.minLiveShards == 2)
        assert(coord.liveShards == 2)
        assert(door.withClient(_.dense(Seq(0.1f), 2)) ==
          Seq((1L, 0.9), (2L, 0.85)))
      } finally b2.kill()
    } finally { coord.close(); door.close(); a.kill() }
  }

  test("republish orchestration: staggered reloads every shard once, parallel within max-reload window") {
    val a = new FleetStubShard(shardA)
    val b = new FleetStubShard(shardB)
    val coord = new FleetCoordinator(Seq(a.port, b.port), timeoutMs = 2000)
    try {
      val perShard = coord.republishStaggered()
      assert(perShard.length == 2)
      assert(a.reloadsServed == 1 && b.reloadsServed == 1,
        s"staggered republish reload counts: ${a.reloadsServed}/${b.reloadsServed}")
      val window = coord.republishParallel()
      assert(a.reloadsServed == 2 && b.reloadsServed == 2)
      assert(window < 2000, f"parallel republish window $window%.0f ms")
    } finally { coord.close(); a.kill(); b.kill() }
  }

  test("deadShards surfaces control-plane degradation without a door") {
    val a = new FleetStubShard(shardA)
    val b = new FleetStubShard(shardB)
    val coord = new FleetCoordinator(Seq(a.port, b.port), timeoutMs = 300,
      checkIntervalMs = 50, backoffBaseMs = 50)
    try {
      assert(coord.deadShards.isEmpty)
      b.kill()
      // the control plane hasn't touched the shard since the kill — a
      // tick's redial probe against the closed port discovers it...
      // but only once something MARKS it. Mark via a failed reload.
      intercept[Throwable] { coord.republishStaggered(reloadTimeoutMs = 300) }
      assert(coord.deadShards.contains(1))
      assert(coord.liveShards == 1)
    } finally { coord.close(); a.kill(); b.kill() }
  }
}
