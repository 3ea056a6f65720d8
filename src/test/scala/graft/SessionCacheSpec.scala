package graft

/** Lifecycle pins for [[graft.plans.SessionCache]] (ADVICE r15) — the
  * one device behind every build-once-serve-many materialization.
  */
class SessionCacheSpec extends SparkSpec {

  test("compute-once: concurrent first users share ONE build per key") {
    val cache = new graft.plans.SessionCache[String]
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val ready = new java.util.concurrent.CyclicBarrier(8)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        ready.await()
        results.add(cache.getOrElseUpdate(spark, "dirA") {
          builds.incrementAndGet()
          Thread.sleep(50) // widen the race window
          "built"
        })
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get() === 1,
      "eight concurrent first users must run the expensive build exactly once")
    assert(results.size === 8 && results.toArray.forall(_ == "built"))
  }

  test("keys are independent; clear() drops session entries") {
    val cache = new graft.plans.SessionCache[Int]
    var n = 0
    def build(): Int = { n += 1; n }
    assert(cache.getOrElseUpdate(spark, "a")(build()) === 1)
    assert(cache.getOrElseUpdate(spark, "b")(build()) === 2, "distinct key -> own build")
    assert(cache.getOrElseUpdate(spark, "a")(build()) === 1, "hit serves the cached value")
    cache.clear()
    assert(cache.getOrElseUpdate(spark, "a")(build()) === 3, "clear() forces a rebuild")
  }

  test("a failed build is not cached as poison") {
    // the lazy-thunk slot retries: a transient failure on first use
    // must not wedge the key for the session's lifetime
    val cache = new graft.plans.SessionCache[String]
    var attempts = 0
    def flaky(): String = {
      attempts += 1
      if (attempts == 1) throw new RuntimeException("transient")
      "ok"
    }
    intercept[RuntimeException] { cache.getOrElseUpdate(spark, "k")(flaky()) }
    assert(cache.getOrElseUpdate(spark, "k")(flaky()) === "ok",
      "the key must be retryable after a failed build")
  }
}
