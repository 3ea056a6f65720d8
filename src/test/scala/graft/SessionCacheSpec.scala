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

  test("after a failed build the RETRYING caller's build runs, not the original closure") {
    // ADVICE r16: a failed thunk un-installs itself, so the retry uses
    // the new call site's build — not a replay of the dead closure
    val cache = new graft.plans.SessionCache[String]
    intercept[RuntimeException] {
      cache.getOrElseUpdate(spark, "k")(throw new RuntimeException("boom"))
    }
    assert(cache.getOrElseUpdate(spark, "k")("second") === "second")
  }

  test("first-build-wins: a later different build for a built key is ignored") {
    val cache = new graft.plans.SessionCache[String]
    assert(cache.getOrElseUpdate(spark, "k")("first") === "first")
    assert(cache.getOrElseUpdate(spark, "k")("other") === "first",
      "the documented contract: keys identify the build")
  }

  test("entries of a collected session are released (no session pinning)") {
    // ADVICE r16: the r16 WeakHashMap never evicted because values
    // strongly referenced their key session. The token-keyed design
    // must release a discarded session's entries on the next access.
    val cache = new graft.plans.SessionCache[Array[Byte]]
    var child: org.apache.spark.sql.SparkSession = spark.newSession()
    val ref = new java.lang.ref.WeakReference(child)
    cache.getOrElseUpdate(child, "k")(new Array[Byte](1 << 20))
    assert(cache.liveSessions === 1)
    child = null
    val deadline = System.nanoTime + 10000000000L
    while (ref.get != null && System.nanoTime < deadline) {
      System.gc(); Thread.sleep(50)
    }
    assert(ref.get == null, "the discarded child session must be collectable")
    assert(cache.liveSessions === 0,
      "the collected session's cache entries must drain away")
  }
}
