package graft.engine

import graft.SparkSpec

/** The per-(session, key) memo behind the operator caches. */
class SessionCacheSpec extends SparkSpec {

  test("computes once per (session, key); keys are independent") {
    val cache = new SessionCache[String]
    var computes = 0
    def get(key: String) = cache.getOrCompute(spark, key) {
      computes += 1; s"v-$key-$computes"
    }
    assert(get("a") === "v-a-1")
    assert(get("a") === "v-a-1") // memoized, not recomputed
    assert(get("b") === "v-b-2") // distinct key computes independently
    assert(get("a") === "v-a-1")
    assert(computes === 2)
  }

  test("recompute after a cleared soft value yields a fresh entry") {
    // the soft value map can be GC-cleared under pressure; the contract
    // is only that the next call recomputes — simulate by using a fresh
    // cache (same observable behavior: no stale value survives)
    val c1 = new SessionCache[Int]
    assert(c1.getOrCompute(spark, "k")(1) === 1)
    val c2 = new SessionCache[Int]
    assert(c2.getOrCompute(spark, "k")(2) === 2)
  }
}
