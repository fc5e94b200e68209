package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scope semantics of the cache registry: per-query `track` entries fall
 * to `releaseAll`, run-scoped `memoRun` entries survive it (that is the
 * point — shared derivations outlive query boundaries) and fall only to
 * `releaseRun`. */
class CacheScopeSpec extends AnyFunSuite {
  import TestSpark._

  test("memoRun memoizes per key and survives releaseAll") {
    CacheScope.releaseRun()
    var builds = 0
    def build() = { builds += 1; spark.range(10).toDF() }
    val a = CacheScope.memoRun("spec:memo1")(build())
    val b = CacheScope.memoRun("spec:memo1")(build())
    assert(builds === 1)
    assert(a eq b)
    assert(CacheScope.runSize === 1)
    CacheScope.releaseAll() // per-query release must NOT evict run scope
    assert(CacheScope.runSize === 1)
    val c = CacheScope.memoRun("spec:memo1")(build())
    assert(builds === 1 && (c eq a))
    CacheScope.releaseRun()
    assert(CacheScope.runSize === 0)
    val d = CacheScope.memoRun("spec:memo1")(build())
    assert(builds === 2)
    assert(d.storageLevel.useMemory) // re-built entry is persisted again
    CacheScope.releaseRun()
  }

  test("memoRunValue memoizes scalars, survives releaseAll, falls to releaseRun") {
    CacheScope.releaseRun()
    var builds = 0
    def build(): Int = { builds += 1; 42 }
    assert(CacheScope.memoRunValue("spec:val1")(build()) === 42)
    assert(CacheScope.memoRunValue("spec:val1")(build()) === 42)
    assert(builds === 1)
    CacheScope.releaseAll() // per-query release must NOT evict the stat
    assert(CacheScope.memoRunValue("spec:val1")(build()) === 42)
    assert(builds === 1)
    CacheScope.releaseRun()
    assert(CacheScope.memoRunValue("spec:val1")(build()) === 42)
    assert(builds === 2)
    CacheScope.releaseRun()
  }

  test("track entries fall to releaseAll; memoRun entries stay cached") {
    CacheScope.releaseRun()
    // distinct plans: Spark's cache is keyed by analyzed plan, so two
    // datasets over the SAME plan would alias each other's persist state
    val t = CacheScope.track(spark.range(5).toDF())
    val m = CacheScope.memoRun("spec:memo2")(spark.range(7).toDF())
    t.count(); m.count()
    assert(t.storageLevel.useMemory && m.storageLevel.useMemory)
    CacheScope.releaseAll()
    assert(!t.storageLevel.useMemory)
    assert(m.storageLevel.useMemory)
    CacheScope.releaseRun()
    assert(!m.storageLevel.useMemory)
  }

  test("memoRun builder racing releaseRun does not cache into the dead run") {
    // Deterministic single-thread replay of the interleaving: the build
    // thunk runs OUTSIDE the monitor, so a releaseRun can fire between
    // the first check and the registration. The generation counter must
    // make the loser hand back an UNCACHED dataset and leave the (now
    // ended) run's memo empty — without it, the persisted dataset would
    // pin MEMORY_AND_DISK blocks in an empty memo until some future
    // releaseRun (the round-15 ADVICE race).
    CacheScope.releaseRun()
    val got = CacheScope.memoRun("spec:raced") {
      CacheScope.releaseRun() // the run ends while we are building
      spark.range(11).toDF()
    }
    got.count()
    assert(CacheScope.runSize === 0, "raced builder registered into a dead run")
    assert(!got.storageLevel.useMemory,
      "raced builder's dataset stayed persisted with no owner")
    // and the next run is undamaged: a fresh memoRun caches normally
    var builds = 0
    val fresh = CacheScope.memoRun("spec:raced") { builds += 1; spark.range(11).toDF() }
    assert(builds === 1 && CacheScope.runSize === 1)
    assert(fresh.storageLevel.useMemory)
    CacheScope.releaseRun()
  }
}
