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

  test("memoRun builder racing releaseRun re-registers into the live memo") {
    // Deterministic single-thread replay of the interleaving: the build
    // thunk runs OUTSIDE the monitor, so a releaseRun can fire between
    // the first check and the registration. The raced builder must
    // register into the CURRENT (post-release) memo — the derivation is
    // a pure function of the dataset and the key encodes (app, sfDir,
    // kind), so the entry is correct for any later asker — keeping the
    // caller cached instead of permanently recomputing (the r16
    // unpersist-and-degrade fallback this round's ADVICE replaced).
    // Ownership transfers: the entry falls to the NEXT releaseRun, so
    // nothing is pinned past a run boundary (the round-15 ADVICE race).
    CacheScope.releaseRun()
    val got = CacheScope.memoRun("spec:raced") {
      CacheScope.releaseRun() // the run ends while we are building
      spark.range(11).toDF()
    }
    got.count()
    assert(CacheScope.runSize === 1, "raced builder failed to re-register")
    assert(got.storageLevel.useMemory,
      "raced builder's dataset lost its persist")
    // the re-registered entry serves later askers — no rebuild
    var builds = 0
    val reused = CacheScope.memoRun("spec:raced") { builds += 1; spark.range(11).toDF() }
    assert(builds === 0 && (reused eq got))
    // and the next releaseRun releases it — ownership really transferred
    CacheScope.releaseRun()
    assert(CacheScope.runSize === 0)
    assert(!got.storageLevel.useMemory,
      "raced entry survived the releaseRun that should own it")
  }
}
