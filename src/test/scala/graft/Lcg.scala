package graft

/** Deterministic 64-bit LCG (Knuth MMIX constants) for pseudo-random
 * test fixtures — shared so each spec doesn't re-implement it. */
final class Lcg(private var seed: Long) {
  def next(m: Int): Int = next(m.toLong).toInt
  def next(m: Long): Long = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (seed >>> 33) % m
  }
}
