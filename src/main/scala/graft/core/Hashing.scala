package graft.core

/** Deterministic 64-bit hashing primitives used everywhere determinism
  * matters (CLK bloom insertion, minhash, block-key sampling, corpus
  * synthesis). Pure JVM, no dependencies, stable across partitionings,
  * JVM versions and reruns — the engine-side analogue of the seeded
  * hashing the reference relies on (reference: seeded `random.Random`
  * in `/root/reference/anonlink/blocking.py:159-164`; HMAC-seeded
  * double hashing in clkhash per `/root/reference/README.rst:23-24`).
  *
  * Construction: FNV-1a 64 over the bytes, then a splitmix64-style
  * avalanche finalizer (public-domain constants from Vigna's
  * splitmix64 / Stafford mix13). Not cryptographic — used only for
  * bucketing/sketching quality.
  */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  /** splitmix64 finalizer (Stafford mix13). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hash raw bytes with a seed. */
  def bytes(data: Array[Byte], seed: Long): Long = {
    var h = FnvOffset ^ mix64(seed)
    var i = 0
    while (i < data.length) {
      h = (h ^ (data(i) & 0xffL)) * FnvPrime
      i += 1
    }
    mix64(h)
  }

  /** Hash a string (UTF-8 bytes) with a seed. */
  def str(s: String, seed: Long): Long =
    bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Hash a window of a char array without allocation (hot path for
    * n-gram loops). Chars are mixed as UTF-16 code units — fine for
    * hashing (we never need cross-language parity).
    */
  def chars(s: CharSequence, from: Int, until: Int, seed: Long): Long = {
    var h = FnvOffset ^ mix64(seed)
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      h = (h ^ (c & 0xffL)) * FnvPrime
      h = (h ^ ((c >>> 8) & 0xffL)) * FnvPrime
      i += 1
    }
    mix64(h)
  }

  /** Combine two longs into one (order-sensitive). */
  @inline def combine(a: Long, b: Long): Long = mix64(a ^ (b * FnvPrime))

  /** Deterministic uniform double in [0, 1) from a long key. */
  @inline def toUnitDouble(h: Long): Double = (h >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Deterministic sample of `r` distinct ints from [0, n) (partial
    * Fisher-Yates keyed by seed). Semantics-equivalent to the
    * reference's `rng.sample(range(hash_len), r)`
    * (`/root/reference/anonlink/blocking.py:162-164`) without
    * replicating Python's RNG.
    */
  def sampleIndices(n: Int, r: Int, seed: Long): Array[Int] = {
    require(r <= n, s"cannot sample $r from $n")
    val arr = Array.range(0, n)
    var i = 0
    while (i < r) {
      val j = i + java.lang.Math.floorMod(mix64(seed + i), (n - i).toLong).toInt
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i += 1
    }
    java.util.Arrays.copyOfRange(arr, 0, r)
  }
}
