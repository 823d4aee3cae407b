package graft.core

/** Fixed-width bit-vector math over packed `Array[Long]`.
  *
  * Canonical storage is Spark `BinaryType` (little-endian longs); the
  * scoring kernels view the same bits as `Array[Long]` so the hot loop
  * is `Long.bitCount` over words (JIT-compiled to the POPCNT
  * instruction — the JVM analogue of the reference's handrolled
  * popcount kernels, `/root/reference/anonlink/similarities/dice.cpp:13-175`).
  *
  * Only popcounts of AND/XOR are ever consumed downstream
  * (`/root/reference/anonlink/similarities/_dice_python.py:66`,
  * `_smc.py:19-21`), so the byte/bit packing order is free as long as
  * it is consistent; we fix little-endian longs.
  */
object BitVector {
  /** Default CLK geometry: 1024 bits = 16 longs = 128 bytes
    * (reference default length, `/root/reference/anonlink/benchmark.py:10-18`). */
  final val DefaultBits = 1024
  final val DefaultWords = DefaultBits / 64

  @inline def wordsFor(bits: Int): Int = (bits + 63) >>> 6

  /** Pack longs into little-endian bytes (Spark BinaryType payload). */
  def toBytes(words: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](words.length * 8)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    out
  }

  /** Unpack little-endian bytes into longs. Byte length need not be a
    * multiple of 8 (trailing partial word is zero-padded — mirrors the
    * reference accepting odd byte lengths,
    * `/root/reference/tests/test_similarity_dice.py:137-148`). */
  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val n = (bytes.length + 7) / 8
    val out = new Array[Long](n)
    var i = 0
    while (i < bytes.length) {
      out(i >>> 3) |= (bytes(i) & 0xffL) << ((i & 7) << 3)
      i += 1
    }
    out
  }

  def popcount(a: Array[Long]): Int = {
    var s = 0; var i = 0
    while (i < a.length) { s += java.lang.Long.bitCount(a(i)); i += 1 }
    s
  }

  def andPopcount(a: Array[Long], b: Array[Long]): Int = {
    var s = 0; var i = 0
    while (i < a.length) { s += java.lang.Long.bitCount(a(i) & b(i)); i += 1 }
    s
  }

  def xorPopcount(a: Array[Long], b: Array[Long]): Int = {
    var s = 0; var i = 0
    while (i < a.length) { s += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    s
  }

  /** XOR-popcount over a window of a flattened matrix. */
  @inline def xorPopcountFlat(a: Array[Long], flat: Array[Long], off: Int, width: Int): Int = {
    var s = 0; var i = 0
    while (i < width) { s += java.lang.Long.bitCount(a(i) ^ flat(off + i)); i += 1 }
    s
  }

  /** AND-popcount over a window of a flattened matrix: rows packed
    * back-to-back in `flat`, row `row` starting at `row*width`. The
    * cache-linear layout mirrors `/root/reference/anonlink/similarities/_dice_x86.py:94-97`. */
  @inline def andPopcountFlat(a: Array[Long], flat: Array[Long], off: Int, width: Int): Int = {
    var s = 0; var i = 0
    while (i < width) { s += java.lang.Long.bitCount(a(i) & flat(off + i)); i += 1 }
    s
  }

  /** Dice coefficient 2|a∧b| / (|a|+|b|); 0.0 on zero denominator
    * (`/root/reference/anonlink/similarities/_dice_python.py:113-116`).
    * Integer popcounts + one multiply + one divide in double precision
    * — bit-exact reproducible, which the parity tests rely on. */
  def dice(a: Array[Long], b: Array[Long]): Double = {
    val pa = popcount(a); val pb = popcount(b)
    diceFromCounts(andPopcount(a, b), pa, pb)
  }

  @inline def diceFromCounts(andPop: Int, popA: Int, popB: Int): Double = {
    val denom = popA + popB
    if (denom == 0) 0.0 else 2.0 * andPop / denom
  }

  /** Simple matching coefficient 1 − hamming/len
    * (`/root/reference/anonlink/similarities/_smc.py:19-21`). */
  def smc(a: Array[Long], b: Array[Long], bits: Int): Double =
    1.0 - xorPopcount(a, b).toDouble / bits

  /** Read bit `i` (little-endian word packing). */
  @inline def testBit(a: Array[Long], i: Int): Boolean =
    ((a(i >>> 6) >>> (i & 63)) & 1L) != 0L

  @inline def setBit(a: Array[Long], i: Int): Unit =
    a(i >>> 6) |= 1L << (i & 63)
}
