package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{BitVector, Hashing}
import graft.encode.{ClkEncoder, ClkParams}

/** Core bit math + CLK encoding. Mirrors the reference's popcount and
  * special-bit-pattern tests (`/root/reference/tests/test_popcount.py:19-31`,
  * `/root/reference/tests/bitarray_utils.py:4-20`).
  */
class CoreSpec extends AnyFunSuite {

  // Special words from /root/reference/tests/bitarray_utils.py:4-8
  private val specialWords = Seq(0L, -1L, 1L, 1L << 63)
  // "Interesting" lengths (in 64-bit words here; reference uses bits)
  private val lengths = Seq(1, 2, 3, 4, 8, 15, 16, 17, 31, 32, 33)

  test("popcount on special patterns matches naive count") {
    for (len <- lengths; w <- specialWords) {
      val arr = Array.fill(len)(w)
      val expected = len * java.lang.Long.bitCount(w)
      assert(BitVector.popcount(arr) == expected, s"len=$len w=$w")
    }
  }

  test("bytes <-> longs round trip, including non-multiple-of-8 byte lengths") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val arr = Array.fill(rnd.nextInt(40))(rnd.nextLong())
      assert(BitVector.fromBytes(BitVector.toBytes(arr)).toSeq == arr.toSeq)
    }
    // odd byte lengths (reference supports 1,7,9...25-byte filters,
    // tests/test_similarity_dice.py:137-148)
    for (nBytes <- Seq(1, 7, 9, 17, 25)) {
      val bytes = Array.tabulate[Byte](nBytes)(i => (i * 37 + 1).toByte)
      val longs = BitVector.fromBytes(bytes)
      var expected = 0
      bytes.foreach(b => expected += java.lang.Integer.bitCount(b & 0xff))
      assert(BitVector.popcount(longs) == expected)
    }
  }

  test("dice: exact values, zero-popcount guard") {
    val a = Array(0xffL, 0L)
    val b = Array(0x0fL, 0L)
    // |a|=8, |b|=4, |a&b|=4 → 2*4/12
    assert(BitVector.dice(a, b) == 2.0 * 4 / 12)
    assert(BitVector.dice(a, a) == 1.0)
    val z = Array(0L, 0L)
    assert(BitVector.dice(z, z) == 0.0) // no div-by-zero (ref _dice_python.py:113-116)
    assert(BitVector.dice(z, a) == 0.0)
  }

  test("smc matches 1 - hamming/bits") {
    val a = Array(0xff00ff00L)
    val b = Array(0x00ff00ffL)
    assert(BitVector.smc(a, b, 64) == 1.0 - 32.0 / 64)
    assert(BitVector.smc(a, a, 64) == 1.0)
  }

  test("testBit/setBit round trip across word boundaries") {
    val arr = new Array[Long](16)
    val idx = Seq(0, 1, 63, 64, 65, 511, 512, 1023)
    idx.foreach(i => BitVector.setBit(arr, i))
    (0 until 1024).foreach { i =>
      assert(BitVector.testBit(arr, i) == idx.contains(i))
    }
    assert(BitVector.popcount(arr) == idx.size)
  }

  test("hashing is deterministic and seed-sensitive") {
    assert(Hashing.str("hello", 1L) == Hashing.str("hello", 1L))
    assert(Hashing.str("hello", 1L) != Hashing.str("hello", 2L))
    assert(Hashing.str("hello", 1L) != Hashing.str("hellp", 1L))
    // chars window == str on the substring
    assert(Hashing.chars("xxhelloyy", 2, 7, 9L) == Hashing.chars("hello", 0, 5, 9L))
  }

  test("sampleIndices: distinct, in range, deterministic") {
    val s = Hashing.sampleIndices(1024, 16, 42L)
    assert(s.length == 16)
    assert(s.distinct.length == 16)
    assert(s.forall(i => i >= 0 && i < 1024))
    assert(s.toSeq == Hashing.sampleIndices(1024, 16, 42L).toSeq)
    assert(s.toSeq != Hashing.sampleIndices(1024, 16, 43L).toSeq)
  }

  test("CLK encoding is deterministic and parameter-sensitive") {
    val p = ClkParams()
    val t = "the quick brown fox jumps over the lazy dog and runs away fast"
    val c1 = ClkEncoder.encode(t, p)
    val c2 = ClkEncoder.encode(t, p)
    assert(c1.toSeq == c2.toSeq)
    assert(ClkEncoder.encode(t, p.copy(seed = 7L)).toSeq != c1.toSeq)
    assert(ClkEncoder.encode(t + " extra", p).toSeq != c1.toSeq)
    assert(c1.length == 16)
  }

  test("CLK: similar texts score high Dice, dissimilar low") {
    val p = ClkParams()
    val base = (1 to 60).map(i => s"word${i % 40}").mkString(" ")
    val nearDup = base.replace("word7", "sub7") // small perturbation
    val other = (1 to 60).map(i => s"tok${i + 100}").mkString(" ")
    val cb = ClkEncoder.encode(base, p)
    val cn = ClkEncoder.encode(nearDup, p)
    val co = ClkEncoder.encode(other, p)
    assert(BitVector.dice(cb, cb) == 1.0)
    assert(BitVector.dice(cb, cn) > 0.7, s"near-dup dice=${BitVector.dice(cb, cn)}")
    assert(BitVector.dice(cb, co) < 0.3, s"cross dice=${BitVector.dice(cb, co)}")
  }

  test("CLK fill factor stays in a healthy band for typical page sizes") {
    val p = ClkParams()
    for (nWords <- Seq(30, 100, 200)) {
      val t = (1 to nWords).map(i => s"w${Hashing.mix64(i.toLong) % 4000}").mkString(" ")
      val pop = BitVector.popcount(ClkEncoder.encode(t, p))
      assert(pop > 0 && pop < p.bits, s"nWords=$nWords pop=$pop")
      if (nWords >= 100) assert(pop >= 256 && pop <= 900, s"nWords=$nWords pop=$pop")
    }
  }
}
