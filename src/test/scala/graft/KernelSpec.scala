package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.BitVector
import graft.sim.{ClkRow, DiceKernel}

/** Differential tests: packed kernel vs naive oracle — the analogue of
  * the reference's Python-vs-C++ Dice parity suite
  * (`/root/reference/tests/test_similarity_dice.py:51-66,204-214`).
  */
class KernelSpec extends AnyFunSuite {

  private def randomClks(n: Int, words: Int, density: Double, seed: Long): Seq[(Long, Array[Long])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val arr = new Array[Long](words)
      for (b <- 0 until words * 64 if rnd.nextDouble() < density) BitVector.setBit(arr, b)
      // random non-contiguous recIds, like hashed urls
      (rnd.nextLong(), arr)
    }
  }

  private def run(a: Seq[(Long, Array[Long])], b: Seq[(Long, Array[Long])],
      t: Double, k: Option[Int]) = {
    val aRows = a.map { case (id, w) => ClkRow(id, BitVector.toBytes(w), BitVector.popcount(w)) }
    val bRows = b.map { case (id, w) => ClkRow(id, BitVector.toBytes(w), BitVector.popcount(w)) }
    DiceKernel.blockDiceTopK(aRows.toArray, bRows.toArray, t, k, 0, 1).toSeq
  }

  private def assertParity(a: Seq[(Long, Array[Long])], b: Seq[(Long, Array[Long])],
      t: Double, k: Option[Int]): Unit = {
    val kernel = run(a, b, t, k).sorted(graft.solve.Candidate.globalOrdering)
    val naive = DiceKernel.naiveDice(a, b, t, k).sorted(graft.solve.Candidate.globalOrdering)
    assert(kernel == naive, s"t=$t k=$k kernel=${kernel.size} naive=${naive.size}")
  }

  test("kernel == naive oracle across thresholds, k, densities") {
    for {
      density <- Seq(0.05, 0.3, 0.6)
      t <- Seq(0.0, 0.5, 0.7, 0.9)
      k <- Seq(None, Some(1), Some(3), Some(1000))
    } {
      val a = randomClks(40, 16, density, seed = (density * 1000).toLong + t.hashCode)
      val b = randomClks(55, 16, density, seed = (density * 7000).toLong + 13 * t.hashCode)
      assertParity(a, b, t, k)
    }
  }

  test("k=0 and empty sides produce nothing") {
    val a = randomClks(5, 16, 0.3, 1)
    val b = randomClks(5, 16, 0.3, 2)
    assert(run(a, b, 0.5, Some(0)).isEmpty)
    assert(run(Nil, b, 0.0, None).isEmpty)
    assert(run(a, Nil, 0.0, None).isEmpty)
  }

  test("zero-popcount records: sims are 0.0, emitted only at threshold 0 (ref _dice_python.py:68-69)") {
    val zero = Seq((1L, new Array[Long](16)))
    val b = randomClks(4, 16, 0.3, 3)
    assert(run(zero, b, 0.1, None).isEmpty)
    val atZero = run(zero, b, 0.0, None)
    assert(atZero.size == 4 && atZero.forall(_.sim == 0.0))
    // zero right-side records score 0 against non-zero lefts
    val a = randomClks(3, 16, 0.3, 4)
    val zb = Seq((9L, new Array[Long](16)))
    assert(run(a, zb, 0.5, None).isEmpty)
    assertParity(a ++ zero, b ++ zb, 0.0, None)
    assertParity(a ++ zero, b ++ zb, 0.0, Some(2))
  }

  test("special bit patterns (ref tests/bitarray_utils.py)") {
    val words = Seq(0L, -1L, 1L, 1L << 63)
    val special = for ((w, i) <- words.zipWithIndex) yield (i.toLong, Array.fill(16)(w))
    for (t <- Seq(0.0, 0.5, 1.0); k <- Seq(None, Some(2)))
      assertParity(special, special, t, k)
  }

  test("identical filters score exactly 1.0") {
    val a = randomClks(10, 16, 0.4, 7)
    val pairs = run(a, a, 0.999, None)
    val selfPairs = pairs.filter(p => p.rec0 == p.rec1)
    assert(selfPairs.size == a.size) // every record matches itself at 1.0
    assert(selfPairs.forall(_.sim == 1.0))
  }

  test("top-k tie-break: earlier (ascending recId) right record wins, matching stable sort") {
    // left matches three rights with identical similarity
    val l = Array.fill(16)(0L); BitVector.setBit(l, 0); BitVector.setBit(l, 1)
    val r = Array.fill(16)(0L); BitVector.setBit(r, 0); BitVector.setBit(r, 1)
    val a = Seq((100L, l))
    val b = Seq((30L, r.clone()), (10L, r.clone()), (20L, r.clone()))
    val got = run(a, b, 0.5, Some(2))
    assert(got.map(_.rec1).sorted == Seq(10L, 20L))
    assertParity(a, b, 0.5, Some(2))
  }

  test("k larger than right side is clamped (ref _dice_x86.py:78-82)") {
    val a = randomClks(3, 16, 0.3, 8)
    val b = randomClks(4, 16, 0.3, 9)
    assert(run(a, b, 0.0, Some(Int.MaxValue)).size == 12)
  }

  test("inconsistent CLK widths raise") {
    val a = Seq(ClkRow(1L, new Array[Byte](128), 0))
    val b = Seq(ClkRow(2L, new Array[Byte](64), 0))
    intercept[IllegalArgumentException] {
      DiceKernel.blockDiceTopK(a.toArray, b.toArray, 0.0, None, 0, 1).toSeq
    }
  }

  test("non-multiple-of-8 byte widths work (ref odd lengths)") {
    for (nBytes <- Seq(1, 7, 9, 25)) {
      val rnd = new scala.util.Random(nBytes)
      def mk(id: Long) = {
        val bytes = Array.fill[Byte](nBytes)(rnd.nextInt().toByte)
        (id, BitVector.fromBytes(bytes))
      }
      val a = (0 until 10).map(i => mk(i.toLong))
      val b = (0 until 12).map(i => mk(100L + i))
      assertParity(a, b, 0.5, Some(3))
    }
  }
}
