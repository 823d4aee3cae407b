package graft.sim

import graft.core.BitVector
import graft.solve.Candidate

/** S6: Simple Matching Coefficient scorer
  * (`/root/reference/anonlink/similarities/_smc.py:89-123`):
  * `smc = 1 − hamming/bits` via XOR popcount.
  *
  * Top-k semantics differ from Dice: a pair is kept iff it is in the
  * top-k of **both** sides (`pair_counter == 2`, `_smc.py:61-66`),
  * with ties broken by `(-sim, rec0, rec1)`. The distributed form is
  * two rank windows over the scored pairs (see
  * [[graft.ops.Smc.bothSidesTopK]]); this kernel only scores
  * pairs ≥ threshold.
  */
object SmcKernel {

  /** Score all pairs with smc >= threshold in one cell. Prefilter:
    * xor >= |p0-p1|, so smc <= 1 - |p0-p1|/bits — skip when that bound
    * is below the threshold. */
  def blockSmc(
      aRows: Array[ClkRow],
      bRows: Array[ClkRow],
      threshold: Double,
      bits: Int,
      dset0: Int,
      dset1: Int): Iterator[Candidate] = {
    if (aRows.isEmpty || bRows.isEmpty) return Iterator.empty
    val a = new DiceKernel.Packed(aRows)
    val b = new DiceKernel.Packed(bRows)
    require(a.width == b.width, s"inconsistent CLK width: ${a.width} vs ${b.width} words")
    val width = a.width
    val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    val left = new Array[Long](width)
    // max hamming distance allowed (conservative by 1e-9)
    val maxXor = math.floor((1.0 - threshold) * bits + 1e-9).toInt
    var tile = 0
    while (tile < b.n) {
      val tileEnd = math.min(b.n, tile + DiceKernel.TileRows)
      var i = 0
      while (i < a.n) {
        System.arraycopy(a.flat, i * width, left, 0, width)
        val p0 = a.pops(i)
        var j = tile
        while (j < tileEnd) {
          // popcount prefilter: xor >= |p0 - p1|
          if (math.abs(p0 - b.pops(j)) <= maxXor) {
            val xor = BitVector.xorPopcountFlat(left, b.flat, j * width, width)
            if (xor <= maxXor) {
              val sim = 1.0 - xor.toDouble / bits
              if (sim >= threshold)
                out += Candidate(sim, dset0, dset1, a.recIds(i), b.recIds(j))
            }
          }
          j += 1
        }
        i += 1
      }
      tile = tileEnd
    }
    out.iterator
  }

  /** Naive oracle for differential tests. */
  def naiveSmc(
      aRows: Seq[(Long, Array[Long])],
      bRows: Seq[(Long, Array[Long])],
      threshold: Double,
      bits: Int,
      dset0: Int = 0,
      dset1: Int = 1): Seq[Candidate] =
    for {
      (r0, ca) <- aRows.sortBy(_._1)
      (r1, cb) <- bRows.sortBy(_._1)
      sim = BitVector.smc(ca, cb, bits)
      if sim >= threshold
    } yield Candidate(sim, dset0, dset1, r0, r1)
}
