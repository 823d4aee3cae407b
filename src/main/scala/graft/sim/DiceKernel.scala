package graft.sim

import graft.core.BitVector
import graft.solve.Candidate

/** One blocked record as seen by the kernel. */
final case class ClkRow(recId: Long, clk: Array[Byte], pop: Int)

/** The batched bitwise-popcount Dice kernel — the Spark-side
  * re-expression of the reference's accelerated scorer
  * (`/root/reference/anonlink/similarities/_dice_x86.py:22-113` +
  * `/root/reference/anonlink/similarities/dice.cpp:518-675`).
  *
  * Runs inside `mapGroups`/`cogroup` tasks over one (blockKey, salt)
  * cell. Implementation mirrors the reference's tricks:
  *   - both sides packed into contiguous `Array[Long]` matrices so the
  *     inner loop is cache-linear (`_dice_x86.py:94-97`)
  *   - per-row popcounts precomputed once (`_dice_x86.py:99-105`)
  *   - popcount prefilter: a pair is skipped unless
  *     `2*min(p0,p1) >= t*(p0+p1)` — the exact upper bound
  *     `dice <= 2*min/(p0+p1)` (the reference's equivalent delta test,
  *     `dice.cpp:349-352,596`)
  *   - per-left-record bounded top-k heap whose floor dynamically
  *     raises the effective threshold (`dice.cpp:575-587`)
  *   - tie-breaking matches the reference's stable sort: on equal
  *     similarity the *earlier* right record (ascending recId) wins
  *     (`_dice_python.py:71-72` — stable `sorted` over enumerate order)
  *
  * Threshold semantics: keep `sim >= threshold`
  * (`_dice_python.py:71`). Zero-popcount left records produce sim 0.0
  * for every right record (`_dice_python.py:68-69`) — emitted only if
  * `threshold <= 0`.
  */
object DiceKernel {

  /** Packed per-block matrix: rows sorted by recId. */
  final class Packed(rows: Array[ClkRow]) {
    val n: Int = rows.length
    val recIds: Array[Long] = new Array[Long](n)
    val pops: Array[Int] = new Array[Int](n)
    val width: Int = if (n == 0) 0 else (rows(0).clk.length + 7) / 8
    val flat: Array[Long] = new Array[Long](n * width)
    locally {
      java.util.Arrays.sort(rows, Ordering.by((r: ClkRow) => r.recId))
      var i = 0
      while (i < n) {
        val r = rows(i)
        recIds(i) = r.recId
        pops(i) = r.pop
        val ws = BitVector.fromBytes(r.clk)
        System.arraycopy(ws, 0, flat, i * width, math.min(ws.length, width))
        i += 1
      }
    }
  }

  /** Score all pairs in one block cell; per-left-record top-k.
    * Emits (sim, rec0, rec1) with dset ids fixed by the caller.
    * `k = None` → all pairs above threshold; `k <= 0` → nothing
    * (reference k=0 golden, `tests/test_candidate_generation.py`).
    */
  def blockDiceTopK(
      aRows: Array[ClkRow],
      bRows: Array[ClkRow],
      threshold: Double,
      k: Option[Int],
      dset0: Int,
      dset1: Int): Iterator[Candidate] = {
    if (aRows.isEmpty || bRows.isEmpty || k.exists(_ <= 0)) return Iterator.empty
    val a = new Packed(aRows)
    val b = new Packed(bRows)
    // consistent filter length, as _dice_x86.py:84-92
    require(a.width == b.width, s"inconsistent CLK width: ${a.width} vs ${b.width} words")
    val kk = k.map(math.min(_, b.n)).getOrElse(b.n) // clamp, _dice_x86.py:78-82
    val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    val left = new Array[Long](a.width)
    // bounded top-k heap (min at root under "worse-first" ordering):
    // worse = lower sim, then larger right position. Iterating rights in
    // ascending position means a tie never evicts — matching the
    // reference's stable-sort tie-break.
    val heapSim = new Array[Double](kk)
    val heapPos = new Array[Int](kk)

    var i = 0
    while (i < a.n) {
      val p0 = a.pops(i)
      if (p0 == 0) {
        if (threshold <= 0) {
          // all sims are 0.0; top-k keeps the first kk right records
          var j = 0
          while (j < kk) {
            out += Candidate(0.0, dset0, dset1, a.recIds(i), b.recIds(j))
            j += 1
          }
        }
      } else {
        System.arraycopy(a.flat, i * a.width, left, 0, a.width)
        var heapSize = 0
        var j = 0
        while (j < b.n) {
          val p1 = b.pops(j)
          // prefilter: dice <= 2*min(p0,p1)/(p0+p1); also respect the
          // dynamically raised floor when the heap is full.
          val minPop = if (p0 < p1) p0 else p1
          val bound = 2.0 * minPop / (p0 + p1)
          val floor = if (heapSize == kk) heapSim(0) else threshold
          if (bound >= floor && bound >= threshold) {
            val andPop = BitVector.andPopcountFlat(left, b.flat, j * b.width, b.width)
            val sim = 2.0 * andPop / (p0 + p1)
            if (sim >= threshold) {
              if (heapSize < kk) {
                heapInsert(heapSim, heapPos, heapSize, sim, j); heapSize += 1
              } else if (sim > heapSim(0)) {
                heapReplaceRoot(heapSim, heapPos, heapSize, sim, j)
              }
            }
          }
          j += 1
        }
        var h = 0
        while (h < heapSize) {
          out += Candidate(heapSim(h), dset0, dset1, a.recIds(i), b.recIds(heapPos(h)))
          h += 1
        }
      }
      i += 1
    }
    out.iterator
  }

  // --- binary min-heap on (sim asc, pos desc): root = worst kept pair ---
  @inline private def worse(s1: Double, p1: Int, s2: Double, p2: Int): Boolean =
    s1 < s2 || (s1 == s2 && p1 > p2)

  private def heapInsert(sims: Array[Double], pos: Array[Int], size: Int, s: Double, p: Int): Unit = {
    var i = size
    sims(i) = s; pos(i) = p
    while (i > 0 && worse(sims(i), pos(i), sims((i - 1) / 2), pos((i - 1) / 2))) {
      val par = (i - 1) / 2
      swap(sims, pos, i, par)
      i = par
    }
  }

  private def heapReplaceRoot(sims: Array[Double], pos: Array[Int], size: Int, s: Double, p: Int): Unit = {
    sims(0) = s; pos(0) = p
    var i = 0
    var continue = true
    while (continue) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(sims(l), pos(l), sims(m), pos(m))) m = l
      if (r < size && worse(sims(r), pos(r), sims(m), pos(m))) m = r
      if (m != i) { swap(sims, pos, i, m); i = m } else continue = false
    }
  }

  @inline private def swap(sims: Array[Double], pos: Array[Int], i: Int, j: Int): Unit = {
    val s = sims(i); sims(i) = sims(j); sims(j) = s
    val p = pos(i); pos(i) = pos(j); pos(j) = p
  }

  /** Naive all-pairs oracle — the analogue of the reference's pure-
    * Python scorer (`_dice_python.py:15-80`), used in differential
    * tests against the packed kernel. */
  def naiveDice(
      aRows: Seq[(Long, Array[Long])],
      bRows: Seq[(Long, Array[Long])],
      threshold: Double,
      k: Option[Int],
      dset0: Int = 0,
      dset1: Int = 1): Seq[Candidate] = {
    val bSorted = bRows.sortBy(_._1)
    aRows.sortBy(_._1).flatMap { case (r0, ca) =>
      val p0 = BitVector.popcount(ca)
      val sims = bSorted.map { case (r1, cb) =>
        val s = if (p0 == 0) 0.0 else BitVector.diceFromCounts(
          BitVector.andPopcount(ca, cb), p0, BitVector.popcount(cb))
        (s, r1)
      }
      val kept = sims.filter(_._1 >= threshold)
      val top = kept.sortBy { case (s, _) => -s }.take(k.getOrElse(kept.length)) // stable
      top.map { case (s, r1) => Candidate(s, dset0, dset1, r0, r1) }
    }
  }
}
