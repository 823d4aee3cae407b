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
  * Runs inside `mapPartitions`/`flatMapGroups` tasks over one
  * (blockKey, salt) cell or one (A-partition × broadcast-B) rectangle.
  * Implementation mirrors the reference's tricks, plus one of its own:
  *   - both sides packed into contiguous `Array[Long]` matrices so the
  *     inner loop is cache-linear (`_dice_x86.py:94-97`)
  *   - per-row popcounts precomputed once (`_dice_x86.py:99-105`)
  *   - popcount prefilter as an integer window: a pair is skipped
  *     unless `2*min(p0,p1) >= t*(p0+p1)` — the exact upper bound
  *     `dice <= 2*min/(p0+p1)` (the reference's equivalent delta test,
  *     `dice.cpp:349-352,596`)
  *   - per-left-record bounded top-k heap whose floor dynamically
  *     raises the effective threshold (`dice.cpp:575-587`)
  *   - **cache tiling**: the right-side matrix is scanned in
  *     L2-resident tiles (outer loop over tiles, inner over left rows)
  *     so a big right side is read from DRAM once per task instead of
  *     once per left row — this is what keeps the kernel compute-bound
  *     at 32 cores, where a naive row-major scan saturates memory
  *     bandwidth (the reference never hits this because its benchmark
  *     matrices fit in L3)
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

  /** Right-tile rows targeted to stay L2-resident: rows × width(16) ×
    * 8B ≈ 256 KiB at the default 1024-bit CLK width. */
  final val TileRows = 2048

  /** Packed per-block matrix: rows sorted by recId. Serializable so a
    * whole side can be broadcast for shuffle-free all-pairs scoring. */
  final class Packed(inputRows: Array[ClkRow]) extends Serializable {
    val n: Int = inputRows.length
    val recIds: Array[Long] = new Array[Long](n)
    val pops: Array[Int] = new Array[Int](n)
    val width: Int = if (n == 0) 0 else (inputRows(0).clk.length + 7) / 8
    val flat: Array[Long] = new Array[Long](n * width)
    locally {
      val rows = inputRows.clone() // don't mutate (possibly shared) input
      java.util.Arrays.sort(rows, Ordering.by((r: ClkRow) => r.recId))
      val byteLen = if (n == 0) 0 else inputRows(0).clk.length
      var i = 0
      while (i < n) {
        val r = rows(i)
        recIds(i) = r.recId
        pops(i) = r.pop
        // consistent filter length, like the reference's
        // _check_filters_size (`_dice_x86.py:84-92`) — silently
        // truncating a longer row would score bits inconsistent with
        // the precomputed popcount.
        require(r.clk.length == byteLen,
          s"inconsistent CLK byte length: ${r.clk.length} vs $byteLen")
        val ws = BitVector.fromBytes(r.clk)
        System.arraycopy(ws, 0, flat, i * width, ws.length)
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
    blockDiceTopKPacked(new Packed(aRows), new Packed(bRows), threshold, k, dset0, dset1)
  }

  /** As [[blockDiceTopK]] but over pre-packed sides (e.g. a broadcast
    * right side). */
  def blockDiceTopKPacked(
      a: Packed,
      b: Packed,
      threshold: Double,
      k: Option[Int],
      dset0: Int,
      dset1: Int): Iterator[Candidate] = {
    if (a.n == 0 || b.n == 0 || k.exists(_ <= 0)) return Iterator.empty
    // consistent filter length, as _dice_x86.py:84-92
    require(a.width == b.width, s"inconsistent CLK width: ${a.width} vs ${b.width} words")
    val kk = k.map(math.min(_, b.n)).getOrElse(b.n) // clamp, _dice_x86.py:78-82
    val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]

    // zero-popcount left rows: all sims 0.0 → first kk rights iff t <= 0
    if (threshold <= 0) {
      var i = 0
      while (i < a.n) {
        if (a.pops(i) == 0) {
          var j = 0
          while (j < kk) {
            out += Candidate(0.0, dset0, dset1, a.recIds(i), b.recIds(j))
            j += 1
          }
        }
        i += 1
      }
    }

    if (k.isEmpty) scoreAllTiled(a, b, threshold, dset0, dset1, out)
    else scoreTopKTiled(a, b, threshold, kk, dset0, dset1, out)
    out.iterator
  }

  /** k=None path: tiled scan, heap-free, emit everything ≥ threshold. */
  private def scoreAllTiled(
      a: Packed, b: Packed, threshold: Double, dset0: Int, dset1: Int,
      out: scala.collection.mutable.ArrayBuffer[Candidate]): Unit = {
    val width = a.width
    val w16 = width == 16
    val left = new Array[Long](width)
    var tile = 0
    while (tile < b.n) {
      val tileEnd = math.min(b.n, tile + TileRows)
      var i = 0
      while (i < a.n) {
        val p0 = a.pops(i)
        if (p0 > 0) {
          var loP = 0
          var hiP = Int.MaxValue
          if (threshold > 0) {
            loP = math.ceil(threshold * p0 / (2.0 - threshold) - 1e-9).toInt
            hiP = math.min(Int.MaxValue.toDouble,
              math.floor(p0 * (2.0 - threshold) / threshold + 1e-9)).toInt
          }
          if (w16)
            emitRange16(a.flat, i << 4, p0, a.recIds(i), b, tile, tileEnd,
              threshold, loP, hiP, dset0, dset1, out)
          else {
            System.arraycopy(a.flat, i * width, left, 0, width)
            emitRangeGen(left, width, p0, a.recIds(i), b, tile, tileEnd,
              threshold, loP, hiP, dset0, dset1, out)
          }
        }
        i += 1
      }
      tile = tileEnd
    }
  }

  /** top-k path: tiled scan with one bounded heap per left row carried
    * across tiles (ascending j order preserves the tie-break). */
  private def scoreTopKTiled(
      a: Packed, b: Packed, threshold: Double, kk: Int, dset0: Int, dset1: Int,
      out: scala.collection.mutable.ArrayBuffer[Candidate]): Unit = {
    val width = a.width
    val w16 = width == 16
    val left = new Array[Long](width)
    val heapSim = new Array[Double](a.n * kk)
    val heapPos = new Array[Int](a.n * kk)
    val heapSize = new Array[Int](a.n)
    val floors = Array.fill(a.n)(threshold)
    var tile = 0
    while (tile < b.n) {
      val tileEnd = math.min(b.n, tile + TileRows)
      var i = 0
      while (i < a.n) {
        val p0 = a.pops(i)
        if (p0 > 0) {
          if (w16)
            topkRange16(a.flat, i << 4, p0, b, tile, tileEnd, threshold, kk,
              heapSim, heapPos, heapSize, floors, i)
          else {
            System.arraycopy(a.flat, i * width, left, 0, width)
            topkRangeGen(left, width, p0, b, tile, tileEnd, threshold, kk,
              heapSim, heapPos, heapSize, floors, i)
          }
        }
        i += 1
      }
      tile = tileEnd
    }
    var i = 0
    while (i < a.n) {
      val base = i * kk
      var h = 0
      while (h < heapSize(i)) {
        out += Candidate(heapSim(base + h), dset0, dset1, a.recIds(i), b.recIds(heapPos(base + h)))
        h += 1
      }
      i += 1
    }
  }

  // ---------------- k=None row×tile scanners ----------------

  private def emitRange16(
      aflat: Array[Long], base: Int, p0: Int, recId0: Long,
      b: Packed, jStart: Int, jEnd: Int,
      threshold: Double, loP: Int, hiP: Int, dset0: Int, dset1: Int,
      out: scala.collection.mutable.ArrayBuffer[Candidate]): Unit = {
    val bflat = b.flat
    val bpops = b.pops
    val l0 = aflat(base); val l1 = aflat(base + 1); val l2 = aflat(base + 2); val l3 = aflat(base + 3)
    val l4 = aflat(base + 4); val l5 = aflat(base + 5); val l6 = aflat(base + 6); val l7 = aflat(base + 7)
    val l8 = aflat(base + 8); val l9 = aflat(base + 9); val l10 = aflat(base + 10); val l11 = aflat(base + 11)
    val l12 = aflat(base + 12); val l13 = aflat(base + 13); val l14 = aflat(base + 14); val l15 = aflat(base + 15)
    var j = jStart
    while (j < jEnd) {
      val p1 = bpops(j)
      if (p1 >= loP && p1 <= hiP) {
        val o = j << 4
        val andPop = and16(l0, l1, l2, l3, l4, l5, l6, l7, l8, l9, l10, l11, l12, l13, l14, l15, bflat, o)
        val denom = p0 + p1
        if (2.0 * andPop >= threshold * denom - 1e-9) {
          val sim = 2.0 * andPop / denom
          if (sim >= threshold)
            out += Candidate(sim, dset0, dset1, recId0, b.recIds(j))
        }
      }
      j += 1
    }
  }

  private def emitRangeGen(
      left: Array[Long], width: Int, p0: Int, recId0: Long,
      b: Packed, jStart: Int, jEnd: Int,
      threshold: Double, loP: Int, hiP: Int, dset0: Int, dset1: Int,
      out: scala.collection.mutable.ArrayBuffer[Candidate]): Unit = {
    var j = jStart
    while (j < jEnd) {
      val p1 = b.pops(j)
      if (p1 >= loP && p1 <= hiP) {
        val andPop = BitVector.andPopcountFlat(left, b.flat, j * width, width)
        val denom = p0 + p1
        if (2.0 * andPop >= threshold * denom - 1e-9) {
          val sim = 2.0 * andPop / denom
          if (sim >= threshold)
            out += Candidate(sim, dset0, dset1, recId0, b.recIds(j))
        }
      }
      j += 1
    }
  }

  // ---------------- top-k row×tile scanners ----------------

  private def topkRange16(
      aflat: Array[Long], base: Int, p0: Int,
      b: Packed, jStart: Int, jEnd: Int,
      threshold: Double, kk: Int,
      heapSim: Array[Double], heapPos: Array[Int], heapSize: Array[Int],
      floors: Array[Double], row: Int): Unit = {
    val bflat = b.flat
    val bpops = b.pops
    val l0 = aflat(base); val l1 = aflat(base + 1); val l2 = aflat(base + 2); val l3 = aflat(base + 3)
    val l4 = aflat(base + 4); val l5 = aflat(base + 5); val l6 = aflat(base + 6); val l7 = aflat(base + 7)
    val l8 = aflat(base + 8); val l9 = aflat(base + 9); val l10 = aflat(base + 10); val l11 = aflat(base + 11)
    val l12 = aflat(base + 12); val l13 = aflat(base + 13); val l14 = aflat(base + 14); val l15 = aflat(base + 15)
    val hBase = row * kk
    var size = heapSize(row)
    var floor = floors(row)
    var loP = 0
    var hiP = Int.MaxValue
    if (floor > 0) {
      loP = math.ceil(floor * p0 / (2.0 - floor) - 1e-9).toInt
      hiP = math.min(Int.MaxValue.toDouble, math.floor(p0 * (2.0 - floor) / floor + 1e-9)).toInt
    }
    var j = jStart
    while (j < jEnd) {
      val p1 = bpops(j)
      if (p1 >= loP && p1 <= hiP) {
        val o = j << 4
        val andPop = and16(l0, l1, l2, l3, l4, l5, l6, l7, l8, l9, l10, l11, l12, l13, l14, l15, bflat, o)
        val denom = p0 + p1
        if (2.0 * andPop >= floor * denom - 1e-9) {
          val sim = 2.0 * andPop / denom
          if (sim >= threshold) {
            var floorChanged = false
            if (size < kk) {
              heapInsert(heapSim, heapPos, hBase, size, sim, j); size += 1
              floorChanged = size == kk && heapSim(hBase) > floor
            } else if (sim > heapSim(hBase)) {
              heapReplaceRoot(heapSim, heapPos, hBase, size, sim, j)
              floorChanged = heapSim(hBase) > floor
            }
            if (floorChanged) {
              floor = heapSim(hBase)
              loP = math.ceil(floor * p0 / (2.0 - floor) - 1e-9).toInt
              hiP = math.min(Int.MaxValue.toDouble, math.floor(p0 * (2.0 - floor) / floor + 1e-9)).toInt
            }
          }
        }
      }
      j += 1
    }
    heapSize(row) = size
    floors(row) = floor
  }

  private def topkRangeGen(
      left: Array[Long], width: Int, p0: Int,
      b: Packed, jStart: Int, jEnd: Int,
      threshold: Double, kk: Int,
      heapSim: Array[Double], heapPos: Array[Int], heapSize: Array[Int],
      floors: Array[Double], row: Int): Unit = {
    val hBase = row * kk
    var size = heapSize(row)
    var floor = floors(row)
    var loP = 0
    var hiP = Int.MaxValue
    if (floor > 0) {
      loP = math.ceil(floor * p0 / (2.0 - floor) - 1e-9).toInt
      hiP = math.min(Int.MaxValue.toDouble, math.floor(p0 * (2.0 - floor) / floor + 1e-9)).toInt
    }
    var j = jStart
    while (j < jEnd) {
      val p1 = b.pops(j)
      if (p1 >= loP && p1 <= hiP) {
        val andPop = BitVector.andPopcountFlat(left, b.flat, j * width, width)
        val denom = p0 + p1
        if (2.0 * andPop >= floor * denom - 1e-9) {
          val sim = 2.0 * andPop / denom
          if (sim >= threshold) {
            var floorChanged = false
            if (size < kk) {
              heapInsert(heapSim, heapPos, hBase, size, sim, j); size += 1
              floorChanged = size == kk && heapSim(hBase) > floor
            } else if (sim > heapSim(hBase)) {
              heapReplaceRoot(heapSim, heapPos, hBase, size, sim, j)
              floorChanged = heapSim(hBase) > floor
            }
            if (floorChanged) {
              floor = heapSim(hBase)
              loP = math.ceil(floor * p0 / (2.0 - floor) - 1e-9).toInt
              hiP = math.min(Int.MaxValue.toDouble, math.floor(p0 * (2.0 - floor) / floor + 1e-9)).toInt
            }
          }
        }
      }
      j += 1
    }
    heapSize(row) = size
    floors(row) = floor
  }

  @inline private def and16(
      l0: Long, l1: Long, l2: Long, l3: Long, l4: Long, l5: Long, l6: Long, l7: Long,
      l8: Long, l9: Long, l10: Long, l11: Long, l12: Long, l13: Long, l14: Long, l15: Long,
      f: Array[Long], o: Int): Int =
    java.lang.Long.bitCount(l0 & f(o)) +
    java.lang.Long.bitCount(l1 & f(o + 1)) +
    java.lang.Long.bitCount(l2 & f(o + 2)) +
    java.lang.Long.bitCount(l3 & f(o + 3)) +
    java.lang.Long.bitCount(l4 & f(o + 4)) +
    java.lang.Long.bitCount(l5 & f(o + 5)) +
    java.lang.Long.bitCount(l6 & f(o + 6)) +
    java.lang.Long.bitCount(l7 & f(o + 7)) +
    java.lang.Long.bitCount(l8 & f(o + 8)) +
    java.lang.Long.bitCount(l9 & f(o + 9)) +
    java.lang.Long.bitCount(l10 & f(o + 10)) +
    java.lang.Long.bitCount(l11 & f(o + 11)) +
    java.lang.Long.bitCount(l12 & f(o + 12)) +
    java.lang.Long.bitCount(l13 & f(o + 13)) +
    java.lang.Long.bitCount(l14 & f(o + 14)) +
    java.lang.Long.bitCount(l15 & f(o + 15))

  // --- binary min-heap on (sim asc, pos desc) living at [base, base+size):
  // root = worst kept pair ---
  @inline private def worse(s1: Double, p1: Int, s2: Double, p2: Int): Boolean =
    s1 < s2 || (s1 == s2 && p1 > p2)

  private def heapInsert(sims: Array[Double], pos: Array[Int], base: Int, size: Int, s: Double, p: Int): Unit = {
    var i = size
    sims(base + i) = s; pos(base + i) = p
    while (i > 0 && worse(sims(base + i), pos(base + i), sims(base + (i - 1) / 2), pos(base + (i - 1) / 2))) {
      val par = (i - 1) / 2
      swap(sims, pos, base + i, base + par)
      i = par
    }
  }

  private def heapReplaceRoot(sims: Array[Double], pos: Array[Int], base: Int, size: Int, s: Double, p: Int): Unit = {
    sims(base) = s; pos(base) = p
    var i = 0
    var continue = true
    while (continue) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(sims(base + l), pos(base + l), sims(base + m), pos(base + m))) m = l
      if (r < size && worse(sims(base + r), pos(base + r), sims(base + m), pos(base + m))) m = r
      if (m != i) { swap(sims, pos, base + i, base + m); i = m } else continue = false
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
