package graft.block

import graft.core.{BitVector, Hashing}

/** Bit-sampling LSH over the CLK: g tables × r pseudo-random bit
  * positions; block key = integer formed from the sampled bits,
  * disambiguated by table index (`key * g + table`) — the exact key
  * math of the reference (`/root/reference/anonlink/blocking.py:171-179`).
  * Positions are fixed by seed at plan time (semantics of the
  * reference's seeded `random.sample`, `blocking.py:159-164`).
  */
case class BitBandParams(g: Int = 48, r: Int = 12, seed: Long = 0xb17b10cL, bits: Int = 1024) {
  require(g >= 1, s"g is expected to be positive but is $g")
  require(r >= 1 && r <= 62, s"r is expected to be in [1,62] but is $r")

  /** g×r sampled bit positions, deterministic in seed. */
  lazy val positions: Array[Array[Int]] =
    Array.tabulate(g)(t => Hashing.sampleIndices(bits, r, Hashing.combine(seed, t.toLong)))
}

/** MinHash banding over the document's n-gram hash set — the classic
  * Broder construction (the north-rule "LSH/minhash-band keys").
  * numHashes = bands × rowsPerBand signatures; each band's key is the
  * hash of its rowsPerBand minima tagged with the band index. Two
  * documents with n-gram Jaccard similarity s share a given band with
  * probability s^rowsPerBand.
  */
case class MinhashParams(bands: Int = 32, rowsPerBand: Int = 3, seed: Long = 0x3155a55L) {
  require(bands >= 1 && rowsPerBand >= 1)
  def numHashes: Int = bands * rowsPerBand
  lazy val hashSeeds: Array[Long] =
    Array.tabulate(numHashes)(i => Hashing.mix64(Hashing.combine(seed, i.toLong)))
}

object Blocking {

  /** B1 bit-sampling band keys for one CLK. */
  def bitBandKeys(clk: Array[Long], p: BitBandParams): Array[Long] = {
    // a CLK shorter than the sampled range would read past the array
    // deep inside an executor task — fail with the actionable mismatch
    // instead (reachable when ClkParams.bits and BitBandParams.bits
    // are configured inconsistently, or external CLK files carry a
    // smaller filter size than the blocking config assumes)
    require(clk.length * 64 >= p.bits,
      s"CLK has ${clk.length * 64} bits but BitBandParams.bits=${p.bits} — " +
        "align the blocking config with the filter size " +
        "(e.g. BitBandBlocking(BitBandParams(bits = <your filter size>)))")
    val out = new Array[Long](p.g)
    var t = 0
    while (t < p.g) {
      val pos = p.positions(t)
      var v = 0L
      var j = 0
      while (j < pos.length) {
        if (BitVector.testBit(clk, pos(j))) v |= 1L << j
        j += 1
      }
      // key*g + table, as blocking.py:176-179
      out(t) = v * p.g + t
      t += 1
    }
    out
  }

  /** MinHash signature of an n-gram hash set. */
  def minhashSignature(ngramHashes: Array[Long], p: MinhashParams): Array[Long] = {
    val sig = Array.fill(p.numHashes)(Long.MaxValue)
    var g = 0
    while (g < ngramHashes.length) {
      val base = ngramHashes(g)
      var i = 0
      while (i < p.numHashes) {
        val h = Hashing.mix64(base ^ p.hashSeeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      g += 1
    }
    sig
  }

  /** MinHash band keys: one key per band. Empty gram set → no keys
    * (such records can never match anyway: zero CLK → sim 0). */
  def minhashBandKeys(ngramHashes: Array[Long], p: MinhashParams): Array[Long] = {
    if (ngramHashes.isEmpty) return Array.empty
    val sig = minhashSignature(ngramHashes, p)
    val out = new Array[Long](p.bands)
    var b = 0
    while (b < p.bands) {
      var h = Hashing.combine(p.seed, b.toLong)
      var j = b * p.rowsPerBand
      val end = j + p.rowsPerBand
      while (j < end) { h = Hashing.combine(h, sig(j)); j += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** B2 continuous blocking: overlapping 1-D buckets of width 2r, each
    * value in exactly two buckets, values within `radius` share ≥1
    * (`/root/reference/anonlink/blocking.py:211-215`). Pure arithmetic —
    * in DataFrame form use [[continuousKeyCols]] instead.
    */
  def continuousKeys(x: Double, radius: Double): (Long, Long) = {
    require(radius > 0, s"radius should be positive, got $radius")
    val b1 = math.floor(x / (2 * radius)).toLong
    val b2 = math.floor((x + radius) / (2 * radius)).toLong
    (b1 * 2, b2 * 2 + 1)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Column form of B2 — codegen-friendly, no UDF. */
  def continuousKeyCols(x: Column, radius: Double): Column = {
    require(radius > 0, s"radius should be positive, got $radius")
    array(
      floor(x / (2 * radius)).cast("long") * 2,
      floor((x + radius) / (2 * radius)).cast("long") * 2 + 1)
  }

  /** B4 conjunction: records share an AND-key iff they share a key in
    * every sub-function — Cartesian product of sub-keys
    * (`/root/reference/anonlink/blocking.py:64-72`). */
  def andKeys(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length * b.length)
    var i = 0; var n = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) { out(n) = Hashing.combine(a(i), b(j)); n += 1; j += 1 }
      i += 1
    }
    out
  }

  /** B5 disjunction: union of sub-function keys tagged by sub-function
    * index (`/root/reference/anonlink/blocking.py:104-114`). */
  def orKeys(keySets: Array[Long]*): Array[Long] = {
    val out = new Array[Long](keySets.map(_.length).sum)
    var n = 0
    var f = 0
    while (f < keySets.length) {
      val ks = keySets(f)
      var i = 0
      while (i < ks.length) { out(n) = Hashing.combine(f.toLong, ks(i)); n += 1; i += 1 }
      f += 1
    }
    out
  }
}
