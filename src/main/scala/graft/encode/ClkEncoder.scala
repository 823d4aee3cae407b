package graft.encode

import graft.core.{BitVector, Hashing}

/** CLK (cryptographic linkage key) parameters.
  *
  * @param bits   Bloom filter length in bits (1024 default, like the
  *               reference benchmarks `/root/reference/anonlink/benchmark.py:10-18`).
  * @param k      hash functions (bits set) per n-gram. clkhash's default
  *               is 30 for short PII fields; web-page *text* has far more
  *               n-grams per record, so the default here is sized to keep
  *               the filter near 50% fill for 30–200-word pages.
  * @param ngramN n-gram size.
  * @param charNgrams true → character n-grams over " "+text+" "
  *               (clkhash-style padding); false → word (shingle) n-grams.
  * @param seed   seed for the double-hashing scheme (the linkage-unit
  *               secret in real deployments).
  */
case class ClkParams(
    bits: Int = 1024,
    k: Int = 6,
    ngramN: Int = 3,
    charNgrams: Boolean = false,
    seed: Long = 0x5eedL) {
  def words: Int = BitVector.wordsFor(bits)
}

/** Deterministic text → 1024-bit CLK Bloom-filter encoder.
  *
  * The reference consumes CLKs produced by the external `clkhash`
  * library (`/root/reference/README.rst:23-24`): tokenize into n-grams,
  * hash each n-gram k times, set k bits. We re-create the same scheme
  * (double hashing: `idx_i = h1 + i*h2 mod bits`, the classic
  * Kirsch–Mitzenmacher construction clkhash also uses) over page text.
  *
  * Pure function of (text, params) — encoding determinism across
  * partitionings/reruns is a tested invariant (BASELINE.json: "CLK
  * encoding determinism").
  */
object ClkEncoder {

  /** Tokenize to word n-gram (shingle) hashes, no allocation per gram
    * beyond the rolling word-hash array. Splits on runs of whitespace. */
  def wordNgramHashes(text: String, n: Int, seed: Long): Array[Long] = {
    // First pass: hash each word window without materializing words.
    val wordHashes = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) wordHashes += Hashing.chars(text, start, i, seed)
    }
    val m = wordHashes.length
    if (m < n) {
      if (m == 0) Array.empty[Long]
      else { // short doc: single gram of all words
        var h = seed
        var j = 0
        while (j < m) { h = Hashing.combine(h, wordHashes(j)); j += 1 }
        Array(h)
      }
    } else {
      val out = new Array[Long](m - n + 1)
      var j = 0
      while (j + n <= m) {
        var h = seed
        var t = j
        while (t < j + n) { h = Hashing.combine(h, wordHashes(t)); t += 1 }
        out(j) = h
        j += 1
      }
      out
    }
  }

  /** Character n-gram hashes over " " + text + " " (clkhash-style pad). */
  def charNgramHashes(text: String, n: Int, seed: Long): Array[Long] = {
    val padded = " " + text + " "
    val m = padded.length - n + 1
    if (m <= 0) return Array.empty[Long]
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = Hashing.chars(padded, i, i + n, seed)
      i += 1
    }
    out
  }

  def ngramHashes(text: String, p: ClkParams): Array[Long] =
    if (p.charNgrams) charNgramHashes(text, p.ngramN, p.seed)
    else wordNgramHashes(text, p.ngramN, p.seed)

  /** Encode text into a packed bloom filter (`Array[Long]`). */
  def encode(text: String, p: ClkParams): Array[Long] =
    encodeFromGrams(ngramHashes(text, p), p)

  /** Bloom-insert pre-computed n-gram hashes (shared with minhash
    * banding so the text is tokenized exactly once per record). */
  def encodeFromGrams(grams: Array[Long], p: ClkParams): Array[Long] = {
    val words = new Array[Long](p.words)
    val bits = p.bits
    var g = 0
    while (g < grams.length) {
      // Kirsch–Mitzenmacher double hashing: two independent 64-bit
      // values derived from the gram hash; k indices h1 + i*h2 mod bits.
      val h1 = Hashing.mix64(grams(g) ^ p.seed)
      val h2 = Hashing.mix64(grams(g) + 0x9e3779b97f4a7c15L * (p.seed | 1L)) | 1L // odd → full-period
      var i = 0
      while (i < p.k) {
        val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, bits.toLong).toInt
        BitVector.setBit(words, idx)
        i += 1
      }
      g += 1
    }
    words
  }

  /** Encode straight to the BinaryType payload. */
  def encodeBytes(text: String, p: ClkParams): Array[Byte] =
    BitVector.toBytes(encode(text, p))
}
