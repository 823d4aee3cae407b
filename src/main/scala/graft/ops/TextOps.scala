package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Hashing

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, document
  * fingerprinting. All deterministic; the cheap ones are pure Column
  * arithmetic (whole-stage codegen), the hash-based ones are typed
  * maps over `(id, text)`.
  */
object TextOps {

  // ---------------- token counting ----------------

  /** Whitespace token count as pure Column arithmetic (identical
    * semantics in ANSI SQL for the oracle). */
  def tokenCountCol(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** BPE-ish subword count approximation: words + extra tokens for
    * long words (every 6 chars beyond the first 6 ≈ one more subword),
    * plus punctuation/digit runs. Pure Column arithmetic. */
  def subwordCountApproxCol(text: Column): Column = {
    val words = tokenCountCol(text)
    val chars = length(text).cast("long")
    val nonSpace = chars - (words - 1)
    // floor-div extra pieces for long tokens (Column `/` is double
    // division — floor+cast keeps this integer arithmetic end to end)
    words + greatest(lit(0L), floor((nonSpace - words * 6) / 6.0).cast("long"))
  }

  // ---------------- quality scoring ----------------

  /** Heuristic quality features (length/punct/stopword ratios) as one
    * struct column of doubles — all codegen'd Column math. */
  def qualityFeatures(text: Column): Column = {
    val chars = length(text).cast("double")
    val tokens = tokenCountCol(text).cast("double")
    val letters = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val puncts = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val meanWordLen = (chars - (tokens - 1)) / greatest(tokens, lit(1.0))
    struct(
      tokens.as("n_tokens"),
      meanWordLen.as("mean_word_len"),
      (letters / greatest(chars, lit(1.0))).as("letter_ratio"),
      (digits / greatest(chars, lit(1.0))).as("digit_ratio"),
      (puncts / greatest(chars, lit(1.0))).as("punct_ratio"))
  }

  /** Composite quality score in [0,1]: penalize too-short/too-long
    * docs, digit-heavy and punct-heavy text. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = least(f.getField("n_tokens") / 50.0, lit(1.0))
    val digitPenalty = greatest(lit(0.0), lit(1.0) - f.getField("digit_ratio") * 5.0)
    val punctPenalty = greatest(lit(0.0), lit(1.0) - f.getField("punct_ratio") * 5.0)
    round(lenScore * digitPenalty * punctPenalty, 6)
  }

  // ---------------- language ID ----------------

  /** Tiny per-language marker-word profiles (public-knowledge common
    * stopwords). A production system would use char-n-gram profiles; the
    * *operator shape* (score per language → argmax) is the same. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "fr" -> Seq("le", "la", "les", "et", "de", "des", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "de", "y", "que", "en", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "zh" -> Seq() // handled by CJK character detection
  )

  /** n-gram/marker heuristic language ID: returns (lang_pred, lang_score).
    * CJK codepoint share decides "zh"; otherwise the language whose
    * marker words are most frequent, "und" when nothing matches. */
  def langIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null || text.isEmpty) ("und", 0.0)
      else {
        var cjk = 0
        var i = 0
        while (i < text.length) {
          val c = text.charAt(i)
          if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
          i += 1
        }
        if (cjk * 3 >= text.length) ("zh", cjk.toDouble / text.length)
        else {
          // drop empty tokens: Java split keeps a leading "" (and SQL
          // regex splitters keep trailing ones too) — counting only
          // real tokens makes the scores splitter-independent, so the
          // DuckDB oracle can reproduce them exactly
          val tokens = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
          val n = math.max(tokens.length, 1)
          val scored = langMarkers.collect { case (lang, ms) if ms.nonEmpty =>
            val set = ms.toSet
            (lang, tokens.count(set.contains).toDouble / n)
          }
          val (bestLang, bestScore) = scored.maxBy(_._2)
          if (bestScore == 0.0) ("und", 0.0) else (bestLang, bestScore)
        }
      }
    }

  def withLangId(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", langIdUdf(col(textCol)))
      .withColumn("lang_score", col("lang_pred._2"))
      .withColumn("lang_pred", col("lang_pred._1"))

  // ---------------- fingerprinting ----------------

  /** Default seeds, named so the SQL oracle generator
    * (graft.oracle.OracleSqlGen) and these kernels cannot drift. */
  final val FingerprintSeed = 0xf19eL
  final val SimhashSeed = 0x51a54L
  final val SketchSeed = 0x57e7c4L

  /** 64-bit rolling-hash document fingerprint (order-sensitive: a
    * content hash over the token stream). */
  def docFingerprint(text: String, seed: Long = FingerprintSeed): Long = {
    var h = Hashing.mix64(seed)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) h = Hashing.combine(h, Hashing.chars(text, start, i, seed))
    }
    h
  }

  /** Winnowing-style bottom-m sketch of token 3-gram hashes: a compact,
    * order-insensitive near-dup signature (the min-k analogue of
    * MinHash, good for containment checks). */
  def bottomKSketch(text: String, m: Int = 16, seed: Long = SketchSeed): Array[Long] = {
    val grams = graft.encode.ClkEncoder.wordNgramHashes(text, 3, seed)
    if (grams.isEmpty) Array.empty
    else {
      java.util.Arrays.sort(grams)
      grams.distinct.take(m)
    }
  }

  /** 64-bit SimHash over token 3-gram hashes. */
  def simhash(text: String, seed: Long = SimhashSeed): Long = {
    val grams = graft.encode.ClkEncoder.wordNgramHashes(text, 3, seed)
    if (grams.isEmpty) return 0L
    val counts = new Array[Int](64)
    var g = 0
    while (g < grams.length) {
      val h = grams(g)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      g += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
