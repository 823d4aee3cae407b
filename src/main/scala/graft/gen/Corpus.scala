package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Hashing

/** Deterministic Common-Crawl-style web-page synthesizer (the
  * BASELINE.json `input_hint` table: url, warc_ts, html, text, lang).
  *
  * Mirrors the *role* of the reference's synthetic-PII corpora
  * (`/root/reference/tests/test_e2e.py:16-26`, clkhash NameList with a
  * known overlap proportion): E entities, each with 1–4 page variants;
  * a variant perturbs the entity's base text with ~10% word
  * substitutions/deletions, so within-entity Dice is high and
  * cross-entity Dice low. Hosts are drawn log-uniformly → skewed hosts
  * for the salting tests. Everything derives from `Hashing.mix64`
  * chains on (seed, entityId, variantId) — no wall clock, no RNG
  * state, identical output for any partitioning (generated
  * distributed, over `spark.range(E)`).
  */
object Corpus {

  case class Params(
      entities: Long = 1000L,
      seed: Long = 42L,
      hosts: Int = 100,
      minWords: Int = 30,
      maxWords: Int = 200,
      vocab: Int = 4000,
      perturbation: Double = 0.10,
      minVariants: Int = 1,
      maxVariants: Int = 4)

  /** Page rows BEFORE label columns are dropped:
    * (url, warc_ts, html, text, lang, entityId, variantId, dsetId).
    * `dsetId = variantId % 2` splits each entity's variants across the
    * two "datasets" (bipartite case, like `test_e2e.py`'s subset split).
    */
  def labeledPages(spark: SparkSession, p: Params): DataFrame = {
    import spark.implicits._
    val seed = p.seed
    val hosts = p.hosts
    val minW = p.minWords
    val maxW = p.maxWords
    val vocab = p.vocab
    val pert = p.perturbation
    val minVar = p.minVariants
    val maxVar = p.maxVariants

    spark.range(p.entities).as[Long].flatMap { entityId =>
      val eSeed = Hashing.combine(seed, entityId)
      val nVariants = minVar + java.lang.Math.floorMod(
        Hashing.mix64(eSeed + 1), (maxVar - minVar + 1).toLong).toInt
      val nWords = minW + java.lang.Math.floorMod(Hashing.mix64(eSeed + 2), (maxW - minW + 1).toLong).toInt
      // base text: deterministic word-index sequence from the vocab
      val baseIdx = Array.tabulate(nWords)(i =>
        java.lang.Math.floorMod(Hashing.mix64(Hashing.combine(eSeed + 3, i.toLong)), vocab.toLong).toInt)
      // skewed host: log-uniform over [1, hosts]
      val u = Hashing.toUnitDouble(Hashing.mix64(eSeed + 4))
      val host = math.min(hosts - 1, (math.pow(hosts.toDouble, u) - 1).toInt)

      (0 until nVariants).iterator.map { variantId =>
        val vSeed = Hashing.combine(eSeed, 1000L + variantId)
        val sb = new StringBuilder
        var i = 0
        while (i < baseIdx.length) {
          val r = Hashing.toUnitDouble(Hashing.mix64(Hashing.combine(vSeed, i.toLong)))
          if (variantId == 0 || r >= pert) {
            // keep the base word
            if (sb.nonEmpty) sb += ' '
            sb ++= wordFor(baseIdx(i))
          } else if (r >= pert / 2) {
            // substitute a different vocab word
            val sub = java.lang.Math.floorMod(
              Hashing.mix64(Hashing.combine(vSeed, 7777L + i)), vocab.toLong).toInt
            if (sb.nonEmpty) sb += ' '
            sb ++= wordFor(sub)
          } // else delete the word
          i += 1
        }
        val text = sb.toString
        val url = s"https://host-$host.example/e$entityId/v$variantId"
        val tsOffsetSec = java.lang.Math.floorMod(Hashing.str(url, seed), 2592000L) // 30 days
        val warcTs = new java.sql.Timestamp(1767225600000L + tsOffsetSec * 1000L) // 2026-01-01T00:00:00Z
        val html = ("<html><body>" + text + "</body></html>")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (url, warcTs, html, text, "en", entityId, variantId, variantId % 2)
      }
    }.toDF("url", "warc_ts", "html", "text", "lang", "entityId", "variantId", "dsetId")
  }

  /** The input table exactly as `input_hint` specifies it. */
  def pages(spark: SparkSession, p: Params): DataFrame =
    labeledPages(spark, p).select("url", "warc_ts", "html", "text", "lang")

  /** The reference's E2E corpus layout over pages
    * (`/root/reference/tests/test_e2e.py:16-26`): two datasets of
    * exactly `samples` records each, sharing `proportion` of their
    * entities. Entity layout: `[0, overlap)` shared (one variant per
    * dataset), `[overlap, samples)` dataset-0-only, `[samples, total)`
    * dataset-1-only. Low perturbation mirrors the reference's
    * identical-PII overlap records. Labels (`entityId`, `dsetId`)
    * retained — drop them for the `input_hint` shape. */
  def overlapLabeled(spark: SparkSession, samples: Long, proportion: Double,
      seed: Long, perturbation: Double = 0.03): DataFrame = {
    require(samples > 0L && proportion >= 0.0 && proportion <= 1.0,
      s"need samples > 0, proportion in [0,1] (got $samples, $proportion)")
    val overlap = (samples * proportion).toLong
    val total = 2L * samples - overlap
    val all = labeledPages(spark, Params(
      entities = total, seed = seed, minVariants = 2, maxVariants = 2,
      perturbation = perturbation))
    all.where(
      (col("entityId") < overlap) ||
        (col("entityId") >= overlap && col("entityId") < samples && col("dsetId") === 0) ||
        (col("entityId") >= samples && col("dsetId") === 1))
  }

  /** Deterministic pseudo-word for a vocab index (3–8 lowercase chars,
    * stable across runs). */
  def wordFor(idx: Int): String = {
    val h = Hashing.mix64(0x70cab1eL + idx)
    val len = 3 + (((h >>> 8) & 0xffL) % 6).toInt
    val chars = new Array[Char](len)
    var x = h
    var i = 0
    while (i < len) {
      chars(i) = ('a' + java.lang.Math.floorMod(x, 26L).toInt).toChar
      x = Hashing.mix64(x)
      i += 1
    }
    new String(chars)
  }
}
