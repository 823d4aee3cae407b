package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.Corpus

/** Writes the deterministic two-dataset overlap corpus
  * ([[graft.gen.Corpus.overlapLabeled]] — the reference's E2E layout,
  * `/root/reference/tests/test_e2e.py:16-26`) as Parquet in the
  * BASELINE `input_hint` shape, for driving [[graft.RunPipeline]] via
  * spark-submit:
  *
  * {{{
  * /opt/spark/bin/spark-submit --master local[8] --class graft.tools.MakeCorpus \
  *   target/scala-2.13/anonlinkspark_2.13-0.1.0.jar \
  *   --out /tmp/corpus --samples 75000 --proportion 0.75 --seed 211
  * }}}
  *
  * Output: `<out>/a` and `<out>/b` (url, warc_ts, html, text, lang —
  * one dataset each, `samples` rows), plus `<out>/truth`
  * (dsetId, url, entityId) for accuracy evaluation of a linkage run's
  * clusters. Fully deterministic in (samples, proportion, seed):
  * re-running reproduces byte-identical text per url.
  */
object MakeCorpus {

  final case class Config(
      out: String = "",
      samples: Long = 10000L,
      proportion: Double = 0.75,
      seed: Long = 211L,
      perturbation: Double = 0.03)

  def parse(args: Array[String]): Config = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      msg + "\nusage: MakeCorpus --out <dir> [--samples N] [--proportion p]" +
        " [--seed s] [--perturbation p]")
    var c = Config()
    var i = 0
    def next(flag: String): String = {
      if (i + 1 >= args.length) fail(s"$flag needs a value")
      i += 1; args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "--out" => c = c.copy(out = next("--out"))
        case "--samples" => c = c.copy(samples = next("--samples").toLong)
        case "--proportion" => c = c.copy(proportion = next("--proportion").toDouble)
        case "--seed" => c = c.copy(seed = next("--seed").toLong)
        case "--perturbation" => c = c.copy(perturbation = next("--perturbation").toDouble)
        case other => fail(s"unknown argument: $other")
      }
      i += 1
    }
    if (c.out.isEmpty) fail("--out is required")
    if (c.samples < 1L) fail(s"--samples must be >= 1 (got ${c.samples})")
    if (c.proportion < 0.0 || c.proportion > 1.0 || c.proportion.isNaN)
      fail(s"--proportion must be in [0, 1] (got ${c.proportion})")
    if (c.perturbation < 0.0 || c.perturbation >= 1.0 || c.perturbation.isNaN)
      fail(s"--perturbation must be in [0, 1) (got ${c.perturbation})")
    c
  }

  def write(spark: SparkSession, c: Config): Unit = {
    // one cached generation pass feeds both dataset splits + the truth
    // table (generation is the expensive part — mix64 text synthesis)
    val labeled = Corpus.overlapLabeled(
      spark, c.samples, c.proportion, c.seed, c.perturbation).cache()
    try {
      for ((d, sub) <- Seq(0 -> "a", 1 -> "b"))
        labeled.where(col("dsetId") === d)
          .select("url", "warc_ts", "html", "text", "lang")
          .write.mode("overwrite").parquet(s"${c.out}/$sub")
      labeled.select(col("dsetId"), col("url"), col("entityId"))
        .write.mode("overwrite").parquet(s"${c.out}/truth")
    } finally labeled.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val c =
      try parse(args)
      catch {
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage); sys.exit(2)
      }
    val spark = graft.RunPipeline.buildSession("graft-make-corpus")
    try write(spark, c)
    finally spark.stop()
  }
}
