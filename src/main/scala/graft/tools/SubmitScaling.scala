package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.RunPipeline

/** spark-submit vehicle for the north rule's two-cluster-size scaling
  * evidence: runs the REAL deployment pipeline ([[graft.RunPipeline]]
  * — encode → block/salt → Dice kernel → candidates → greedy solver)
  * on a [[MakeCorpus]] corpus and reports pairs-scored/sec plus
  * pairwise F1 vs the corpus truth table, as ONE JSON line on stdout.
  *
  * Submit the SAME invocation at two `--master local[N]` sizes (the
  * N and 4N stand-in — see BASELINE.md on why 2→8 is this host's
  * dedicated-core regime) and compare `cmp_per_sec`:
  *
  * {{{
  * /opt/spark/bin/spark-submit --master local[2] --class graft.tools.SubmitScaling \
  *   target/scala-2.13/anonlinkspark_2.13-0.1.0.jar \
  *   --corpus /tmp/graft_submit/corpus --warm-corpus /tmp/graft_submit/warm \
  *   --work /tmp/graft_submit/run_2 --threshold 0.8 --k 5
  * }}}
  *
  * `--warm-corpus` (a small MakeCorpus output) is run first through the
  * identical pipeline and discarded: a fresh spark-submit JVM pays
  * several seconds of JIT/codegen on its first query, which would
  * otherwise tax the shorter high-core run proportionally more and
  * bias the ratio downward (same neutral-warmup protocol as
  * `graft.Bench`). The measured run's numbers come from the pipeline's
  * own accumulator metrics (comparisons = Σ|A|·|B| kernel work — the
  * reference benchmark's "comparisons" metric, `benchmark.py:32-66`).
  */
object SubmitScaling {

  final case class Config(
      corpus: String = "",
      warmCorpus: Option[String] = None,
      work: String = "",
      threshold: Double = 0.8,
      k: Option[Int] = Some(5),
      solver: String = "greedy",
      trials: Int = 1)

  def parse(args: Array[String]): Config = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      msg + "\nusage: SubmitScaling --corpus <dir> --work <dir>" +
        " [--warm-corpus <dir>] [--threshold t] [--k n|none]" +
        " [--solver s] [--trials n]")
    var c = Config()
    var i = 0
    def next(flag: String): String = {
      if (i + 1 >= args.length) fail(s"$flag needs a value")
      i += 1; args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "--corpus" => c = c.copy(corpus = next("--corpus"))
        case "--warm-corpus" => c = c.copy(warmCorpus = Some(next("--warm-corpus")))
        case "--work" => c = c.copy(work = next("--work"))
        case "--threshold" => c = c.copy(threshold = next("--threshold").toDouble)
        case "--k" =>
          val v = next("--k")
          c = c.copy(k = if (v.equalsIgnoreCase("none")) None else Some(v.toInt))
        case "--solver" => c = c.copy(solver = next("--solver"))
        case "--trials" => c = c.copy(trials = next("--trials").toInt)
        case other => fail(s"unknown argument: $other")
      }
      i += 1
    }
    if (c.corpus.isEmpty) fail("--corpus is required")
    if (c.work.isEmpty) fail("--work is required")
    if (c.trials < 1) fail(s"--trials must be >= 1 (got ${c.trials})")
    c
  }

  private def pipelineConfig(corpus: String, out: String, c: Config) =
    RunPipeline.Config(
      inputs = Seq(s"$corpus/a", s"$corpus/b"), out = out,
      threshold = c.threshold, k = c.k, solver = c.solver)

  /** Host-window canary taken immediately before a trial: raw kernel
    * throughput at 1 thread and at `cores` threads (no Spark in the
    * loop). `ratio` = per-thread retention at `cores` threads vs 1 —
    * the host's CPU-provisioning health AT this submit's parallelism
    * in THIS window. On a shared box the single-thread number can look
    * clean while multithread capacity is halved (other tenants), which
    * silently deflates the high-core side of a scaling pair; the
    * per-trial ratio makes that visible inside the artifact instead of
    * requiring a side probe run. */
  final case class Canary(mcps1t: Double, perThreadMcps: Double, ratio: Double)

  private def canary(cores: Int): Canary = {
    val probed = ThreadScaling.probe(6000, Seq(1, cores), reps = 2)
    val c1 = probed.head._2
    val ct = probed.last._2
    Canary(c1 / 1e6, ct / cores / 1e6, ct / (cores * c1))
  }

  /** Runs warmup + trials on an existing session; returns the JSON
    * report line. Separated from [[main]] so a spec can drive the
    * exact submitted code path. */
  def run(spark: SparkSession, c: Config): String = {
    val cores = spark.sparkContext.defaultParallelism
    // executor CPU time per trial: the cross-size ratio of CPU-seconds
    // per comparison is the scaling number that survives a noisy window
    val cpu = org.apache.spark.graftlistener.TaskCpuCounter
      .install(spark.sparkContext)
    val trials =
      try {
        c.warmCorpus.foreach { w =>
          RunPipeline.run(spark, pipelineConfig(w, s"${c.work}/warm_out", c))
        }
        (1 to c.trials).map { t =>
          val can = canary(cores)
          cpu.reset()
          val s = RunPipeline.run(spark, pipelineConfig(c.corpus, s"${c.work}/out_$t", c))
          (s, can, cpu.readSec())
        }
      } finally cpu.remove() // the caller's session outlives this run
    val summaries = trials.map(_._1)

    // pairwise F1 of the last trial's clusters vs the corpus truth
    val truth = spark.read.parquet(s"${c.corpus}/truth")
      .select(col("dsetId"), graft.Linkage.recIdCol(col("url")).as("recId"),
        col("entityId"))
    val clusters = spark.read.parquet(s"${c.work}/out_${c.trials}")
      .select("dsetId", "recId", "clusterId")
    val f1 = graft.solve.Evaluation.pairwise(truth, clusters)
      .select(col("f1")).head().getDouble(0)

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    def cps(s: RunPipeline.Summary): Double =
      if (s.pairsSec > 0) s.comparisons / s.pairsSec else 0.0
    val trialsJson = trials.map { case (s, can, cpuSec) =>
      s"""{"comparisons":${s.comparisons},"pairs":${s.pairs},""" +
        s""""pairs_sec":${fmt(s.pairsSec)},"cmp_per_sec":${fmt(cps(s))},""" +
        s""""cpu_sec":${fmt(cpuSec)},""" +
        s""""canary_1t_mcps":${fmt(can.mcps1t)},""" +
        s""""canary_${cores}t_per_thread_mcps":${fmt(can.perThreadMcps)},""" +
        s""""host_ratio":${fmt(can.ratio)}}"""
    }.mkString("[", ",", "]")
    // best_cpu_sec belongs to the SAME trial best_cmp_per_sec reports
    // (selecting by wall alone would diverge if comparisons ever
    // differed across trials, e.g. a resumed trial reporting 0)
    val bestTrial = trials.maxBy { case (s, _, _) => cps(s) }
    val best = cps(bestTrial._1)
    // median host ratio across trials; even counts average the middle
    // two (taking the upper-middle would report the MAX of two trials,
    // hiding exactly the degraded window the canary exists to surface)
    val ratios = trials.map(_._2.ratio).sorted
    val medRatio =
      if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2
    s"""{"cores":$cores,"best_cmp_per_sec":${fmt(best)},""" +
      s""""best_cpu_sec":${fmt(bestTrial._3)},""" +
      s""""host_ratio_median":${fmt(medRatio)},""" +
      s""""f1":${fmt(f1)},"trials":$trialsJson}"""
  }

  def main(args: Array[String]): Unit = {
    val c =
      try parse(args)
      catch {
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage); sys.exit(2)
      }
    val spark = RunPipeline.buildSession("graft-submit-scaling")
    try println(run(spark, c))
    finally spark.stop()
  }
}
