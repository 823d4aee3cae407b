package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.BitVector
import graft.gen.RandomClks
import graft.sim.{ClkRow, DiceKernel}

/** Benchmark main. Prints ONE compact JSON line (clean on stdout —
  * build.sbt sets `outputStrategy := StdoutOutput` so sbt does not wrap
  * it in `[info]` decoration; compact because the driver captures a
  * bounded log TAIL, so the stdout line must stay well under ~2 KB to
  * arrive unclipped) and writes the detailed rendition (same structure
  * + per-round arrays + the thread-scaling probe) to `bench.json`:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "kernel_cmp_per_sec":..., "scaling":{...}}
  *
  * Three measurements:
  *  1. headline SparkEntry queries at the driver-provided parallelism —
  *     wall seconds each, STALL-ROBUST with PER-SAMPLE HOST CANARIES:
  *     after a neutral JIT warmup and with session caches cleared before
  *     every sample, a ~0.25 s single-thread kernel canary runs
  *     immediately before EACH sample and is recorded next to it; any
  *     query whose sample exceeds max(10 s, 3× the pass median) gets a
  *     cold re-run, ESCALATING to one more sample only when the rerun
  *     still exceeds the threshold AND disagrees with the first by
  *     >1.5× (degraded-window suspicion — two consistent slow samples
  *     mean the query is genuinely slow and are reported as-is).
  *     The artifact reports min over samples per query, every sample
  *     with its canary for re-sampled queries (`"reruns"`), a stall
  *     count (`"stalls"`), and the winning sample's canary for every
  *     query >10 s (`"query_canaries_mcps"`; bench.json has all
  *     queries) — so the driver can distinguish "slow window" (canary
  *     ≪ ~130 M) from "slow code" without trusting builder-side runs.
  *     A query that THROWS records -1 (an explicit error marker), never
  *     a fast-looking wall time;
  *  2. single-thread Dice-kernel micro-bench — comparisons/sec against
  *     the reference's ~134e6 cmp/s/core plateau at t=0.7
  *     (`/root/reference/README.rst:79-89`, methodology
  *     `/root/reference/anonlink/benchmark.py:32-66`: throughput counts
  *     the similarity stage only, on uniformly random 1024-bit CLKs);
  *  3. all-pairs distributed scoring on identical input at local[N] and
  *     local[4N] — pairs-scored/sec at both + scaling efficiency
  *     (the sandbox stand-in for the north rule's N → 4N executors),
  *     for TWO pairs: 2→8 cores (dedicated-core regime — see the
  *     comment at the measurement site and BASELINE.md) and 8→32.
  *
  * Scaling methodology: the host CPU is shared (interference) and
  * provides near-proportional CPU only up to ~8 active threads (see
  * the probe note at the measurement site), so single short trials are
  * noisy in BOTH directions. Per round each core count runs the SAME
  * input with the SAME trial count (asymmetric best-of would bias the
  * ratio) — long runs average interference out; the low/high order
  * alternates between rounds (turbo/thermal state decays across runs —
  * alternating cancels the order bias); the HEADLINE `efficiency` is
  * the MEDIAN of the per-round ratios (the max is reported alongside
  * but is upward-biased: interference during a low-core trial raises
  * that round's ratio). An executor-CPU-seconds-per-comparison ratio
  * is also reported ("cpu_work_efficiency"; note stall cycles and
  * guest-invisible host frequency both land in CPU time, so it is not
  * a pure work measure either).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores * 2, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def randomClkRows(n: Int, seed: Long): Array[ClkRow] =
    (0 until n).map { i =>
      val w = RandomClks.clkFor(i.toLong, 16, seed)
      ClkRow(0L, BitVector.toBytes(w), BitVector.popcount(w))
    }.toArray

  /** Reference-methodology micro-bench: 1×N kernel loops, one thread. */
  private def kernelMicro(): Double = {
    val n = 8000
    val a = randomClkRows(n, 0xaaL)
    val b = randomClkRows(n, 0xbbL)
    // warmup for JIT, then best of 3 (the host is shared and noisy)
    DiceKernel.blockDiceTopK(a.take(1000), b.take(1000), 0.7, None, 0, 1).size
    var best = Double.MaxValue
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      DiceKernel.blockDiceTopK(a, b, 0.7, None, 0, 1).size
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    n.toDouble * n / best
  }

  /** Short single-thread HOST CANARY (~0.25 s on a healthy window): one
    * timed pass of the same Dice kernel the micro-bench uses, run
    * immediately BEFORE each headline query sample. The kernel's clean
    * rate on this host is ~130-175 M cmp/s and is code-stable across
    * rounds, so a canary ≪ 130 M printed NEXT TO a slow query sample
    * proves the WINDOW (host interference), not the code, was slow —
    * without trusting any side run. Inputs are built once and the JIT
    * warmup runs once per process; each call after that is one timed
    * kernel pass. */
  private lazy val canaryInputs: (Array[ClkRow], Array[ClkRow]) = {
    val n = 6000
    val r = (randomClkRows(n, 0xccL), randomClkRows(n, 0xddL))
    // one-time JIT warmup so the first canary is not a compile measurement
    DiceKernel.blockDiceTopK(r._1.take(1000), r._2.take(1000), 0.7, None, 0, 1).size
    r
  }

  private def hostCanary(): Double = {
    val (a, b) = canaryInputs
    val t0 = System.nanoTime()
    DiceKernel.blockDiceTopK(a, b, 0.7, None, 0, 1).size
    a.length.toDouble * b.length / ((System.nanoTime() - t0) / 1e9)
  }

  /** All-pairs scoring throughput at a given core count: two datasets
    * of `n` random CLKs, the right side packed + broadcast (shuffle-
    * free broadcast nested-loop), t=0.7, k=None — mirrors the reference
    * 20k×20k benchmark rows (`README.rst:79-89`) at cluster scale.
    * Runs `trials` timed trials in one session; returns (best
    * pairs/sec, executor-CPU seconds of the best trial). */
  private def allPairsThroughput(cores: Int, n: Long, trials: Int): (Double, Double) = {
    val spark = session(cores)
    try {
      val bRows = (0L until n).map { i =>
        val w = RandomClks.clkFor(i, 16, 0xbbL)
        ClkRow(i, BitVector.toBytes(w), BitVector.popcount(w))
      }.toArray
      val a = RandomClks.generate(spark, n, 0xaaL)
        .repartition(cores * 2) // 2 waves: balanced without re-streaming the broadcast per tiny task
        .cache()
      a.count() // materialize input outside the timed stage
      val params = LinkageParams(threshold = 0.7, k = None)
      // short warmup (JIT + task machinery), then the timed trials
      Linkage.scoreAgainstBroadcast(a.limit((n / 8).toInt.max(1)), bRows, params).count()
      // per-trial executor CPU time — a clock/interference-independent
      // "work" measure (drain-guarded counter shared with SubmitScaling)
      val cpu = org.apache.spark.graftlistener.TaskCpuCounter
        .install(spark.sparkContext)
      var bestSec = Double.MaxValue
      var bestCpu = 0.0
      for (_ <- 1 to trials) {
        val acc = spark.sparkContext.longAccumulator("comparisons")
        cpu.reset()
        val t0 = System.nanoTime()
        Linkage.scoreAgainstBroadcast(a, bRows, params, Some(acc)).count()
        val sec = (System.nanoTime() - t0) / 1e9
        require(acc.value == n * n, s"expected ${n * n} comparisons, got ${acc.value}")
        val cpuSec = cpu.readSec()
        if (sec < bestSec) { bestSec = sec; bestCpu = cpuSec }
      }
      (n.toDouble * n / bestSec, bestCpu)
    } finally spark.stop()
  }

  /** Reset per-query session state so every headline measurement (and
    * every stall RE-measurement) starts cold-cache: operators that
    * return cached frames (the dedup family) and iterative solvers'
    * localCheckpoint blocks must not make a later query — or a rerun
    * of the SAME query — look artificially fast, and must not
    * accumulate storage pressure across a 36-query session (the
    * round-3 `CacheManager: Asked to cache already cached data` tail). */
  private def resetSessionState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** One headline-query sample: wall seconds + the host canary measured
    * immediately before it (single thread, same JVM — see hostCanary).
    * A query that THROWS records -1 (an explicit error marker), never a
    * fast-looking wall time. */
  private case class Sample(sec: Double, canaryMcps: Double)

  private def timeQuery(spark: SparkSession, sfDir: String,
      name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Sample = {
    resetSessionState(spark)
    val canary = hostCanary() / 1e6
    val t0 = System.nanoTime()
    try { fn(spark, sfDir).count(); Sample((System.nanoTime() - t0) / 1e9, canary) }
    catch { case e: Throwable =>
      System.err.println(s"[bench] query $name FAILED: ${e.getMessage}")
      Sample(-1.0, canary)
    }
  }

  /** Neutral JIT/codegen warmup: the FIRST Spark query of a session
    * pays ~6-8 s of classloading + codegen compilation that belongs to
    * the JVM, not to whichever query happens to run first
    * alphabetically. A tiny synthetic job through the same machinery
    * (parquet scan, shuffle aggregate, window, join) absorbs it
    * without touching any benched query's specific plan. */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    // best-effort: a failed warmup (missing table, schema drift) must
    // not abort the bench — per-query failures are recorded as -1 and
    // the artifact still gets written, so the warmup can't be stricter
    try {
      import org.apache.spark.sql.expressions.Window
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "lang").limit(4000).cache()
      d.count()
      d.groupBy("lang").count().count()
      d.withColumn("rn", row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
        .where(col("rn") <= 3)
        .join(d.select(col("doc_id").as("k")), col("doc_id") === col("k"))
        .count()
      d.unpersist()
      ()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup skipped: ${e.getMessage}")
    }
    resetSessionState(spark)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // 1. headline queries, stall-robust: this sandbox's host sometimes
    // stalls a process for tens of seconds (round 3's official artifact
    // recorded 107 s for a query the same commit runs in 7 s locally,
    // with an RpcTimeout stack in the tail). One sample per query lets
    // a single stall own the round, so: first pass over all queries,
    // then ONE cold re-run of every query whose wall time exceeds
    // max(10 s, 3× the first-pass median); report {first, rerun} for
    // each re-sampled query plus a stall count, and take min(first,
    // rerun) as the query's time (the min of two honest cold-cache
    // runs — reruns re-clear all session caches, so a rerun can never
    // ride a warm cache to a fake number).
    val spark = session(cpus)
    warmup(spark, sfDir)
    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
    val firstPass = qs0.map { case (name, fn) =>
      name -> timeQuery(spark, sfDir, name, fn)
    }
    val okTimes = firstPass.collect { case (_, s) if s.sec >= 0 => s.sec }.sorted
    val median = if (okTimes.isEmpty) 0.0 else okTimes(okTimes.length / 2)
    val stallThreshold = math.max(10.0, 3.0 * median)
    // ESCALATING rerun: a query whose first pass exceeds the stall
    // threshold gets ONE cold re-run; if the rerun ITSELF still exceeds
    // the threshold AND the two samples DISAGREE (>1.5× apart — the
    // round-4 both-samples-in-a-degraded-window case), take one MORE
    // sample. Two samples that AGREE need no third: the query is
    // genuinely that slow (a legitimate 20 s scale query must not be
    // triple-sampled every round), and its per-sample canaries already
    // say whether the window was healthy. Every sample carries its own
    // host canary, so the artifact distinguishes "slow window" (canary
    // ≪ ~130 M next to the slow sample) from "slow code" (healthy
    // canary, consistent slow samples) per query, without trusting any
    // builder-side run.
    val allSamples: Seq[(String, Seq[Sample])] = firstPass.map { case (name, s0) =>
      val fn = SparkEntry.queries(name)
      val samples = scala.collection.mutable.ArrayBuffer(s0)
      def disagree: Boolean = {
        val ok = samples.map(_.sec).filter(_ >= 0)
        ok.size < samples.size || ok.max > 1.5 * ok.min
      }
      if (s0.sec > stallThreshold || s0.sec < 0) {
        samples += timeQuery(spark, sfDir, name, fn)
        if (samples.last.sec > stallThreshold && disagree)
          samples += timeQuery(spark, sfDir, name, fn)
      }
      name -> samples.toSeq
    }
    val results = allSamples.map { case (name, ss) =>
      val ok = ss.filter(_.sec >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.map(_.sec).min)
    }
    val reruns: Map[String, Seq[Sample]] =
      allSamples.collect { case (n, ss) if ss.length > 1 => n -> ss }.toMap
    // winning sample's canary per query (bench.json carries ALL samples)
    val winningCanary: Map[String, Double] = allSamples.map { case (name, ss) =>
      val ok = ss.filter(_.sec >= 0)
      name -> (if (ok.isEmpty) ss.head.canaryMcps else ok.minBy(_.sec).canaryMcps)
    }.toMap
    spark.stop()

    // 2. kernel micro-bench (single thread, no Spark)
    val kernelCps = kernelMicro()

    // 3. N vs 4N scaling on identical input (see the scaladoc for the
    // noise-control methodology). TWO N→4N pairs are measured:
    //  - 2→8 cores: the DEDICATED-CORE regime. A pure-kernel probe
    //    (graft.tools.ThreadScaling) shows this host provides
    //    near-proportional CPU only up to ~8 active threads
    //    (~130-145 M cmp/s/thread at 1-8 threads, ~70-100 M at 16-32 —
    //    host oversubscription/frequency, identical code+input), so
    //    this pair is the faithful stand-in for a real fleet where
    //    every executor gets dedicated cores at both cluster sizes.
    //  - 8→32 cores: the full-box pair, reported alongside with the
    //    same rigor; its ratio is bounded by the host ceiling above,
    //    not by the plan (the plan adds no shuffle and no extra work
    //    per comparison between the two runs).
    // fail fast on bad env config — a bench that runs for minutes must
    // not crash at the reporting stage or mid-measurement
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "150000").toLong
    require(nBase >= 1, s"SPARK_GRAFT_BENCH_N must be >= 1, got $nBase")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "5").toInt
    require(rounds >= 1, s"SPARK_GRAFT_BENCH_ROUNDS must be >= 1, got $rounds")
    // symmetric single trials per round: best-of-k on only one side
    // would bias the ratio; the long runs average interference out and
    // the median across rounds rejects outliers
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "1").toInt
    require(trials >= 1, s"SPARK_GRAFT_BENCH_TRIALS must be >= 1, got $trials")
    val pairsSpec = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAIRS",
      s"2:8,${math.max(1, cpus / 4)}:$cpus")
    val pairs: Seq[(Int, Int)] =
      pairsSpec.split(",").toSeq.map { p =>
        p.split(":").map(_.trim) match {
          case Array(l, h) if l.nonEmpty && h.nonEmpty
              && l.length <= 4 && h.length <= 4 // core counts, not Ints that overflow
              && l.forall(_.isDigit) && h.forall(_.isDigit)
              && l.toInt >= 1 && h.toInt >= 1 =>
            (l.toInt, h.toInt)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_BENCH_PAIRS must look like '2:8,8:32', got '$pairsSpec'")
        }
      }.distinct
    require(pairs.nonEmpty,
      s"SPARK_GRAFT_BENCH_PAIRS parsed to zero pairs: '$pairsSpec'")

    case class PairResult(lowCores: Int, highCores: Int, n: Long,
        rounds: Seq[(Double, Double, Double, Double, Double, Double)]) {
      val ratio: Double = highCores.toDouble / lowCores
      val sortedEff: Seq[Double] = rounds.map(_._3).sorted
      val medianEff: Double = sortedEff(sortedEff.length / 2)
      val best: (Double, Double, Double, Double, Double, Double) = rounds.maxBy(_._3)
      val cpuEff: Double = {
        val es = rounds.map(m => m._4 / m._5).sorted
        es(es.length / 2)
      }
      /** Per-pair summary; `detail = true` appends the per-round array
        * (bench.json only — the stdout headline stays one SHORT line
        * the driver's log-tail window can capture whole). */
      def json(detail: Boolean): String = {
        val summary =
          s"""{"cores_low":$lowCores,"cores_high":$highCores,"n":$n,""" +
            f""""pairs_per_sec_low":${best._1}%.0f,"pairs_per_sec_high":${best._2}%.0f,""" +
            f""""efficiency":${medianEff}%.3f,"efficiency_max":${best._3}%.3f,""" +
            f""""cpu_work_efficiency":${cpuEff}%.3f"""
        if (!detail) summary + "}"
        else {
          val roundsJson = rounds.map { case (lo, hi, e, loCpu, hiCpu, canary) =>
            f"""{"low":${lo}%.0f,"high":${hi}%.0f,"eff":${e}%.3f,""" +
              f""""cpu_sec_low":${loCpu}%.1f,"cpu_sec_high":${hiCpu}%.1f,""" +
              f""""host_canary_mcps":${canary / 1e6}%.1f}"""
          }.mkString("[", ",", "]")
          summary + s""","rounds":$roundsJson}"""
        }
      }
    }

    val pairResults = pairs.map { case (lowCores, highCores) =>
      // the SAME input size for every pair and both sides — short jobs
      // (<10 s) under-read throughput by 20-30% (codegen/JIT + task
      // ramp), which would corrupt the ratio asymmetrically
      val n = nBase
      val ratio = highCores.toDouble / lowCores
      val measured = (1 to rounds).map { r =>
        // per-round single-thread canary: makes externally-degraded
        // host windows visible next to that round's ratio (the shared
        // box sometimes loses ~30% to other tenants for minutes)
        val canary = kernelMicro()
        // alternate which core count runs first (turbo/thermal decay bias)
        val (lo, loCpu, hi, hiCpu) =
          if (r % 2 == 1) {
            val (l, lc) = allPairsThroughput(lowCores, n, trials)
            val (h, hc) = allPairsThroughput(highCores, n, trials)
            (l, lc, h, hc)
          } else {
            val (h, hc) = allPairsThroughput(highCores, n, trials)
            val (l, lc) = allPairsThroughput(lowCores, n, trials)
            (l, lc, h, hc)
          }
        (lo, hi, hi / (lo * ratio), loCpu, hiCpu, canary)
      }
      PairResult(lowCores, highCores, n, measured)
    }
    val primary = pairResults.head

    // pure-kernel thread-scaling probe (1..cpus threads): self-contained
    // evidence for the host-CPU-ceiling claim next to the Spark pairs
    // (bench.json only — see BASELINE.md "platform confound")
    val probeSeries = graft.tools.ThreadScaling.probe(
      n = 15000, threadCounts = Seq(1, 2, 4, 8, 16, 32).filter(_ <= cpus), reps = 2)
    val probeJson = probeSeries.map { case (t, cps) =>
      f"""{"threads":$t,"cmp_per_sec":${cps}%.0f}""" }.mkString("[", ",", "]")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // stall annotations: per re-sampled query EVERY sample with its own
    // host canary, so the artifact itself shows whether a big number was
    // host noise (canary ≪ ~130 M next to the slow sample, rerun ≪
    // first) or real work (healthy canaries, all samples slow)
    val rerunJson = reruns.toSeq.sortBy(_._1).map { case (n, ss) =>
      val samples = ss.map(s =>
        f"""{"sec":${s.sec}%.2f,"canary_mcps":${s.canaryMcps}%.1f}""")
        .mkString("[", ",", "]")
      "\"" + n + "\":" + s"""{"samples":$samples}"""
    }.mkString("{", ",", "}")
    // per-query winning-sample canary: stdout carries only the >10 s
    // queries (compact line), bench.json carries every query
    def canaryJson(all: Boolean): String =
      results.collect { case (n, t) if all || t > 10.0 =>
        "\"" + n + "\":" + f"${winningCanary(n)}%.1f"
      }.mkString("{", ",", "}")
    // one line, two renditions: the stdout headline is COMPACT (per-pair
    // summaries only — the driver captures a bounded log tail, and a
    // multi-KB line gets truncated mid-JSON); bench.json carries the
    // same structure plus per-round arrays and the thread probe.
    def render(detail: Boolean): String = {
      val scaling = primary.json(detail = false).dropRight(1) +
        s""","pairs":${pairResults.map(_.json(detail)).mkString("[", ",", "]")}""" +
        (if (detail) s""","thread_probe":$probeJson}""" else "}")
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,""" +
        s""""stalls":${reruns.size},"reruns":$rerunJson,""" +
        s""""query_canaries_mcps":${canaryJson(all = detail)},""" +
        s""""errors":$errors,"sf":"$sfDir",""" +
        f""""kernel_cmp_per_sec":${kernelCps}%.0f,"scaling":$scaling}"""
    }
    // stdout (clean SHORT line) AND a detailed file for the driver
    println(render(detail = false))
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."), "bench.json"),
      render(detail = true))
    catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
  }
}
