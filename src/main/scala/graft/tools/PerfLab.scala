package graft.tools

import org.apache.spark.sql.SparkSession
import graft._
import graft.core.BitVector
import graft.gen.RandomClks
import graft.sim.{ClkRow, DiceKernel}

/** Scratch profiling main (not part of the driver contract). */
object PerfLab {

  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"perflab-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores * 2, 8))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = 40000L
    val mode = if (args.nonEmpty) args(0) else "all"

    if (mode == "gran") {
      // task-granularity sweep for the broadcast all-pairs at 32 cores
      for (factor <- Seq(1, 2, 4)) {
        val spark = session(32)
        import spark.implicits._
        val n = 150000L
        val bRows = (0L until n).map { i =>
          val w = RandomClks.clkFor(i, 16, 0xbbL)
          ClkRow(i, BitVector.toBytes(w), BitVector.popcount(w))
        }.toArray
        val a = RandomClks.generate(spark, n, 0xaaL).repartition(32 * factor).cache()
        a.count()
        val params = LinkageParams(threshold = 0.7, k = None)
        Linkage.scoreAgainstBroadcast(a.limit(20000), bRows, params).count() // warmup
        for (trial <- 1 to 2) {
          val t0 = System.nanoTime()
          Linkage.scoreAgainstBroadcast(a, bRows, params).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[perf] gran factor=$factor trial$trial: $sec%.2f s, ${n.toDouble*n/sec/1e6}%.0f M cmp/s")
        }
        spark.stop()
      }
    }

    if (mode == "big") {
      // 500k-page smoke at default heap: memory headroom + wall time
      val spark = session(32)
      import org.apache.spark.sql.functions._
      val pages = graft.gen.Corpus.labeledPages(spark,
        graft.gen.Corpus.Params(entities = 250000L, seed = 6L, minVariants = 2, maxVariants = 2))
      val params = graft.LinkageParams(blocking = graft.MinhashBlocking(), threshold = 0.8, k = Some(5))
      var pairs: org.apache.spark.sql.DataFrame = null
      time("big candidatePairs (500k pages, 32 cores)") {
        pairs = graft.Linkage.candidatePairs(pages, params, col("dsetId")).cache()
        println(s"[perf] pairs: ${pairs.count()}")
      }
      time("big clusters CC") {
        val cl = graft.Linkage.clusters(pairs, params)
        println(s"[perf] clustered: ${cl.count()}")
        cl.unpersist()
      }
      spark.stop()
    }

    if (mode == "stages") {
      val spark = session(32)
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val pages = graft.gen.Corpus.labeledPages(spark,
        graft.gen.Corpus.Params(entities = 50000L, seed = 5L, minVariants = 2, maxVariants = 2)).cache()
      time("corpus")(pages.count())
      val params = graft.LinkageParams(blocking = graft.MinhashBlocking(), threshold = 0.8, k = Some(5))
      val enc = graft.Linkage.encode(pages, params, col("dsetId"))
      time("encode only")(enc.count())
      val encCached = enc.cache()
      time("encode cache")(encCached.count())
      val blocked = graft.Linkage.blockAndSalt(encCached, params)
      time("blockAndSalt (census+explode) on cached encode")(blocked.count())
      val scored = graft.Linkage.scorePairs(blocked, params)
      time("scorePairs")(scored.count())
      time("finalize")(graft.cand.Candidates.finalize(scored, params.k).count())
      spark.stop()
    }

    if (mode == "pipeline") {
      // full linkage pipeline at FIXTURES "bench" scale
      for (cores <- Seq(8, 32)) {
        val spark = session(cores)
        import org.apache.spark.sql.functions._
        val pages = graft.gen.Corpus.labeledPages(spark,
          graft.gen.Corpus.Params(entities = 50000L, seed = 5L, minVariants = 2, maxVariants = 2)).cache()
        time(s"corpus materialize ($cores cores)")(pages.count())
        val params = graft.LinkageParams(blocking = graft.MinhashBlocking(), threshold = 0.8, k = Some(5))
        var pairs: org.apache.spark.sql.DataFrame = null
        time(s"candidatePairs ($cores cores)") {
          pairs = graft.Linkage.candidatePairs(pages, params, col("dsetId")).cache()
          println(s"[perf] pairs: ${pairs.count()}")
        }
        time(s"clusters CC ($cores cores)") {
          val cl = graft.Linkage.clusters(pairs, params)
          println(s"[perf] clustered: ${cl.count()}")
          cl.unpersist()
        }
        time(s"greedy matching distributed ($cores cores)") {
          println(s"[perf] matched: ${graft.solve.DistributedGreedy.matching2Party(pairs).count()}")
        }
        spark.stop()
      }
    }

    if (mode == "bscale") {
      // broadcast all-pairs at several sizes/cores to separate fixed
      // overhead from per-core rate
      for (n <- Seq(200000L); cores <- Seq(4, 16, 8, 32)) {
        val spark = session(cores)
        import spark.implicits._
        val bRows = (0L until n).map { i =>
          val w = RandomClks.clkFor(i, 16, 0xbbL)
          ClkRow(i, BitVector.toBytes(w), BitVector.popcount(w))
        }.toArray
        val a = RandomClks.generate(spark, n, 0xaaL).repartition(cores * 4).cache()
        a.count()
        val params = LinkageParams(threshold = 0.7, k = None)
        for (trial <- 1 to 2) {
          val t0 = System.nanoTime()
          Linkage.scoreAgainstBroadcast(a, bRows, params).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[perf] bscale n=$n cores=$cores trial$trial: $sec%.2f s, ${n.toDouble*n/sec/1e6}%.0f M cmp/s")
        }
        spark.stop()
      }
    }

    if (mode == "micro" || mode == "all") {
      // kernel-only: same cell shape as the distributed run (2000x2000)
      val cell = 2000
      val a = (0 until cell).map(i => RandomClks.clkFor(i.toLong, 16, 0xaaL))
        .map(w => ClkRow(0L, BitVector.toBytes(w), BitVector.popcount(w))).toArray
      val b = (0 until cell).map(i => RandomClks.clkFor(i.toLong, 16, 0xbbL))
        .map(w => ClkRow(0L, BitVector.toBytes(w), BitVector.popcount(w))).toArray
      DiceKernel.blockDiceTopK(a, b, 0.7, None, 0, 1).size // warmup
      DiceKernel.blockDiceTopK(a, b, 0.7, None, 0, 1).size
      val t0 = System.nanoTime()
      var reps = 0
      while (reps < 25) { DiceKernel.blockDiceTopK(a.clone(), b.clone(), 0.7, None, 0, 1).size; reps += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[perf] kernel 2000x2000 x25: ${25.0 * cell * cell / sec / 1e6}%.1f M cmp/s single-thread")
    }

    for (cores <- Seq(8, 32) if mode == "dist" || mode == "all") {
      val spark = session(cores)
      import spark.implicits._
      val budget = 4L * 1000 * 1000
      val side = math.sqrt(budget.toDouble).toLong
      val sA = math.max(1L, math.ceil(n.toDouble / side).toLong).toInt
      val sB = sA
      val a = RandomClks.generate(spark, n, 0xaaL)
        .flatMap(r => (0 until sB).iterator.map(j =>
          BlockedRow(0L, (java.lang.Math.floorMod(r.recId, sA.toLong).toInt) * sB + j, 0, r.recId, r.clk, r.pop)))
      val b = RandomClks.generate(spark, n, 0xbbL)
        .flatMap(r => (0 until sA).iterator.map(i =>
          BlockedRow(0L, i * sB + java.lang.Math.floorMod(r.recId, sB.toLong).toInt, 1, r.recId, r.clk, r.pop)))
      val blocked = a.union(b).cache()
      time(s"materialize cache ($cores cores)")(blocked.count())
      // shuffle + group only (no kernel)
      time(s"shuffle+group only ($cores cores)") {
        blocked.groupByKey(r => (r.key, r.salt)).mapGroups { (_, rows) =>
          var c = 0L; rows.foreach(_ => c += 1); c
        }.reduce(_ + _)
      }
      // shuffle + group + pack (no scoring)
      time(s"shuffle+group+pack ($cores cores)") {
        blocked.groupByKey(r => (r.key, r.salt)).mapGroups { (_, rows) =>
          val buf = rows.map(r => ClkRow(r.recId, r.clk, r.pop)).toArray
          new DiceKernel.Packed(buf).n.toLong
        }.reduce(_ + _)
      }
      val params = LinkageParams(threshold = 0.7, k = None)
      for (trial <- 1 to 2)
        time(s"full scorePairs trial$trial ($cores cores)") {
          Linkage.scorePairs(blocked, params).count()
        }
      spark.stop()
    }
  }
}

/** Raw-loop experiments for the 16-word AND-popcount. */
object LoopLab {
  def main(args: Array[String]): Unit = {
    val n = 4000
    val rnd = new scala.util.Random(1)
    val aflat = Array.fill(n * 16)(rnd.nextLong())
    val bflat = Array.fill(n * 16)(rnd.nextLong())
    def viaArray(): Long = {
      var acc = 0L
      val left = new Array[Long](16)
      var i = 0
      while (i < n) {
        System.arraycopy(aflat, i * 16, left, 0, 16)
        var j = 0
        while (j < n) {
          val o = j * 16
          acc += java.lang.Long.bitCount(left(0) & bflat(o)) + java.lang.Long.bitCount(left(1) & bflat(o+1)) +
            java.lang.Long.bitCount(left(2) & bflat(o+2)) + java.lang.Long.bitCount(left(3) & bflat(o+3)) +
            java.lang.Long.bitCount(left(4) & bflat(o+4)) + java.lang.Long.bitCount(left(5) & bflat(o+5)) +
            java.lang.Long.bitCount(left(6) & bflat(o+6)) + java.lang.Long.bitCount(left(7) & bflat(o+7)) +
            java.lang.Long.bitCount(left(8) & bflat(o+8)) + java.lang.Long.bitCount(left(9) & bflat(o+9)) +
            java.lang.Long.bitCount(left(10) & bflat(o+10)) + java.lang.Long.bitCount(left(11) & bflat(o+11)) +
            java.lang.Long.bitCount(left(12) & bflat(o+12)) + java.lang.Long.bitCount(left(13) & bflat(o+13)) +
            java.lang.Long.bitCount(left(14) & bflat(o+14)) + java.lang.Long.bitCount(left(15) & bflat(o+15))
          j += 1
        }
        i += 1
      }
      acc
    }
    def viaLocals(): Long = {
      var acc = 0L
      var i = 0
      while (i < n) {
        val base = i * 16
        val l0 = aflat(base); val l1 = aflat(base+1); val l2 = aflat(base+2); val l3 = aflat(base+3)
        val l4 = aflat(base+4); val l5 = aflat(base+5); val l6 = aflat(base+6); val l7 = aflat(base+7)
        val l8 = aflat(base+8); val l9 = aflat(base+9); val l10 = aflat(base+10); val l11 = aflat(base+11)
        val l12 = aflat(base+12); val l13 = aflat(base+13); val l14 = aflat(base+14); val l15 = aflat(base+15)
        var j = 0
        while (j < n) {
          val o = j * 16
          acc += java.lang.Long.bitCount(l0 & bflat(o)) + java.lang.Long.bitCount(l1 & bflat(o+1)) +
            java.lang.Long.bitCount(l2 & bflat(o+2)) + java.lang.Long.bitCount(l3 & bflat(o+3)) +
            java.lang.Long.bitCount(l4 & bflat(o+4)) + java.lang.Long.bitCount(l5 & bflat(o+5)) +
            java.lang.Long.bitCount(l6 & bflat(o+6)) + java.lang.Long.bitCount(l7 & bflat(o+7)) +
            java.lang.Long.bitCount(l8 & bflat(o+8)) + java.lang.Long.bitCount(l9 & bflat(o+9)) +
            java.lang.Long.bitCount(l10 & bflat(o+10)) + java.lang.Long.bitCount(l11 & bflat(o+11)) +
            java.lang.Long.bitCount(l12 & bflat(o+12)) + java.lang.Long.bitCount(l13 & bflat(o+13)) +
            java.lang.Long.bitCount(l14 & bflat(o+14)) + java.lang.Long.bitCount(l15 & bflat(o+15))
          j += 1
        }
        i += 1
      }
      acc
    }
    for (label <- Seq("warmup", "timed")) {
      for ((name, f) <- Seq("array" -> (viaArray _), "locals" -> (viaLocals _))) {
        val t0 = System.nanoTime(); val r = f(); val sec = (System.nanoTime()-t0)/1e9
        if (label == "timed") println(f"[perf] $name: ${n.toDouble*n/sec/1e6}%.1f M pairs/s (acc=$r)")
      }
    }
  }
}

/** Plan-inspection main: dump formatted plans for the key pipeline
  * stages so column pruning / pushdown / join strategies are auditable. */
object PlanLab {
  def main(args: Array[String]): Unit = {
    val spark = PerfLab.session(8)
    import org.apache.spark.sql.functions._
    // write a real pages parquet so scan pruning is observable
    val dir = java.nio.file.Files.createTempDirectory("pages").toString
    graft.gen.Corpus.labeledPages(spark, graft.gen.Corpus.Params(entities = 200L))
      .write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir)
    val params = graft.LinkageParams()
    println("=== encode scan (expect ReadSchema WITHOUT html/warc_ts/lang) ===")
    graft.Linkage.encode(pages, params, col("dsetId")).explain("formatted")
    println("=== candidatePairs plan ===")
    graft.Linkage.candidatePairs(pages, params, col("dsetId")).explain("formatted")
    println("=== q_join_agg (expect BroadcastHashJoin) ===")
    graft.SparkEntry.queries("q_join_agg")(spark, "/root/testdata/sf0.001").explain("formatted")
    println("=== q_filter_project (expect PushedFilters) ===")
    graft.SparkEntry.queries("q_filter_project")(spark, "/root/testdata/sf0.001").explain("formatted")
    println("=== Evaluation pair sums (expect ONE Expand + HashAggregate chain " +
      "collapsing the grouping sets — single action, no pair join, no cache) ===")
    locally {
      import spark.implicits._
      val truth = Seq((0, 1L, 5L), (1, 2L, 5L)).toDF("dsetId", "recId", "entityId")
      val pred = Seq((0, 1L, 50L), (1, 2L, 50L)).toDF("dsetId", "recId", "clusterId")
      // pairwise() itself is eager (returns a LocalRelation); explain
      // the lazy aggregate it collects
      graft.solve.Evaluation.pairSums(
        graft.solve.Evaluation.joinedCells(truth, pred),
        n => shiftright(n * (n - 1), 1)).explain("formatted")
    }
    spark.stop()
  }
}

/** Time individual SparkEntry queries: `runMain graft.tools.QueryLab
  * <sfDir> <query...>` — the per-query iteration loop Bench is too
  * coarse for. */
object QueryLab {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryLab <sfDir> <query...>")
    val sfDir = args(0)
    val spark = PerfLab.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[qlab] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}

/** Pure-kernel thread-scaling probe (no Spark): T JVM threads each run
  * the packed Dice kernel over a slice of side A against a shared
  * packed side B. Isolates the MACHINE's parallel-scaling behavior
  * (host frequency scaling + shared-cache/bandwidth contention) from
  * Spark overheads — used to pick the honest N→4N pair for Bench and
  * to document the platform confound in BASELINE.md. */
object ThreadScaling {

  /** One probe series: for each thread count T, T JVM threads each run
    * the packed kernel over an n/T slice of A against all of B;
    * returns (threads, total cmp/s, best-of-`reps` wall). Shared by the
    * CLI main and [[graft.Bench]] (which embeds the series in
    * bench.json so the host-ceiling evidence is self-contained). */
  def probe(n: Int, threadCounts: Seq[Int], reps: Int = 3): Seq[(Int, Double)] = {
    import graft.core.BitVector
    import graft.gen.RandomClks
    import graft.sim.{ClkRow, DiceKernel}
    def rows(seed: Long) = (0 until n).map { i =>
      val w = RandomClks.clkFor(i.toLong, 16, seed)
      ClkRow(i.toLong, BitVector.toBytes(w), BitVector.popcount(w))
    }.toArray
    val a = new DiceKernel.Packed(rows(0xaaL))
    val b = new DiceKernel.Packed(rows(0xbbL))
    // slice a's rows into per-thread Packed views
    def slices(t: Int): Array[DiceKernel.Packed] = {
      val all = rows(0xaaL)
      (0 until t).map { i =>
        val lo = (n.toLong * i / t).toInt; val hi = (n.toLong * (i + 1) / t).toInt
        new DiceKernel.Packed(all.slice(lo, hi))
      }.toArray
    }
    // warmup
    DiceKernel.blockDiceTopKPacked(a, b, 0.7, None, 0, 1).size
    threadCounts.map { t =>
      val sl = slices(t)
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val threads = sl.map { s =>
          new Thread(() => { DiceKernel.blockDiceTopKPacked(s, b, 0.7, None, 0, 1).size; () })
        }
        val t0 = System.nanoTime()
        threads.foreach(_.start()); threads.foreach(_.join())
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (t, n.toDouble * n / best)
    }
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    // optional second arg: comma-separated thread counts (a 2-element
    // list is a ~3 s window probe, e.g. "1,8" for the submit-scaling
    // script's dedicated-core gate)
    val counts =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 2, 4, 8, 16, 32)
    probe(n, counts).foreach { case (t, cps) =>
      println(f"[scal] threads=$t%2d total=${cps / 1e6}%8.1f M cmp/s  per-thread=${cps / t / 1e6}%7.1f M")
    }
  }
}
