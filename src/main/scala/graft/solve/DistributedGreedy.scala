package graft.solve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.cand.Candidates

/** Exact distributed 2-party greedy matching.
  *
  * The reference's `greedy_solve` on bipartite candidate pairs is
  * greedy maximal matching in the global candidate order: walk pairs by
  * `(-sim, dset0, dset1, rec0, rec1)`; take a pair iff neither endpoint
  * is already matched (groups can never exceed size 2 on bipartite
  * input, see `tests/test_solving.py:test_greedy_2p`).
  *
  * That sequential sweep equals the parallel *mutual-best* (locally
  * dominant edge) iteration: an edge taken by the sequential sweep is
  * precisely one that is the best remaining edge of BOTH its endpoints
  * at some round — the classic parallel greedy-matching equivalence
  * (Manne & Bisseling's dominant-edge argument; exact here because the
  * 5-tuple order is total, so "best" is unique). Each round:
  * rank remaining pairs per endpoint, keep rank-1×rank-1 edges, drop
  * all pairs touching matched records, repeat. O(log n) rounds expected;
  * every round truncates lineage (stable-storage snapshots with a
  * checkpointDir, localCheckpoint otherwise).
  *
  * This gives bit-exact parity with the driver-side [[Greedy]] oracle
  * on bipartite inputs — stronger than the F1≥0.99 budget the
  * connected-components path targets (SURVEY §2.5 V1/V2).
  */
object DistributedGreedy {

  /** @param pairs (sim, dset0, dset1, rec0, rec1) all from ONE
    *              cross-dataset combination (conventionally dset0=0,
    *              dset1=1, but any two distinct ids work — the windows
    *              rank on rec0/rec1, not the ids), pair-deduplicated
    *              (as [[Candidates.finalize]] emits — with duplicate
    *              pairs at different sims the reference greedy can
    *              exceed matching semantics)
    * @return matched pairs — a subset of `pairs`, the greedy matching
    */
  def matching2Party(
      pairs: DataFrame,
      maxIterations: Int = 60,
      /** once the remainder fits comfortably on the driver, finish the
        * sweep sequentially — bounds worst-case (staircase-preference)
        * inputs where only one edge is dominant per round. The same
        * small-tail concession the reference makes by running its
        * solver single-threaded on the post-top-k candidate list. */
      driverFinishThreshold: Long = 100000L,
      /** round snapshots to stable storage when set (executor-loss-
        * safe); None → localCheckpoint, the local-mode fast path. */
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    require(maxIterations >= 1, s"maxIterations must be >= 1 (got $maxIterations)")
    val ckpt = new graft.io.Snapshots.RoundCheckpointer(checkpointDir)
    // The driver-finish gate fires at iteration 0, BEFORE the initial
    // round snapshot: a small input (the common post-threshold/top-k
    // case) goes straight from one limit-collect to the sequential
    // sweep — the whole distributed round machinery (snapshot + two
    // windows + count + anti-joins, ~8 jobs) is skipped, and the
    // sequential sweep IS the reference semantics, so the result is
    // bit-identical (pinned by the vs-sequential parity specs). An
    // input that comes back at the limit pays at most one extra
    // map-side pass of its upstream before the snapshot materializes
    // it — at real scale the caller passes a checkpointDir
    // (RunPipeline does) and the input is already a snapshot read.
    val src = pairs.select(Candidates.columns.map(col): _*)
    var remaining: DataFrame = null
    var matched: DataFrame = null
    var iter = 0
    var done = false
    // gate limit for the small-tail finish: ONE limit-collect instead
    // of count()-then-collect() (remaining is checkpointed, so the
    // double scan was cheap but still one redundant job per gated
    // round); a FULL limited collect means the tail is still big —
    // same not-full rule as ConnectedComponents' fused gate
    // clamp BEFORE adding one: threshold = Long.MaxValue must mean
    // "always driver-finish", not wrap to a gate that never fires
    val gateLimit = math.min(driverFinishThreshold, (Int.MaxValue - 2).toLong).toInt + 1
    while (!done && iter < maxIterations) {
      val gathered =
        (if (remaining == null) src else remaining).limit(gateLimit).collect()
      if (remaining == null && gathered.length >= gateLimit)
        remaining = ckpt(src)
      if (gathered != null && gathered.length < gateLimit) {
        // sequential greedy sweep over the (small) remainder
        val rem = gathered.map(r =>
          Candidate(r.getDouble(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
          .sorted(Candidate.globalOrdering)
        val taken0 = scala.collection.mutable.HashSet.empty[Long]
        val taken1 = scala.collection.mutable.HashSet.empty[Long]
        val out = rem.filter { c =>
          if (!taken0.contains(c.rec0) && !taken1.contains(c.rec1)) {
            taken0 += c.rec0; taken1 += c.rec1; true
          } else false
        }
        val tail = out.toSeq.map(c => (c.sim, c.dset0, c.dset1, c.rec0, c.rec1))
          .toDF(Candidates.columns: _*)
        matched = if (matched == null) tail else matched.unionByName(tail)
        return ckpt.finish(matched)
      }
      val w0 = Window.partitionBy("rec0").orderBy(Candidates.globalSortCols: _*)
      val w1 = Window.partitionBy("rec1").orderBy(Candidates.globalSortCols: _*)
      val ranked = remaining
        .withColumn("r0rank", row_number().over(w0))
        .withColumn("r1rank", row_number().over(w1))
      val roundMatches = ckpt(ranked
        .where(col("r0rank") === 1 && col("r1rank") === 1)
        .drop("r0rank", "r1rank"))
      matched =
        if (matched == null) roundMatches
        else ckpt(matched.unionByName(roundMatches))
      val nRound = roundMatches.count()
      if (nRound == 0) done = true
      else {
        val m0 = roundMatches.select(col("rec0")).distinct()
        val m1 = roundMatches.select(col("rec1")).distinct()
        remaining = ckpt(remaining
          .join(m0, Seq("rec0"), "left_anti")
          .join(m1, Seq("rec1"), "left_anti")
          // using-column joins reorder columns — restore the canonical
          // order so later unions/windows see a stable layout
          .select(Candidates.columns.map(col): _*))
        // no isEmpty check: the next iteration's fused limit-collect
        // (driver-finish gate) detects the empty remainder without an
        // extra job
      }
      iter += 1
    }
    // done == true ⇔ a round found no mutual-best pair ⇔ the remainder
    // is empty (any non-empty remainder's globally-best pair is mutual-
    // best). But empty-remainder DETECTION costs one extra round, so a
    // sweep whose final allowed round consumed every remaining pair
    // exits with done == false and a complete matching — only a
    // genuinely non-empty remainder means matches would be dropped
    if (!done && !remaining.isEmpty) throw new IllegalStateException(
      s"matching2Party did not converge within $maxIterations rounds; " +
        "the remaining candidate pairs would be silently dropped — raise " +
        "maxIterations or raise driverFinishThreshold (the sequential " +
        "tail finishes any remainder exactly)")
    ckpt.finish(matched)
  }

  /** Matching → cluster table (dsetId, recId, clusterId), same shape as
    * [[ConnectedComponents.clusterPairs]]. */
  def clusters2Party(pairs: DataFrame,
      checkpointDir: Option[String] = None): DataFrame = {
    val m = matching2Party(pairs, checkpointDir = checkpointDir)
    val cid = ConnectedComponents.Encoding.nodeIdCol(col("dset0"), col("rec0"))
    m.select(col("dset0").as("dsetId"), col("rec0").as("recId"), cid.as("clusterId"))
      .union(m.select(col("dset1"), col("rec1"), cid))
  }
}
