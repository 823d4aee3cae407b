package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.solve.Candidate

/** Statistics / diagnostics over candidate pairs — T1–T4 of
  * `/root/reference/anonlink/stats.py`. */
object Stats {

  /** T1 `similarities_hist` (`stats.py:21-35`): fixed-bin histogram of
    * similarity scores over [lo, hi]; last bin closed and empty bins
    * emitted with n=0, like np.histogram (which returns a dense array
    * of length `bins` — a groupBy alone would drop absent buckets).
    * Values outside [lo, hi] are excluded, matching np.histogram's
    * `range` semantics. */
  def similaritiesHist(pairs: DataFrame, bins: Int, lo: Double, hi: Double): DataFrame = {
    // np.histogram raises on bins < 1 or a zero-width range; without
    // this, w = 0 makes (sim - lo)/w NaN/Inf and every in-range pair
    // silently drops out of a plausible-looking all-zero histogram
    require(bins >= 1, s"bins must be >= 1 (got $bins)")
    require(hi > lo, s"histogram range must be non-degenerate (lo=$lo, hi=$hi)")
    val w = (hi - lo) / bins
    val counts = pairs
      .where(col("sim") >= lo && col("sim") <= hi)
      .select(least(floor((col("sim") - lo) / w), lit(bins - 1)).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    pairs.sparkSession.range(0, bins).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** T3 `cumul_number_matches_vs_threshold` (`stats.py:109-135`):
    * per-bucket counts + reverse cumulative sum (matches at or above
    * each threshold) via a window. */
  def cumulativeCounts(pairs: DataFrame, bins: Int, lo: Double, hi: Double): DataFrame = {
    val hist = similaritiesHist(pairs, bins, lo, hi)
    hist.withColumn("cumul",
      sum("n").over(Window.orderBy(desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** T2 `matches_nonmatches_hist` (`stats.py:38-106`): single-pass
    * 2-party greedy sweep labeling each pair match/nonmatch, binned.
    * Sequential by construction (like the reference) — driver-side over
    * the sorted candidate list, which is small after threshold+top-k. */
  def matchesNonmatchesHist(
      sorted: Seq[Candidate], bins: Int, lo: Double, hi: Double): (Array[Long], Array[Long]) = {
    val matched0 = scala.collection.mutable.HashSet.empty[Long]
    val matched1 = scala.collection.mutable.HashSet.empty[Long]
    val matches = new Array[Long](bins)
    val nonmatches = new Array[Long](bins)
    val w = (hi - lo) / bins
    for (c <- sorted) {
      val bucket = math.min(bins - 1, math.max(0, ((c.sim - lo) / w).toInt))
      if (!matched0.contains(c.rec0) && !matched1.contains(c.rec1)) {
        matched0 += c.rec0
        matched1 += c.rec1
        matches(bucket) += 1
      } else {
        nonmatches(bucket) += 1
      }
    }
    (matches, nonmatches)
  }

  /** T4 `nonmatch_index_score` (`stats.py:138-177`): index of the n-th
    * "definite nonmatch" in the sorted stream — a threshold-picking
    * heuristic. Returns -1 when fewer than n nonmatches exist. */
  def nonmatchIndexScore(sorted: Seq[Candidate], n: Int): Int = {
    val matched0 = scala.collection.mutable.HashSet.empty[Long]
    val matched1 = scala.collection.mutable.HashSet.empty[Long]
    var nonmatches = 0
    var i = 0
    for (c <- sorted) {
      if (!matched0.contains(c.rec0) && !matched1.contains(c.rec1)) {
        matched0 += c.rec0
        matched1 += c.rec1
      } else {
        nonmatches += 1
        if (nonmatches == n) return i
      }
      i += 1
    }
    -1
  }
}
