package graft.cand

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate-pair post-processing: multi-block dedup, global top-k
  * enforcement, and the presentation-boundary sort.
  *
  * Schema: (sim double, dset0 int, dset1 int, rec0 long, rec1 long) —
  * the Spark form of the reference's struct-of-arrays candidate pairs
  * (`/root/reference/anonlink/typechecking.py:22-24`).
  */
object Candidates {

  val columns: Seq[String] = Seq("sim", "dset0", "dset1", "rec0", "rec1")

  /** Global sort key `(-sim, dset0, dset1, rec0, rec1)` — total, so
    * sort stability is irrelevant (the reference needs a *stable*
    * mergesort because its per-block key is only `-sim`;
    * `/root/reference/anonlink/candidate_generation.py:65-66`,
    * `similarities/_utils.py:16-18`). */
  def globalSortCols = Seq(desc("sim"), asc("dset0"), asc("dset1"), asc("rec0"), asc("rec1"))

  /** C3: one record pair can be found via several shared blocks; the
    * similarity is deterministic per pair, so deduplicating on the
    * pair identity alone matches the reference's consecutive-tuple
    * dedup (`candidate_generation.py:69-70`). */
  def dedup(pairs: DataFrame): DataFrame =
    pairs.dropDuplicates("dset0", "dset1", "rec0", "rec1")

  /** C4: global-order top-k: a pair survives iff its rank under the
    * global sort is ≤ k among pairs sharing each of its endpoint
    * records (counting pairs suppressed by the other side — exactly
    * `_enforce_k`, `candidate_generation.py:43-57`; ranks count
    * unconditionally there too).
    *
    * Two `row_number` windows ordered by the full 5-tuple key — the
    * windows partition by endpoint record, so the full key makes the
    * order total and the result partitioning-invariant. */
  def enforceK(pairs: DataFrame, k: Int): DataFrame = {
    val wRight = Window.partitionBy("dset0", "dset1", "rec1").orderBy(globalSortCols: _*)
    val wLeft = Window.partitionBy("dset1", "dset0", "rec0").orderBy(globalSortCols: _*)
    pairs
      .withColumn("rank_r", row_number().over(wRight))
      .withColumn("rank_l", row_number().over(wLeft))
      .where(col("rank_r") <= k && col("rank_l") <= k)
      .drop("rank_r", "rank_l")
  }

  /** Per-BLOCK per-left-record top-k over a pair stream that still
    * carries its block `key` column. The kernel applies per-left top-k
    * per (block, salt) CELL; a salted block's union of cell top-ks is a
    * superset of the unsalted per-block top-k (each left row sees all
    * rights across its row of cells, and any true block-top-k pair
    * ranks ≤ k within its own cell too). One window restores the exact
    * per-block stream, so salting is *exactly* result-invariant — not
    * just up to `_enforce_k`'s chunked semantics. Tie-break matches the
    * kernel: equal sims prefer the smaller right record
    * (`/root/reference/anonlink/similarities/_dice_python.py:71-72`). */
  def perBlockTopK(pairsWithKey: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("key", "dset0", "dset1", "rec0")
      .orderBy(desc("sim"), asc("rec1"))
    pairsWithKey
      .withColumn("rank_b", row_number().over(w))
      .where(col("rank_b") <= k)
      .drop("rank_b")
  }

  /** Dedup + optional k-enforcement (the shape of `_merge_similarities`,
    * `candidate_generation.py:60-91`). The global sort itself is a
    * presentation property — apply [[sorted]] only at output
    * boundaries, not mid-pipeline. */
  def finalize(pairs: DataFrame, k: Option[Int]): DataFrame = {
    val d = dedup(pairs)
    k.map(enforceK(d, _)).getOrElse(d)
  }

  /** Boundary sort: the engine's only total sort (range-partitioned
    * exchange + per-partition sort in Spark — the distributed k-way
    * merge the reference hand-rolls in `serialization.py:285-338`). */
  def sorted(pairs: DataFrame): DataFrame = pairs.orderBy(globalSortCols: _*)
}
