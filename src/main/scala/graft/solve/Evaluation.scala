package graft.solve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed pairwise clustering evaluation — the north-rule metric
  * (pairwise F1 vs labeled entities) as a first-class operator instead
  * of a test-only helper ([[Greedy.pairwiseF1]] materializes pair
  * sets on the driver; fine for specs, unusable at corpus scale).
  *
  * Pairwise counts are computed from GROUP SIZES only, never from
  * materialized pairs: with n_c records in predicted cluster c, n_e in
  * truth entity e, and n_ce in their intersection cell,
  *
  *   predicted pairs P  = Σ_c  C(n_c, 2)
  *   truth pairs     T  = Σ_e  C(n_e, 2)
  *   true positives  TP = Σ_ce C(n_ce, 2)
  *
  * (every within-cell pair is within one cluster AND one entity, and
  * intersection cells partition both sides). A SINGLE record-level
  * hash aggregation with map-side partial combine produces the cell
  * counts; both marginals derive from the cells (n_c = Σ_e n_ce,
  * n_e = Σ_c n_ce), so a 10^12-record corpus is scanned once, the
  * shuffle carries one row per cell, and no pairs are ever
  * materialized. This is the standard pair-counting identity behind
  * the Rand index family.
  *
  * Records the matcher left unclustered count as singletons (zero
  * pairs on the predicted side, but their truth pairs still count as
  * misses — dropping them would inflate recall).
  */
object Evaluation {

  /** Pairwise precision/recall/F1 of a cluster assignment vs truth.
    *
    * Evaluates EAGERLY (the jobs run inside this call) — the one-row
    * result gains nothing from laziness and eagerness lets the method
    * release its internal cache before returning.
    *
    * @param truth (dsetId, recId, entityId) — every record in scope
    * @param clusters (dsetId, recId, clusterId) — matcher output;
    *                 records absent here count as singletons
    * @return one row: (tp, pred_pairs, truth_pairs, precision, recall, f1)
    */
  def pairwise(truth: DataFrame, clusters: DataFrame): DataFrame = {
    // C(n,2) in pure integer math: n*(n-1) is even, so a right shift is
    // exact while the product fits a Long — i.e. to n ≈ 3.0e9 members
    // in ONE cluster/entity/cell, vs n ≈ 9.5e7 where Spark's
    // double-division `/` starts rounding (a hot boilerplate cluster
    // of 10^8 already crosses that). Beyond 3e9 ANSI mode fails loudly
    // with an overflow error rather than returning a rounded count.
    val c2 = (n: org.apache.spark.sql.Column) => shiftright(n * (n - 1), 1)
    // Unmatched records become singleton clusters keyed by their own
    // node id. Cluster ids are node ids of MEMBER records (CC minima /
    // greedy rec0), so a non-member's node id cannot collide with a
    // real cluster's id.
    val joined = truth
      .join(clusters, Seq("dsetId", "recId"), "left")
      .withColumn("cid", coalesce(col("clusterId"),
        ConnectedComponents.Encoding.nodeIdCol(col("dsetId"), col("recId"))))
    // ONE record-level aggregation: the (cluster, entity) cell counts.
    // Both marginals follow from the cells (n_c = Σ_e n_ce, n_e =
    // Σ_c n_ce), so the record-scale join is scanned once and the
    // three pair sums run over the far smaller cell table. The cells
    // are cached for the three aggregation branches and EAGERLY
    // consumed: a metrics operator returning one row has nothing to
    // gain from laziness, and eager evaluation lets this method
    // unpersist its cache before returning (a lazy result would pin
    // one cell table in executor storage per pairwise() call, leaking
    // across a tuning sweep).
    val cells = joined.groupBy("cid", "entityId").agg(count(lit(1)).as("n")).cache()
    try {
      def firstLong(df: DataFrame): Long = df.collect().head.getLong(0)
      val predPairs = firstLong(cells.groupBy("cid").agg(sum(col("n")).as("n"))
        .agg(coalesce(sum(c2(col("n"))), lit(0L))))
      val truthPairs = firstLong(cells.groupBy("entityId").agg(sum(col("n")).as("n"))
        .agg(coalesce(sum(c2(col("n"))), lit(0L))))
      val tp = firstLong(cells.agg(coalesce(sum(c2(col("n"))), lit(0L))))
      // same IEEE op order as the DuckDB oracle's CASE/CAST arithmetic
      val precision = if (predPairs == 0) 0.0 else tp.toDouble / predPairs
      val recall = if (truthPairs == 0) 0.0 else tp.toDouble / truthPairs
      val f1 = if (precision + recall == 0.0) 0.0
        else 2.0 * precision * recall / (precision + recall)
      val spark = truth.sparkSession
      import spark.implicits._
      Seq((tp, predPairs, truthPairs, precision, recall, f1))
        .toDF("tp", "pred_pairs", "truth_pairs", "precision", "recall", "f1")
    } finally {
      cells.unpersist()
      ()
    }
  }
}
