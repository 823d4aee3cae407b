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
    * @param truth (dsetId, recId, entityId) — every record in scope
    * @param clusters (dsetId, recId, clusterId) — matcher output;
    *                 records absent here count as singletons
    * @return one row: (tp, pred_pairs, truth_pairs, precision, recall, f1)
    */
  def pairwise(truth: DataFrame, clusters: DataFrame): DataFrame = {
    // C(n,2) in pure integer math: n*(n-1) is even, so a right shift is
    // exact at any n — Spark's `/` is double division, which silently
    // rounds once products pass 2^53 (real cluster sizes at corpus
    // scale can get there; a hot boilerplate cluster of 10^8 already
    // does).
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
    // three pair sums run over the far smaller cell table (cached:
    // it is consumed by three aggregation branches).
    val cells = joined.groupBy("cid", "entityId").agg(count(lit(1)).as("n")).cache()
    val pred = cells.groupBy("cid").agg(sum(col("n")).as("n"))
      .agg(coalesce(sum(c2(col("n"))), lit(0L)).as("pred_pairs"))
    val tru = cells.groupBy("entityId").agg(sum(col("n")).as("n"))
      .agg(coalesce(sum(c2(col("n"))), lit(0L)).as("truth_pairs"))
    val tp = cells
      .agg(coalesce(sum(c2(col("n"))), lit(0L)).as("tp"))
    tp.crossJoin(pred).crossJoin(tru)
      .withColumn("precision",
        when(col("pred_pairs") === 0, lit(0.0))
          .otherwise(col("tp").cast("double") / col("pred_pairs")))
      .withColumn("recall",
        when(col("truth_pairs") === 0, lit(0.0))
          .otherwise(col("tp").cast("double") / col("truth_pairs")))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall")
            / (col("precision") + col("recall"))))
      .select("tp", "pred_pairs", "truth_pairs", "precision", "recall", "f1")
  }
}
