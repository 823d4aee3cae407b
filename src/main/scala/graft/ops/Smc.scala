package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{BlockedRow, LinkageParams}
import graft.sim.{ClkRow, SmcKernel}

/** SMC similarity as a pipeline operator (S6 in SURVEY §2.3). */
object Smc {

  /** Deprecated alias mirroring the reference's `hamming_similarity`
    * (`/root/reference/anonlink/similarities/_smc.py:126-133`). */
  @deprecated("use Smc.scorePairs (simple matching coefficient)", "0.1.0")
  def hammingSimilarity(blocked: Dataset[BlockedRow], threshold: Double, bits: Int): DataFrame =
    scorePairs(blocked, threshold, bits)

  /** Score blocked rows with SMC ≥ threshold (same cell layout as the
    * Dice path). */
  def scorePairs(blocked: Dataset[BlockedRow], threshold: Double, bits: Int): DataFrame = {
    val spark = blocked.sparkSession
    import spark.implicits._
    // relational groupBy on the (key, salt) columns — same exchange
    // elision as Linkage.scorePairsWithKey: when the upstream blocking
    // semi-join already partitioned by key (unsalted path), the kernel
    // grouping needs no second exchange of the clk payloads.
    blocked.toDF()
      .groupBy(col("key"), col("salt")).as[(Long, Int), BlockedRow]
      .flatMapGroups { (_, rows) =>
        val a = scala.collection.mutable.ArrayBuffer.empty[ClkRow]
        val b = scala.collection.mutable.ArrayBuffer.empty[ClkRow]
        rows.foreach { r =>
          // the reference raises NotImplementedError for >2 datasets
          // (`/root/reference/anonlink/similarities/_smc.py:109-112`);
          // silently lumping dsetId>=2 into side 1 would cross-score
          // mislabeled records, so fail loudly the same way.
          require(r.dsetId <= 1,
            s"SMC supports exactly 2 datasets; got dsetId=${r.dsetId}")
          if (r.dsetId == 0) a += ClkRow(r.recId, r.clk, r.pop)
          else b += ClkRow(r.recId, r.clk, r.pop)
        }
        SmcKernel.blockSmc(a.toArray, b.toArray, threshold, bits, 0, 1)
      }
      .toDF("sim", "dset0", "dset1", "rec0", "rec1")
  }

  /** SMC's top-k rule: keep a pair iff it ranks ≤ k on **both** sides,
    * ties broken by `(-sim, rec0, rec1)`
    * (`/root/reference/anonlink/similarities/_smc.py:51-66` —
    * `pair_counter == 2`). Unlike Dice's `_enforce_k`, ranks here do
    * not count suppressed pairs; two plain windows express it. */
  def bothSidesTopK(pairs: DataFrame, k: Int): DataFrame = {
    val order = Seq(desc("sim"), asc("rec0"), asc("rec1"))
    val wLeft = Window.partitionBy("dset0", "dset1", "rec0").orderBy(order: _*)
    val wRight = Window.partitionBy("dset0", "dset1", "rec1").orderBy(order: _*)
    pairs
      .withColumn("rank_l", row_number().over(wLeft))
      .withColumn("rank_r", row_number().over(wRight))
      .where(col("rank_l") <= k && col("rank_r") <= k)
      .drop("rank_l", "rank_r")
  }
}
