package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cand.Candidates

/** Z1–Z3 candidate-pair exchange
  * (`/root/reference/anonlink/serialization.py`).
  *
  * The reference defines a little-endian binary shard format plus a
  * k-way heap merge so sorted shards from different workers can be
  * recombined (`serialization.py:17-41,285-338`). The ENGINE-NATIVE
  * exchange format is Parquet: shards are written sorted-within-
  * partitions under the global key, and "merge" is `union` + the
  * boundary sort — Spark's range-partitioned sort IS the distributed
  * k-way merge. For byte-level interop with anonlink /
  * anonlink-entity-service shards use [[AnonlinkFormat]], the literal
  * wire-format implementation (golden-byte verified).
  */
object CandidateIO {

  /** Z1 `dump_candidate_pairs`: write pairs sorted within files under
    * the global `(-sim, d0, d1, r0, r1)` key. */
  def save(pairs: DataFrame, path: String): Unit =
    pairs.sortWithinPartitions(Candidates.globalSortCols: _*)
      .write.mode("overwrite").parquet(path)

  /** Z2 `load_candidate_pairs`. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select("sim", "dset0", "dset1", "rec0", "rec1")

  /** Z3 `merge_streams`: shards → one stream in global order,
    * deduplicated like `_merge_similarities`
    * (`candidate_generation.py:60-91`). */
  def merge(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val all = paths.map(load(spark, _)).reduce(_ union _)
    Candidates.sorted(Candidates.dedup(all))
  }
}
