package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.block.{Blocking, MinhashParams}
import graft.core.Hashing
import graft.encode.ClkEncoder
import graft.solve.ConnectedComponents

/** Deduplication operators for a training-data pipeline, each scaled
  * the Spark way: exact = hash groupBy; near-dup = signature → band
  * bucket → bounded-task same-bucket pairs → verify → connected
  * components → canonical keeper.
  *
  * All candidate generation is *within one table* (self-dedup), unlike
  * the bipartite linkage pipeline; pairs are canonicalized `id0 < id1`.
  *
  * Two guards make the bucket self-joins web-scale-safe (a raw
  * `banded.join(banded, "band")` is quadratic in the hottest bucket —
  * 100k identical boilerplate pages would put ~10^10 pairs in one
  * task):
  *
  *  1. '''exact pre-collapse''' — identical texts enter LSH once, as
  *     their min-id representative; members are re-attached to the
  *     representative's cluster afterwards. Output-preserving: copies
  *     share all signatures, so un-collapsed they'd always land in one
  *     component whose min id IS the representative.
  *  2. '''triangle tiling''' ([[bucketPairs]]) — a still-hot bucket
  *     (many *distinct* near-identical docs) is split into bounded
  *     cells that partition its unordered-pair set exactly, the
  *     self-join analogue of `Linkage.saltExploded`'s bipartite salting
  *     (itself the recast of the reference's `split_to_chunks`,
  *     `/root/reference/anonlink/concurrency.py:39-86`).
  */
object Dedup {

  /** Instrumentation hook type for the near-dup pipelines: called with
    * a stage name and the stage's DataFrame; whatever it returns feeds
    * the next stage. Identity by default — [[graft.SparkEntry]] uses it
    * to dump deterministic intermediates for differential DuckDB
    * oracles (the SQL-expressible tail of each pipeline is then
    * hash-verified on REAL pipeline data instead of rows-only). */
  type Tap = (String, DataFrame) => DataFrame
  val noTap: Tap = (_, df) => df

  /** Exact dedup: one keeper (min id) per identical text. A shuffle on
    * a 64-bit text hash, not the text itself — at 100 TB you group by
    * the digest and keep the full text only in the payload. Digest
    * equality stands in for text equality (collision odds ~2^-64 per
    * pair; group on (digest, length) or re-verify within groups if that
    * is not acceptable for a given corpus). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // NULL text hashes as "" so exact and near-dup agree on the null ==
    // empty crawl convention (xxhash64 skips null inputs, which would
    // otherwise give nulls their own group distinct from empty texts)
    docs.groupBy(xxhash64(coalesce(col(textCol), lit(""))).as("text_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** All unordered same-bucket pairs `(id0 < id1)` from a `(bucket,
    * id)` table, with hot buckets exactly triangle-tiled: a bucket with
    * n rows where n·(n−1)/2 > `pairBudget` is split into
    * s = ⌈n/√pairBudget⌉ slices by a deterministic id hash; a pair
    * lands in exactly one cell (the diagonal cell for same-slice
    * pairs, the (lo,hi) cell otherwise), so every cell holds ≤ ~2·√budget
    * rows ⇒ ≤ ~budget pairs per task, and the union over cells is
    * EXACTLY the bucket's pair set — no recall loss, just bounded
    * tasks. Cold buckets pass through as a single cell.
    *
    * '''Star fanout cap''' (`starFanout = Some(m)`): the tiling bounds
    * pairs per TASK but a bucket's TOTAL pair set stays n·(n−1)/2 — a
    * boilerplate-template cluster of 10^6 *distinct* near-identical
    * pages (exact pre-collapse can't fire) would emit ~5·10^11
    * verification pairs. With the cap, a bucket where the full
    * triangle exceeds the star (n > 2m+1) switches to '''anchor/star
    * pairing''': m anchors are chosen deterministically per bucket
    * (smallest `xxhash64(id, bucket)`, total order) and every member
    * is paired with every anchor — n·m pairs total, O(m) per record.
    *
    * Recall semantics of the cap: two non-anchor members are never
    * verified directly — they end up in one cluster iff both verify
    * against a common anchor, so per-bucket CONNECTIVITY through the
    * anchors is preserved (a genuinely near-identical cluster stays
    * one component: every member matches every anchor), but an
    * individual non-anchor/non-anchor pair below-threshold-to-all-
    * anchors is missed. Dedup needs the cluster connected, not every
    * pair enumerated — the same trade the linkage path makes with
    * per-left top-k inside the Dice kernel. Here the cap defaults to
    * `None` (exhaustive); the dedup entry points ([[minhashLsh]],
    * [[simhash]], [[embeddingNearDup]]) default it ON at m = 64 —
    * pass `starFanout = None` there to restore exhaustive pairing.
    * Within one bucket every pair is emitted exactly once by BOTH the
    * tiling and the star path (anchor-anchor pairs are emitted only
    * from the smaller anchor's row).
    *
    * The hot census is collected to the driver like the linkage path's
    * (`Linkage.saltExploded`): hot buckets are few by construction —
    * each carries ≥ √budget distinct rows.
    *
    * Pairs are NOT deduplicated across buckets — callers `.distinct()`.
    */
  def bucketPairs(bucketed: DataFrame, pairBudget: Long = 4L * 1000 * 1000,
      starFanout: Option[Int] = None): DataFrame =
    bucketPairsWithTotal(bucketed, pairBudget, starFanout)._1

  /** Rows above which the bucket table is "large": joins over streams
    * of this size stop being broadcast-able, so sort-based strategies
    * (and their sorts) appear; callers use the flag to place a
    * SHUFFLE_HASH hint on their verification joins only in that regime
    * — below it AQE's runtime broadcast is strictly better and the hint
    * would force a worse plan. ~500k (bucket, id) rows ≈ the 10 MB
    * auto-broadcast threshold at ~20 B/row. */
  private[ops] val LargeBucketTableRows = 500000L

  /** As [[bucketPairs]], also returning the bucket table's TOTAL row
    * count (measured inside the single census action — no extra pass).
    * Callers use it for size-aware join strategy on their own
    * verification joins. */
  private[ops] def bucketPairsWithTotal(bucketed: DataFrame,
      pairBudget: Long = 4L * 1000 * 1000,
      starFanout: Option[Int] = None): (DataFrame, Long) = {
    val spark = bucketed.sparkSession
    import spark.implicits._
    require(pairBudget >= 2, s"pairBudget must be >= 2, got $pairBudget")
    starFanout.foreach(m => require(m >= 1, s"starFanout must be >= 1, got $m"))
    val base = bucketed.select(col("bucket").cast("long").as("bucket"),
      col("id").cast("long").as("id"))
    // one census action, TWO outputs: the per-bucket counts feed a tiny
    // second-level aggregate producing the grand-total row count (for
    // the join-strategy choice below) and the hot rows as a filtered
    // collect_list — no rollup/Expand (which would double every input
    // row before the partial aggregation), no second pass. collect_list
    // drops the nulls the `when` leaves for cold buckets, and the hot
    // set is small by construction (each member holds ≥ √pairBudget
    // distinct rows).
    val censusRow = base.groupBy($"bucket").agg(count(lit(1)).as("n"))
      .agg(
        coalesce(sum($"n"), lit(0L)).as("total"),
        collect_list(when($"n" * ($"n" - 1) / 2 > pairBudget,
          struct($"bucket", $"n"))).as("hot"))
      .head()
    val totalRows = censusRow.getLong(0)
    val census = censusRow.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1))).toArray
    // Cold buckets: group each bucket's ids into ONE list and expand
    // the triangle with a codegen'd nested transform — a single
    // exchange (the aggregate), versus the previous equi-self-join's
    // TWO exchanges of the full (bucket, id) stream plus a hash build
    // (or, pre-hint, two sorts). Measured ~2× faster on the 50k-doc
    // scale corpus (1.6 s vs 3.4 s for the census+join+distinct
    // stretch) and set-identical: pairs are normalized (least,
    // greatest) with i<j enumeration, exactly the a.id < b.id join
    // output. Safe to group: this stream holds ONLY cold buckets, so a
    // list row is ≤ ~2·√pairBudget ids (~32 KB at the default budget) —
    // the skewed giants that make collect_list dangerous were already
    // routed to the tiling/star paths by the census above.
    def coldPairs(d: DataFrame): DataFrame =
      d.groupBy($"bucket").agg(collect_list($"id").as("ids"))
        .where(size($"ids") >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(0, size(ids)-2), i -> " +
            "transform(sequence(i+1, size(ids)-1), j -> " +
            "struct(least(ids[i], ids[j]) as id0, greatest(ids[i], ids[j]) as id1))))"))
          .as("p"))
        .select(col("p.id0").as("id0"), col("p.id1").as("id1"))
        // strict inequality like the join's a.id < b.id: duplicate
        // (bucket, id) rows must not yield self-pairs
        .where(col("id0") =!= col("id1"))
    val side = math.max(1L, math.sqrt(pairBudget.toDouble).toLong)
    // buckets whose full triangle beats the star stay exactly tiled;
    // beyond n = 2m+1 the star is strictly smaller AND linear in n
    val (starCensus, tileCensus) = starFanout match {
      case Some(m) => census.partition { case (_, n) => n > 2L * m + 1 }
      case None => (Array.empty[(Long, Long)], census)
    }
    val hot = tileCensus.map { case (b, n) =>
      b -> math.max(1L, math.ceil(n.toDouble / side).toLong).toInt
    }.toMap
    val starSet = starCensus.map(_._1).toSet
    if (hot.isEmpty && starSet.isEmpty) return (coldPairs(base), totalRows)
    val hotB = spark.sparkContext.broadcast(hot)
    val excluded = hot.keys.toSeq ++ starSet.toSeq
    val cold = coldPairs(base.where(!col("bucket").isInCollection(excluded)))
    val starPairs: Option[DataFrame] = if (starSet.isEmpty) None else {
      val m = starFanout.get
      val starRows = base.where(col("bucket").isInCollection(starSet.toSeq))
      // deterministic anchors: the m smallest (mix64(id ^ mix64(b)), id)
      // per bucket. NOT a window — a window sort would concentrate the
      // motivating 10^6-member hot bucket into one sort task, the exact
      // skew this machinery exists to avoid. Instead: per-partition
      // bounded heaps (linear, no shuffle) → driver merge of
      // ≤ m × #star-buckets candidates per partition — same collect
      // shape as the hot census above.
      def anchorKey(b: Long, id: Long): Long = Hashing.mix64(id ^ Hashing.mix64(b))
      val partTop = starRows.as[(Long, Long)]
        .mapPartitions { it =>
          val heaps = scala.collection.mutable.HashMap
            .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Long)]]
          it.foreach { case (b, id) =>
            val k = (anchorKey(b, id), id)
            val pq = heaps.getOrElseUpdate(b,
              scala.collection.mutable.PriorityQueue.empty[(Long, Long)]) // max on top
            if (pq.size < m) pq.enqueue(k)
            else if (Ordering[(Long, Long)].lt(k, pq.head)) { pq.dequeue(); pq.enqueue(k) }
          }
          heaps.iterator.flatMap { case (b, pq) =>
            pq.iterator.map { case (h, id) => (b, h, id) }
          }
        }
      // second-level reduce BEFORE the driver: per-partition tops are
      // m × #buckets × #partitions rows — merge to the global per-
      // bucket top-m distributively so the collect is exactly
      // m × #star-buckets (the census collect times m, never scaled by
      // partition count)
      val anchors: Map[Long, Array[Long]] = partTop
        .groupByKey(_._1)
        .mapGroups { (b, it) =>
          val top = it.map(t => (t._2, t._3)).toArray.sorted.take(m).map(_._2).sorted
          (b, top)
        }
        .collect()
        .toMap
      val anchorsB = spark.sparkContext.broadcast(anchors)
      // each unordered pair exactly ONCE: a member row pairs with every
      // anchor (members are not anchors), an ANCHOR row pairs only with
      // strictly-larger anchors — without the guard every anchor-anchor
      // pair would be emitted twice (once from each anchor's row),
      // which embeddingNearDup's no-distinct contract would surface as
      // duplicate output rows
      Some(starRows.as[(Long, Long)]
        .mapPartitions { it =>
          val a = anchorsB.value
          it.flatMap { case (b, id) =>
            val as = a(b)
            val isAnchor = java.util.Arrays.binarySearch(as, id) >= 0
            as.iterator
              .filter(x => if (isAnchor) x > id else x != id)
              .map(x => (math.min(x, id), math.max(x, id)))
          }
        }
        .toDF("id0", "id1"))
    }
    val tilePairs: Option[DataFrame] = if (hot.isEmpty) None else Some(
      base.where(col("bucket").isInCollection(hot.keys.toSeq))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val h = hotB.value
        it.flatMap { case (b, id) =>
          val s = h(b)
          val own = java.lang.Math
            .floorMod(Hashing.mix64(id ^ Hashing.mix64(b)), s.toLong).toInt
          (0 until s).iterator.map { j =>
            val lo = math.min(own, j); val hi = math.max(own, j)
            // Long cell id: lo*s+hi overflows Int once s > ~46k (a
            // single bucket of ~9e7 rows at the default budget)
            (b, lo.toLong * s + hi, if (own == lo) 0 else 1, id)
          }
        }
      }
      .groupByKey { case (b, cell, _, _) => (b, cell) }
      .flatMapGroups { (key, rs) =>
        // diagonal-ness comes from the CELL ID (lo == hi ⇔ cell is a
        // multiple of s+1), never from "one side empty": an off-
        // diagonal cell whose hi slice got no rows must emit NOTHING —
        // its lo rows' within-slice pairs belong to the diagonal cell.
        val (b, cell) = key
        val s = hotB.value(b)
        val diagonal = cell % (s + 1L) == 0L && cell / (s + 1L) < s
        val lo = scala.collection.mutable.ArrayBuffer.empty[Long]
        val hi = scala.collection.mutable.ArrayBuffer.empty[Long]
        rs.foreach { case (_, _, t, id) => if (t == 0) lo += id else hi += id }
        if (diagonal) {
          // all unordered pairs within the slice (tags are all 0 here);
          // strictly a(i) < a(j) — should duplicate (bucket, id) rows
          // ever reach this path (a 64-bit band-key collision), the
          // skip keeps it self-pair-free like the cold path's a.id < b.id
          val a = lo.toArray
          java.util.Arrays.sort(a)
          a.indices.iterator.flatMap(i =>
            (i + 1 until a.length).iterator
              .filter(j => a(j) != a(i)).map(j => (a(i), a(j))))
        } else {
          // off-diagonal cell: pairs BETWEEN the two slices only (the
          // within-slice pairs belong to each slice's diagonal cell)
          lo.iterator.flatMap(x => hi.iterator.map(y =>
            (math.min(x, y), math.max(x, y))))
        }
      }
      .toDF("id0", "id1"))
    ((Seq(cold) ++ tilePairs ++ starPairs).reduce(_ unionByName _), totalRows)
  }

  /** Rebalance an under-partitioned input scan: the CPU-heavy typed
    * stages downstream (shingling, minhash, normalization) inherit the
    * SCAN's partitioning, and a small corpus packs into 1-2 scan splits
    * (openCostInBytes file packing) — serializing those stages
    * regardless of available cores. Same guard as RunPipeline's encode
    * rebalance: a 100 TB scan has thousands of partitions, so this
    * never fires at scale and large runs keep the shuffle-free
    * scan→signature path. Call with scan-shaped inputs (the operators'
    * documented input contract) — partition-count inspection of an
    * exchange-bearing plan could trigger upstream work. */
  private def rebalanced(df: DataFrame): DataFrame = {
    val minParts = df.sparkSession.sparkContext.defaultParallelism
    // size gate: only rebalance when there is enough data for the extra
    // exchange to pay for itself (measured: repartitioning a ~600 KB
    // 5k-doc table into 64 partitions of ~80 rows DOUBLED its dedup
    // query time in task overhead, while the ~15 MB 50k-doc scale
    // corpus gained ~10%). Plan statistics are free for scans.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes > 8L * 1024 * 1024 && df.rdd.getNumPartitions < minParts)
      df.repartition(2 * minParts)
    else df
  }

  /** Collapse identical texts to their min-id representative.
    * Returns (id, rep, text) where `rep == id` marks representatives.
    * Grouping is by (64-bit text digest, text length) — like
    * [[exact]], hash equality stands in for text equality (an xxhash64
    * collision would merge two distinct documents unverified; the
    * length component shrinks that surface to same-length collisions,
    * ~2^-64 per same-length pair). */
  private def withTextRep(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // crawl extracts carry NULL texts routinely (same convention as
    // Linkage.encode): treat as "" — empty gram set, can never near-dup
    // — instead of NPEing inside the executor-side shingling map.
    //
    // rep = min(id) per (digest, length) group, attached via an
    // aggregate + equi-join on the 64-bit digest instead of a window:
    // the window shuffled AND sorted every full text by digest; the
    // aggregate's shuffle carries only (digest, length, id) — 24
    // bytes/row with map-side partial aggregation (guide §2.3 "shuffle
    // keys and metadata instead of payloads") — and the join back
    // attaches rep without the per-partition sort (locally the small
    // aggregated side broadcasts; at scale both forms are one wide
    // exchange, minus the window's sort).
    val base = docs.select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .withColumn("th", xxhash64(col("text")))
      .withColumn("tl", length(col("text")))
    val reps = base.groupBy(col("th"), col("tl")).agg(min("id").as("rep"))
    base.join(reps, Seq("th", "tl")).select(col("id"), col("text"), col("rep"))
  }

  /** Re-attach collapsed members to their representative's component:
    * (id, clusterId, keeper); singleton representatives keep their own
    * id as clusterId. Output matches the un-collapsed computation: the
    * min id of any mixed component is itself a representative.
    *
    * keeper = min(id) per cluster ≡ clusterId, provably, so no window
    * (previously a full exchange + sort of the member table) and no
    * aggregate are needed:
    *  - every member id ≥ its rep ([[withTextRep]]: rep is the MIN id
    *    of its identical-text group);
    *  - a CC component's label is the MIN node id in the component
    *    ([[ConnectedComponents.run]]'s contract), and its nodes are
    *    exactly the reps wired by verified edges;
    *  - hence min over a CC cluster's members = min over its reps =
    *    component = clusterId, and for a singleton rep group
    *    min = rep = clusterId.
    * The identity is cross-checked every round by the driver's DuckDB
    * oracle, which still computes keeper as min(id) OVER (PARTITION BY
    * cluster) from the dumped intermediates, and by OpsSpec. */
  private def expandReps(withRep: DataFrame, repComps: DataFrame): DataFrame = {
    withRep.select(col("id"), col("rep"))
      .join(repComps.withColumnRenamed("node", "rep"), Seq("rep"), "left")
      .withColumn("clusterId", coalesce(col("component"), col("rep")))
      .withColumn("keeper", col("clusterId"))
      .select("id", "clusterId", "keeper")
  }

  /** MinHash + LSH near-dup clusters:
    * exact pre-collapse → shingle → minhash signature → band keys →
    * bounded same-band pairs → exact-Jaccard verification → CC →
    * member re-expansion → (id, clusterId, keeper).
    *
    * The returned frame is CACHED and already materialized (the
    * operator evaluates eagerly so its internal caches — rep collapse,
    * signatures, candidate pairs — can be unpersisted before
    * returning instead of leaking across a session); callers
    * `unpersist()` it when done.
    *
    * @param jaccardThreshold verified n-gram Jaccard to call a dup.
    * @param pairBudget max unordered pairs per band cell before
    *                   triangle tiling kicks in ([[bucketPairs]]).
    * @param starFanout per-record candidate cap for hot buckets of
    *                   DISTINCT near-identical texts (the exact
    *                   pre-collapse only absorbs byte-identical
    *                   copies): buckets beyond 2·m+1 members emit
    *                   anchor/star pairs (n·m total) instead of the
    *                   full n²/2 triangle — see [[bucketPairs]] for
    *                   the connectivity-preserving recall semantics.
    *                   `None` restores exhaustive pairing.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      params: MinhashParams = MinhashParams(),
      ngramN: Int = 3,
      jaccardThreshold: Double = 0.5,
      seed: Long = 0xded0bL,
      pairBudget: Long = 4L * 1000 * 1000,
      starFanout: Option[Int] = Some(64),
      tap: Tap = noTap): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val withRep = tap("withrep", withTextRep(rebalanced(docs), idCol, textCol)).cache()
    // one pass per representative: rep → (band keys, distinct gram set)
    val sigs = withRep.where($"id" === $"rep").select($"id", $"text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val grams = ClkEncoder.wordNgramHashes(text, ngramN, seed).distinct
        (id, Blocking.minhashBandKeys(grams, params), grams)
      }
      .toDF("id", "bands", "grams")
      .cache()

    // bounded same-band candidate pairs (canonical id0 < id1), deduped;
    // cached: the pair set feeds the verification joins — uncached, the
    // census+tiling+distinct would run twice
    // cached: the exploded band table is scanned by the census AND both
    // sides of the bucket self-join — uncached each scan re-explodes
    // (and re-deserializes the band arrays from) the signature cache
    val banded = sigs.select(explode($"bands").as("bucket"), $"id").cache()
    val (pairs0, bandedRows) = bucketPairsWithTotal(banded, pairBudget, starFanout)
    val pairs = pairs0.distinct().cache()

    // verify with exact n-gram Jaccard by attaching the two (distinct)
    // gram ARRAYS to each candidate pair and intersecting them in one
    // codegen'd expression. This replaced a gram-inverted-index join
    // ((pair, gram) scalar rows → two equi-joins → count per pair):
    // measured on the 50k-doc scale corpus the index path cost ~5-8 s
    // (two shuffles of Σ_docs |grams| ≈ 5.7M scalar rows plus a
    // Σ_pairs |grams| intermediate, then a pair-keyed aggregate) vs
    // <1 s for the array path (two joins keyed on the ~n·m-bounded pair
    // set, zero extra shuffles of gram data, O(|g0|+|g1|) per pair) —
    // guide §2.3/§2.4: fewer exchanges, fewer bytes. Shuffle payload is
    // Σ_pairs(|g0|+|g1|) gram hashes; the star-fanout cap bounds pairs
    // at n·m, so the payload is ≤ 2·m·Σ_docs |grams| — same order as
    // the scalar-row stream the index path shuffled, without its three
    // extra exchanges. Intersection counts are identical (gram sets are
    // distinct per doc on both paths), so the Jaccard doubles — and the
    // verified edge set — are bit-identical.
    // The first attach joins the (small) pair set against the
    // signatures — the planner broadcasts the pairs and streams the
    // signature cache, zero exchanges. The second attach carries the
    // g0 arrays on its left: on a LARGE corpus that side is too big to
    // broadcast and unhinted it planned as sort-merge, sorting the
    // ARRAY payloads on both sides — SHUFFLE_HASH keeps the two
    // exchanges but drops both sorts (guide §3.1; hash build per
    // partition is the bounded signature slice, never a skewed key's
    // whole payload). On a small corpus AQE's runtime broadcast is
    // strictly better, so the hint is size-gated like bucketPairs'.
    val gramsById = sigs.select($"id", $"grams")
    val g1Side = gramsById.select($"id".as("id1"), $"grams".as("g1"))
    val verified = pairs
      .join(gramsById.select($"id".as("id0"), $"grams".as("g0")), "id0")
      .join(if (bandedRows >= LargeBucketTableRows) g1Side.hint("SHUFFLE_HASH") else g1Side, "id1")
      .withColumn("inter", size(array_intersect($"g0", $"g1")).cast("long"))
      .withColumn("n0", size($"g0").cast("long"))
      .withColumn("n1", size($"g1").cast("long"))
      // union == 0 ⇔ both gram sets empty ⇔ identical-as-shingled → 1.0
      // (same convention as the reference-exact merge-intersect kernel
      // this replaces)
      .withColumn("jaccard",
        when($"n0" + $"n1" - $"inter" === 0, lit(1.0))
          .otherwise($"inter" / ($"n0" + $"n1" - $"inter")))
      .where($"jaccard" >= jaccardThreshold)
      .select($"id0", $"id1")

    // CC is eager (iterative jobs / driver finish), so by the time it
    // returns, sigs and pairs are fully consumed; the result is then
    // cached + materialized so withRep can be released too — nothing
    // internal outlives the call (see the scaladoc contract).
    // release in finally: a failed materialization (executor OOM, task
    // abort) must not leave the internal caches pinned in the session
    try {
      val comps = ConnectedComponents.run(
        tap("verified", verified).select($"id0".as("src"), $"id1".as("dst")))
      val out = expandReps(withRep, comps).cache()
      out.count()
      out
    } finally {
      withRep.unpersist(); sigs.unpersist(); pairs.unpersist(); banded.unpersist()
    }
  }

  /** SimHash near-dup: exact pre-collapse → 64-bit simhash, banded
    * into 4×16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ at least one
    * chunk identical) → bounded same-chunk pairs → exact hamming ≤
    * maxHamming → CC → member re-expansion.
    *
    * Same eager-and-cached return contract and `starFanout` cap
    * semantics as [[minhashLsh]] (simhash chunk buckets are just as
    * exposed to distinct-near-identical boilerplate clusters). */
  def simhash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      seed: Long = 0x51a54L,
      pairBudget: Long = 4L * 1000 * 1000,
      starFanout: Option[Int] = Some(64),
      tap: Tap = noTap): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxHamming <= 3, "4-chunk banding guarantees recall only for hamming <= 3")

    val withRep = tap("withrep", withTextRep(rebalanced(docs), idCol, textCol)).cache()
    val sigs = withRep.where($"id" === $"rep").select($"id", $"text")
      .as[(Long, String)]
      .map { case (id, text) => (id, TextOps.simhash(text, seed)) }
      .toDF("id", "sig")
      .cache()

    // bucket = (chunk index, 16-bit chunk value) packed into one long;
    // cached for the census + self-join scans like minhashLsh's banded
    val chunked = sigs.select(
      explode(array((0 until 4).map(c =>
        (shiftright($"sig", c * 16).bitwiseAND(0xffffL) + lit(c.toLong << 16)).as(s"k$c")): _*))
        .as("bucket"),
      $"id").cache()
    val pairs = bucketPairs(chunked, pairBudget, starFanout).distinct().cache()

    val s0 = sigs.select($"id".as("id0"), $"sig".as("s0"))
    val s1 = sigs.select($"id".as("id1"), $"sig".as("s1"))
    val verified = pairs.join(s0, "id0").join(s1, "id1")
      .withColumn("hamming", bit_count($"s0".bitwiseXOR($"s1")))
      .where($"hamming" <= maxHamming)
      .select($"id0", $"id1")

    try {
      val comps = ConnectedComponents.run(
        tap("verified", verified).select($"id0".as("src"), $"id1".as("dst")))
      val out = expandReps(withRep, comps).cache()
      out.count()
      out
    } finally {
      withRep.unpersist(); sigs.unpersist(); pairs.unpersist(); chunked.unpersist()
    }
  }

  /** Direct exact n-gram Jaccard pairs via gram-inverted-index
    * equi-join: docs → (gram, id) → candidate pairs → per-pair
    * intersection counts → Jaccard.
    *
    * '''Prefix filtering''' (`prefixFilter = true` — PPJoin's
    * position-less prefix principle, Xiao et al. WWW'08, OPT-IN): a
    * pair with Jaccard ≥ t must share at least one gram among each
    * doc's `|g| − ⌈t·|g|⌉ + 1` RAREST grams (global df ascending, gram
    * value as tie-break — any consistent total order is correct, the
    * rare-first order is the effective one). Only those prefix grams
    * enter the candidate self-join, so join volume drops from
    * Σ_g df(g)² to Σ_g pdf(g)² over rare grams; candidates are then
    * verified with intersection counts over the FULL gram index —
    * output is EXACTLY the unfiltered result at every threshold (the
    * prefix theorem prunes only pairs that cannot reach t; exactness
    * is spec-pinned across thresholds). The ⌈t·n⌉ is computed as
    * `ceil(t·n − 1e-9)`: floating-point up-rounding could only ever
    * SHORTEN the prefix (drop qualifying pairs), so the epsilon errs
    * toward a longer prefix — extra candidates are verified away,
    * never missed.
    *
    * Default OFF, by measurement: on corpora whose gram distribution
    * is flat after the df-cap (the synthetic test corpora here — most
    * grams df ≤ 2), the direct capped join is already cheap and the
    * prefix machinery (df join + per-doc rank window + candidate
    * distinct + full-index verify joins) measured 2–2.5× SLOWER at
    * t = 0.3 AND t = 0.8 (20k docs, local[32]). Turn it on for
    * Zipfian natural-language grams where many MID-frequency grams
    * (df just under the cap) dominate Σ min(df, cap)² — the regime
    * the prefix bound was designed for and the df-cap cannot help.
    *
    * Grams with document frequency above `maxDf` are treated as
    * stop-grams and removed from the gram sets entirely (both the
    * index AND the set sizes), so the Jaccard stays exact over the
    * filtered sets — a well-defined semantic, not an approximation
    * error. Without the cap one boilerplate gram with df=10^6 yields
    * 10^12 join rows in a single task; with it the join work is
    * bounded by Σ min(df, maxDf)² per gram. A stop-gram shared by both
    * docs lowers inter and union by one each, so filtered Jaccard ≤
    * unfiltered for j < 1 — the cap only ever tightens membership.
    *
    * Cache contract: SAME eager-and-release convention as the other
    * near-dup ops ([[minhashLsh]] etc.) — the filtered gram index is
    * cached for the three scans inside the plan (sizes + both join
    * sides), the RESULT is cached and materialized, and the gram index
    * is unpersisted before returning, so nothing internal outlives the
    * call; callers `unpersist()` the returned frame when done. The
    * result is the thresholded pair set — the same cardinality class
    * the eager embedding near-dup op already returns cached. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ngramN: Int = 3,
      threshold: Double = 0.5,
      seed: Long = 0x9a33L,
      maxDf: Long = 100000L,
      prefixFilter: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // df-cap via a hash-aggregate census + broadcast anti-join — no
    // sort: a `count() over (partition by gram)` window sorts the whole
    // gram index by gram; the stop-gram SET (df > maxDf) is tiny by
    // definition (each member is a near-universal boilerplate gram), so
    // it broadcasts, and the index re-derivation (n-gram hashing runs
    // twice: census pass + filtered pass) is cheap linear CPU against
    // the sort it replaces. Cached: the filtered index feeds the sizes
    // aggregate and both sides of the self-join.
    // NULL text → "" (empty gram set, no pairs) — see withTextRep
    // grams0 cached: the stop-gram census and the filtered-index cache
    // fill both scan it — uncached, the shingling flatMap over every
    // text ran twice (released in the finally with the others)
    val grams0 = rebalanced(docs).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        ClkEncoder.wordNgramHashes(text, ngramN, seed).distinct.map(g => (id, g))
      }
      .toDF("id", "gram")
      .cache()
    val stopGrams = grams0.groupBy($"gram").agg(count(lit(1)).as("df"))
      .where($"df" > maxDf).select($"gram")
    val grams = grams0.join(broadcast(stopGrams), Seq("gram"), "left_anti")
      .cache()
    val sizes = grams.groupBy($"id").agg(count(lit(1)).as("n"))
    // prefix index: each doc's |g| − ⌈t·|g|⌉ + 1 globally-rarest grams
    // (cached for the two sides of its self-join); None = full index
    val prefix: Option[DataFrame] =
      if (!prefixFilter) None
      else {
        val dfs = grams.groupBy($"gram").agg(count(lit(1)).as("df"))
        Some(grams.join(dfs, "gram")
          .withColumn("rn", row_number().over(
            Window.partitionBy($"id").orderBy($"df", $"gram")))
          .join(sizes, "id")
          .where($"rn" <= $"n" - ceil(lit(threshold) * $"n" - lit(1e-9)) + 1)
          .select($"id", $"gram")
          .cache())
      }
    val inter = prefix match {
      case None =>
        // direct self-join count: every gram-sharing pair gets its
        // intersection size in one aggregation
        grams.as("a").join(grams.as("b"), "gram")
          .where($"a.id" < $"b.id")
          .groupBy($"a.id".as("id0"), $"b.id".as("id1"))
          .agg(count(lit(1)).as("inter"))
      case Some(pfx) =>
        // candidates share a PREFIX gram (distinct — a pair can share
        // several); intersection sizes come from joining candidates
        // back to the FULL gram index, so the Jaccard is exact
        val cands = pfx.as("a").join(pfx.as("b"), "gram")
          .where($"a.id" < $"b.id")
          .select($"a.id".as("id0"), $"b.id".as("id1"))
          .distinct()
        cands
          .join(grams.select($"id".as("id0"), $"gram"), "id0")
          .join(grams.select($"id".as("id1"), $"gram"), Seq("id1", "gram"))
          .groupBy($"id0", $"id1")
          .agg(count(lit(1)).as("inter"))
    }
    try {
      val out = inter
        .join(sizes.select($"id".as("id0"), $"n".as("n0")), "id0")
        .join(sizes.select($"id".as("id1"), $"n".as("n1")), "id1")
        .withColumn("jaccard", $"inter" / ($"n0" + $"n1" - $"inter"))
        .where($"jaccard" >= threshold)
        .select($"id0", $"id1", $"jaccard")
        .cache()
      out.count()
      out
    } finally {
      grams.unpersist(); grams0.unpersist(); prefix.foreach(_.unpersist())
    }
  }

  /** Embedding-cosine near-dup PAIRS: normalized vectors, LSH-bucketed
    * by random-hyperplane sign bits, bounded same-bucket pairs
    * ([[bucketPairs]] — identical boilerplate embeddings share every
    * bucket, so the guard matters here too), verified by exact cosine.
    * `planes` must grow with corpus size (buckets ≈ 2^planes); the
    * tiling bounds task size at any setting.
    *
    * Same eager-and-cached return contract and `starFanout` semantics
    * as [[minhashLsh]] (a template cluster of near-identical
    * embeddings lands in one hyperplane bucket). */
  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double = 0.95,
      planes: Int = 8,
      seed: Long = 0xe3bedL,
      pairBudget: Long = 4L * 1000 * 1000,
      starFanout: Option[Int] = Some(64),
      tap: Tap = noTap): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // a NULL embedding cannot pair with anything (and unlike NULL text
    // there is no natural zero encoding — an all-zero "unit" vector
    // would still land every null row in one artificial hot bucket):
    // exclude such rows, which yields the same pair set a zero vector
    // would (cosine 0 < any positive threshold) without the bucket skew
    val vecs = rebalanced(embeddings)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .where(col("vec").isNotNull)
      .as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val arr = v.toArray
        var norm = 0.0
        var i = 0
        while (i < arr.length) { norm += arr(i).toDouble * arr(i); i += 1 }
        val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
        val unit = arr.map(x => (x * inv).toFloat)
        (id, unit, Ann.hyperplaneKey(unit, planes, seed))
      }
      .toDF("id", "unit", "bucket")
      .cache()
    // tap("units") is pass-through by default; with a dump tap the
    // verification reads the SAME unit vectors the oracle sees
    val units = tap("units", vecs.select($"id", $"unit"))
    // no .distinct(): each id has exactly ONE bucket, and the triangle
    // tiling puts each unordered pair in exactly one cell
    val cand = tap("cands", bucketPairs(vecs.select($"bucket", $"id"), pairBudget, starFanout))
    val u0 = units.select($"id".as("id0"), $"unit".as("u0"))
    val u1 = units.select($"id".as("id1"), $"unit".as("u1"))
    try {
      val out = cand.join(u0, "id0").join(u1, "id1")
        .withColumn("cosine", Ann.dot($"u0", $"u1"))
        .where($"cosine" >= cosineThreshold)
        .select($"id0", $"id1", $"cosine")
        .cache()
      out.count()
      out
    } finally vecs.unpersist()
  }

  /** Shared tail: pairs → CC clusters → keeper = min id per cluster.
    * Returns (id, clusterId, keeper); singletons keep themselves. */
  def clustersWithKeeper(pairs: DataFrame, allIds: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select($"id0".as("src"), $"id1".as("dst"))
    val comps = ConnectedComponents.run(edges)
    allIds.select($"id")
      .join(comps.withColumnRenamed("node", "id"), Seq("id"), "left")
      .withColumn("clusterId", coalesce($"component", $"id"))
      .drop("component")
      .withColumn("keeper", min($"id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"clusterId")))
  }
}
