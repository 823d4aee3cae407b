package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.block.{Blocking, MinhashParams}
import graft.core.Hashing
import graft.encode.ClkEncoder
import graft.solve.ConnectedComponents

/** Deduplication operators for a training-data pipeline, each scaled
  * the Spark way: exact = hash groupBy; near-dup = signature → band
  * bucket equi-join → verify → connected components → canonical keeper.
  *
  * All candidate generation is *within one table* (self-dedup), unlike
  * the bipartite linkage pipeline; pairs are canonicalized `id0 < id1`.
  */
object Dedup {

  /** Exact dedup: one keeper (min id) per identical text. A shuffle on
    * a 64-bit text hash, not the text itself — at 100 TB you group by
    * the digest and keep the full text only in the payload. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-dup clusters:
    * shingle → minhash signature → band keys → same-band pairs →
    * exact-Jaccard verification → CC → (id, clusterId, keeper).
    *
    * @param jaccardThreshold verified n-gram Jaccard to call a dup.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      params: MinhashParams = MinhashParams(),
      ngramN: Int = 3,
      jaccardThreshold: Double = 0.5,
      seed: Long = 0xded0bL): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // one pass: id → (band keys, bottom sketch for verification)
    val sigs = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val grams = ClkEncoder.wordNgramHashes(text, ngramN, seed).distinct
        java.util.Arrays.sort(grams)
        (id, Blocking.minhashBandKeys(grams, params), grams)
      }
      .toDF("id", "bands", "grams")
      .cache()

    // band-bucket candidate pairs (canonical id0 < id1), deduped
    val banded = sigs.select($"id", explode($"bands").as("band"))
    val pairs = banded.as("a").join(banded.as("b"), "band")
      .where($"a.id" < $"b.id")
      .select($"a.id".as("id0"), $"b.id".as("id1"))
      .distinct()

    // verify with exact n-gram Jaccard over the sorted gram arrays
    val jacc = udf { (a: Seq[Long], b: Seq[Long]) =>
      if (a.isEmpty && b.isEmpty) 1.0
      else {
        var i = 0; var j = 0; var inter = 0L
        while (i < a.length && j < b.length) {
          val c = java.lang.Long.compare(a(i), b(j))
          if (c == 0) { inter += 1; i += 1; j += 1 }
          else if (c < 0) i += 1
          else j += 1
        }
        val union = a.length.toLong + b.length - inter
        if (union == 0) 1.0 else inter.toDouble / union
      }
    }
    val g0 = sigs.select($"id".as("id0"), $"grams".as("g0"))
    val g1 = sigs.select($"id".as("id1"), $"grams".as("g1"))
    val verified = pairs.join(g0, "id0").join(g1, "id1")
      .withColumn("jaccard", jacc($"g0", $"g1"))
      .where($"jaccard" >= jaccardThreshold)
      .select($"id0", $"id1", $"jaccard")

    clustersWithKeeper(verified, sigs.select($"id"))
  }

  /** SimHash near-dup: 64-bit simhash, banded into 4×16-bit chunks
    * (pigeonhole: hamming ≤ 3 ⇒ at least one chunk identical), verify
    * exact hamming ≤ maxHamming, cluster. */
  def simhash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      seed: Long = 0x51a54L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxHamming <= 3, "4-chunk banding guarantees recall only for hamming <= 3")

    val sigs = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, TextOps.simhash(text, seed)) }
      .toDF("id", "sig")
      .cache()

    val chunked = sigs.select($"id", $"sig",
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"), shiftright($"sig", c * 16).bitwiseAND(0xffffL).as("key"))): _*)).as("ck"))
      .select($"id", $"sig", $"ck.chunk", $"ck.key")

    val pairs = chunked.as("a").join(chunked.as("b"), Seq("chunk", "key"))
      .where($"a.id" < $"b.id")
      .select($"a.id".as("id0"), $"b.id".as("id1"), $"a.sig".as("s0"), $"b.sig".as("s1"))
      .distinct()
      .withColumn("hamming", bit_count($"s0".bitwiseXOR($"s1")))
      .where($"hamming" <= maxHamming)
      .select($"id0", $"id1", $"hamming")

    clustersWithKeeper(pairs, sigs.select($"id"))
  }

  /** Direct exact n-gram Jaccard pairs via gram-inverted-index
    * equi-join (PPJoin-lite): docs → (gram, id) → self-join on gram →
    * per-pair intersection counts → Jaccard. No signatures, exact —
    * quadratic only within gram posting lists. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ngramN: Int = 3,
      threshold: Double = 0.5,
      seed: Long = 0x9a33L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        ClkEncoder.wordNgramHashes(text, ngramN, seed).distinct.map(g => (id, g))
      }
      .toDF("id", "gram")
      .cache()
    val sizes = grams.groupBy($"id").agg(count(lit(1)).as("n"))
    val inter = grams.as("a").join(grams.as("b"), "gram")
      .where($"a.id" < $"b.id")
      .groupBy($"a.id".as("id0"), $"b.id".as("id1"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select($"id".as("id0"), $"n".as("n0")), "id0")
      .join(sizes.select($"id".as("id1"), $"n".as("n1")), "id1")
      .withColumn("jaccard", $"inter" / ($"n0" + $"n1" - $"inter"))
      .where($"jaccard" >= threshold)
      .select($"id0", $"id1", $"jaccard")
  }

  /** Embedding-cosine near-dup: normalized vectors, LSH-bucketed by
    * random-hyperplane sign bits, verified by exact cosine. */
  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double = 0.95,
      planes: Int = 8,
      seed: Long = 0xe3bedL): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
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
    val pairs = vecs.as("a").join(vecs.as("b"), "bucket")
      .where($"a.id" < $"b.id")
      .select($"a.id".as("id0"), $"b.id".as("id1"), $"a.unit".as("u0"), $"b.unit".as("u1"))
      .withColumn("cosine", Ann.dotUdf($"u0", $"u1"))
      .where($"cosine" >= cosineThreshold)
      .select($"id0", $"id1", $"cosine")
    pairs
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
