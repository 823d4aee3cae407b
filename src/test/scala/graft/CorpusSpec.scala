package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.gen.Corpus

/** Corpus generator invariants (BASELINE.json input_hint): exact table
  * shape, byte-identical extracted text per url, determinism across
  * partitionings, planted structure. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val p = Corpus.Params(entities = 200L, seed = 13L)

  test("table shape matches input_hint exactly") {
    val pages = Corpus.pages(spark, p)
    assert(pages.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "url" -> "string", "warc_ts" -> "timestamp", "html" -> "binary",
      "text" -> "string", "lang" -> "string"))
  }

  test("byte-identical extracted text per url (html wraps text exactly)") {
    Corpus.pages(spark, p).collect().foreach { r =>
      val html = new String(r.getAs[Array[Byte]]("html"), java.nio.charset.StandardCharsets.UTF_8)
      val extracted = html.stripPrefix("<html><body>").stripSuffix("</body></html>")
      assert(extracted == r.getAs[String]("text"), r.getAs[String]("url"))
    }
  }

  test("deterministic across partitionings and reruns") {
    def canon(n: Int) = Corpus.labeledPages(spark.newSession() match { case s => s }, p)
      .repartition(n).collect()
      .map(r => (r.getString(0), r.getString(3), r.getLong(5), r.getInt(7))).sortBy(_._1).toSeq
    assert(canon(2) == canon(11))
  }

  test("planted structure: variants within bounds, dsetId = parity, hosts skewed") {
    val lp = Corpus.labeledPages(spark, p).cache()
    val variants = lp.groupBy("entityId").count().agg(min("count"), max("count")).head
    assert(variants.getLong(0) >= 1 && variants.getLong(1) <= 4)
    assert(lp.where(col("dsetId") =!= pmod(col("variantId"), lit(2))).count() == 0)
    // skew: the most common host should carry far more than 1/hosts share
    val hostCounts = lp.withColumn("host", regexp_extract(col("url"), "host-(\\d+)", 1))
      .groupBy("host").count().orderBy(desc("count")).collect()
    val total = hostCounts.map(_.getLong(1)).sum.toDouble
    assert(hostCounts.head.getLong(1) / total > 3.0 / p.hosts,
      s"top host share ${hostCounts.head.getLong(1) / total}")
  }
}
