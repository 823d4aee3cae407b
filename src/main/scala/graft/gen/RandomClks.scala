package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{BitVector, Hashing}
import graft.sim.ClkRow

/** E2: deterministic random-CLK generator for benchmarks — the role of
  * the reference's `generate_clks` (`/root/reference/anonlink/benchmark.py:10-18`),
  * but seeded/deterministic (no `os.urandom`) and distributed over
  * `spark.range`. Uniform random bits → popcount ≈ bits/2, like the
  * reference's uniformly random bitarrays.
  */
object RandomClks {

  def clkFor(id: Long, words: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](words)
    var w = 0
    var h = Hashing.combine(seed, id)
    while (w < words) {
      h = Hashing.mix64(h + 0x9e3779b97f4a7c15L)
      out(w) = h
      w += 1
    }
    out
  }

  /** A dataset of n random CLKs with recId = row index (dsetId fixed by
    * the caller via the returned rows). */
  def generate(spark: SparkSession, n: Long, seed: Long, words: Int = 16): Dataset[ClkRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val clk = clkFor(i, words, seed)
      ClkRow(i, BitVector.toBytes(clk), BitVector.popcount(clk))
    }
  }
}
