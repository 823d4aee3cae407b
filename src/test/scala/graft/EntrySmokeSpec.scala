package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry(spark) returns rows > 0. */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns clustered rows") {
    val n = SparkEntry.entry(SparkTestBase.spark).count()
    assert(n > 0, s"entry produced $n rows")
  }
}
