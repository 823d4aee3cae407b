package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.oracle.OracleSqlGen

/** Structural sanity for the generated oracle SQL. Value-level parity
  * is proven by the driver's DuckDB compare (and was validated locally
  * at sf0.001/sf0.01 during development — DuckDB cannot run inside
  * sbt, so these tests pin the generator's invariants instead:
  * determinism (the committed oracle_sql.json must be reproducible),
  * bounded size, balanced nesting, and the guard rails that make a
  * wrong configuration fail loudly. */
class OracleSqlGenSpec extends AnyFunSuite {

  private def balanced(s: String): Boolean = {
    var depth = 0
    var par = 0
    s.foreach {
      case '(' => par += 1
      case ')' => par -= 1; if (par < 0) return false
      case '[' => depth += 1
      case ']' => depth -= 1; if (depth < 0) return false
      case _ =>
    }
    par == 0 && depth == 0
  }

  test("generators are deterministic and balanced") {
    val fp1 = OracleSqlGen.textFingerprintSql()
    val fp2 = OracleSqlGen.textFingerprintSql()
    assert(fp1 == fp2, "textFingerprintSql must be reproducible")
    assert(balanced(fp1))

    val mh1 = OracleSqlGen.minhashBandsSql(block.MinhashParams(), encode.ClkParams())
    val mh2 = OracleSqlGen.minhashBandsSql(block.MinhashParams(), encode.ClkParams())
    assert(mh1 == mh2)
    assert(balanced(mh1))

    val gr = OracleSqlGen.greedyClustersSql("/tmp/x/*.parquet")
    assert(gr == OracleSqlGen.greedyClustersSql("/tmp/x/*.parquet"))
    assert(balanced(gr))
  }

  test("generated SQL stays far below any driver payload concern") {
    assert(OracleSqlGen.textFingerprintSql().length < 100000)
    assert(OracleSqlGen.minhashBandsSql(block.MinhashParams(), encode.ClkParams()).length < 100000)
    assert(OracleSqlGen.greedyClustersSql("/tmp/x/*.parquet").length < 100000)
  }

  test("greedy oracle: 64 materialized rounds, matched union, poison sentinel") {
    val sql = OracleSqlGen.greedyClustersSql("/tmp/x/*.parquet")
    assert(sql.contains("rem64"), "expected 64 unrolled rounds")
    assert(!sql.contains("rem65"))
    // inlined (non-materialized) CTE chains go exponential in DuckDB
    assert("AS MATERIALIZED".r.findAllIn(sql).size == 1 + 2 * 64)
    assert(sql.contains("SELECT -99"), "poison row on non-convergence")
  }

  test("minhash oracle embeds the engine's own seed constants") {
    val p = block.MinhashParams()
    val sql = OracleSqlGen.minhashBandsSql(p, encode.ClkParams())
    // spot-check first and last permutation seeds and the band seed
    assert(sql.contains(p.hashSeeds.head.toString))
    assert(sql.contains(p.hashSeeds.last.toString))
    assert(sql.contains(p.seed.toString))
  }

  test("wrong gram configuration fails at generation time, not verify time") {
    intercept[IllegalArgumentException] {
      OracleSqlGen.minhashBandsSql(block.MinhashParams(),
        encode.ClkParams(charNgrams = true))
    }
    intercept[IllegalArgumentException] {
      OracleSqlGen.minhashBandsSql(block.MinhashParams(rowsPerBand = 2),
        encode.ClkParams())
    }
  }
}
