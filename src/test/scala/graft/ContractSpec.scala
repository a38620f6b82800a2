package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that a map-literal typo would silently break:
  * every oracle belongs to a defined query (an orphan oracle makes the
  * driver's compare look for output that is never written), and the name
  * universe matches the recorded counts. */
class ContractSpec extends AnyFunSuite {

  test("every oracleSql key has a matching queries entry; counts recorded") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphans = o -- q
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.mkString(", ")}")
    info(s"queries=${q.size} oracle-checked=${o.size} rows-only=${(q -- o).size}")
    assert(q.size == 111 && o.size == 88,
      s"query universe changed (${q.size}/${o.size}) — update README/COVERAGE counts")
  }

  test("every query name is a legal driver artifact name") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("q_[a-z0-9_]+"), s"suspicious query name '$n'")
    }
  }
}
