package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants, enforced at test time so a new operator
  * cannot land half-wired:
  *  - every query has an oracle and vice versa (a query without an
  *    oracle silently downgrades to a rows-only check in the driver's
  *    correctness gate);
  *  - every plan-audited name is a real query;
  *  - names follow the q_* convention the bench/correctness tooling
  *    sorts and reports on. */
class ContractSpec extends AnyFunSuite {

  test("queries and oracles are exactly 1:1") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("every audited plan name is a registered query") {
    val q = SparkEntry.queries.keySet
    val missing = PlanAudit.audited.filterNot(q.contains)
    assert(missing.isEmpty, s"audited but not registered: $missing")
    assert(PlanAudit.audited.distinct.size == PlanAudit.audited.size,
      "duplicate names in the audited list")
  }

  test("query names follow the reporting convention") {
    SparkEntry.queries.keySet.foreach { n =>
      assert(n == "q1_agg" || n.startsWith("q_"), s"unconventional name: $n")
      assert(!n.contains(" ") && n == n.toLowerCase, s"unsortable name: $n")
    }
  }
}
