package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-lockstep contract as a compile-time-adjacent gate: EVERY
  * declared query carries a DuckDB oracle (the driver's hash compare is
  * the correctness gate — a rows-only query is a weaker check and must
  * be a deliberate, listed exemption, not an oversight). Currently the
  * exemption set is EMPTY: all queries are oracle-gated. */
class OracleContractSpec extends AnyFunSuite {

  private val rowsOnlyExemptions: Set[String] = Set.empty

  test("every declared query has an oracle (or a listed exemption)") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val missing = queries -- oracles -- rowsOnlyExemptions
    assert(missing.isEmpty, s"queries without an oracle: $missing")
    val orphaned = oracles -- queries
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
    val staleExemptions = rowsOnlyExemptions.intersect(oracles)
    assert(staleExemptions.isEmpty,
      s"exemptions that now HAVE oracles (remove them): $staleExemptions")
  }

  test("query names follow the q_ prefix convention") {
    val bad = SparkEntry.queries.keySet.filterNot(_.startsWith("q_"))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }
}
