package graft.queries

import graft.SparkTestBase

/** Pins for the TPC-H remainder module's shared-SQL machinery: the
  * subquery-shaped queries run ONE text in both engines (DuckDB verbatim,
  * Spark with table tokens rewritten to `_t` temp views), so the rewriter
  * must touch exactly the bare table names — a stray rewrite inside an
  * alias or column would silently fork the two sides. */
class TpchSpec extends SparkTestBase {

  test("sparkified rewrites bare table tokens only") {
    assert(Tpch.sparkified("FROM lineitem l JOIN part ON l_partkey = p_partkey")
      == "FROM lineitem_t l JOIN part_t ON l_partkey = p_partkey")
    // aliases and columns that CONTAIN a table name stay untouched
    assert(Tpch.sparkified("SELECT supplier_no, sp_partkey FROM supplier")
      == "SELECT supplier_no, sp_partkey FROM supplier_t")
    assert(Tpch.sparkified("WHERE o_orderdate >= x AND c_custkey % 10 IN (1)")
      == "WHERE o_orderdate >= x AND c_custkey % 10 IN (1)")
    // already-suffixed views (idempotence against double application)
    assert(Tpch.sparkified("FROM region_t") == "FROM region_t")
    // aliased subquery references (the q17/q21 self-join aliases)
    assert(Tpch.sparkified("EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.x = l.x)")
      == "EXISTS (SELECT 1 FROM lineitem_t l2 WHERE l2.x = l.x)")
  }

  test("Q2 ties: every supplier at the per-part minimum cost survives") {
    // the correlated scalar-min gate is an EQUALITY, not a top-1: when two
    // EUROPE suppliers tie on a part's min cents, BOTH rows must return
    // (identical semantics in DuckDB — this pins the Spark side against a
    // future "optimization" to min_by/row_number that would break ties
    // arbitrarily and fork the engines)
    val d = "/root/testdata/sf0.01"
    val rows = graft.Catalog.defs("q_tpch_q2").build(spark, d)
      .select("p_partkey", "supply_cost").collect()
    val costs = rows.groupBy(_.getLong(0)).view.mapValues(
      _.map(_.getDouble(1)).distinct).toMap
    assert(costs.nonEmpty)
    assert(costs.values.forall(_.length == 1),
      s"a part surfaced more than one 'minimum' cost: $costs")
  }
}
