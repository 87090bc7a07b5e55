package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.OrderedOut

/** The remaining TPC-H canon (Q1/Q3/Q4/Q5/Q13/Q18 live in [[Relational]]),
  * adapted to the testdata schema (no partsupp / shipmode / commit-receipt
  * dates / phone / comment columns — each adaptation keeps the SHAPE the
  * query exists to exercise and documents the stand-in). Together the 22
  * cover every canonical relational pattern: this file adds the correlated
  * scalar-aggregate subqueries (Q2/Q17), uncorrelated scalars in
  * WHERE/HAVING position (Q11/Q15/Q22), NOT IN (Q16), nested
  * semi-chains (Q20), the EXISTS + NOT EXISTS dual correlation (Q21),
  * OR-of-ANDs pushdown (Q19), and the classic join-agg report shapes
  * (Q6/Q7/Q8/Q9/Q10/Q12/Q14).
  *
  * Two idioms by design:
  *   - subquery-shaped queries are WRITTEN AS SQL with the subqueries left
  *     in, sharing ONE text between Spark and the DuckDB oracle (modulo
  *     temp-view names): the operator under test is Catalyst's
  *     decorrelation (RewriteCorrelatedScalarSubquery /
  *     RewritePredicateSubquery), so hand-building the joins would test
  *     nothing — CatalogSpec pins that no correlated subquery survives
  *     optimization;
  *   - join-agg report shapes use the DataFrame API with the Q3/Q5/Q18
  *     hint discipline: broadcast() only on fixed-cardinality dims
  *     (region 5 rows, nation 25 — constant at any SF); customer /
  *     supplier / part / orders / lineitem scale linearly and are left to
  *     AQE's size-based strategy choice, so plans degrade to shuffles at
  *     100 TB instead of OOMing a pinned broadcast.
  *
  * Float discipline is the house rule (QueryDef determinism notes): money
  * sums ride exact decimals via the shared `round(x, 6)` lift or exact
  * cents (`round(x*100)` → BIGINT), one final cast to double per output,
  * ratios as a single IEEE divide of two exact sums, and CAST(year() AS
  * BIGINT) pins the cross-engine int width.
  */
object Tpch {

  /** Shared exact-decimal revenue lane (the Q1/Q3/Q5 discipline). */
  private def rev = expr(
    "CAST(round(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(28,6))")

  private val tableNames =
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")

  /** Register the relational tables as `<name>_t` temp views for the
    * SQL-form queries (the Q4 pattern). Re-registered on every build so
    * the dir can change between calls; a temp view binds at ANALYSIS time,
    * so an already-built DataFrame is unaffected by later re-registration
    * (the CatalogSpec concurrency test relies on this). */
  private def reg(s: SparkSession, d: String): Unit = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_t")
    Tables.orders(s, d).createOrReplaceTempView("orders_t")
    Tables.customer(s, d).createOrReplaceTempView("customer_t")
    Tables.supplier(s, d).createOrReplaceTempView("supplier_t")
    Tables.part(s, d).createOrReplaceTempView("part_t")
    Tables.nation(s, d).createOrReplaceTempView("nation_t")
    Tables.region(s, d).createOrReplaceTempView("region_t")
  }

  /** One SQL text serves BOTH engines for the subquery-shaped queries: the
    * oracle runs it verbatim in DuckDB over the bare parquet table names;
    * the Spark side rewrites each bare table token to its `_t` temp view.
    * A single source of truth makes "Spark decorrelates exactly what
    * DuckDB executes" a property of the text, not of two hand-synced
    * copies. Dialect notes folded into the shared texts: `INTERVAL 60
    * DAY` (singular) parses in both; `%` / ordinal GROUP BY / CTEs /
    * LIKE / IN are common. */
  private[graft] def sparkified(sql: String): String =
    tableNames.foldLeft(sql)((acc, t) => acc.replaceAll("\\b" + t + "\\b", t + "_t"))

  /** The register→analyze window is serialized per session: the `_t`
    * views are shared by all eight SQL-form queries, so two THREADS
    * building against different dirs could otherwise interleave reg() and
    * sql() and bind one query's plan to the other's dir. (Once sql()
    * returns, the plan is bound — later re-registration is harmless, the
    * property the CatalogSpec concurrency test relies on.) */
  private def sqlQuery(sql: String)(s: SparkSession, d: String): DataFrame =
    s.synchronized {
      reg(s, d)
      s.sql(sparkified(sql))
    }

  // ------------------------------------------------------------------
  // Q2 — minimum-cost supplier (correlated scalar MIN subquery)
  // ------------------------------------------------------------------

  /** TPC-H Q2, adapted: no partsupp table, so the supply relation derives
    * from lineitem — `supply(partkey, suppkey, cost)` with cost = the
    * minimum observed price in exact cents. The SHAPE under test is the
    * correlated scalar-aggregate subquery (min cost among EUROPE suppliers
    * of the same part): Catalyst must decorrelate it into an aggregate
    * grouped on the correlation key joined back to the outer side
    * (RewriteCorrelatedScalarSubquery), not execute it per outer row —
    * CatalogSpec pins that no subquery survives optimization. Scale shape:
    * both the outer and subquery arms reduce lineitem to a
    * (part, supp, min-cents) aggregate before any join; the region/nation
    * dims fold to a broadcast-sized build; the top-100 is
    * TakeOrderedAndProject. The inner ORDER BY tiebreaks to full
    * determinism: (p_partkey, s_name) is unique per row (supply is grouped
    * by part × supplier). */
  private val q2Sql =
    """WITH supply AS (
      |  SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
      |         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sp_cost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
      |       CAST(sp_cost AS DOUBLE) / 100 AS supply_cost
      |FROM part, supply, supplier, nation, region
      |WHERE p_partkey = sp_partkey AND s_suppkey = sp_suppkey
      |  AND p_size = 15 AND p_type = 'PROMO'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND sp_cost = (SELECT min(sp2.sp_cost)
      |                 FROM supply sp2, supplier s2, nation n2, region r2
      |                 WHERE sp2.sp_partkey = p_partkey
      |                   AND s2.s_suppkey = sp2.sp_suppkey
      |                   AND s2.s_nationkey = n2.n_nationkey
      |                   AND n2.n_regionkey = r2.r_regionkey
      |                   AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  def tpchQ2(s: SparkSession, d: String): DataFrame =
    sqlQuery(q2Sql)(s, d).orderedBy("p_partkey", "s_name")

  private val q2Oracle =
    s"SELECT * FROM (\n$q2Sql\n) ORDER BY p_partkey, s_name"

  // ------------------------------------------------------------------
  // Q6 — forecasting revenue change (pure pushdown scan-agg)
  // ------------------------------------------------------------------

  /** TPC-H Q6 verbatim: the pure predicate-pushdown benchmark — all four
    * range predicates (date window, discount band, quantity cap) must
    * reach the parquet scan as PushedFilters (CatalogSpec pins it), so at
    * 100 TB row groups outside the year prune on statistics without
    * decompression. No joins, no shuffle except the single-row final
    * aggregate merge. */
  def tpchQ6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(expr(
        "CAST(round(l_extendedprice * l_discount, 6) AS DECIMAL(28,6))"))
        .cast("double").as("revenue"))
      .orderedBy("revenue")

  private val q6Oracle =
    """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount, 6)
      |         AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  // ------------------------------------------------------------------
  // Q7 — volume shipping between two markets
  // ------------------------------------------------------------------

  /** TPC-H Q7, adapted: the spec's FRANCE↔GERMANY nation pair is a
    * REGION pair (EUROPE↔ASIA) — the testdata spreads 100 suppliers over
    * 25 synthetic nations, so a single-nation cut is empty at small SF
    * while the shape (two independently aliased dim chains + the
    * direction disjunction + year bucketing) is unchanged. The region
    * membership filter is applied INSIDE each dim chain before the fact
    * joins — lines outside the two markets never reach the orderkey
    * exchange. Hints only on the nation⋈region folds; the SF-scaling
    * supplier/customer sides are AQE's choice. */
  def tpchQ7(s: SparkSession, d: String): DataFrame = {
    val natRegion = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)
          .filter(col("r_name").isin("EUROPE", "ASIA"))),
        col("n_regionkey") === col("r_regionkey"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(natRegion.select(col("n_nationkey").as("sn_key"),
        col("r_name").as("supp_rgn"))), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_rgn"))
    val cust = Tables.customer(s, d)
      .join(broadcast(natRegion.select(col("n_nationkey").as("cn_key"),
        col("r_name").as("cust_rgn"))), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_rgn"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("bigint").as("l_year"), rev.as("volume_c"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_rgn") === "EUROPE" && col("cust_rgn") === "ASIA") ||
        (col("supp_rgn") === "ASIA" && col("cust_rgn") === "EUROPE"))
      .groupBy(col("supp_rgn"), col("cust_rgn"), col("l_year"))
      .agg(sum(col("volume_c")).cast("double").as("revenue"))
      .orderedBy("supp_rgn", "cust_rgn", "l_year")
  }

  private val q7Oracle =
    """SELECT supp_rgn, cust_rgn, l_year,
      |       CAST(sum(volume_c) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT r1.r_name AS supp_rgn, r2.r_name AS cust_rgn,
      |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |         CAST(round(l_extendedprice * (1 - l_discount), 6)
      |              AS DECIMAL(28,6)) AS volume_c
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |  WHERE ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
      |      OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
      |GROUP BY supp_rgn, cust_rgn, l_year
      |ORDER BY supp_rgn, cust_rgn, l_year""".stripMargin

  // ------------------------------------------------------------------
  // Q8 — market share (conditional-sum ratio per year)
  // ------------------------------------------------------------------

  /** TPC-H Q8, adapted: market = AMERICA customers buying LARGE parts;
    * share under test = the EUROPE-supplied fraction (the spec's BRAZIL
    * share — region-level for the same small-SF reason as Q7). The shape
    * is the CASE-inside-sum ratio: numerator and denominator are BOTH
    * exact decimal sums over the same groups, divided once as doubles.
    * The customer arm is a LEFT SEMI join (only membership matters —
    * c_custkey is unique so the spec's inner join is row-equivalent, and
    * semi skips materializing customer columns through the exchange). */
  def tpchQ8(s: SparkSession, d: String): DataFrame = {
    val natRegion = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
    val custAmerica = Tables.customer(s, d)
      .join(broadcast(natRegion.filter(col("r_name") === "AMERICA")
        .select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(natRegion.select(col("n_nationkey").as("sn_key"),
        col("r_name").as("supp_rgn"))), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_rgn"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        rev.as("volume_c"))
      .join(Tables.part(s, d).filter(col("p_type") === "LARGE")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1997-12-31").cast("timestamp")))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("bigint").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custAmerica, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg((sum(when(col("supp_rgn") === "EUROPE", col("volume_c"))
          .otherwise(lit(0).cast("decimal(28,6)"))).cast("double")
        / sum(col("volume_c")).cast("double")).as("mkt_share"))
      .orderedBy("o_year")
  }

  private val q8Oracle =
    """SELECT o_year,
      |  CAST(sum(CASE WHEN supp_rgn = 'EUROPE' THEN volume_c
      |                ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
      |  / CAST(sum(volume_c) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         CAST(round(l_extendedprice * (1 - l_discount), 6)
      |              AS DECIMAL(28,6)) AS volume_c,
      |         r2.r_name AS supp_rgn
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |  WHERE r1.r_name = 'AMERICA' AND p_type = 'LARGE'
      |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                        AND TIMESTAMP '1997-12-31 00:00:00') all_sales
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // ------------------------------------------------------------------
  // Q9 — product-type profit by nation and year
  // ------------------------------------------------------------------

  /** TPC-H Q9, adapted: no partsupp.ps_supplycost, so line cost is the
    * catalog-derived stand-in `p_retailprice * l_quantity * 0.2` (a fixed
    * left-associated IEEE product tree — deterministic per row, the Q1
    * charge-expression rule); profit = the two 6dp-rounded decimal terms
    * subtracted EXACTLY, summed exactly, one final double cast. The part
    * filter is the spec's p_name LIKE (color '%red%' for the testdata's
    * '<adj> <noun>' names). Plan: filtered part prunes lineitem via the
    * partkey join before the orderkey exchange; nation broadcasts. */
  def tpchQ9(s: SparkSession, d: String): DataFrame = {
    val amount = expr(
      "CAST(round(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(28,6)) - " +
        "CAST(round(p_retailprice * l_quantity * 0.2, 6) AS DECIMAL(28,6))")
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderedBy("nation", "o_year")
  }

  private val q9Oracle =
    """SELECT nation, o_year, CAST(sum(amount_c) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         CAST(round(l_extendedprice * (1 - l_discount), 6)
      |              AS DECIMAL(28,6))
      |       - CAST(round(p_retailprice * l_quantity * 0.2, 6)
      |              AS DECIMAL(28,6)) AS amount_c
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year""".stripMargin

  // ------------------------------------------------------------------
  // Q10 — returned-item reporting (top 20 customers by lost revenue)
  // ------------------------------------------------------------------

  /** TPC-H Q10 verbatim shape: one quarter of orders, only RETURNED lines
    * (l_returnflag = 'R'), revenue per customer, top 20. The group keys
    * carry the customer attributes through the aggregate (c_custkey is
    * the real key; the rest are functionally dependent — same cardinality,
    * wider rows, exactly the spec's shape). Deliberate extra: the
    * c_custkey tiebreak under the revenue sort makes the top-20 cut
    * deterministic for the hash gate. TakeOrderedAndProject caps the
    * output — no global sort. */
  def tpchQ10(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), rev.as("rev_c")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(col("rev_c")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .orderedBy("c_custkey")

  private val q10Oracle =
    """SELECT c_custkey, c_name, c_acctbal, n_name, revenue FROM (
      |  SELECT c_custkey, c_name, c_acctbal, n_name,
      |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 6)
      |                  AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |  FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_returnflag = 'R'
      |  GROUP BY c_custkey, c_name, c_acctbal, n_name
      |  ORDER BY revenue DESC, c_custkey LIMIT 20)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------
  // Q11 — important parts (value concentration, scalar in HAVING position)
  // ------------------------------------------------------------------

  /** TPC-H Q11, adapted: part value derives from lineitem extended price
    * in exact cents (no partsupp), scoped to EUROPE-region suppliers (the
    * spec's GERMANY — region-level for small-SF density). The shape is
    * the UNCORRELATED scalar aggregate gating a grouped result: value_c *
    * 1000 > Σvalue_c, i.e. the spec's `> sum(...) * 0.0001` HAVING
    * rewritten to EXACT integer arithmetic (no cross-engine float
    * threshold). Spark keeps the scalar as a one-row subquery broadcast —
    * the right plan at any scale; the CTE is evaluated twice (once per
    * arm), the honest Spark behavior without CTE materialization. */
  private val q11Sql =
    """WITH val AS (
      |  SELECT l_partkey AS p_key,
      |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS val_c
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |  GROUP BY l_partkey)
      |SELECT p_key, CAST(val_c AS DOUBLE) / 100 AS part_value
      |FROM val
      |WHERE val_c * 1000 > (SELECT sum(val_c) FROM val)""".stripMargin

  def tpchQ11(s: SparkSession, d: String): DataFrame =
    sqlQuery(q11Sql)(s, d).orderedBy("p_key")

  private val q11Oracle = s"$q11Sql\nORDER BY p_key"

  // ------------------------------------------------------------------
  // Q12 — late-shipment priority distribution (join + conditional counts)
  // ------------------------------------------------------------------

  /** TPC-H Q12, adapted: no l_shipmode/commit/receipt columns — the class
    * key is l_returnflag and "late" is `l_shipdate > o_orderdate + 60
    * days` (the Q4 lateness stand-in). The shape is intact: an
    * orders⋈lineitem join whose aggregate splits ONE count into
    * high/low-priority lanes via CASE on o_orderpriority — the two-sums-
    * one-pass idiom. The year window is pushed to the lineitem scan; the
    * lateness predicate references both sides so it rides the join. */
  def tpchQ12(s: SparkSession, d: String): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .join(Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .groupBy(col("l_returnflag").as("ship_class"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderedBy("ship_class")
  }

  private val q12Oracle =
    """SELECT l_returnflag AS ship_class,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag
      |ORDER BY ship_class""".stripMargin

  // ------------------------------------------------------------------
  // Q14 — promotion effect (single-row conditional ratio)
  // ------------------------------------------------------------------

  /** TPC-H Q14 verbatim shape: one month of lineitem, the PROMO-part
    * revenue share as `100 * Σ(case) / Σ` — both sums exact decimals, the
    * scale by 100 and the divide are the only IEEE ops (left-associated
    * identically in both engines). p_type here is an exact category
    * ('PROMO'), standing in for the spec's LIKE 'PROMO%'. */
  def tpchQ14(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .select(col("l_partkey"), rev.as("rev_c"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", col("rev_c"))
          .otherwise(lit(0).cast("decimal(28,6)"))).cast("double")
        / sum(col("rev_c")).cast("double")).as("promo_revenue"))
      .orderedBy("promo_revenue")

  private val q14Oracle =
    """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |           THEN CAST(round(l_extendedprice * (1 - l_discount), 6)
      |                AS DECIMAL(28,6))
      |           ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
      |       / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 6)
      |                AS DECIMAL(28,6))) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  // ------------------------------------------------------------------
  // Q15 — top supplier (CTE reused + scalar MAX self-reference)
  // ------------------------------------------------------------------

  /** TPC-H Q15 with the view written as a CTE referenced twice: once as
    * the join input, once under the scalar max() — the classic
    * "rows equal to the extreme of their own relation" shape. All revenue
    * comparisons are EXACT decimal equality (sum of 6dp decimals), so the
    * cross-engine result set is identical even under ties; the double
    * cast happens only at output. Spark evaluates the CTE twice (no
    * auto-materialization) — each arm is a lineitem scan-agg, the scalar
    * arm reduces to one broadcast row. */
  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(round(l_extendedprice * (1 - l_discount), 6)
      |             AS DECIMAL(28,6))) AS total_rev_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev_c AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_rev_c = (SELECT max(total_rev_c) FROM revenue)""".stripMargin

  def tpchQ15(s: SparkSession, d: String): DataFrame =
    sqlQuery(q15Sql)(s, d).orderedBy("s_suppkey")

  private val q15Oracle = s"$q15Sql\nORDER BY s_suppkey"

  // ------------------------------------------------------------------
  // Q16 — parts/supplier relationship (NOT IN + count DISTINCT)
  // ------------------------------------------------------------------

  /** TPC-H Q16, adapted: the supplier exclusion list is `s_acctbal < 0`
    * (the spec's complaint-comment LIKE — supplier has no comment column);
    * the part attribute filter is brand/type/size verbatim. Two shapes
    * under test: the NOT IN subquery, which Catalyst must turn into an
    * anti-join (null-aware, since neither side's non-nullness is declared
    * in parquet), and count(DISTINCT l_suppkey) per attribute group
    * (expand + two-phase aggregate). The exclusion side is a handful of
    * keys — broadcastable at any SF since it's bounded by supplier
    * cardinality × the acctbal cut. */
  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |       count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  def tpchQ16(s: SparkSession, d: String): DataFrame =
    sqlQuery(q16Sql)(s, d).orderedBy("p_brand", "p_type", "p_size")

  private val q16Oracle = s"$q16Sql\nORDER BY p_brand, p_type, p_size"

  // ------------------------------------------------------------------
  // Q17 — small-quantity-order revenue (correlated scalar AVG, exactified)
  // ------------------------------------------------------------------

  /** TPC-H Q17's correlated-average gate, rewritten to EXACT integer
    * arithmetic: `l_quantity < 0.2 * avg(l_quantity)` over the same part
    * becomes `5 * qty_cents * count < sum_cents` (quantities positive), so
    * the boundary rows can't flip on cross-engine float division. That
    * leaves TWO correlated scalar subqueries over the same correlation key
    * — exactly the shape Catalyst's decorrelation + scalar-subquery
    * merging exists for: both rewrite to ONE aggregate over lineitem
    * grouped by partkey, joined back (CatalogSpec pins no surviving
    * subquery). Output is the spec's sum/7 yearly average: exact cents,
    * one double divide by 700. */
  private val q17Sql =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |            AS DOUBLE) / 700 AS avg_yearly
      |FROM lineitem l JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3'
      |  AND 5 * CAST(round(l_quantity * 100) AS BIGINT)
      |        * (SELECT count(*) FROM lineitem l2
      |           WHERE l2.l_partkey = l.l_partkey)
      |      < (SELECT sum(CAST(round(l2.l_quantity * 100) AS BIGINT))
      |         FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  def tpchQ17(s: SparkSession, d: String): DataFrame =
    sqlQuery(q17Sql)(s, d).orderedBy("avg_yearly")

  private val q17Oracle = q17Sql

  // ------------------------------------------------------------------
  // Q19 — discounted revenue (OR-of-ANDs pushdown)
  // ------------------------------------------------------------------

  /** TPC-H Q19, adapted to the available part columns (brand + size bands
    * + quantity bands; no container/shipinstruct): the shape is the
    * three-way OR of per-brand AND-blocks over ONE equi-join. What the
    * plan must do (CatalogSpec pins it): split the disjunction into its
    * single-side components — the part-only OR pushes to the part scan,
    * the lineitem-only quantity OR pushes to the lineitem scan — while
    * the full predicate evaluates after the join. At 100 TB the pushed
    * quantity OR ([1,30] spans ~40% of rows) and brand OR prune row
    * groups before the shuffle. */
  def tpchQ19(s: SparkSession, d: String): DataFrame = {
    val c1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val c2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val c3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(c1 || c2 || c3)
      .agg(sum(rev).cast("double").as("revenue"))
      .orderedBy("revenue")
  }

  private val q19Oracle =
    """SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 6)
      |         AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ------------------------------------------------------------------
  // Q20 — potential part promotion (nested semi-join chain)
  // ------------------------------------------------------------------

  /** TPC-H Q20, adapted: no partsupp.ps_availqty, so "has excess stock"
    * becomes "shipped more than the threshold of a red part in the
    * window" — the IN subquery keeps its nested structure (join + LIKE
    * filter + grouped HAVING inside the membership test) and the region
    * scope replaces the spec's single nation (small-SF density again).
    * Catalyst folds the IN into a left-semi join fed by an aggregate —
    * the whole subquery reduces to a handful of supplier keys,
    * broadcastable at any SF (bounded by supplier cardinality). */
  private val q20Sql =
    """SELECT s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE p_name LIKE 'red%'
      |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 3000)""".stripMargin

  def tpchQ20(s: SparkSession, d: String): DataFrame =
    sqlQuery(q20Sql)(s, d).orderedBy("s_name")

  private val q20Oracle = s"$q20Sql\nORDER BY s_name"

  // ------------------------------------------------------------------
  // Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
  // ------------------------------------------------------------------

  /** TPC-H Q21 — the crown decorrelation query: per late line, an EXISTS
    * (another supplier contributed to the same order) AND a NOT EXISTS
    * (no OTHER supplier was also late on it). Adaptations: lateness is
    * `l_shipdate > o_orderdate + 60 days` (no commit/receipt dates) —
    * note the NOT EXISTS therefore correlates on BOTH l1.l_orderkey and
    * the OUTER o_orderdate, a two-table correlation Catalyst must fold
    * into the anti-join condition; the supplier scope is region-level.
    * Expected plan: one left-semi and one left-anti join against
    * lineitem, both keyed on l_orderkey (hash-joinable; the <> and date
    * terms ride as join-condition extras), no per-row subqueries
    * (CatalogSpec pins both join types). */
  private val q21Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderstatus = 'F' AND r_name = 'EUROPE'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  def tpchQ21(s: SparkSession, d: String): DataFrame =
    sqlQuery(q21Sql)(s, d).orderedBy("s_name")

  private val q21Oracle = s"SELECT * FROM (\n$q21Sql\n) ORDER BY s_name"

  // ------------------------------------------------------------------
  // Q22 — global sales opportunity (scalar threshold + NOT EXISTS)
  // ------------------------------------------------------------------

  /** TPC-H Q22, adapted: country code = c_custkey % 10 (customer has no
    * phone column) and "never ordered" becomes "no order since 2000"
    * (every testdata customer has SOME order — the anti-join shape is
    * what matters). The above-average-balance gate is exactified the Q17
    * way: `bal > avg(bal)` over the positive-balance cohort becomes
    * `bal_cents * count > sum_cents` — two UNCORRELATED scalar subqueries
    * over the same cohort (a scalar-subquery-merge candidate) compared in
    * exact integer space. Plan: the scalars are one-row broadcasts, the
    * NOT EXISTS folds to a left-anti join on custkey against the pruned
    * (date-filtered) orders scan. */
  private val q22Sql =
    """SELECT cntrycode, count(*) AS numcust,
      |       CAST(sum(bal_c) AS DOUBLE) / 100 AS totacctbal
      |FROM (
      |  SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM customer
      |  WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
      |    AND CAST(round(c_acctbal * 100) AS BIGINT)
      |          * (SELECT count(*) FROM customer
      |             WHERE c_acctbal > 0 AND c_custkey % 10 IN (1, 3, 5, 7, 9))
      |        > (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
      |           FROM customer
      |           WHERE c_acctbal > 0 AND c_custkey % 10 IN (1, 3, 5, 7, 9))
      |    AND NOT EXISTS (SELECT 1 FROM orders
      |                    WHERE o_custkey = c_custkey
      |                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |) cold
      |GROUP BY cntrycode""".stripMargin

  def tpchQ22(s: SparkSession, d: String): DataFrame =
    sqlQuery(q22Sql)(s, d).orderedBy("cntrycode")

  private val q22Oracle = s"$q22Sql\nORDER BY cntrycode"

  // ------------------------------------------------------------------

  val defs: Map[String, QueryDef] = Map(
    "q_tpch_q2" -> QueryDef(tpchQ2, Some(q2Oracle)),
    "q_tpch_q6" -> QueryDef(tpchQ6, Some(q6Oracle)),
    "q_tpch_q7" -> QueryDef(tpchQ7, Some(q7Oracle)),
    "q_tpch_q8" -> QueryDef(tpchQ8, Some(q8Oracle)),
    "q_tpch_q9" -> QueryDef(tpchQ9, Some(q9Oracle)),
    "q_tpch_q10" -> QueryDef(tpchQ10, Some(q10Oracle)),
    "q_tpch_q11" -> QueryDef(tpchQ11, Some(q11Oracle)),
    "q_tpch_q12" -> QueryDef(tpchQ12, Some(q12Oracle)),
    "q_tpch_q14" -> QueryDef(tpchQ14, Some(q14Oracle)),
    "q_tpch_q15" -> QueryDef(tpchQ15, Some(q15Oracle)),
    "q_tpch_q16" -> QueryDef(tpchQ16, Some(q16Oracle)),
    "q_tpch_q17" -> QueryDef(tpchQ17, Some(q17Oracle)),
    "q_tpch_q19" -> QueryDef(tpchQ19, Some(q19Oracle)),
    "q_tpch_q20" -> QueryDef(tpchQ20, Some(q20Oracle)),
    "q_tpch_q21" -> QueryDef(tpchQ21, Some(q21Oracle)),
    "q_tpch_q22" -> QueryDef(tpchQ22, Some(q22Oracle))
  )
}
