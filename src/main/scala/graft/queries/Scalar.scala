package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{OracleSql, QueryDef, Tables}
import graft.core.QueryDef.OrderedOut

/** Scalar-function batteries (SURVEY.md §2.5) plus the reference's own
  * expression surface re-exercised over driver testdata: JSON parse/serialize
  * round-trips, cast chains, the topic-routing regex (reference
  * main.py:131-136 — including its loose-gate/strict-extract quirk), the
  * collect/sort/higher-order array pipeline (main.py:153-158).
  *
  * Everything here is per-row scalar work — embarrassingly parallel, fully
  * inside whole-stage codegen, no shuffle except the harness ORDER BY.
  * Cross-engine float rules: see QueryDef. ln() is the one libm-dependent
  * function exposed; rounded to 6dp the divergence probability is ~1e-10/row.
  */
object Scalar {

  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("ub"),
      lower(col("p_type")).as("lt"),
      substring(col("p_name"), 1, 8).as("pre8"),
      // int64 everywhere an INT would meet DuckDB's BIGINT: the driver's
      // hash canonicalizes plain int widths today, but exact-type match
      // removes the dependence on that behavior (VERDICT r2).
      length(col("p_name")).cast("long").as("nlen"),
      expr("replace(p_name, ' ', '_')").as("und"),
      split(col("p_name"), " ").getItem(0).as("tok1"),
      instr(col("p_name"), "a").cast("long").as("pos_a"),
      concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
      lpad(col("p_brand"), 12, "*").as("lp")
    ).orderedBy("p_partkey")

  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("dd"),
      quarter(col("o_orderdate")).cast("long").as("q"),
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("dd95"),
      date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("am3"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("ld"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mon")
    ).orderedBy("o_orderkey")

  /** Single-IEEE-op outputs only (sub/abs/sqrt/floor/ceil/multiply/mod are
    * deterministic across engines); ln is rounded — see object doc. */
  /** Math-function battery over EVERY lineitem row — abs/sqrt/floor/ceil/
    * pow/ln/mod/sign — digested per `l_orderkey % 7` group instead of
    * emitted long-form: the raw battery was the catalog's last
    * corpus-sized output (600 k rows × 10 cols through the single-task
    * harness sort — the q_unpivot lesson). The per-row md5-prefix digest
    * pins every row's value of every function (any wrong row moves the
    * sum), so the oracle compare is exactly as strong; doubles
    * canonicalize through round(·,6) → DECIMAL(18,6) so the hashed string
    * form is engine-independent. Same guarded fan-out as q_unpivot: the
    * single-row-group testdata scan would otherwise run the md5 loop on
    * one task (no-op at corpus scale where the scan splits). */
  def mathFuncs(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"))
    val fanned = QueryDef.fanOut(wide)
    def d6(c: Column): Column = c.cast("decimal(18,6)").cast("string")
    val fl = floor(col("l_extendedprice") / lit(7.0))
    val cl = ceil(col("l_extendedprice") / lit(7.0))
    val repr = concat_ws("#",
      col("l_orderkey"), col("l_linenumber"),
      d6(round(abs(col("l_discount") - lit(0.05)), 6)),
      d6(round(sqrt(col("l_quantity")), 6)),
      fl, cl,
      d6(round(col("l_quantity") * col("l_quantity"), 6)),
      d6(round(log(col("l_extendedprice")), 6)),
      signum(col("l_discount") - lit(0.05)).cast("int"))
    // The 32-bit md5 prefix accumulates in two BIGINT lanes (hi/lo 16-bit
    // halves): each lane's sum stays under Long.MaxValue past 1e14
    // rows/group (vs ~2e9 for a single-lane BIGINT sum — the ANSI abort
    // ADVICE r9 flagged), and the lanes recombine exactly into one decimal
    // per GROUP, not per row. Emitted as STRING: a raw DECIMAL(38,0)
    // output column reaches the driver's hash as pyarrow-decimal on the
    // Spark side but float64 from DuckDB (the r10 hash regression) —
    // strings round-trip identically through both loaders.
    val h32 = conv(substring(md5(repr.cast("binary")), 1, 8), 16, 10)
      .cast("long")
    fanned
      .select((col("l_orderkey") % 7).as("md"), fl.as("fl"), cl.as("cl"),
        h32.as("h"))
      .groupBy(col("md"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("fl")).as("sum_fl"),
        sum(col("cl")).as("sum_cl"),
        sum(shiftright(col("h"), 16)).as("hi"),
        sum(col("h").bitwiseAND(lit(0xffffL))).as("lo"))
      .select(col("md"), col("cnt"), col("sum_fl"), col("sum_cl"),
        (col("hi").cast("decimal(38,0)") * lit(65536) + col("lo"))
          .cast("string").as("digest"))
      .orderedBy("md")
  }

  def arrayFuncs(s: SparkSession, d: String): DataFrame = {
    val w = split(col("text"), " ")
    Tables.documents(s, d).select(
      col("doc_id"),
      size(w).cast("long").as("n_words"),
      size(array_distinct(w)).cast("long").as("n_distinct"),
      element_at(w, 1).as("first_word"),
      array_contains(w, "spark").as("has_spark"),
      array_join(slice(sort_array(array_distinct(w)), 1, 3), ",").as("top3")
    ).orderedBy("doc_id")
  }

  /** Map-typed column surface: construct, merge, probe, enumerate. Outputs
    * are scalars (probed values, joined key list, cardinality) so the
    * oracle compares plain types — the map itself never leaves the query. */
  def mapFuncs(s: SparkSession, d: String): DataFrame = {
    val m = map_concat(
      map(lit("nk"), col("n_nationkey").cast("string")),
      map(lit("name"), col("n_name")))
    Tables.nation(s, d).select(
      col("n_nationkey"),
      element_at(m, "name").as("v_name"),
      element_at(m, "nk").as("v_nk"),
      // ANSI mode (Spark 4 default) makes element_at THROW on a missing
      // key — try_element_at is the null-on-absent probe
      try_element_at(m, lit("missing")).as("v_absent"),
      array_join(map_keys(m), ",").as("keys"),
      size(m).cast("long").as("m_card")
    ).orderedBy("n_nationkey")
  }

  /** Generate-node surface: posexplode of the token array — the row-fanout
    * operator every ingest/flatten pipeline leans on. 1-based positions to
    * match SQL ordinality. */
  def explodeQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("tok"))
      .orderedBy("doc_id", "pos")

  /** One oracle adjudicates both JSON-extraction lanes (string-path
    * get_json_object and the VARIANT lane) — the bridge rule. */
  private val jsonKOracle =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events ORDER BY event_id""".stripMargin

  def jsonGet(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k")
    ).orderedBy("event_id")

  /** The SAME extraction through Spark 4's VARIANT type (parse_json →
    * variant_get): the open-format semi-structured path — parse once into
    * the binary variant encoding, extract typed fields without
    * re-tokenizing the JSON text per path (the get_json_object cost
    * model). Shares [[jsonGet]]'s oracle verbatim: the variant lane must
    * answer the identical question. */
  def jsonVariant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).selectExpr("event_id",
      "CAST(variant_get(parse_json(props), '$.k', 'int') AS INT) AS k")
      .orderedBy("event_id")

  /** JSON serialize→parse round-trip (reference P2/P10): if from_json or
    * to_json corrupts anything, the oracle (which reads the source columns
    * directly) mismatches. */
  def parseJson(s: SparkSession, d: String): DataFrame = {
    val js = to_json(struct(col("event_id").as("id"), col("event_type").as("ty")))
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(js, lit("id BIGINT, ty STRING")).as("p"))
      .select(col("event_id"), col("p.id").as("pid"), col("p.ty").as("pty"))
      .orderedBy("event_id")
  }

  def toJsonQ(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      to_json(struct(col("event_id").as("id"), col("event_type").as("ty"))).as("js")
    ).orderedBy("event_id")

  /** Reference cast chain (P1/P4/P5): epoch↔timestamp↔string round-trips and
    * the null-on-unparseable string→double cast. */
  def castChain(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      unix_timestamp(col("ts")).as("ep"),
      from_unixtime(unix_timestamp(col("ts"))).as("rt"),
      col("value").cast("string").cast("double").as("vs"),
      // try_cast: Spark 4 runs ANSI mode by default, a plain cast would throw
      expr("try_cast(concat('x', cast(event_id as string)) as double)").as("bad")
    ).orderedBy("event_id")

  def filterNotNull(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .where(col("k").isNotNull && col("k") % 2 === 0)
      .orderedBy("event_id")

  /** Reference topic routing (main.py:131-136) kept quirk-for-quirk: the
    * gate is the LOOSE pattern (`.+`), the extract the STRICT one
    * (`[^-]+`), so a multi-hyphen topic passes the gate but extracts an
    * empty base — observable behavior, reproduced deliberately (ADVICE r1).
    * event_id%3==1 rows synthesize exactly that case. */
  def topicRoute(s: SparkSession, d: String): DataFrame = {
    val topic = when(col("event_id") % 3 === 0,
        concat(lit("parsed-trades-"), col("event_type"), lit("-usdt")))
      .when(col("event_id") % 3 === 1,
        concat(lit("parsed-trades-x-"), col("event_type"), lit("-usdt")))
      .otherwise(concat(lit("raw."), col("event_type")))
    Tables.events(s, d)
      .withColumn("topic", topic)
      .withColumn("base",
        when(col("topic").rlike("parsed-trades-.+-usdt"),
          regexp_extract(col("topic"), "parsed-trades-([^-]+)-usdt", 1))
          .otherwise(upper(col("event_type"))))
      .select(col("event_id"), col("topic"), col("base"))
      .orderedBy("event_id")
  }

  /** The reference's collect_list/array_sort surface (main.py:153-158) as an
    * engine capability — NOT used in the OHLC hot path (see OhlcPipeline). */
  def collectSort(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        expr("array_join(transform(array_sort(collect_list(l_linenumber))," +
          " x -> cast(x as string)), ',')").as("lns"),
        count(lit(1)).as("cnt")
      )
      .orderedBy("l_orderkey")

  /** transform/aggregate/filter/element_at/size higher-order battery
    * (main.py:153-158's lambda surface, generalized). */
  def higherOrder(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      // int64 on both sides: DuckDB's list_sum widens to HUGEINT,
      // Spark's aggregate() stays INT — meet at BIGINT
      expr("aggregate(transform(split(text, ' '), x -> length(x)), 0, (a, x) -> a + x)")
        .cast("long").as("tot_chars"),
      element_at(split(col("text"), " "), 1).as("first_w"),
      element_at(split(col("text"), " "), -1).as("last_w"),
      size(split(col("text"), " ")).cast("long").as("n_words"),
      size(expr("filter(split(text, ' '), x -> length(x) > 4)")).cast("long").as("long_cnt")
    ).orderedBy("doc_id")

  /** DuckDB twin of [[mathFuncs]]: same per-row repr string, same 32-bit
    * md5-prefix digest (DuckDB has no conv() — the strpos-over-hex-alphabet
    * rebuild matches q_unpivot's oracle). DuckDB floor/ceil return DOUBLE,
    * hence the BIGINT casts before stringifying; sum(BIGINT) widens to
    * HUGEINT, hence the casts on the way out. */
  private val mathOracle: String = {
    val hv = OracleSql.hexPrefixToLong("h8")
    s"""WITH r AS (
       |  SELECT l_orderkey % 7 AS md,
       |         CAST(floor(l_extendedprice / 7.0) AS BIGINT) AS fl,
       |         CAST(ceil(l_extendedprice / 7.0) AS BIGINT) AS cl,
       |         CAST(l_orderkey AS VARCHAR) || '#' ||
       |         CAST(l_linenumber AS VARCHAR) || '#' ||
       |         CAST(CAST(round(abs(l_discount - 0.05), 6) AS DECIMAL(18,6)) AS VARCHAR) || '#' ||
       |         CAST(CAST(round(sqrt(l_quantity), 6) AS DECIMAL(18,6)) AS VARCHAR) || '#' ||
       |         CAST(CAST(floor(l_extendedprice / 7.0) AS BIGINT) AS VARCHAR) || '#' ||
       |         CAST(CAST(ceil(l_extendedprice / 7.0) AS BIGINT) AS VARCHAR) || '#' ||
       |         CAST(CAST(round(l_quantity * l_quantity, 6) AS DECIMAL(18,6)) AS VARCHAR) || '#' ||
       |         CAST(CAST(round(ln(l_extendedprice), 6) AS DECIMAL(18,6)) AS VARCHAR) || '#' ||
       |         CAST(CAST(sign(l_discount - 0.05) AS INTEGER) AS VARCHAR) AS repr
       |  FROM lineitem),
       |h AS (SELECT md, fl, cl, substr(md5(repr), 1, 8) AS h8 FROM r)
       |SELECT md, count(*) AS cnt,
       |       CAST(sum(fl) AS BIGINT) AS sum_fl,
       |       CAST(sum(cl) AS BIGINT) AS sum_cl,
       |       CAST(CAST(sum($hv) AS DECIMAL(38,0)) AS VARCHAR) AS digest
       |FROM h GROUP BY md ORDER BY md""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "q_string_funcs" -> QueryDef(stringFuncs, Some(
      """SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt,
        |       substring(p_name, 1, 8) AS pre8, length(p_name) AS nlen,
        |       replace(p_name, ' ', '_') AS und,
        |       string_split(p_name, ' ')[1] AS tok1,
        |       instr(p_name, 'a') AS pos_a,
        |       concat_ws('-', p_brand, p_type) AS cw,
        |       lpad(p_brand, 12, '*') AS lp
        |FROM part ORDER BY p_partkey""".stripMargin)),
    "q_date_funcs" -> QueryDef(dateFuncs, Some(
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |       day(o_orderdate) AS dd, quarter(o_orderdate) AS q,
        |       strftime(o_orderdate, '%Y-%m') AS ym,
        |       datediff('day', DATE '1995-01-01', o_orderdate) AS dd95,
        |       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS am3,
        |       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS ld,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    "q_math_funcs" -> QueryDef(mathFuncs, Some(mathOracle)),
    "q_array_funcs" -> QueryDef(arrayFuncs, Some(
      """SELECT doc_id, len(string_split(text, ' ')) AS n_words,
        |       len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |       string_split(text, ' ')[1] AS first_word,
        |       list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |       array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS top3
        |FROM documents ORDER BY doc_id""".stripMargin)),
    "q_map_funcs" -> QueryDef(mapFuncs, Some(
      """SELECT n_nationkey,
        |       n_name AS v_name,
        |       CAST(n_nationkey AS VARCHAR) AS v_nk,
        |       CAST(NULL AS VARCHAR) AS v_absent,
        |       'nk,name' AS keys,
        |       CAST(2 AS BIGINT) AS m_card
        |FROM nation ORDER BY n_nationkey""".stripMargin),
      doc = "map construct/probe/enumerate; oracle replays the observable scalars"),
    "q_explode" -> QueryDef(explodeQ, Some(
      // two unnests in one SELECT zip positionally (scalar range() builds
      // the 1-based ordinality list — the lateral table fn can't correlate)
      """SELECT doc_id,
        |       unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
        |       unnest(string_split(text, ' ')) AS tok
        |FROM documents ORDER BY doc_id, pos""".stripMargin)),
    "q_json_get" -> QueryDef(jsonGet, Some(jsonKOracle)),
    "q_json_variant" -> QueryDef(jsonVariant, Some(jsonKOracle)),
    "q_parse_json" -> QueryDef(parseJson, Some(
      """SELECT event_id, event_id AS pid, event_type AS pty
        |FROM events ORDER BY event_id""".stripMargin)),
    "q_to_json" -> QueryDef(toJsonQ, Some(
      """SELECT event_id,
        |       CAST(to_json(struct_pack(id := event_id, ty := event_type)) AS VARCHAR) AS js
        |FROM events ORDER BY event_id""".stripMargin)),
    "q_cast_chain" -> QueryDef(castChain, Some(
      """SELECT event_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS ep,
        |       strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000),
        |                '%Y-%m-%d %H:%M:%S') AS rt,
        |       TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS vs,
        |       TRY_CAST('x' || CAST(event_id AS VARCHAR) AS DOUBLE) AS bad
        |FROM events ORDER BY event_id""".stripMargin)),
    "q_filter_notnull" -> QueryDef(filterNotNull, Some(
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
        |  AND CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0
        |ORDER BY event_id""".stripMargin)),
    "q_topic_route" -> QueryDef(topicRoute, Some(
      """WITH t AS (
        |  SELECT event_id,
        |         CASE WHEN event_id % 3 = 0
        |                THEN 'parsed-trades-' || event_type || '-usdt'
        |              WHEN event_id % 3 = 1
        |                THEN 'parsed-trades-x-' || event_type || '-usdt'
        |              ELSE 'raw.' || event_type END AS topic,
        |         event_type
        |  FROM events)
        |SELECT event_id, topic,
        |       CASE WHEN regexp_matches(topic, 'parsed-trades-.+-usdt')
        |            THEN regexp_extract(topic, 'parsed-trades-([^-]+)-usdt', 1)
        |            ELSE upper(event_type) END AS base
        |FROM t ORDER BY event_id""".stripMargin)),
    "q_collect_sort" -> QueryDef(collectSort, Some(
      """SELECT l_orderkey,
        |       array_to_string(list_sort(list(l_linenumber)), ',') AS lns,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),
    "q_higher_order" -> QueryDef(higherOrder, Some(
      """SELECT doc_id,
        |       CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x))) AS BIGINT) AS tot_chars,
        |       string_split(text, ' ')[1] AS first_w,
        |       string_split(text, ' ')[-1] AS last_w,
        |       len(string_split(text, ' ')) AS n_words,
        |       len(list_filter(string_split(text, ' '), x -> len(x) > 4)) AS long_cnt
        |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
