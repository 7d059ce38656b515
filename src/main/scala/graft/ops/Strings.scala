package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Events

/** SQL-surface breadth: string functions, pivot, JSON extraction,
  * correlated scalar subqueries, ranking-window variants, GROUPING SETS.
  * All per-row transforms are codegen'd narrow ops (no shuffle); pivot
  * and grouping sets compile to single-shuffle hash aggregations. */
object Strings {

  /** Extended string-function surface (lpad/rpad/translate/split_part/
    * instr/reverse/repeat/ascii/concat_ws) — parity-checked against
    * DuckDB's equivalents. */
  def qStringFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"),
      lpad(col("c_name"), 25, "*").as("name_lpad"),
      rpad(substring(col("c_name"), 10, 9), 12, "0").as("id_rpad"),
      translate(col("c_name"), "Cust", "Kust").as("name_tr"),
      split_part(col("c_name"), lit("#"), lit(2)).as("id_part"),
      reverse(col("c_name")).as("name_rev"),
      repeat(col("c_mktsegment"), 2).as("seg2"),
      instr(col("c_name"), "mer").cast("long").as("pos_mer"),
      ascii(substring(col("c_name"), 1, 1)).cast("long").as("first_ascii"),
      concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"))
      .orderBy("c_custkey")

  /** Pivot: customers per (nation, market segment) as a cross-tab.
    * Fixed segment list keeps the output schema static (required for the
    * oracle and the sane thing at scale — dynamic pivot needs a driver
    * pass to enumerate values). */
  def qPivot(s: SparkSession, d: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val c = customer(s, d)
    val n = nation(s, d)
    val base = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name").pivot("c_mktsegment", segs).count()
    segs.foldLeft(base)((df, seg) =>
        df.withColumn(seg, coalesce(col(s"`$seg`"), lit(0L))))
      .orderBy("n_name")
  }

  /** JSON extraction from the events `props` column. */
  def qJson(s: SparkSession, d: String): DataFrame =
    Events.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .orderBy("event_id")

  /** Correlated scalar subqueries (SQL-text form over temp views). */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("gs_customer")
    orders(s, d).createOrReplaceTempView("gs_orders")
    s.sql(
      """SELECT c.c_custkey,
        |  (SELECT COUNT(*) FROM gs_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  COALESCE((SELECT MAX(o.o_totalprice) FROM gs_orders o
        |            WHERE o.o_custkey = c.c_custkey), -1.0D) AS max_price
        |FROM gs_customer c
        |ORDER BY c.c_custkey""".stripMargin)
  }

  /** Ranking-window variants: dense_rank, ntile, percent_rank, cume_dist,
    * first_value — over a total per-partition order. */
  def qWindowMisc(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d).select(
      col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
      dense_rank().over(w).cast("long").as("drk"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("prk"),
      cume_dist().over(w).as("cd"),
      first_value(col("o_orderkey")).over(w).as("top_order"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** Explicit GROUPING SETS (beyond rollup/cube). */
  def qGroupingSets(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("gs_lineitem")
    s.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       COUNT(*) AS n
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }

  /** Unpivot (wide → long melt) — the inverse of [[qPivot]], via Spark's
    * native `Dataset.unpivot` (compiles to a single Expand node: each
    * input row fans out to one row per value column map-side, no shuffle
    * until the summarizing aggregate). Sums go through DECIMAL(18,4) so
    * the per-metric totals are associative and engine-exact; min/max are
    * order-free already. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "metric", "value")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .orderBy("metric")

  /** Higher-order array-function surface — transform / filter /
    * aggregate(fold) / sort / slice composed per row over the token
    * array, all codegen'd narrow ops (the "functions, not UDFs" rule
    * applied to collections; every result is integer/string-exact so the
    * DuckDB list_* oracle hash-matches). */
  def qArrayFuncs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), Text.toks(col("text")).as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        aggregate(transform(col("tk"), t => length(t)),
          lit(0L), (acc, x) => acc + x).as("sum_len"),
        size(filter(col("tk"), t => length(t) >= 6)).cast("long")
          .as("n_long"),
        concat_ws(" ", slice(sort_array(col("tk")), 1, 3)).as("first3"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_funcs"     -> qArrayFuncs _,
    "q_string_funcs"    -> qStringFuncs _,
    "q_unpivot"         -> qUnpivot _,
    "q_pivot"           -> qPivot _,
    "q_json"            -> qJson _,
    "q_scalar_subquery" -> qScalarSubquery _,
    "q_window_misc"     -> qWindowMisc _,
    "q_grouping_sets"   -> qGroupingSets _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_array_funcs" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'),
        |    x -> x <> '') AS tk
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_tok,
        |  CAST(COALESCE(list_aggregate(list_transform(tk, x -> len(x)),
        |    'sum'), 0) AS BIGINT) AS sum_len,
        |  CAST(len(list_filter(tk, x -> len(x) >= 6)) AS BIGINT) AS n_long,
        |  array_to_string(list_sort(tk)[1:3], ' ') AS first3
        |FROM tk ORDER BY doc_id""".stripMargin,
    "q_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
        |  MIN(value) AS min_v, MAX(value) AS max_v
        |FROM u GROUP BY metric ORDER BY metric""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        |  lpad(c_name, 25, '*') AS name_lpad,
        |  rpad(substring(c_name, 10, 9), 12, '0') AS id_rpad,
        |  translate(c_name, 'Cust', 'Kust') AS name_tr,
        |  split_part(c_name, '#', 2) AS id_part,
        |  reverse(c_name) AS name_rev,
        |  repeat(c_mktsegment, 2) AS seg2,
        |  CAST(strpos(c_name, 'mer') AS BIGINT) AS pos_mer,
        |  CAST(ascii(substring(c_name, 1, 1)) AS BIGINT) AS first_ascii,
        |  concat_ws('-', c_mktsegment, c_name) AS seg_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_pivot" ->
      """SELECT n.n_name,
        |  CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE')
        |       AS BIGINT) AS AUTOMOBILE,
        |  CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING')
        |       AS BIGINT) AS BUILDING,
        |  CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE')
        |       AS BIGINT) AS FURNITURE,
        |  CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD')
        |       AS BIGINT) AS HOUSEHOLD,
        |  CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY')
        |       AS BIGINT) AS MACHINERY
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c.c_custkey,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  COALESCE((SELECT MAX(o.o_totalprice) FROM orders o
        |            WHERE o.o_custkey = c.c_custkey), -1.0) AS max_price
        |FROM customer c
        |ORDER BY c.c_custkey""".stripMargin,
    "q_window_misc" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  PERCENT_RANK() OVER w AS prk,
        |  CUME_DIST() OVER w AS cd,
        |  FIRST_VALUE(o_orderkey) OVER w AS top_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
  )
}
