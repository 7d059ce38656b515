package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Events

/** Window-function surface (SURVEY.md §2.4 X8, X9, X14).
  *
  * Scale posture: a window `partitionBy(k)` shuffles once on `k` and then
  * streams each partition in sort order — the same cost envelope as a
  * grouped aggregation. Running sums are computed over DECIMAL so the
  * sequential accumulation is exact (associativity ⇒ reproducible across
  * retries/partitionings). `orderBy().limit(k)` compiles to
  * TakeOrderedAndProject: per-partition top-k heaps + driver merge of k·P
  * rows — no global sort, the right plan at 100 TB.
  */
object Windows {

  /** X8: ranking — row_number over a total per-partition order (ties broken
    * by key columns) + rank over the natural (tying) order, top-5 rows per
    * supplier. */
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    val rnW = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_extendedprice"))
    val rkW = Window.partitionBy("l_suppkey").orderBy(col("l_shipdate"))
    lineitem(s, d)
      .withColumn("rn", row_number().over(rnW))
      .withColumn("rk", rank().over(rkW))
      .where(col("rn") <= 5)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
        "rn", "rk")
      .orderBy("l_suppkey", "rn")
  }

  /** X8: running (prefix) aggregation + lag, per customer over order time.
    * The running sum is DECIMAL-exact, then cast to double. */
  def qWindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_totalprice"),
        sum(dec2(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** X9: top-k — TakeOrderedAndProject (no global sort at scale). */
  def qTopk(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)

  /** X14: tumbling 1-hour event-time windows, batch form (the same
    * `window()` expression works under Structured Streaming with
    * `withWatermark`; see graft.streaming). */
  def qTimeWindow(s: SparkSession, d: String): DataFrame =
    Events.events(s, d)
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")

  /** X9 at scale: top-k per key via the custom two-phase physical
    * operator [[graft.plans.TopKPerKey]] — map-side partial top-k bounds
    * shuffle volume at k·partitions·keys (the window-function form
    * shuffles every row). Oracle: the equivalent ROW_NUMBER window SQL —
    * proving the custom operator matches the declarative form. */
  def qTopkPerKey(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    graft.plans.TopKPerKey.topKPerKey(li,
      Seq(li("l_suppkey")),
      Seq(li("l_extendedprice").desc, li("l_orderkey"), li("l_linenumber"),
        li("l_partkey")),
      3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
        "l_extendedprice")
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
  }

  /** X8/X14: event-time rolling aggregation — per-user 1-hour trailing
    * count + sum via a RANGE frame over epoch-seconds. One shuffle on
    * user_id, then each partition streams once with a sliding frame
    * (amortized O(1) per row — never a per-row re-scan). The frame key is
    * numeric (epoch seconds) so range semantics are engine-portable, and
    * the sum runs over DECIMAL so the sequential accumulation is exact
    * and bit-reproducible at any partitioning. */
  def qRollingWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_sec")
      .rangeBetween(-3600L, 0L)
    Events.events(s, d)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("ts_sec"), col("value"))
      // both frame aggregates in ONE select so they land in one Window
      // node (chained withColumn left two Window passes in the plan)
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        count(lit(1)).over(w).as("n_1h"),
        sum(dec2(col("value"))).over(w).cast("double").as("sum_1h"))
      .orderBy("user_id", "ts_sec", "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_per_key"   -> qTopkPerKey _,
    "q_window_rank"    -> qWindowRank _,
    "q_window_running" -> qWindowRunning _,
    "q_topk"           -> qTopk _,
    "q_time_window"    -> qTimeWindow _,
    "q_rolling_window" -> qRollingWindow _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_topk_per_key" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
        |       l_extendedprice
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
        |         l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
        |               l_partkey) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey,
        |         l_linenumber, l_partkey""".stripMargin,
    "q_window_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, rn, rk
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |               l_extendedprice) AS rn,
        |    RANK() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate) AS rk
        |  FROM lineitem)
        |WHERE rn <= 5
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total,
        |  LAG(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |    AS prev_price
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "q_rolling_window" ->
      """SELECT event_id, user_id,
        |  epoch_ns(ts) // 1000000000 AS ts_sec,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY (epoch_ns(ts) // 1000000000)
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_sec, event_id""".stripMargin,
    "q_time_window" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
        |                '%Y-%m-%d %H:%M:%S') AS wstart,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY wstart, event_type""".stripMargin,
  )
}
