package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Events

/** Set operations, semi/anti joins, non-equi (range) join and as-of join
  * (SURVEY.md §2.4 X10–X12).
  *
  * Scale posture:
  *   - union/intersect/except and semi/anti joins shuffle on the compared
  *     key only — constant-width rows, no payload amplification.
  *   - The range join broadcasts the (tiny) band table: a
  *     BroadcastNestedLoopJoin over k bands is a k-way predicate fan-out,
  *     not a shuffle. With a large range table the upgrade path is interval
  *     bucketing (explode ranges into grid cells, equi-join on cell).
  *   - The as-of join is ONE shuffle on user_id + a sorted window scan —
  *     the Spark-native equivalent of a streaming join, no per-row lookups.
  */
object SetOps {

  private def highValueOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d).where(col("o_totalprice") > 100000)
      .select(col("o_custkey").as("k")).distinct()

  private def richCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d).where(col("c_acctbal") > 0)
      .select(col("c_custkey").as("k")).distinct()

  /** X10: UNION / INTERSECT / EXCEPT (ANSI distinct semantics), tagged and
    * stacked so one result exercises all three. */
  def qSetops(s: SparkSession, d: String): DataFrame = {
    val a = highValueOrders(s, d)
    val b = richCustomers(s, d)
    a.union(b).distinct().withColumn("op", lit("union"))
      .unionAll(a.intersect(b).withColumn("op", lit("intersect")))
      .unionAll(a.except(b).withColumn("op", lit("except")))
      .select("op", "k")
      .orderBy("op", "k")
  }

  /** X11: left-semi (EXISTS) + left-anti (NOT EXISTS), tagged. */
  def qSemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).select("o_custkey")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_order").as("tag"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_order").as("tag"))
    semi.unionAll(anti).orderBy("c_custkey", "tag")
  }

  /** X12a: non-equi range join — events banded by value against a small
    * broadcast range table. */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      ("b0_low", 0.0, 50.0),
      ("b1_mid", 50.0, 100.0),
      ("b2_high", 100.0, 150.0),
      ("b3_top", 150.0, 1000000.0),
    )).toDF("band", "lo", "hi")
    val e = Events.events(s, d)
    e.join(broadcast(bands),
        e("value") >= bands("lo") && e("value") < bands("hi"), "inner")
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy("band")
  }

  /** X12 scale path: the same interval join, BINNED — each band explodes
    * into the fixed-width bins it covers (multiplying only the tiny dim
    * side), each event computes its bin in O(1), and the join becomes a
    * hash EQUI-join on bin + residual range check. The plain form is a
    * nested-loop scan of every band per event: fine at 4 bands, fatal at
    * 100k intervals; the binned form's per-event cost is one hash lookup
    * regardless of band count (RangeBinSpec asserts BroadcastHashJoin vs
    * the plain form's BNL, and the oracle is the identical interval-join
    * SQL). Bin width trades dim-side blowup (wide intervals → many bins)
    * against residual selectivity — a production operator would derive it
    * from the interval-length histogram. */
  def qRangeJoinBinned(s: SparkSession, d: String): DataFrame = {
    val binW = 50.0
    val bands = s.createDataFrame(Seq(
      ("b0_low", 0.0, 50.0),
      ("b1_mid", 50.0, 100.0),
      ("b2_high", 100.0, 150.0),
      ("b3_top", 150.0, 1000000.0),
    )).toDF("band", "lo", "hi")
    val binned = bands.select(col("band"), col("lo"), col("hi"),
      explode(sequence(
        floor(col("lo") / binW).cast("long"),
        floor((col("hi") - lit(1e-9)) / binW).cast("long"))).as("bin"))
    val e = Events.events(s, d)
      .withColumn("bin", floor(col("value") / binW).cast("long"))
    e.join(broadcast(binned),
        e("bin") === binned("bin") &&
          e("value") >= binned("lo") && e("value") < binned("hi"), "inner")
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy("band")
  }

  /** X12b: as-of join — each purchase matched to the latest earlier 'view'
    * of the same user. Implemented as union + sorted window (single shuffle
    * on user_id), the scalable alternative to a per-row lookup join.
    * Timestamps stay raw epoch-nanos longs so comparisons are exact against
    * the oracle's TIMESTAMP_NS. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Events.events(s, d)
      .where(col("event_type").isin("view", "purchase"))
      .select("event_id", "user_id", "ts", "event_type")
    // strict as-of (v.ts < p.ts, matching the oracle's ASOF p.ts > v.ts):
    // at equal timestamps views must sort AFTER purchases so a same-ts
    // view never lands in a purchase's preceding frame
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"),
        when(col("event_type") === "view", lit(1)).otherwise(lit(0)),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // both frame aggregates in ONE select: makes the single-Window-pass
    // shape explicit and skips the per-withColumn analyzer round trips
    // (the optimizer's CollapseWindow would merge adjacent same-spec
    // Window operators either way; PlanAuditSpec pins one pass)
    e.select(col("*"),
        last(when(col("event_type") === "view", col("event_id")), true)
          .over(w).as("view_event_id"),
        last(when(col("event_type") === "view", col("ts")), true)
          .over(w).as("view_ts"))
      .where(col("event_type") === "purchase")
      // no-match sentinel -1 (a NULL BIGINT would become float64 downstream
      // and lose precision); epoch-micros because DuckDB truncates parquet
      // TIMESTAMP(NANOS) to µs on read, so ns aren't oracle-visible
      .select(col("event_id").as("purchase_id"), col("user_id"),
        coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
        coalesce(expr("view_ts div 1000"), lit(-1L)).as("view_ts_us"))
      .orderBy("purchase_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_setops"     -> qSetops _,
    "q_semi_anti"  -> qSemiAnti _,
    "q_range_join" -> qRangeJoin _,
    "q_range_join_binned" -> qRangeJoinBinned _,
    "q_asof_join"  -> qAsofJoin _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
        |           WHERE o_totalprice > 100000),
        |     b AS (SELECT DISTINCT c_custkey AS k FROM customer
        |           WHERE c_acctbal > 0)
        |SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, k
        |FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        |UNION ALL
        |SELECT 'except' AS op, k
        |FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
        |ORDER BY op, k""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_custkey = c.c_custkey)
        |       THEN 'has_order' ELSE 'no_order' END AS tag
        |FROM customer c
        |ORDER BY c_custkey, tag""".stripMargin,
    "q_range_join" ->
      """SELECT r.band, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_value
        |FROM events e
        |JOIN (VALUES ('b0_low', 0.0, 50.0), ('b1_mid', 50.0, 100.0),
        |             ('b2_high', 100.0, 150.0), ('b3_top', 150.0, 1000000.0))
        |     AS r(band, lo, hi)
        |  ON e.value >= r.lo AND e.value < r.hi
        |GROUP BY r.band
        |ORDER BY r.band""".stripMargin,
    // binned form computes the SAME interval join — same oracle
    "q_range_join_binned" ->
      """SELECT r.band, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_value
        |FROM events e
        |JOIN (VALUES ('b0_low', 0.0, 50.0), ('b1_mid', 50.0, 100.0),
        |             ('b2_high', 100.0, 150.0), ('b3_top', 150.0, 1000000.0))
        |     AS r(band, lo, hi)
        |  ON e.value >= r.lo AND e.value < r.hi
        |GROUP BY r.band
        |ORDER BY r.band""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |       COALESCE(v.event_id, -1) AS view_event_id,
        |       COALESCE(epoch_us(v.ts), -1) AS view_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts > v.ts
        |ORDER BY purchase_id""".stripMargin,
  )
}
