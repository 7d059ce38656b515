package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Events

/** Behavioral / product-analytics operators over the events stream:
  * ordered-sequence funnels and cohort retention.
  *
  * Scale posture: both are built from partial+final aggregations and
  * equi-joins on user_id — never a per-user event sort (the window
  * formulation would order every user's history; the iterated
  * min-after-t form only ever aggregates). Timestamps stay epoch-nanos
  * longs end to end: exact comparisons, no timezone surface, and the
  * DuckDB oracle compares the same integers via epoch_ns().
  */
object Behavior {

  /** Ordered conversion funnel view → click → purchase: a user converts a
    * stage only with an event STRICTLY AFTER their previous stage's first
    * conversion (the classic "ordered funnel" semantics). Each stage is
    * one filtered partial-agg min + one equi-join on user_id — stages
    * compose linearly, no per-user ordering ever materializes. */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    val e = Events.events(s, d).select(col("user_id"), col("event_type"),
      col("ts"))
    val u = e.select("user_id").distinct()
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    u.join(v.select(col("user_id"), lit(1L).as("did_view")), Seq("user_id"),
        "left")
      .join(c.select(col("user_id"), lit(1L).as("did_click")), Seq("user_id"),
        "left")
      .join(p.select(col("user_id"), lit(1L).as("did_purchase")),
        Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("did_view"), lit(0L)).as("did_view"),
        coalesce(col("did_click"), lit(0L)).as("did_click"),
        coalesce(col("did_purchase"), lit(0L)).as("did_purchase"))
      .orderBy("user_id")
  }

  /** Cohort retention: users bucketed by their first-activity week
    * (epoch-week of min event), counted in every week they were active.
    * Two partial aggregations + one equi-join on user_id; the
    * count-distinct runs as Spark's standard two-phase expand — all
    * shapes that scale linearly. Week indices are integer epoch-nanos
    * arithmetic (identical in the oracle via epoch_ns). */
  def qCohortRetention(s: SparkSession, d: String): DataFrame = {
    // integer `div`, never `/`: epoch-nanos exceed 2^53, a double round
    // trip would misplace events at week boundaries
    val e = Events.events(s, d)
      .select(col("user_id"),
        expr("ts div 604800000000000").as("wk")) // 7d in nanos
    val first = e.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    e.join(first, Seq("user_id"))
      .groupBy("cohort_wk", "wk")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .withColumn("weeks_since", col("wk") - col("cohort_wk"))
      .select("cohort_wk", "weeks_since", "n_users")
      .orderBy("cohort_wk", "weeks_since")
  }

  /** Time-series gap filling + forward fill: every user gets a dense
    * hourly grid between their first and last event (sequence + explode —
    * slot count is bounded per user, generated distributed, never on the
    * driver); missing hours zero-fill the count and carry the last
    * observed hourly sum forward via last(ignoreNulls) over a running
    * frame. One join keyed (user, hour), one per-user window — the
    * standard dashboard/feature-store densification at any scale. */
  def qGapFill(s: SparkSession, d: String): DataFrame = {
    val e = Events.events(s, d)
      .select(col("user_id"),
        expr("ts div 3600000000000").as("hr"), col("value")) // 1h in nanos
    val hourly = e.groupBy("user_id", "hr")
      .agg(count(lit(1)).as("n"),
        round(sum(graft.Tables.dec2(col("value"))).cast("double"), 2)
          .as("sum_v"))
    val slots = e.groupBy("user_id")
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("hr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hr")
      .rowsBetween(Long.MinValue, 0)
    slots.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("sum_v"), ignoreNulls = true).over(w).as("last_sum"))
      .orderBy("user_id", "hr")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel"           -> qFunnel _,
    "q_cohort_retention" -> qCohortRetention _,
    "q_gap_fill"         -> qGapFill _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t1
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t2
        |      GROUP BY 1)
        |SELECT u.user_id,
        |  CAST(v.user_id IS NOT NULL AS BIGINT) AS did_view,
        |  CAST(c.user_id IS NOT NULL AS BIGINT) AS did_click,
        |  CAST(p.user_id IS NOT NULL AS BIGINT) AS did_purchase
        |FROM u
        |LEFT JOIN v ON u.user_id = v.user_id
        |LEFT JOIN c ON u.user_id = c.user_id
        |LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS hr, value
        |  FROM events),
        |hourly AS (
        |  SELECT user_id, hr, CAST(COUNT(*) AS BIGINT) AS n,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS sum_v
        |  FROM e GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |          FROM e GROUP BY 1),
        |slots AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr
        |          FROM spans)
        |SELECT s.user_id, s.hr,
        |  COALESCE(h.n, 0) AS n,
        |  last_value(h.sum_v IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_sum
        |FROM slots s
        |LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
        |ORDER BY s.user_id, s.hr""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id,
        |    epoch_ns(ts) // 604800000000000 AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1)
        |SELECT f.cohort_wk,
        |  e.wk - f.cohort_wk AS weeks_since,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_wk, weeks_since""".stripMargin,
  )
}
