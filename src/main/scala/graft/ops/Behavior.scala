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
    * hourly grid between their first and last event; missing hours
    * zero-fill the count and carry the last observed hourly sum forward.
    *
    * Structured as SPARSE last-observation-carry (r16 verdict task 5):
    * the LOCF window and the gap arithmetic run over the OBSERVED
    * hourly rows only (input-sized — one per-user window computing the
    * running carry and each observation's gap-to-next), and the dense
    * grid materializes in a single narrow explode that stamps every
    * gap hour with its observation's already-computed carry. The old
    * shape joined the exploded grid against the hourly frame and ran
    * the LOCF window over the DENSE rows — two extra output-sized
    * shuffles that dominated at scale. What remains output-proportional
    * is irreducible: the operator's OUTPUT is the dense grid (10×
    * input → 10× grid rows, measured 105k → 1.05M on the probe pair),
    * so the final order-and-write is the floor, not a plan defect. */
  def qGapFill(s: SparkSession, d: String): DataFrame = {
    val e = Events.events(s, d)
      .select(col("user_id"),
        expr("ts div 3600000000000").as("hr"), col("value")) // 1h in nanos
    val hourly = e.groupBy("user_id", "hr")
      .agg(count(lit(1)).as("n"),
        round(sum(graft.Tables.dec2(col("value"))).cast("double"), 2)
          .as("sum_v"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hr")
      .rowsBetween(Long.MinValue, 0)
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hr")
    // both window columns in ONE select → one Window node, one pass
    val sparse = hourly.select(col("user_id"), col("hr"), col("n"),
      last(col("sum_v"), ignoreNulls = true).over(wRun).as("carry"),
      lead(col("hr"), 1).over(wNext).as("next_hr"))
    sparse
      .withColumn("hrs",
        sequence(col("hr"), coalesce(col("next_hr") - 1, col("hr"))))
      .select(col("user_id"), col("hr").as("obs_hr"), col("n").as("obs_n"),
        col("carry"), explode(col("hrs")).as("hr"))
      .select(col("user_id"), col("hr"),
        when(col("hr") === col("obs_hr"), col("obs_n"))
          .otherwise(lit(0L)).as("n"),
        col("carry").as("last_sum"))
      .orderBy("user_id", "hr")
  }

  /** Type-2 slowly-changing-dimension build: collapse each user's event
    * stream into state-version intervals (state = event_type; a new
    * version starts whenever the state differs from the previous event's).
    * The classic warehouse history table: (user, state, valid_from,
    * valid_to, version), valid_to NULL on the current version.
    *
    * Scale posture: both windows are partitioned by user_id — parallelism
    * is the user count, no few-key funnel. Per-user history is the only
    * ordered unit, exactly the SCD2 contract. Timestamps are epoch-MICROS
    * longs (integer `div`, exact): DuckDB truncates parquet nano
    * timestamps to micros, so nanos must never reach an oracle-checked
    * output; ordering tie-breaks on event_id so version numbering stays
    * total under equal micros. */
  def qScd2(s: SparkSession, d: String): DataFrame = {
    val e = Events.events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
    scd2Versions(e).drop("vid").orderBy("user_id", "version")
  }

  /** The SCD2 core over (user_id, event_id, ts-micros, event_type) rows:
    * (user_id, version, state, valid_from, valid_to, vid). `vid` is the
    * event_id of the version's FIRST row in (ts, event_id) window order —
    * a stable per-version identity that downstream renumbering
    * ([[qScd2Merge]]) can tie-break on when two versions of one user
    * share a valid_from micro-timestamp. min(event_id) over the whole
    * version would NOT be safe: a later row of an earlier-starting
    * version may carry a smaller event_id than the first row of the
    * next version, inverting the order under ties. */
  private[graft] def scd2Versions(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runs = e
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = runs.groupBy("user_id", "version")
      // all rows in a version share one event_type by construction, so
      // min() is just the deterministic way to pick it
      .agg(min(col("event_type")).as("state"),
        min(col("ts")).as("valid_from"),
        min(struct(col("ts"), col("event_id"))).as("fst"))
    val vw = Window.partitionBy("user_id").orderBy("version")
    versions
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"),
        lead(col("valid_from"), 1).over(vw).as("valid_to"),
        col("fst.event_id").as("vid"))
  }

  /** Incremental SCD2 maintenance (the warehouse MERGE): split the
    * stream at a time cutoff, build the "existing" history from the old
    * half, then fold ONLY the new batch in — extend the open version
    * when the first new state matches it, close it otherwise, renumber
    * by a per-user window over VERSION rows (not events). Output is
    * proven identical to the full recompute: the oracle is the same SQL
    * as q_scd2, and Scd2MergeSpec asserts equality directly.
    *
    * Scale posture: the point of the operator — a daily increment never
    * rescans historical events, only the (users × versions) history
    * table and the day's batch; every join and window is keyed by
    * user_id. */
  def qScd2Merge(s: SparkSession, d: String): DataFrame = {
    val e = Events.events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
    // the cutoff is an INPUT in a real incremental job (the batch
    // boundary); deriving it from data here only makes the key
    // self-contained — one aggregated scalar read on the driver, so the
    // incremental plan itself carries no global aggregation
    val cut = e.agg(expr("(min(ts) + max(ts)) div 2"))
      .collect()(0).getLong(0)
    scd2Merge(e, cut).orderBy("user_id", "version")
  }

  /** The MERGE core over (user_id, event_id, ts, event_type) rows split
    * at `cut`: fold the ≥cut batch into the <cut history. Factored out of
    * [[qScd2Merge]] so PropertySpec can replay it on generated streams
    * with heavy timestamp ties. */
  private[graft] def scd2Merge(e: DataFrame, cut: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val history = scd2Versions(e.where(col("ts") < cut))
    val batch = scd2Versions(e.where(col("ts") >= cut))
    val open = history.where(col("valid_to").isNull)
      .select(col("user_id"), col("state").as("o_state"))
    // drop the batch's first version when it extends the open one
    val kept = batch.join(open, Seq("user_id"), "left")
      .where(col("version") =!= 1 || col("o_state").isNull ||
        col("o_state") =!= col("state"))
      .select(col("user_id"), col("state"), col("valid_from"), col("vid"))
    val all = history
      .select(col("user_id"), col("state"), col("valid_from"), col("vid"))
      .unionAll(kept)
    // vid tie-breaks versions sharing a valid_from micro-timestamp — the
    // full recompute orders them by first-event (ts, event_id), and vid
    // carries exactly that identity through the merge
    val w = Window.partitionBy("user_id").orderBy("valid_from", "vid")
    all.select(col("user_id"),
        row_number().over(w).cast("long").as("version"),
        col("state"), col("valid_from"),
        lead(col("valid_from"), 1).over(w).as("valid_to"))
  }

  /** Maximum interval concurrency per event type: every event opens a
    * 30-minute interval; report the peak number of simultaneously open
    * intervals for each type (capacity planning / rate analysis — the
    * sweep-line). Touching endpoints do not overlap (close sorts before
    * open at the same instant).
    *
    * Scale posture: the textbook formulation is one running sum ordered
    * by time PER TYPE — a handful of types means the whole table funnels
    * through a handful of reducers (the q_quantiles failure mode). This
    * is the two-level parallel prefix-sum instead: (1) ±1 deltas are
    * bucketed by hour and prefix-summed WITHIN (type, hour-bucket) — a
    * window keyed fine enough to spread every reducer; (2) per-bucket
    * totals (rows = types × hours, data-independent and tiny — the same
    * aggregated-metadata posture as qGapFill's spans) get an exclusive
    * running offset per type; (3) peak = max over buckets of
    * offset + local peak. Identical to the global sweep because bucket
    * boundaries respect the global time order. */
  def qMaxConcurrency(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val len = 1800000000L // 30 min in micros (micros, not nanos: DuckDB
    // truncates parquet nano timestamps to micros, so the sweep runs on
    // epoch-micros in both engines for identical tie-breaking)
    val e = Events.events(s, d)
      .select(col("event_type"), expr("ts div 1000").as("ts"))
    val deltas = e.select(col("event_type"), col("ts").as("t"),
        lit(1L).as("delta"))
      .unionAll(e.select(col("event_type"), (col("ts") + len).as("t"),
        lit(-1L).as("delta")))
      .withColumn("bucket", expr("t div 3600000000")) // 1h in micros
    val local = Window.partitionBy("event_type", "bucket")
      .orderBy("t", "delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = deltas
      .withColumn("run", sum(col("delta")).over(local))
      .groupBy("event_type", "bucket")
      .agg(sum(col("delta")).as("tot"), max(col("run")).as("local_peak"))
    val offsets = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("offset",
        coalesce(sum(col("tot")).over(offsets), lit(0L)))
      .groupBy("event_type")
      .agg(max(col("offset") + col("local_peak")).as("max_concurrent"))
      .orderBy("event_type")
  }

  /** Linear multi-touch attribution: every purchase splits its value
    * equally across the user's clicks in the preceding hour (half-open
    * window [t−1h, t)); a click accumulates credit from every purchase
    * it preceded. The classic marketing-attribution join.
    *
    * Scale posture: the purchase×click pairing is the BINNED interval
    * join (each purchase window spans exactly two 1-hour buckets because
    * the bucket width equals the window length) — a hash equi-join on
    * (user, bucket) plus a residual band filter, never a per-user
    * cross-product or a sorted merge over time. The per-purchase touch
    * count is a window keyed by purchase id (cardinality = purchases —
    * spreads over every reducer). All money is integer cents with floor
    * division, exact in both engines. */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = 3600000000L // 1h in micros — window length AND bucket width
    val e = Events.events(s, d).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("t"), col("event_type"),
      (graft.Tables.dec2(col("value")) * 100).cast("long").as("v"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("t").as("ct"), expr(s"t div $b").as("bucket"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("t").as("pt"), col("v"),
        // [pt−b, pt) spans exactly buckets {pt div b − 1, pt div b}
        explode(array(expr(s"t div $b - 1"), expr(s"t div $b")))
          .as("bucket"))
    val paired = purchases.join(clicks, Seq("user_id", "bucket"))
      .where(col("ct") >= col("pt") - b && col("ct") < col("pt"))
      .select(col("user_id"), col("p_id"), col("v"), col("click_id"))
    paired
      .select(col("user_id"), col("click_id"), col("v"),
        count(lit(1)).over(Window.partitionBy("p_id")).as("n"))
      .select(col("user_id"), col("click_id"),
        expr("v div n").as("credit"))
      .groupBy("user_id", "click_id")
      .agg(count(lit(1)).as("n_purchases"), sum(col("credit")).as("credit"))
      .orderBy("user_id", "click_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel"           -> qFunnel _,
    "q_cohort_retention" -> qCohortRetention _,
    "q_gap_fill"         -> qGapFill _,
    "q_scd2"             -> qScd2 _,
    "q_scd2_merge"       -> qScd2Merge _,
    "q_max_concurrency"  -> qMaxConcurrency _,
    "q_attribution"      -> qAttribution _,
  )

  /** Shared by q_scd2 and q_scd2_merge: the incremental MERGE must land
    * on byte-identical history, so both keys check against the same
    * full-recompute SQL. */
  private val scd2Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t, event_type,
      |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |v AS (
      |  SELECT user_id, event_id, t, event_type,
      |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS version
      |  FROM e),
      |g AS (
      |  SELECT user_id, version, min(event_type) AS state,
      |    min(t) AS valid_from
      |  FROM v GROUP BY 1, 2)
      |SELECT user_id, version, state, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to
      |FROM g
      |ORDER BY user_id, version""".stripMargin

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
    "q_scd2" -> scd2Sql,
    // the MERGE path must land on byte-identical history — one oracle
    "q_scd2_merge" -> scd2Sql,
    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, t AS ct FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS p_id, t AS pt, v FROM e
        |      WHERE event_type = 'purchase'),
        |paired AS (
        |  SELECT p.user_id, p.p_id, p.v, c.click_id
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE c.ct >= p.pt - 3600000000 AND c.ct < p.pt),
        |credited AS (
        |  SELECT user_id, click_id,
        |    v // (COUNT(*) OVER (PARTITION BY p_id)) AS credit
        |  FROM paired)
        |SELECT user_id, click_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(credit) AS BIGINT) AS credit
        |FROM credited
        |GROUP BY 1, 2
        |ORDER BY user_id, click_id""".stripMargin,
    "q_max_concurrency" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) AS t, CAST(1 AS BIGINT) AS delta
        |  FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 1800000000,
        |    CAST(-1 AS BIGINT)
        |  FROM events),
        |r AS (
        |  SELECT event_type,
        |    CAST(sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run
        |  FROM d)
        |SELECT event_type, max(run) AS max_concurrent
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
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
