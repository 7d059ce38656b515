package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Graph analytics over relationship tables — PageRank-style entity
  * importance, complementing the label-propagation connected components
  * in [[Sketches.qDedupCluster]].
  *
  * The supply graph: suppliers and parts as nodes (namespaced into one
  * id space: supplier 2k, part 2k+1), an undirected edge per DISTINCT
  * (supplier, part) pair observed in lineitem.
  *
  * Scale posture: each PageRank iteration is ONE equi-join of the rank
  * vector against the edge list plus one partial+final sum keyed by
  * destination — the Pregel shape, linear per iteration, parallelism =
  * node count. The iteration count is static (3), so the whole thing is
  * one plan; the derived edge list and degree table are lineage-
  * truncated with localCheckpoint (lazy) so every iteration reads the
  * SAME materialized edge RDD instead of re-expanding the distinct
  * subtree — without it the static plan re-plans the lineitem scan 40+
  * times. At warehouse scale the edge list would be a bucketed table
  * making every iteration's join shuffle-free.
  *
  * Determinism: all arithmetic is scaled-integer (rank mass of 10^9,
  * floor division) — no floating point anywhere, so ranks are
  * bit-identical in any engine / any partitioning, and the DuckDB oracle
  * replays the same three iterations with `//`. */
object Graph {

  private val Scale = 1000000000L
  private val Iters = 3

  def qPagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = lineitem(s, d)
      .select((col("l_suppkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = pairs
      .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = false)
    val outdeg = edges.groupBy("src")
      .agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    val nn = outdeg.agg(count(lit(1)).as("nn"))
    val base = outdeg.crossJoin(broadcast(nn)) // node, deg, nn
      .localCheckpoint(eager = false)
    var ranks = base.select(col("node"), col("deg"), col("nn"),
      expr(s"$Scale div nn").as("pr"))
    for (_ <- 1 to Iters) {
      val contribs = ranks
        .select(col("node").as("cnode"), expr("pr div deg").as("c"))
      val incoming = edges
        .join(contribs, edges("src") === col("cnode"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = base
        .join(incoming, base("node") === incoming("dst"), "left")
        .select(base("node"), base("deg"), base("nn"),
          expr(s"((15 * ($Scale div nn)) div 100) + " +
            "((85 * coalesce(s, 0L)) div 100)").as("pr"))
    }
    ranks.select(col("node"), col("pr")).orderBy("node")
  }

  /** Triangle census of the part co-purchase graph: nodes are parts,
    * with an edge between two parts iff some order contains both.
    * Reports edge/wedge/triangle counts and the global clustering
    * coefficient 3·T/W — the standard graph-cohesion statistic
    * (community structure, recommendation quality, spam detection).
    *
    * Edge construction is MAP-SIDE pair generation from each order's
    * sorted part list (same idiom as [[Ranking.qCooccurrence]]): no
    * self-join of lineitem against itself keyed on l_orderkey, and
    * per-order pair volume is bounded by basket size (≤ 7 lineitems per
    * order in this schema; unbounded-basket datasets would cap or
    * revert to the keyed self-join).
    *
    * The triangle count is the degree-ordered (compact-forward)
    * algorithm — THE load-bearing choice at scale: every edge is
    * oriented from its lower endpoint under the total order
    * (degree, id), wedges are pairs of out-edges from one source, and a
    * triangle is a wedge whose far endpoints are themselves an oriented
    * edge (one equi-join on (b, c)). Under this orientation max
    * out-degree is O(√m), so wedge volume is O(m^1.5) worst-case
    * instead of Σ deg² — the naive per-node form melts on hub nodes
    * (a part in 10⁶ orders contributes 10¹² wedges; degree-ordering
    * caps its out-degree at ~√m). Everything is integer counting on
    * keyed shuffles; the three 1-row stat frames compose via the
    * broadcast-crossJoin idiom. */
  def qTriangleCount(s: SparkSession, d: String): DataFrame = {
    val perOrder = lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val e = perOrder
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(" +
          "slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"))
        .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .distinct()
      // the degree join and both wedge sides read this; without the cut
      // each consumer re-expands the per-order pair generation
      .localCheckpoint(eager = false)
    val deg = e.select(col("pa").as("node"))
      .unionAll(e.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val ed = e
      .join(deg.select(col("node").as("pa"), col("deg").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("db")), "pb")
    // orient each edge from its smaller endpoint under (degree, id) —
    // struct comparison is lexicographic, exactly the total order needed
    val lower = struct(col("da"), col("pa")) < struct(col("db"), col("pb"))
    val oriented = ed.select(
      when(lower, col("pa")).otherwise(col("pb")).as("src"),
      when(lower, col("pb")).otherwise(col("pa")).as("dst"),
      when(lower, col("db")).otherwise(col("da")).as("ddst"))
      .localCheckpoint(eager = false)
    val o1 = oriented.select(col("src"), col("dst").as("b"),
      col("ddst").as("rb"))
    val o2 = oriented.select(col("src"), col("dst").as("c"),
      col("ddst").as("rc"))
    val wedges = o1.join(o2, Seq("src"))
      .where(struct(col("rb"), col("b")) < struct(col("rc"), col("c")))
      .select("b", "c")
    val tri = wedges
      .join(oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    // W = Σ deg·(deg−1)/2 — all (ordered) wedges, integer-exact
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0d))
          .otherwise(round(lit(3.0d) * col("n_triangles") /
            col("n_wedges"), 6)).as("clustering"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank _,
    "q_triangle_count" -> qTriangleCount _,
  )

  val oracleSql: Map[String, String] = Map(
    // the oracle counts triangles by the id-ordered 3-way join
    // (pa < pb < pc): the count is orientation-independent, so it equals
    // the Spark side's degree-ordered enumeration exactly
    "q_triangle_count" ->
      """WITH pp AS (
        |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |dg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT pa AS node FROM pp UNION ALL SELECT pb FROM pp)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM pp e1
        |  JOIN pp e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
        |  JOIN pp e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
        |  FROM dg),
        |ed AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pp)
        |SELECT st.n_nodes, ed.n_edges, st.n_wedges, tri.n_triangles,
        |  CASE WHEN st.n_wedges = 0 THEN 0.0
        |       ELSE round(3.0 * tri.n_triangles / st.n_wedges, 6)
        |  END AS clustering
        |FROM st, ed, tri""".stripMargin,
    "q_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
        |  FROM lineitem),
        |e AS (SELECT src, dst FROM pairs
        |      UNION ALL SELECT dst, src FROM pairs),
        |dg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |       FROM e GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM dg),
        |r0 AS (SELECT node, deg, 1000000000 // nn AS pr FROM dg, nn),
        |i1 AS (SELECT e.dst AS node,
        |         CAST(SUM(r0.pr // r0.deg) AS BIGINT) AS s
        |       FROM e JOIN r0 ON e.src = r0.node GROUP BY 1),
        |r1 AS (SELECT dg.node, dg.deg,
        |         ((15 * (1000000000 // nn)) // 100)
        |           + ((85 * COALESCE(i1.s, 0)) // 100) AS pr
        |       FROM dg LEFT JOIN i1 ON dg.node = i1.node, nn),
        |i2 AS (SELECT e.dst AS node,
        |         CAST(SUM(r1.pr // r1.deg) AS BIGINT) AS s
        |       FROM e JOIN r1 ON e.src = r1.node GROUP BY 1),
        |r2 AS (SELECT dg.node, dg.deg,
        |         ((15 * (1000000000 // nn)) // 100)
        |           + ((85 * COALESCE(i2.s, 0)) // 100) AS pr
        |       FROM dg LEFT JOIN i2 ON dg.node = i2.node, nn),
        |i3 AS (SELECT e.dst AS node,
        |         CAST(SUM(r2.pr // r2.deg) AS BIGINT) AS s
        |       FROM e JOIN r2 ON e.src = r2.node GROUP BY 1),
        |r3 AS (SELECT dg.node, dg.deg,
        |         ((15 * (1000000000 // nn)) // 100)
        |           + ((85 * COALESCE(i3.s, 0)) // 100) AS pr
        |       FROM dg LEFT JOIN i3 ON dg.node = i3.node, nn)
        |SELECT node, CAST(pr AS BIGINT) AS pr FROM r3
        |ORDER BY node""".stripMargin,
  )
}
