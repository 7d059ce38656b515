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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank _,
  )

  val oracleSql: Map[String, String] = Map(
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
