package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operator surface (SURVEY.md §2.2, R1–R10) re-expressed over the
  * driver's TPC-H-ish testdata.
  *
  * The reference's flagship `QUERY_FINAL`
  * (ETLCNPJFinalEmpresaEstabelecimentos.py:191-234) is a 5-table star:
  * fact ⋈ fact-header ⋈ 3 dims, a conjunction of three IN-list filters
  * (:224-233, one with duplicate literals), and a 20-column projection
  * (:192-212). [[qStarJoin]] reproduces exactly that shape on
  * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
  *
  * Scale posture (100 TB): the fact⋈fact join (lineitem⋈orders) shuffles on
  * the join key and is handled by sort-merge join + AQE (skew-split, runtime
  * broadcast demotion). The dim joins (nation 25·sf rows, region 5) are
  * explicitly `broadcast()` — no shuffle. IN-list filters and the projection
  * are pushed into the parquet scan by Catalyst (`PushedFilters`/`ReadSchema`),
  * so at scale we only read the matching row groups and needed columns.
  * `orderBy` on the final result is a range-partitioned total sort — required
  * here for the oracle hash-compare; a production caller would drop it.
  */
object Relational {

  /** 53 literals, 50 distinct — mirrors the reference's CNAE IN list
    * (ETLCNPJFinalEmpresaEstabelecimentos.py:226-233) where 3 values repeat.
    * Catalyst's OptimizeIn dedupes and converts to an InSet hash lookup. */
  val partKeyInList: Seq[Int] = Seq(
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
    71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149,
    151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 4, 8, 16, 32,
    2, 3, 5) // duplicates, set semantics

  private val partKeySql = partKeyInList.mkString("(", ", ", ")")

  /** R2: fixed-order multi-column projection. */
  def qProjection(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag",
        "l_linestatus", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag",
        "l_linestatus", "l_quantity")

  /** R6/R7: small IN-list membership filters (conjunction). */
  def qFilterInSmall(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_linenumber").isin(1, 3, 5) &&
        col("l_returnflag").isin("A", "R"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag")

  /** R8: large IN list (53 literals, 50 distinct) → InSet. */
  def qFilterInLarge(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_partkey").isin(partKeyInList: _*))
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")

  /** R3: fact ⋈ dim (N:1) — dim side broadcast, no shuffle. */
  def qJoinDim(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val p  = part(s, d)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .select(li("l_orderkey"), li("l_linenumber"), li("l_partkey"),
        p("p_name"), p("p_brand"), li("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "p_name",
        "p_brand", "l_quantity")
  }

  /** R4: fact ⋈ fact-header (N:1), both sides large → shuffled sort-merge
    * join; AQE may demote to broadcast at small SF. */
  def qJoinFact(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o  = orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .select(li("l_orderkey"), li("l_linenumber"), o("o_custkey"),
        o("o_orderstatus"), o("o_totalprice"), li("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus",
        "o_totalprice", "l_extendedprice")
  }

  /** R1–R10 composed: the flagship star join, 20-col projection, 3 IN
    * filters. Same shape as the reference's QUERY_FINAL
    * (ETLCNPJFinalEmpresaEstabelecimentos.py:191-234). */
  def qStarJoin(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o  = orders(s, d)
    val c  = customer(s, d)
    val n  = nation(s, d)
    val r  = region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .join(c, o("o_custkey") === c("c_custkey"), "inner")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "inner")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
      .where(o("o_orderstatus").isin("O", "F") &&
        n("n_name").isin("NATION_1", "NATION_3", "NATION_5") &&
        li("l_partkey").isin(partKeyInList: _*))
      .select(
        li("l_orderkey"), li("l_linenumber"), li("l_partkey"),
        li("l_suppkey"), li("l_quantity"), li("l_extendedprice"),
        li("l_discount"), li("l_returnflag"), li("l_linestatus"),
        date_format(li("l_shipdate"), "yyyy-MM-dd").as("l_shipdate"),
        o("o_custkey"), o("o_orderstatus"), o("o_totalprice"),
        o("o_orderpriority"),
        date_format(o("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        c("c_name"), c("c_acctbal"), c("c_mktsegment"),
        n("n_name"), r("r_name"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_returnflag",
        "l_linestatus", "l_shipdate", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority", "o_orderdate", "c_name",
        "c_acctbal", "c_mktsegment", "n_name", "r_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_projection"      -> qProjection _,
    "q_filter_in_small" -> qFilterInSmall _,
    "q_filter_in_large" -> qFilterInLarge _,
    "q_join_dim"        -> qJoinDim _,
    "q_join_fact"       -> qJoinFact _,
    "q_star_join"       -> qStarJoin _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_projection" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag,
        |       l_linestatus, l_quantity
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_returnflag,
        |         l_linestatus, l_quantity""".stripMargin,
    "q_filter_in_small" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag
        |FROM lineitem
        |WHERE l_linenumber IN (1, 3, 5) AND l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_returnflag""".stripMargin,
    "q_filter_in_large" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey
         |FROM lineitem WHERE l_partkey IN $partKeySql
         |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,
    "q_join_dim" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_name,
        |       p.p_brand, l.l_quantity
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_name,
        |         p.p_brand, l.l_quantity""".stripMargin,
    "q_join_fact" ->
      """SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
        |       o.o_totalprice, l.l_extendedprice
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |ORDER BY l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
        |         o.o_totalprice, l.l_extendedprice""".stripMargin,
    "q_star_join" ->
      s"""SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
         |       l.l_quantity, l.l_extendedprice, l.l_discount,
         |       l.l_returnflag, l.l_linestatus,
         |       strftime(l.l_shipdate, '%Y-%m-%d') AS l_shipdate,
         |       o.o_custkey, o.o_orderstatus, o.o_totalprice,
         |       o.o_orderpriority,
         |       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |       c.c_name, c.c_acctbal, c.c_mktsegment, n.n_name, r.r_name
         |FROM lineitem l
         |JOIN orders o   ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n   ON c.c_nationkey = n.n_nationkey
         |JOIN region r   ON n.n_regionkey = r.r_regionkey
         |WHERE o.o_orderstatus IN ('O', 'F')
         |  AND n.n_name IN ('NATION_1', 'NATION_3', 'NATION_5')
         |  AND l.l_partkey IN $partKeySql
         |ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
         |         l.l_quantity, l.l_extendedprice, l.l_discount,
         |         l.l_returnflag, l.l_linestatus, l_shipdate, o.o_custkey,
         |         o.o_orderstatus, o.o_totalprice, o.o_orderpriority,
         |         o_orderdate, c.c_name, c.c_acctbal, c.c_mktsegment,
         |         n.n_name, r.r_name""".stripMargin,
  )
}
