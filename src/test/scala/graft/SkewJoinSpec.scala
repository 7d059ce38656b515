package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join machinery proof: a hot key that dwarfs the median
  * shuffle partition must be split by OptimizeSkewedJoin (the
  * `skew=true` marker on the sort-merge join) WITHOUT changing the join
  * result. This is the runtime half of the skew story — the static half
  * (explicit salting) is q_salted_join, proven result-identical to the
  * plain join by its oracle. */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "262144")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "262144")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
  }

  test("hot key is split with skew=true and the result is unchanged") {
    import spark.implicits._
    val pad = "x" * 64
    // 150k rows on key 0, 100 rows each on keys 1..99
    val left = spark.range(150000).select(lit(0L).as("k"),
        concat(col("id").cast("string"), lit(pad)).as("lv"))
      .union(spark.range(9900).select((col("id") % 99 + 1).as("k"),
        concat(col("id").cast("string"), lit(pad)).as("lv")))
    val right = spark.range(100).select(col("id").as("k"),
      concat(lit("r"), col("id").cast("string")).as("rv"))
    // the bare join: no downstream operator may claim the join's hash
    // partitioning, or OptimizeSkewedJoin backs off (splitting a skewed
    // partition breaks the output partitioning contract)
    val joined = left.join(right, "k")
    // execute THIS dataset's own AdaptiveSparkPlanExec (count()/write()/
    // foreach build separate QueryExecutions and would leave this plan
    // unfinalized)
    joined.queryExecution.toRdd.foreach(_ => ())
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(300))
    assert(finalPlan.contains("skew=true"),
      "AQE did not mark the join skewed:\n" + finalPlan.take(1500))
    // correctness of the same join, aggregated (its own plan/run)
    val rows = left.join(right, "k").groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) == 150000L)
    assert((1L to 99L).forall(k => rows(k) == 100L))
  }
}
