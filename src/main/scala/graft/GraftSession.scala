package graft

import org.apache.spark.sql.SparkSession

/** The engine's front door: a SparkSession configured the way every graft
  * operator expects — AQE on (runtime broadcast demotion, skew splits,
  * partition coalescing), shuffle parallelism sized to the machine rather
  * than Spark's default 200, UTC session time, nanos-tolerant parquet
  * reads, and the graft extensions (custom strategy + SQL functions)
  * installed. */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores = Runtime.getRuntime.availableProcessors()
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // cost-based optimization: inert until a table carries ANALYZE'd
      // catalog statistics (Warehouse.analyzeTable) — path-based reads
      // keep their size-only estimates — but with stats present the
      // planner gets filter selectivity (broadcast decisions on FILTERED
      // dims) and cost-based join reordering. CboStatsSpec pins the
      // stats-driven plan flip this enables.
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
  }

  def getOrCreate(): SparkSession = builder().getOrCreate()
}
