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
      // Cost-based optimization stays OPT-IN (Spark's default), not a
      // session default: measured on this engine's deep stat-less text
      // plans, cbo.enabled=true costs real planner time for zero
      // information — q_substring_dedup 2.4× slower (5.7 s vs 2.4 s),
      // q_dup_ngrams/q_corpus_clean/q_cooccurrence ~1.2× — because the
      // row-count estimator walks every operator of every re-planned
      // iteration while no table carries catalog statistics. Sessions
      // that query ANALYZE'd tables (Warehouse.analyzeTable) should set
      // spark.sql.cbo.enabled=true themselves; CboStatsSpec pins the
      // stats-driven broadcast flip that buys.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // column-mapped (renameable) tables carry parquet field ids in
      // their recorded schemas; matching by id is what lets pre-rename
      // files keep reading. No-op for schemas without ids, and every
      // graft read path also sets it lazily (Layout.ensureFieldIdRead)
      // for sessions not built here.
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      // storage-partitioned joins (r18): lets a scan's reported
      // KeyGroupedPartitioning reach the planner, so two graft tables
      // PARTITIONED BY the same columns join WITHOUT a shuffle on
      // either side; pushPartValues pads partition values present on
      // only one side with empty partitions instead of re-shuffling.
      // Inert for every non-keyed scan (only the graft catalog's
      // eligible partitioned snapshots report a partitioning).
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
  }

  def getOrCreate(): SparkSession = builder().getOrCreate()
}
