package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the `events` table.
  *
  * The driver-generated `events.parquet` stores `ts` as parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces `ts` as a
  * LongType of epoch-nanoseconds, and derive:
  *
  *   - `ts`    — raw epoch-nanos (exact; used for as-of comparisons so no
  *               precision is lost against the DuckDB oracle's TIMESTAMP_NS)
  *   - `ts_t`  — TimestampType truncated to microseconds (for window ops)
  */
object Events {
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.eventsRaw(spark, dir)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
  }
}
