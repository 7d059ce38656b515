package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver's testdata layout (TESTDATA.md): one parquet
  * file per table under a scale-factor directory.
  *
  * Scale posture: these are plain parquet scans — column pruning and predicate
  * pushdown reach the scan via Catalyst, so callers should express filters on
  * the returned DataFrame (never pre-collect). At 100 TB each "file" becomes a
  * directory of row-grouped parquet; the same `spark.read.parquet(path)` call
  * handles both.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")

  /** `events.parquet` carries TIMESTAMP(NANOS) which vanilla Spark rejects;
    * see [[Events.events]] for the normalizing loader. */
  def eventsRaw(s: SparkSession, d: String): DataFrame = table(s, d, "events")

  /** Exact money arithmetic: cast a double column to DECIMAL(18,2) so sums
    * and running totals are associative (bit-identical regardless of
    * partitioning / aggregation order — required both for the DuckDB oracle
    * hash-compare and for run-to-run determinism on a real cluster). Final
    * outputs go back to double AFTER the exact aggregation. */
  def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,2)")
}
