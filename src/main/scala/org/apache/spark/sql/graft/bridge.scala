package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions —
  * Spark 4 backs `Column` by ColumnNode, so extension libraries need this
  * one-hop package to lift a custom Catalyst `Expression` into a `Column`
  * (the conventional pattern for Spark-native extension libs). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a (possibly custom) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a Dataset. */
  def logicalPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Parquet-semantics schema merge (`StructType.merge`, `private[sql]`):
    * existing fields keep their position and type, new fields append;
    * incompatible type changes throw — exactly the add-column-only
    * evolution contract the manifest table's schema tracking enforces. */
  def mergeSchemas(base: org.apache.spark.sql.types.StructType,
      other: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    base.merge(other)

  /** `StructType.asNullable` (`private[spark]`): a recorded table schema
    * must be all-nullable so pre-evolution files can null-fill columns
    * added after them. */
  def nullableSchema(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    s.asNullable

  /** A BATCH BaseRelation over concrete data files — what a v1
    * RelationProvider returns so `spark.read.format(...)` gets the full
    * file-source machinery (filter pushdown, column pruning, vectorized
    * parquet) over an explicit file list instead of a directory. */
  def fileRelation(spark: SparkSession, format: String,
      paths: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType])
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.execution.datasources.DataSource
    val cs = spark.asInstanceOf[classic.SparkSession]
    DataSource(cs, className = format, paths = paths,
      userSpecifiedSchema = schema)
      .resolveRelation(checkFilesExist = false)
  }

  /** A DataFrame over concrete data files whose plan carries
    * `isStreaming = true` — the FileStreamSource recipe, exposed so a
    * graft v1 streaming `Source.getBatch` can hand micro-batch deltas to
    * MicroBatchExecution (which rejects non-streaming plans). The files
    * are read with the full file-source machinery: the schema is pinned
    * (no per-batch inference), and downstream filters/projections still
    * push into the scan of each micro-batch. */
  def streamingFileRelation(spark: SparkSession, format: String,
      paths: Seq[String],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
    val cs = spark.asInstanceOf[classic.SparkSession]
    val ds = DataSource(cs, className = format, paths = paths,
      userSpecifiedSchema = Some(schema))
    classic.Dataset.ofRows(cs, LogicalRelation(
      ds.resolveRelation(checkFilesExist = false), isStreaming = true))
  }

  /** Re-wrap a v1 `Sink.addBatch` DataFrame (backed by the micro-batch's
    * IncrementalExecution) as a plain batch DataFrame WITHOUT a
    * row-level decode/encode round trip: execute the incremental plan to
    * InternalRows and wrap them directly. No per-row copy — safe for
    * consumers that stream rows straight into a writer (a parquet stage
    * write never buffers row references), which is FileStreamSink's own
    * pattern; a consumer that COLLECTS rows must copy them itself. */
  def rewrapBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    val qe = df.asInstanceOf[classic.Dataset[_]].queryExecution
    cs.internalCreateDataFrame(qe.toRdd, df.schema)
  }

  /** Zero-row streaming DataFrame with a pinned schema — the shape a
    * streaming source must return for an empty delta (a plain empty
    * DataFrame would fail MicroBatchExecution's isStreaming check). */
  def emptyStreamingDF(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }

  /** DSv2 ScanBuilder over an EXPLICIT snapshot file list — what the
    * graft-manifest TableCatalog's table hands Spark so `SELECT`s over
    * a registered table get the native parquet machinery (filter
    * pushdown, column pruning, aggregate pushdown, vectorized read)
    * without any directory listing: the manifest decided which files
    * exist, the FileIndex here only stats them. */
  def parquetScanBuilder(spark: SparkSession, files: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      options: java.util.Map[String, String])
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
    import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import scala.jdk.CollectionConverters._
    val cs = spark.asInstanceOf[classic.SparkSession]
    val index = new InMemoryFileIndex(cs,
      files.map(new org.apache.hadoop.fs.Path(_)),
      options.asScala.toMap, Some(schema),
      FileStatusCache.getOrCreate(cs), None, None)
    ParquetScanBuilder(cs, index, schema, schema,
      new CaseInsensitiveStringMap(options))
  }

  /** Drain the async listener bus (`private[spark]` API): the bench's
    * per-key executor-CPU attribution reads an accumulating
    * SparkListener, and without a drain between keys the task-end
    * events of key N's last stage can post after key N+1's snapshot —
    * CPU bleeding across keys. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
