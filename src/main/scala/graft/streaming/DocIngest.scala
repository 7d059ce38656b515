package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming dedup-on-ingest for a document corpus — the streaming twin
  * of the batch MERGE [[graft.ops.Text.qIncrementalDedup]]. The batch
  * operator folds a new batch into an existing fingerprint set with a
  * groupBy + anti join; at a live ingest edge the same contract is "emit
  * each content fingerprint's first arrival, suppress the rest", which is
  * exactly Structured Streaming's watermarked dedup.
  *
  * State posture at corpus scale: `dropDuplicatesWithinWatermark` keys
  * state by the 128-bit fingerprint only (never the body) and EVICTS each
  * key once the watermark passes its arrival horizon, so state is
  * bounded by the ingest rate × horizon, not by corpus history. The
  * tradeoff is explicit: a duplicate arriving beyond the horizon
  * re-emits (DocIngestDedupSpec pins both the batch equivalence inside
  * the horizon and the eviction behavior beyond it). The unbounded exact
  * form stays batch-side — periodic MERGE against the warehouse
  * fingerprint table (q_incremental_dedup) — which is the standard
  * two-tier production layout: streaming horizon dedup at the edge,
  * exact historical dedup in the warehouse.
  */
object DocIngest {

  /** Watermarked first-arrival dedup over a streaming document source.
    * Input must carry `text` and an event-time column `ingest_t`;
    * output keeps the first-arriving row per content fingerprint within
    * the 1-hour state horizon, with the fingerprint attached as `fp`.
    *
    * Throughput note (the round-8 finding, root-caused by probe): every
    * micro-batch commits EVERY state partition — a delta file write plus
    * maintenance per partition per batch — so per-batch fixed cost is
    * linear in `spark.sql.shuffle.partitions`, which the state layout
    * inherits at the query's FIRST run and keeps for the checkpoint's
    * lifetime. Inheriting a batch-tuned default (32 here) oversharded
    * 5k-row micro-batches 32 ways: measured 2.4k rows/s at 32 state
    * partitions vs 12-15k at 4-8, identical query. Size state
    * partitions to the ingest rate with [[statePartitionsFor]] BEFORE
    * the first start; growing the edge later means a new checkpoint (or
    * offline state repartition), which is standard Structured Streaming
    * operations. Larger micro-batches amortize the same fixed cost
    * (4-file batches measured ~40k rows/s) — trigger sizing is the
    * second lever, orthogonal to this one. */
  def dedupOnIngest(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", graft.ops.Text.fingerprint(col("text")))
      .withWatermark("ingest_t", "1 hour")
      .dropDuplicatesWithinWatermark("fp")

  /** State-partition count for an ingest edge: ~[[TargetRowsPerStatePartition]]
    * rows per partition per micro-batch (below that, per-partition commit
    * overhead dominates the row work), capped by `maxPartitions` (the
    * cluster's parallelism ceiling — state partitions beyond cores buy
    * nothing within one batch). */
  def statePartitionsFor(rowsPerBatch: Long, maxPartitions: Int): Int =
    math.max(1, math.min(maxPartitions.toLong,
      rowsPerBatch / TargetRowsPerStatePartition)).toInt

  /** Below ~1k rows per state partition per batch, the commit (delta
    * file + maintenance) costs more than the rows: measured on the
    * replayed-ingest probe, 5k-row batches ran 2,420 rows/s sharded 32
    * ways (156 rows/partition) vs 12,099 sharded 8 ways and 14,852
    * sharded 4 ways. */
  val TargetRowsPerStatePartition = 1000L
}
