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
    * the 1-hour state horizon, with the fingerprint attached as `fp`. */
  def dedupOnIngest(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", graft.ops.Text.fingerprint(col("text")))
      .withWatermark("ingest_t", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
}
