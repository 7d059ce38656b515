package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState — the
  * streaming twin of the batch gap-sessionizer (ops.Advanced.qSessionize):
  * same >30 min gap rule, same output schema, so the two are directly
  * comparable (and the spec asserts they agree on the same data).
  *
  * Scale posture: state per key is ONE open session (start, end, count) —
  * constant memory per user; in production a GroupStateTimeout +
  * watermark evicts idle users. Events inside a micro-batch are sorted
  * per group before folding, which makes replay deterministic.
  */
object StatefulSessions {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      session_start_us: Long, session_end_us: Long)
  case class SessState(sessionId: Long, start: Long, end: Long, n: Long)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  private def fold(userId: Long, events: Iterator[Ev],
      state: GroupState[SessState]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var cur = state.getOption.orNull
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      if (cur == null) {
        cur = SessState(1L, e.ts_us, e.ts_us, 1L)
      } else if (e.ts_us - cur.end > GapUs) {
        out += SessionOut(userId, cur.sessionId, cur.n, cur.start, cur.end)
        cur = SessState(cur.sessionId + 1, e.ts_us, e.ts_us, 1L)
      } else {
        cur = cur.copy(end = e.ts_us, n = cur.n + 1)
      }
    }
    if (cur != null) {
      state.update(cur)
      // emit the still-open session too: over a finite replay this makes
      // the output comparable to the batch operator
      out += SessionOut(userId, cur.sessionId, cur.n, cur.start, cur.end)
    }
    out.result().iterator
  }

  /** Streaming sessionize over an events stream (see EventStream). */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }
}
