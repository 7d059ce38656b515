package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming ordered-funnel via flatMapGroupsWithState — the
  * streaming twin of the batch iterated-min funnel
  * (ops.Behavior.qFunnel): view → click-after → purchase-after, same
  * flag semantics, so the two are directly comparable and the spec
  * asserts they agree on the same finite event set.
  *
  * Scale posture: state per user is THREE timestamps (first view, first
  * click-after-view, first purchase-after-click) — constant memory, no
  * event buffering. Events inside a micro-batch are sorted per group
  * before folding so replay is deterministic; a production deployment
  * adds a watermark + timeout to bound out-of-order arrival the same way
  * [[StatefulSessions]] does. Processing in ascending event time makes
  * the sequential fold equal the batch min-after-t semantics: the first
  * qualifying event seen IS the minimum qualifying timestamp.
  */
object StatefulFunnel {

  case class FEv(user_id: Long, event_type: String, ts: Long)
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class FunnelOut(user_id: Long, did_view: Long, did_click: Long,
      did_purchase: Long)

  private val Unset = Long.MaxValue

  private def step(userId: Long, events: Iterator[FEv],
      state: GroupState[FunnelState]): Iterator[FunnelOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts, e.event_type))
    var st = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
    sorted.foreach { e =>
      e.event_type match {
        case "view" if st.t1 == Unset =>
          st = st.copy(t1 = e.ts)
        case "click" if st.t1 != Unset && st.t2 == Unset && e.ts > st.t1 =>
          st = st.copy(t2 = e.ts)
        case "purchase" if st.t2 != Unset && st.t3 == Unset && e.ts > st.t2 =>
          st = st.copy(t3 = e.ts)
        case _ => ()
      }
    }
    state.update(st)
    // one row per user per replay — comparable to the batch operator
    Iterator.single(FunnelOut(userId,
      if (st.t1 != Unset) 1L else 0L,
      if (st.t2 != Unset) 1L else 0L,
      if (st.t3 != Unset) 1L else 0L))
  }

  /** Streaming funnel over an events stream (see EventStream). */
  def funnel(spark: SparkSession, events: DataFrame): Dataset[FunnelOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }
}
