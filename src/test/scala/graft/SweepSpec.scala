package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for the round-7 behavioral operators beyond the driver
  * oracle: q_max_concurrency's two-level distributed prefix sum must be
  * VALUE-identical to the textbook single-window sweep it replaces (the
  * whole point of the decomposition), and q_scd2's version table must
  * reconstruct exactly from a naive per-user replay. */
class SweepSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession
    .builder("local[4]", Some(4)).getOrCreate()

  test("two-level max-concurrency equals the single-window sweep") {
    import org.apache.spark.sql.expressions.Window
    val len = 1800000000L // micros, matching the operator
    val e = Events.events(spark, sf)
      .select(col("event_type"), expr("ts div 1000").as("ts"))
    val deltas = e.select(col("event_type"), col("ts").as("t"),
        lit(1L).as("delta"))
      .unionAll(e.select(col("event_type"), (col("ts") + len).as("t"),
        lit(-1L).as("delta")))
    // the textbook form this operator exists to avoid: one running sum
    // ordered by time per event_type (funnels through #types reducers)
    val naive = deltas
      .withColumn("run", sum(col("delta")).over(
        Window.partitionBy("event_type").orderBy("t", "delta")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("event_type").agg(max(col("run")).as("max_concurrent"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val twoLevel = ops.Behavior.qMaxConcurrency(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(twoLevel == naive)
    assert(twoLevel.nonEmpty && twoLevel.forall(_._2 >= 1L))
  }

  test("scd2 versions replay exactly from each user's ordered history") {
    val events = Events.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // naive replay: per user, sort by (ts, event_id), collapse runs
    val expected = events.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      val versions = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, String, Long)] // (uid, version, state, from)
      var prev: String = null
      var v = 0L
      ordered.foreach { case (_, _, t, st) =>
        if (st != prev) { v += 1; versions += ((uid, v, st, t)) }
        prev = st
      }
      versions.zipWithIndex.map { case ((u, ver, st, from), i) =>
        val to: Any =
          if (i + 1 < versions.size) versions(i + 1)._4 else null
        (u, ver, st, from, to)
      }
    }.sortBy(r => (r._1, r._2))
    val got = ops.Behavior.qScd2(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4): Any))
      .toSeq
    assert(got == expected)
    // consecutive versions never share a state (the SCD2 contract)
    got.groupBy(_._1).foreach { case (_, vs) =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._3 != b._3)
        case _ =>
      }
    }
  }

  test("incremental SCD2 merge is byte-identical to the full recompute") {
    val full = ops.Behavior.qScd2(spark, sf).collect().map(_.toSeq).toSeq
    val merged = ops.Behavior.qScd2Merge(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(merged == full)
  }

  test("attribution equals a naive per-user replay; credit is conserved") {
    val e = Events.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("t"), col("event_type"),
        (Tables.dec2(col("value")) * 100).cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val clicks = e.filter(_._4 == "click")
    val purchases = e.filter(_._4 == "purchase")
    val b = 3600000000L
    // naive O(clicks × purchases) pairing within each user
    val pairs = for {
      (pu, pid, pt, _, v) <- purchases
      (cu, cid, ct, _, _) <- clicks
      if cu == pu && ct >= pt - b && ct < pt
    } yield (pu, pid, v, cid)
    val perPurchase = pairs.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = pairs
      .map { case (u, pid, v, cid) => ((u, cid), v / perPurchase(pid)) }
      .groupBy(_._1).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._2).sum)).toMap
    val got = ops.Behavior.qAttribution(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // floor splits only lose: credited total ≤ attributed purchase value
    val attributedValue = perPurchase.keys
      .map(pid => purchases.find(_._2 == pid).get._5).sum
    val credited = got.values.map(_._2).sum
    assert(credited <= attributedValue)
    assert(credited >= attributedValue - perPurchase.values.map(_.toLong).sum)
  }

  test("bigram LM rows are well-formed (≤3 per context, P ≤ 1)") {
    val rows = ops.Ranking.qBigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getDouble(4)
      assert(p > 0.0 && p <= 1.0)
      assert(r.getLong(2) <= r.getLong(3)) // c12 ≤ c1
    }
    rows.groupBy(_.getString(0)).foreach { case (w1, g) =>
      assert(g.length <= 3, s"context $w1 has ${g.length} rows")
    }
  }
}
