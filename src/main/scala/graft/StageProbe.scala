package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev utility: run one key and print per-STAGE wall/CPU/task attribution,
  * so a multi-stage query's cost can be assigned to the operator that
  * spends it (guide §1: decide whether the time goes to shuffle read,
  * compute, or scheduling BEFORE changing anything). Not part of the
  * driver contract.
  *
  *   runMain graft.StageProbe <key> [runs]
  */
object StageProbe {
  final case class StageRow(jobId: Int, stageId: Int, name: String,
      tasks: Int, wallMs: Long, cpuMs: Long, runMs: Long,
      shuffleReadMB: Double, shuffleWriteMB: Double, inputMB: Double)

  /** (jobId, startMs, endMs, gapSincePrevJobEndMs): the GAP column is the
    * driver-only dwell between one job finishing and the next starting —
    * planning, file listing, commit protocol, fs renames. For multi-job
    * lifecycle verbs the r21 probe showed stage walls summing to well
    * under half the key's wall; this column is where the rest lives. */
  final case class JobRow(jobId: Int, startMs: Long, endMs: Long,
      gapMs: Long, site: String)

  final class Listener extends SparkListener {
    val rows = ArrayBuffer.empty[StageRow]
    val jobs = ArrayBuffer.empty[JobRow]
    @volatile var jobOfStage = Map.empty[Int, Int]
    @volatile private var jobStart = Map.empty[Int, Long]
    @volatile private var lastJobEnd = 0L
    def resetClock(): Unit = synchronized { lastJobEnd = 0L }
    @volatile private var jobSite = Map.empty[Int, String]
    override def onJobStart(e: SparkListenerJobStart): Unit =
      synchronized {
        e.stageIds.foreach(sid => jobOfStage += (sid -> e.jobId))
        jobStart += (e.jobId -> e.time)
        jobSite += (e.jobId -> Option(e.properties).map { p =>
          val d = p.getProperty("spark.job.description",
            p.getProperty("callSite.short", ""))
          // fall back to the first stage's name (the action call site)
          if (d.nonEmpty) d.takeWhile(_ != '\n').take(90) else ""
        }.getOrElse(""))
      }
    override def onJobEnd(e: org.apache.spark.scheduler
        .SparkListenerJobEnd): Unit =
      synchronized {
        val st = jobStart.getOrElse(e.jobId, e.time)
        val gap = if (lastJobEnd == 0) 0 else st - lastJobEnd
        jobs += JobRow(e.jobId, st, e.time, gap,
          jobSite.getOrElse(e.jobId, ""))
        lastJobEnd = math.max(lastJobEnd, e.time)
      }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(-1L)
        rows += StageRow(
          jobOfStage.getOrElse(si.stageId, -1), si.stageId,
          si.name.takeWhile(_ != '\n').take(90), si.numTasks, wall,
          m.executorCpuTime / 1000000, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6)
      }
  }

  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lis = new Listener
    spark.sparkContext.addSparkListener(lis)
    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      // warmup run outside the probe window (JIT/codegen, parquet footers)
      BenchProtocol.timeOnce(spark, sfDir, fn)
      var best = Double.MaxValue
      (1 to runs).foreach { _ =>
        lis.synchronized { lis.rows.clear(); lis.jobs.clear() }
        lis.resetClock()
        val t = BenchProtocol.timeOnce(spark, sfDir, fn)
        org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
        if (t >= 0 && t < best) best = t
        println(f"== $key run wall=$t%.3f s ==")
        val rows = lis.synchronized(lis.rows.toVector)
        rows.sortBy(-_.cpuMs).take(12).foreach { r =>
          println(f"  job=${r.jobId}%3d stage=${r.stageId}%4d cpu=${r.cpuMs}%6d ms run=${r.runMs}%6d ms wall=${r.wallMs}%6d ms tasks=${r.tasks}%4d sr=${r.shuffleReadMB}%8.1f MB sw=${r.shuffleWriteMB}%8.1f MB in=${r.inputMB}%8.1f MB  ${r.name}")
        }
        println(f"  TOTAL cpu=${rows.map(_.cpuMs).sum}%6d ms over ${rows.size} stages, ${rows.map(_.tasks).sum} tasks")
        val jobs = lis.synchronized(lis.jobs.toVector).sortBy(_.startMs)
        val jobWall = jobs.map(j => j.endMs - j.startMs).sum
        val gapSum = jobs.map(_.gapMs).sum
        println(f"  JOBS n=${jobs.size} jobWall=$jobWall%5d ms interJobGap=$gapSum%5d ms (driver dwell between jobs)")
        jobs.foreach { j =>
          val site = if (j.site.nonEmpty) j.site
            else rows.find(_.jobId == j.jobId).map(_.name).getOrElse("")
          println(f"    gap=${j.gapMs}%5d ms before job=${j.jobId}%3d (ran ${j.endMs - j.startMs}%4d ms)  $site")
        }
      }
      println(f"BEST $key wall=$best%.3f")
    }
    spark.stop()
  }
}
