package graft

/** Dev utility: A/B-time a handful of keys under a session conf toggle.
  *
  *   runMain graft.AbBench <key,key,...> [conf=v1|v2[;conf2=...]]
  *
  * Runs each key N times per side (min reported; SPARK_GRAFT_AB_RUNS,
  * default 2) with the toggles applied to the LIVE session between
  * sides — for isolating whether a bench regression is a plan change
  * (flips with the conf) or machine noise (doesn't). Each run also
  * reports executor CPU-ns via [[BenchProtocol.CpuListener]] — the
  * repo's regression protocol diffs CPU, not wall, so the dev tool
  * must surface the same signal the round artifact does. Not part of
  * the driver contract.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val toggles: Seq[(String, String, String)] = args.lift(1).toSeq
      .flatMap(_.split(";")).map { t =>
        val Array(k, vs) = t.split("=", 2)
        val Array(a, b) = vs.split("\\|", 2)
        (k, a, b)
      }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_AB_RUNS", "2").toInt
    val spark = GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new BenchProtocol.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    def timeOnce(key: String): (Double, Double) = {
      val c0 = cpu.snapshot(spark)
      // dev tool: surface the exception before folding to the sentinel
      val t = BenchProtocol.timeOnce(spark, sfDir, (s, d) =>
        SparkEntry.queries(key)(s, d))
      if (t < 0) println(s"ERR $key (run the key via Verify for the stack)")
      (t, (cpu.snapshot(spark) - c0) / 1e9)
    }
    val sides = if (toggles.isEmpty) Seq(0) else Seq(0, 1)
    // INTERLEAVE sides per run (A,B,A,B,... per key) rather than running
    // all of side 0 then all of side 1: a transient contention window on
    // this box (CPU steal comes and goes in multi-minute bursts) would
    // otherwise poison exactly one side and masquerade as a toggle
    // effect — the r21 committer A/B read +60% on side 1 from
    // contention alone until interleaving flattened it.
    keys.foreach { k =>
      val samples: Map[Int, Seq[(Double, Double)]] =
        (1 to runs).flatMap { _ =>
          sides.map { side =>
            toggles.foreach { case (c, a, b) =>
              spark.conf.set(c, if (side == 0) a else b)
            }
            side -> timeOnce(k)
          }
        }.groupBy(_._1).map { case (s, v) => s -> v.map(_._2) }
      sides.foreach { side =>
        val label = if (toggles.isEmpty) "RUN" else s"SIDE$side"
        // min over the SUCCESSFUL runs: -1 is the error sentinel, and
        // math.min would let one transient failure discard a valid sample
        val ok = samples(side).filter(_._1 >= 0)
        val (t, c) =
          if (ok.isEmpty) (-1.0, -1.0)
          else (ok.map(_._1).min, ok.map(_._2).min)
        println(f"ABBENCH $label $k wall=$t%.3f cpu=$c%.3f " +
          s"runs=${ok.size} " +
          s"lp_rounds=${ops.Sketches.lastLabelPropIterations}")
      }
    }
    spark.stop()
  }
}
