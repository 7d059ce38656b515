package graft

import org.apache.spark.sql.SparkSession

/** Dev CLI: print the formatted physical plan of one or all queries —
  * the feedback loop for the scale checklist (PushedFilters reaching the
  * scan, dims broadcast, WholeStageCodegen spans, shuffle count).
  *
  * Usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[4]", Some(4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets = name match {
      case Some(n) => Seq(n -> SparkEntry.queries(n))
      case None    => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    targets.foreach { case (n, fn) =>
      println(s"\n========== $n ==========")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
