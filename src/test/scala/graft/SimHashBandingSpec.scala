package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchKernels.simHash64
import graft.ops.Sketches

/** Pins the multi-table SimHash banding (6 blocks, C(6,3)=20 band
  * tables) that replaced the 4×16-bit chunk scheme:
  *   1. structural recall guarantee — for EVERY possible ≤3-bit flip
  *      pattern over 64 bits, at least one block triple is untouched
  *      (exhaustive, driver-side, no Spark);
  *   2. measured recall/precision — the banded pair set EQUALS the
  *      brute-force all-pairs Hamming ≤ 3 set on the testdata corpus.
  */
class SimHashBandingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("blocks partition the 64 signature bits exactly") {
    val covered = Sketches.SimHashBlocks.flatMap { case (off, w) =>
      off until (off + w)
    }
    assert(covered.sorted == (0 until 64).toList)
  }

  test("every <=3-bit flip pattern leaves some 3-block combo untouched") {
    // block index for each bit position
    val blockOf = Array.tabulate(64) { bit =>
      Sketches.SimHashBlocks.indexWhere { case (off, w) =>
        bit >= off && bit < off + w
      }
    }
    // exhaustive over all C(64,3) + C(64,2) + C(64,1) flip sets
    val bits = 0 until 64
    def untouchedComboExists(flipped: Seq[Int]): Boolean = {
      val hit = flipped.map(blockOf).toSet
      Sketches.SimHashCombos.exists(c => c.forall(b => !hit.contains(b)))
    }
    for (a <- bits) assert(untouchedComboExists(Seq(a)))
    for (a <- bits; b <- bits if b > a)
      assert(untouchedComboExists(Seq(a, b)))
    for (a <- bits; b <- bits if b > a; c <- bits if c > b)
      assert(untouchedComboExists(Seq(a, b, c)), s"flips $a,$b,$c")
  }

  test("banded pair set == brute-force Hamming<=3 pair set on testdata") {
    val sig = Tables.documents(spark, sf)
      .select(col("doc_id"), simHash64(col("text")).as("simhash"))
      .cache()
    val brute = sig.as("x").join(sig.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      .where(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Sketches.qSimhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    sig.unpersist()
    assert(brute.nonEmpty, "fixture should contain near-dup signatures")
    assert(banded == brute,
      s"missed=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)}")
  }
}
