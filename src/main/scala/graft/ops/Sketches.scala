package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sketch-based near-duplicate detection (SURVEY.md §2.4 X2) — the 100 TB
  * scale paths that avoid the exact all-pairs shingle join of
  * [[Text.qDedupNear]].
  *
  * Both sketches are fully deterministic (xxhash64 with fixed literal
  * seeds), so results are reproducible run-to-run and cluster-to-cluster —
  * but they are NOT SQL-expressible in DuckDB (different hash function), so
  * these keys carry no oracleSql and get the driver's rows-only check.
  * Their correctness is covered by ScalaTest asserting LSH output ==
  * exact-Jaccard output on the testdata corpus (the corpus's dup pairs sit
  * at J ≥ 0.9 where 8×4 banding has ~99.98% recall).
  *
  * Scale posture:
  *   - MinHash: per-doc sketch is a single groupBy over exploded shingles
  *     (32 mins computed map-side); banding shuffles only (band, bucket,
  *     id) triples; candidate pairs are bounded per bucket instead of per
  *     shingle. Exact Jaccard verification runs only on candidates.
  *   - SimHash: 64-bit signature via bit-vote aggregation; candidate pairs
  *     via 4×16-bit chunk banding (any pair within Hamming ≤ 3 must share
  *     a chunk — pigeonhole); Hamming verified with bit_count(xor).
  */
object Sketches {

  private val NumHashes = 32
  private val NumBands  = 8 // × 4 rows per band

  /** X2 scale path: MinHash-LSH candidate generation + exact-Jaccard
    * verification. Output shape matches q_dedup_near (da, db, jaccard). */
  def qMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val sh = documents(s, d)
      .select(col("doc_id"),
        explode(Text.bigrams(Text.toks(col("text")))).as("s"))

    // 32 independent min-hashes, computed in ONE map-side-combined groupBy
    val minhashes = sh.groupBy("doc_id").agg(
      min(xxhash64(lit(0), col("s"))).as("h0"),
      (1 until NumHashes).map(i =>
        min(xxhash64(lit(i), col("s"))).as(s"h$i")): _*)

    // 8 band keys, each hashing 4 consecutive minhash rows
    val bandStructs = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((4 * b until 4 * b + 4).map(i => col(s"h$i")): _*)
          .as("bkey"))
    }
    val banded = minhashes
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"))

    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()

    // exact verification restricted to candidates
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.as("sa"), col("da") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("db") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy("da", "db").agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("za"), col("da") === col("za.doc_id"))
      .join(sizes.as("zb"), col("db") === col("zb.doc_id"))
      .select(col("da"), col("db"),
        round(col("c").cast("double") /
          (col("za.n") + col("zb.n") - col("c")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.6)
      .orderBy("da", "db")
  }

  /** X2 alternative sketch: 64-bit SimHash signatures + Hamming-banded
    * near-dup pairs (Hamming ≤ 3 over distinct-token signatures). */
  def qSimhash(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(Text.toks(col("text")))).as("t"))
      .withColumn("h", xxhash64(col("t")))

    // bit-vote: +1/-1 per token per bit position, sign → signature bit
    val votes = tok.groupBy("doc_id").agg(
      sum(shiftright(col("h"), 0).bitwiseAND(1) * 2 - 1).as("b0"),
      (1 until 64).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"b$j")): _*)
    val sig = votes.select(col("doc_id"),
      (0 until 64).map(j =>
        when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("simhash"))

    // banding: Hamming ≤ 3 ⇒ at least one of 4 16-bit chunks identical
    val chunks = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"),
          shiftright(col("simhash"), 16 * k).bitwiseAND(0xFFFFL)
            .as("chunk"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.k").as("k"),
        col("ck.chunk").as("chunk"))

    chunks.as("x").join(chunks.as("y"),
        col("x.k") === col("y.k") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy("da", "db")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_minhash_lsh" -> qMinhashLsh _,
    "q_simhash"     -> qSimhash _,
  )

  /** Deliberately empty: xxhash64 seeds/algorithm aren't reproducible in
    * DuckDB SQL; correctness is asserted in ScalaTest against the exact
    * operators instead. */
  val oracleSql: Map[String, String] = Map.empty
}
