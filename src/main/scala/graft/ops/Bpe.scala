package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Byte-pair-encoding merge learning over the corpus — the tokenizer-
  * training step of an LLM data pipeline (the reference has no tokenizer;
  * this is part of the mandated training-data extension surface).
  *
  * Classic BPE (Sennrich et al. 2016, public algorithm): start from the
  * word-frequency table with each word split into characters; repeatedly
  * (1) count adjacent symbol pairs weighted by word frequency, (2) merge
  * the most frequent pair everywhere, left-to-right non-overlapping.
  * Output: the first [[Merges]] learned merge rules in order.
  *
  * Scale posture: BPE learning never touches the corpus after the first
  * scan — it runs on the DISTINCT-WORD frequency table (the standard
  * practice; vocabulary is sublinear in corpus size, and the pair-count
  * aggregation each round is a partial+final hash agg over it). The
  * driver-side loop reads exactly ONE aggregated row per round (the
  * argmax pair — the control decision, same posture as the label-
  * propagation convergence count); the merge substitution itself is a
  * distributed higher-order-function fold, never a collect. Lineage is
  * cut by caching each round's vocabulary and unpersisting the previous
  * one.
  *
  * Determinism: ties on pair count break lexicographically on (left,
  * right), so the learned merge table is a pure function of the corpus.
  * Rows-only key (iterative — not expressible as one DuckDB SQL);
  * BpeSpec pins the algorithm on a hand-computed fixture.
  */
object Bpe {

  private val Merges = 8

  /** One merge round's substitution: fold the symbol array left-to-right,
    * joining an (a, b) adjacency into "ab" greedily and non-overlapping
    * (a just-merged symbol never re-merges because the fold compares the
    * FULL last symbol against `a`). */
  private def mergeExpr(a: String, b: String): String = {
    // tokens are [a-z0-9]+ by construction (Text.toks), so plain quoting
    // is safe
    val ab = a + b
    s"""array_join(
       |  aggregate(split(repr, ' '),
       |    cast(array() as array<string>),
       |    (acc, x) -> case
       |      when size(acc) > 0 and try_element_at(acc, -1) = '$a'
       |           and x = '$b'
       |      then concat(slice(acc, 1, size(acc) - 1), array('$ab'))
       |      else concat(acc, array(x)) end),
       |  ' ')""".stripMargin
  }

  /** Learn the top-[[Merges]] BPE merges; returns one row per learned
    * rule: (rank, left, right, merged, pair_weight). */
  def qBpeLearn(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    learnMerges(s, d)
      .toDF("rank", "left", "right", "merged", "pair_weight")
      .orderBy("rank")
  }

  /** Encode: apply the learned merge table, in rank order, to every
    * distinct corpus word — the tokenizer's encode step. Same fold
    * kernel as learning, chained once per rule, so learn→encode is
    * reproducible by construction. One narrow pass over the vocabulary
    * (plus the learning passes); per-doc token ids then come from an
    * equi-join on word, which is how a 100 TB corpus would be encoded —
    * the merge table itself is a tiny broadcast. */
  def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    val merges = learnMerges(s, d)
    var vocab = documents(s, d)
      .select(explode(Text.toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        trim(regexp_replace(col("w"), "(.)", "$1 ")).as("repr"))
    merges.foreach { case (_, a, b, _, _) =>
      vocab = vocab.select(col("w"), col("freq"),
        expr(mergeExpr(a, b)).as("repr"))
    }
    vocab
      .select(col("w"), col("freq"), col("repr").as("encoded"),
        size(split(col("repr"), " ")).cast("long").as("n_sym"))
      .orderBy("w")
  }

  private def learnMerges(s: SparkSession, d: String)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab = documents(s, d)
      .select(explode(Text.toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // "l o w": every character becomes a symbol separated by spaces
      .select(col("freq"),
        trim(regexp_replace(col("w"), "(.)", "$1 ")).as("repr"))
      .cache()
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    // the previous round's vocab is unpersisted one iteration LATE: the
    // argmax job at the top of each round is what materializes the
    // current vocab's cache (reading the parent's), so no extra
    // count()-only materialization job is ever scheduled
    var parent: org.apache.spark.sql.DataFrame = null
    var rank = 1L
    while (rank <= Merges) {
      val arr = split(col("repr"), " ")
      val top = vocab
        .select(col("freq"), explode(zip_with(
          slice(arr, lit(1), size(arr) - 1),
          slice(arr, lit(2), size(arr) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect() // materializes vocab's cache as a side effect
      if (parent != null) { parent.unpersist(); parent = null }
      if (top.isEmpty) { rank = Merges + 1 }
      else {
        val r = top.head
        val (a, b, cnt) =
          (r.getString(0), r.getString(1), r.getLong(2))
        learned += ((rank, a, b, a + b, cnt))
        val next = vocab
          .select(col("freq"), expr(mergeExpr(a, b)).as("repr"))
          .cache()
        parent = vocab
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist()
    if (parent != null) parent.unpersist()
    learned.toSeq.sortBy(_._1)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_learn"  -> qBpeLearn _,
    "q_bpe_encode" -> qBpeEncode _,
  )

  val oracleSql: Map[String, String] = Map.empty
}
