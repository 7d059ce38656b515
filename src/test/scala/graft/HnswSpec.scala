package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the sharded-HNSW ANN ([[ops.Hnsw]]) — the rows-only key's
  * accuracy gate: recall against the EXACT top-k contract
  * (q_vector_topk), run-to-run determinism (the level draw is a pure
  * function of vec_id), the bounded-degree graph invariant, and exact
  * single-shard behavior on a corpus the beam fully covers. */
class HnswSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def exactTop10: Map[(Long, Long), Int] =
    ops.Vectors.qVectorTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

  test("recall@10 vs the exact contract is >= 0.9, scores are true cosines") {
    val exact = exactTop10
    val got = ops.Hnsw.qVectorAnnHnsw(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.nonEmpty)
    val hits = got.count { case (q, c, _) => exact.contains((q, c)) }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.9,
      f"recall@10 = $recall%.3f (${hits} of ${exact.size}) — graph " +
        "search is losing true neighbors")
    // reported scores are unquantized cosines: any (q,c) pair the exact
    // path also ranked must carry the same cosine to 1e-6
    val exactCos = ops.Vectors.qVectorTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { case (q, c, cos) =>
      exactCos.get((q, c)).foreach(e =>
        assert(math.abs(e - cos) < 1e-6, s"score drift on ($q,$c)"))
    }
  }

  test("the graph and the result set are deterministic run to run") {
    val a = ops.Hnsw.qVectorAnnHnsw(spark, sf).collect().toSeq
    val b = ops.Hnsw.qVectorAnnHnsw(spark, sf).collect().toSeq
    assert(a == b, "HNSW output varies across runs — the level draw or " +
      "a heap ordering is nondeterministic")
  }

  test("single shard with a full-coverage beam is EXACT; degrees bounded") {
    import spark.implicits._
    // a hand-built shard: 200 deterministic vectors in 8 dims
    def vec(i: Long): Array[Double] =
      Array.tabulate(8)(d => math.sin(i * (d + 1) * 0.7) + 0.01 * d)
    val idx = new ops.Hnsw.ShardIndex(8, 64)
    (0L until 200L).foreach(i => idx.add(i, vec(i)))
    // degree invariant: <= m on upper layers, <= 2m on layer 0
    assert(idx.degreesAt(0).forall(_ <= 16), "layer-0 degree > 2m")
    assert(idx.degreesAt(1).forall(_ <= 8), "upper-layer degree > m")
    // with ef >= corpus the beam must find the true top-k (the graph is
    // connected by construction at this size)
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    val q = vec(777L)
    val truth = (0L until 200L)
      .map(i => (i, cosine(q, vec(i))))
      .sortBy { case (i, c) => (-c, i) }.take(10).map(_._1).toSet
    val got = idx.search(q, 10, 200).map(_._1).toSet
    assert(got == truth,
      s"full-beam search missed true neighbors: ${truth -- got}")
  }

  test("persisted graph search ≡ in-memory build (row-identical), and " +
      "the persisted table restores without construction") {
    val inMem = ops.Hnsw.qVectorAnnHnsw(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val persisted = ops.Hnsw.qVectorAnnHnswPersist(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(persisted == inMem,
      "persisted-graph search diverged from the in-memory build — " +
        "serialization lost graph structure")
    // the graph table is a real graft-manifest snapshot: re-query reads
    // it directly (no rebuild), and the node count equals the corpus
    val table = s"${ops.Sources.ioDir(spark, sf)}/hnsw_graph"
    val g = ops.Layout.readSnapshot(spark, table)
    val corpus = Tables.embeddings(spark, sf)
      .where(col("vec_id") >= 5).count()
    assert(g.count() == corpus,
      "persisted graph must carry one row per corpus vector")
    val again = ops.Hnsw.searchIndex(spark, table,
      Tables.embeddings(spark, sf).where(col("vec_id") < 5)
        .select(col("vec_id"),
          col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .toSeq.sortBy(_._1),
      k = 10).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(again == inMem, "re-query of the persisted graph diverged")
    // a rebuild REPLACE-commits: version advances, old graph readable
    val v = ops.Layout.currentVersion(
      new org.apache.hadoop.fs.Path(table).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(table))
    assert(v >= 1)
  }

  test("sharding is a pure union: every reported pair is a real candidate") {
    val ids = Tables.embeddings(spark, sf)
      .select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val got = ops.Hnsw.qVectorAnnHnsw(spark, sf).collect()
    got.foreach { r =>
      assert(r.getLong(0) < 5, "query ids are vec_id < 5")
      assert(r.getLong(1) >= 5 && ids.contains(r.getLong(1)),
        s"candidate ${r.getLong(1)} is not a corpus vector")
    }
    // exactly k rows per query, ranks 1..k
    val byQ = got.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 10),
        s"query $q ranks: ${rows.map(_.getInt(2)).sorted.mkString(",")}")
    }
  }
}
