package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest robustness at the 100 TB posture: a multi-TB CSV drop always
  * contains some malformed rows, and the three Spark parse modes are the
  * contract for what happens to them — PERMISSIVE quarantines them into
  * a corrupt-record column (count them, keep going), DROPMALFORMED
  * silently drops, FAILFAST aborts the job. This spec pins all three so
  * the CNPJ-style headerless `;` ingest can't silently change behavior. */
class IngestRobustnessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "target/graft_io/corrupt_csv"

  private def writeFixture(): Unit = {
    val f = new java.io.File(dir)
    f.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(f, "part.csv"), "ISO-8859-1")
    // CNPJ dialect: headerless, ';'-separated, latin-1. Rows 3 and 5 are
    // malformed: a non-numeric id and a truncated record.
    w.println("1;ACME LTDA;12,50")
    w.println("2;BETA SA;7,25")
    w.println("oops;GAMMA;1,00")
    w.println("4;DELTA EIRELI;3,75")
    w.println("5;EPSILON")
    w.close()
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("val_str", StringType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE quarantines malformed rows into _corrupt_record") {
    writeFixture()
    val df = spark.read
      .option("sep", ";").option("encoding", "ISO-8859-1")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .csv(dir)
      .cache() // corrupt-record column requires the parsed row cached
    try {
      assert(df.count() == 5)
      val bad = df.where(col("_corrupt_record").isNotNull)
      assert(bad.count() == 2, bad.collect().mkString("\n"))
      val good = df.where(col("_corrupt_record").isNull)
      assert(good.count() == 3)
      // good rows parse completely, including the comma-decimal cast
      val total = good
        .select(sum(expr("cast(replace(val_str, ',', '.') as decimal(18,2))")))
        .collect().head.getDecimal(0)
      assert(total == new java.math.BigDecimal("23.50"), total)
    } finally df.unpersist()
  }

  test("DROPMALFORMED keeps only parseable rows") {
    writeFixture()
    val df = spark.read
      .option("sep", ";").option("encoding", "ISO-8859-1")
      .option("mode", "DROPMALFORMED")
      .schema(StructType(schema.fields.dropRight(1)))
      .csv(dir)
    // collect(), not count(): count() prunes every column, the parser
    // then parses zero fields and cannot see malformed rows at all —
    // the same trap applies to any "how many rows" health check on raw
    // CSV drops
    assert(df.collect().length == 3)
  }

  test("FAILFAST aborts on the first malformed row") {
    writeFixture()
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read
        .option("sep", ";").option("encoding", "ISO-8859-1")
        .option("mode", "FAILFAST")
        .schema(StructType(schema.fields.dropRight(1)))
        .csv(dir)
        .collect() // count() would prune all columns and parse nothing
    }
    assert(ex.getMessage.contains("Malformed") ||
      ex.getCause != null, ex.getMessage.take(300))
  }
}
