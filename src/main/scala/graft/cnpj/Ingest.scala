package graft.cnpj

import java.io.{BufferedInputStream, File, FileInputStream, FileOutputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CNPJ ingest utilities (SURVEY.md §2.1 S1–S5).
  *
  * Download and unzip are inherently driver-side, unsplittable steps
  * (SURVEY.md §7.4.6) and stay OUT of any measured query path: at scale the
  * fetch fan-out runs as a driver thread pool (one stream per shard URL)
  * and everything after the CSV lands is distributed Spark.
  */
object Ingest {

  /** S1: streaming HTTP download, idempotent (skip if dest exists), 240 s
    * timeout — semantics of ETLCNPJFinalEmpresaEstabelecimentos.py:60-72.
    * (Unused in the zero-egress test environment; unit-testable via the
    * skip-if-exists path.) */
  def download(url: String, dest: File,
      timeout: Duration = Duration.ofSeconds(240)): Boolean = {
    if (dest.exists()) return false // idempotent, like the reference :61-63
    val client = HttpClient.newBuilder().connectTimeout(timeout).build()
    val req = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).build()
    // stream to a temp file and move only on success: writing straight to
    // dest would leave an error-response body there, and the
    // skip-if-exists guard above would then treat the poisoned file as a
    // completed download forever
    val tmp = File.createTempFile(dest.getName, ".part", dest.getParentFile)
    try {
      val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp.toPath))
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
      java.nio.file.Files.move(tmp.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    } finally {
      tmp.delete() // no-op when already moved
      ()
    }
  }

  /** S2: ZIP extraction to a directory
    * (ETLCNPJFinalEmpresaEstabelecimentos.py:75-81). Returns extracted
    * files; corrupt archives surface as exceptions with the zip path. */
  def extractZip(zip: File, destDir: File): Seq[File] = {
    destDir.mkdirs()
    val in = new ZipInputStream(
      new BufferedInputStream(new FileInputStream(zip)))
    val out = Seq.newBuilder[File]
    try {
      var e = in.getNextEntry
      while (e != null) {
        val f = new File(destDir, e.getName)
        // zip-slip guard; the separator matters — without it an entry
        // escaping to a sibling dir sharing the prefix (out -> out-evil)
        // would pass a bare startsWith
        if (!f.getCanonicalPath
            .startsWith(destDir.getCanonicalPath + File.separator))
          throw new RuntimeException(s"illegal zip entry path: ${e.getName}")
        if (e.isDirectory) f.mkdirs()
        else {
          Option(f.getParentFile).foreach(_.mkdirs())
          val fos = new FileOutputStream(f)
          try in.transferTo(fos) finally fos.close()
          out += f
        }
        e = in.getNextEntry
      }
    } catch {
      case ex: Exception =>
        throw new RuntimeException(s"error extracting ${zip.getPath}", ex)
    } finally in.close()
    out.result()
  }

  /** S3–S5: schema-on-read scan of the CNPJ CSV dialect — headerless,
    * `;`-separated, latin-1, every column string. Replaces the reference's
    * whole chunked re-header stage (:84-94) with a zero-pass declaration;
    * `pathGlobFilter` handles the .EMPRECSV/.ESTABELE suffixes without the
    * rename walk (:97-110). */
  def readRawCsv(spark: SparkSession, path: String, schema: StructType,
      glob: Option[String] = None): DataFrame = {
    val r = spark.read.schema(schema)
      .option("sep", ";")
      .option("header", "false")
      .option("encoding", "ISO-8859-1")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).csv(path)
  }

  /** Quarantining variant of [[readRawCsv]]: rows that don't parse against
    * the schema (wrong column count, mangled quoting — routine in the
    * real Receita drops) land in a `_corrupt_record` column instead of
    * failing the job or silently vanishing. Returns (clean, quarantined):
    * clean rows with the declared schema, quarantined raw lines for
    * audit/replay — the pattern that keeps a 100 TB ingest running when
    * 0.001% of a drop is malformed. */
  def readRawCsvQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType, nullable = true))
    val raw = spark.read.schema(withCorrupt)
      .option("sep", ";")
      .option("header", "false")
      .option("encoding", "ISO-8859-1")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .cache() // PERMISSIVE corrupt-column reads require a materialized scan
    val clean = raw.where(col("_corrupt_record").isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantined = raw.where(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    (clean, quarantined)
  }
}
