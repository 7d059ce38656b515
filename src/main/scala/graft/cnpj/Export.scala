package graft.cnpj

import java.io.{File, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** CSV export sinks (SURVEY.md §2.1 S6–S7).
  *
  * S6 (transform-stage dialect): `;`-separated latin-1 with header —
  * native Spark CSV options, sharded, scales linearly.
  *
  * S7 (final export): the reference writes utf-8-sig, i.e. a UTF-8 BOM
  * (EF BB BF) before the header (pandas to_csv encoding="utf-8-sig",
  * ETLCNPJFinalEmpresaEstabelecimentos.py:187). Spark never emits a BOM,
  * so the single-file+BOM form is a driver-side merge of the sharded
  * output — an export-for-humans step kept OUT of the distributed path
  * (at 100 TB you keep the shards; merging to one file is inherently
  * serial no matter the engine).
  */
object Export {

  /** S6: sharded `;`-CSV, latin-1, with header. The two whitespace
    * options matter: Spark's CSV WRITER trims cell whitespace by default,
    * which would destroy the golden file's fixed-width padding
    * (nome_municipio, SURVEY §1.3) — pandas to_csv never trims. */
  def writeCsvLatin1(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("sep", ";").option("header", "true")
      .option("encoding", "ISO-8859-1")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)

  /** S7: single `;`-CSV file, UTF-8 with BOM, header once — byte-compatible
    * with the reference's pandas export. Spark writes shards (in parallel,
    * each with a header); the driver concatenates keeping only the first
    * shard's header and prepending the BOM. */
  def writeCsvUtf8SigSingle(df: DataFrame, dir: String, outFile: File)
      : Unit = {
    df.write.mode("overwrite")
      .option("sep", ";").option("header", "true")
      .option("encoding", "UTF-8")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    val parts = new File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .sortBy(_.getName)
    val out = new FileOutputStream(outFile)
    try {
      out.write(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)) // BOM
      var headerWritten = false
      parts.foreach { p =>
        val bytes = Files.readAllBytes(p.toPath)
        if (!headerWritten) { out.write(bytes); headerWritten = true }
        else {
          // drop this shard's header line
          val nl = bytes.indexOf('\n'.toByte)
          if (nl >= 0 && nl + 1 < bytes.length)
            out.write(bytes, nl + 1, bytes.length - nl - 1)
        }
      }
    } finally out.close()
  }
}
