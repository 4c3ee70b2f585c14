package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // dev-only: optional comma-separated query-name prefix filter (the
    // driver passes 2 args, so it always gets the full registry). Empty
    // elements (a shell-quoting slip like ",q202" or "q202,,q204") are
    // dropped — a "" prefix matches every name, which would silently turn
    // a filtered dev run into a full-registry run.
    val prefixes =
      (if (args.length > 2) args(2) else "").split(',').toSeq.filter(_.nonEmpty)
    def selected(name: String): Boolean =
      prefixes.isEmpty || prefixes.exists(name.startsWith)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // `coalesce(1)` funnels the whole result through one task — fine ONLY
    // because correctness dumps are bounded (the driver compares hashes of
    // small result sets, sf0.01). The guard keeps anyone from reusing this
    // as a production writer: a result past the bound fails loudly instead
    // of silently serializing gigabytes through a single partition.
    // sized above the largest legitimate gate result (q44 at sf0.1:
    // 2.74M pair rows) but far below corpus-bulk scale
    val maxDumpRows = 10000000L
    SparkEntry.queries
      .filter { case (name, _) => selected(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val n = df.count()
        require(n <= maxDumpRows,
          s"$name returned $n rows > $maxDumpRows; Verify's coalesce(1) dump " +
            "is for bounded correctness results, not bulk export")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
