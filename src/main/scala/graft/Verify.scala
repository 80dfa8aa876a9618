package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    graft.tools.CodegenGuard.install()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet uses TIMESTAMP(NANOS): read as Long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // dev-only subset filter (comma-joined substrings); unset = all queries
    // (the driver contract) — lets a single query iterate without a 109-query
    // session
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.contains)) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // release any checkpoint the query returned (q54's labels) once
        // it is on disk — 57 queries in one session must not accumulate
        // block-manager state (safe: every invocation builds fresh
        // checkpoints; session caches are parquet-backed, never marked)
        try df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        finally graft.engine.Checkpoints.release(df)
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
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // codegen health gate — runs AFTER every result parquet and the oracle
    // json are on disk, so the driver's DuckDB compare has its inputs even
    // when the gate trips; the nonzero exit makes the fallback un-shippable
    if (graft.tools.CodegenGuard.failureCount > 0) {
      System.err.println(s"[verify] ${graft.tools.CodegenGuard.failureSummary}")
      sys.exit(3)
    }
  }
}
