package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.SeriesOps

/** Ingest paths of the reference (reference: db_preparation.py:21-97),
  * re-expressed as CSV -> DataFrame -> parquet with the surrogate dense
  * `time_id` assigned by row_number (the reference's `BIGSERIAL`,
  * db_preparation.py:59,93).
  */
object Ingest {

  /** EMG loader: the source csv's first 3 lines are junk and must be dropped
    * before the header (reference: db_preparation.py:170-180). Implemented
    * with a per-file line index over spark.read.text — order within a text
    * file split is preserved by zipWithIndex on a single-file read.
    */
  def emgCsv(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).rdd.zipWithIndex()
      .filter(_._2 >= 3).map(_._1)
    val fixed = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(lines.toDS())
    SeriesOps.withTimeId(fixed, Seq(monotonically_increasing_id()), "time_id")
  }

  /** GAS loader: union of many csvs; a `Date` column is derived from each
    * source filename (digits of the name, reference: db_preparation.py:147-152);
    * unit suffixes are stripped from headers (`Time (s)` -> `Time`,
    * db_preparation.py:162-164); rows sorted by (Date, Time) before the
    * ordinal key is assigned (db_preparation.py:156).
    */
  def gasCsvDir(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir)
      .withColumn("Date",
        regexp_replace(regexp_extract(input_file_name(), """([^/]+)\.csv""", 1),
          """[^0-9]""", "").cast("long"))
    val renamed = raw.columns.foldLeft(raw) { (df, c) =>
      val clean = c.replaceAll(""" \(.+\)""", "")
      if (clean != c) df.withColumnRenamed(c, clean) else df
    }
    SeriesOps.withTimeId(renamed, Seq(col("Date"), col("Time")), "time_id")
  }

  /** Write a loaded table as parquet (the reference's COPY-into-Postgres,
    * db_preparation.py:58,92). */
  def toParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** One extracted dataset: the directory its csvs landed in and whether
    * the archive held a single csv (the reference's routing signal: a
    * single-csv zip is the EMG dataset, multi-csv is GAS,
    * db_preparation.py:122-126). */
  final case class UnzippedDataset(dir: String, csvs: Seq[String]) {
    def singleCsv: Boolean = csvs.size == 1
  }

  /** S1 — zip extraction + dataset routing (reference:
    * db_preparation.py:113-130): for every `*.zip` in `dirPath`, extract
    * its TOP-LEVEL `.csv` members (nested paths skipped, like the
    * reference's namelist filter) into `dirPath/temp_<zipname>/`.
    * Driver-side one-time prep, exactly like the reference — the extracted
    * files then flow through the distributed loaders ([[loadUnzipped]]).
    */
  def unzipData(dirPath: String): Seq[UnzippedDataset] = {
    val dir = new java.io.File(dirPath)
    val zips = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.toLowerCase.endsWith(".zip")).sortBy(_.getName)
    zips.toSeq.map { zf =>
      val zip = new java.util.zip.ZipFile(zf)
      try {
        import scala.jdk.CollectionConverters._
        val members = zip.entries().asScala.toSeq
          .filter(e => !e.isDirectory && e.getName.endsWith(".csv") &&
            !e.getName.contains("/"))
        val outDir = new java.io.File(dir, s"temp_${zf.getName.stripSuffix(".zip")}")
        outDir.mkdirs()
        val names = members.map { e =>
          val out = new java.io.File(outDir, e.getName)
          val in = zip.getInputStream(e)
          try java.nio.file.Files.copy(in, out.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          out.getName
        }
        UnzippedDataset(outDir.getAbsolutePath, names)
      } finally zip.close()
    }
  }

  /** Route an extracted dataset to its loader: single csv -> the EMG
    * loader (junk-line fixup), several csvs -> the GAS loader (filename
    * date + union). Reference: db_preparation.py:183-195. */
  def loadUnzipped(spark: SparkSession, d: UnzippedDataset): DataFrame = {
    require(d.csvs.nonEmpty,
      s"archive extracted to ${d.dir} contains no top-level .csv members")
    if (d.singleCsv) emgCsv(spark, s"${d.dir}/${d.csvs.head}")
    else gasCsvDir(spark, d.dir)
  }
}
