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
}
