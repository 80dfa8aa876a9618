package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output-layout operators: the write side of a training-data pipeline.
  *
  * At 100 TB the layout of what you WRITE decides the cost of every later
  * read: range-partitioned, sorted shards give parquet min/max footer
  * stats that prune whole files on key-range scans; bounded file sizes
  * keep task granularity sane (no 10 GB stragglers, no 10k-file
  * metadata storms); and periodic compaction repairs the small-file
  * accumulation every incremental/streaming ingest produces. The
  * reference's analogue is its bulk CSV->table load + serial-key layout
  * (db_preparation.py:21-97) — this is the same concern re-expressed for
  * a sharded object store instead of a single PostgreSQL heap.
  */
object Layout {

  /** Write `df` as range-partitioned parquet sorted by `sortCols`:
    * `nRanges` disjoint key ranges (one task each — sampled split points,
    * so ranges are balanced even on skewed keys), rows sorted within each
    * file, and at most `maxRecordsPerFile` rows per file (0 = unbounded).
    * Disjoint sorted ranges mean a key-range read prunes non-overlapping
    * files from the parquet footer stats alone. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      nRanges: Int, maxRecordsPerFile: Long = 0L): Unit =
    df.repartitionByRange(nRanges, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Reproducible NUMBERED-SHARD export — the dataset-release
    * convention (WebDataset / HF-datasets shards): rows ranked by
    * `keyCols` via the distributed two-pass ordinal
    * ([[graft.engine.SeriesOps.withTimeId]] — no global window), shard
    * `(rank−1) div rowsPerShard`, written `partitionBy(shard_id)` so
    * shard membership is a PURE FUNCTION of the data — unlike
    * [[writeSorted]]'s sampled range splits, a re-export of the same
    * rows produces byte-identical shard assignment, which is what
    * makes a release manifest ([[shardManifest]]) meaningful. */
  def writeNumberedShards(df: DataFrame, path: String,
      keyCols: Seq[String], rowsPerShard: Long): Unit = {
    require(rowsPerShard > 0,
      s"rowsPerShard must be positive; got $rowsPerShard")
    val ranked = graft.engine.SeriesOps.withTimeId(df,
      keyCols.map(col), as = "__rk")
    ranked
      .withColumn("shard_id",
        ((col("__rk") - 1) - pmod(col("__rk") - 1, lit(rowsPerShard)))
          .cast("long") / lit(rowsPerShard))
      .withColumn("shard_id", col("shard_id").cast("long"))
      .drop("__rk")
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)
  }

  /** Export MANIFEST — the integrity sidecar every dataset release
    * ships: per numbered shard, the row count, the key range, and an
    * ORDER-INVARIANT content checksum (sum of per-row 60-bit portable
    * hashes bounded into 2²⁰, so the BIGINT sum stays exact beyond
    * 10¹² rows and any engine — DuckDB included — recomputes it from
    * the rows alone). A consumer verifies a downloaded shard by
    * recomputing three numbers; a producer detects a torn or partial
    * re-export by diffing manifests. One scan, one hash aggregate. */
  def shardManifest(spark: SparkSession, path: String, keyCol: String,
      hashCols: Seq[String]): DataFrame = {
    val rowStr = concat_ws("\u0001", hashCols.map(c => col(c).cast("string")): _*)
    val h = pmod(graft.operators.TextOps.portableHash(rowStr, 17),
      lit(1048576L))
    spark.read.parquet(path)
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        sum(h).as("content_sum"))
  }

  /** Rewrite a parquet directory into ~`targetRecordsPerFile`-row sorted
    * shards: the small-file compaction pass run behind incremental
    * ingest. One count to size the job, then one range-shuffle write —
    * returns the shard count it produced. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      sortCols: Seq[String], targetRecordsPerFile: Long): Int = {
    require(targetRecordsPerFile > 0,
      s"targetRecordsPerFile must be positive; got $targetRecordsPerFile")
    val df = spark.read.parquet(inPath)
    val n = df.count()
    val shards = math.max(1L, (n + targetRecordsPerFile - 1) / targetRecordsPerFile)
    // an unchecked .toInt would silently overflow into a negative/garbage
    // partition count for n/target beyond Int range
    require(shards <= Int.MaxValue,
      s"$n rows / $targetRecordsPerFile per file = $shards shards exceeds Int range")
    writeSorted(df, outPath, sortCols, shards.toInt)
    shards.toInt
  }
}
