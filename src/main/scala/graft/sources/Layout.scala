package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Interleave the low 8 bits of `c` into the even bit positions
    * (Morton "Part1By1", 8→16 bits): three shift-or-mask steps, pure
    * integer column arithmetic — codegen'd in Spark, and the identical
    * `<<`/`&`/`|` chain replays in DuckDB for the oracle. */
  private def spread8(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0FL))
    val b = a.bitwiseOR(shiftleft(a, 2)).bitwiseAND(lit(0x3333L))
    b.bitwiseOR(shiftleft(b, 1)).bitwiseAND(lit(0x5555L))
  }

  /** 16-bit Morton (Z-order) key of two 8-bit cell coordinates: bit i of
    * `xb` lands at position 2i, bit i of `yb` at 2i+1. Sorting by this
    * key clusters rows that are close in BOTH dimensions, so parquet
    * footer min/max stats on the RAW columns prune a 2-D box query —
    * the property a single-column sort can only give one dimension
    * (Delta/Iceberg `OPTIMIZE ZORDER BY` is this exact construction). */
  def zorderKey(xb: Column, yb: Column): Column =
    spread8(xb).bitwiseOR(shiftleft(spread8(yb), 1))

  /** Equal-width 256-cell bucket of `c` over the CLOSED integer range
    * [lo, hi] — exact integer floor division (no float rounding to
    * diverge from the oracle's `//`). */
  def bucket256(c: Column, lo: Long, hi: Long): Column = {
    require(hi >= lo, s"empty bucket range [$lo, $hi]")
    // (x − lo) · 256 must stay in Long for every in-range x — fail loud
    // here rather than let an overflowed product bucket silently wrong
    // (keys wider than 2^55 need a pre-scale, not a silent wrap)
    require(hi - lo <= Long.MaxValue / 256,
      s"bucket range [$lo, $hi] too wide for exact 256x integer bucketing")
    val num = (c.cast("long") - lit(lo)) * lit(256L)
    val den = lit(hi - lo + 1L)
    ((num - pmod(num, den)) / den).cast("long")
  }

  /** Driver-side mirror of [[zorderKey]] for one 8-bit coordinate. */
  private def spread8L(x: Long): Long = {
    val a = (x | (x << 4)) & 0x0F0FL
    val b = (a | (a << 2)) & 0x3333L
    (b | (b << 1)) & 0x5555L
  }

  /** Driver-side [[zorderKey]]: the same interleave as plain Scala, for
    * bounded driver-side set computations and spec cross-checks. */
  def zorderKeyL(xb: Long, yb: Long): Long =
    spread8L(xb) | (spread8L(yb) << 1)

  /** EXACT z-interval cover of the cell box `[xlo,xhi] × [ylo,yhi]`
    * (8-bit coordinates) — the litmax/bigmin decomposition that turns an
    * ARBITRARY 2-D box into a union of 1-D zkey ranges (q194's quadrant
    * is the one-interval special case). Quadtree recursion: a node
    * wholly inside the box emits its whole z-range, wholly outside
    * prunes, partial splits; adjacent intervals merge. Intervals =
    * O(box perimeter) — a bounded driver-side list the scan's pushed
    * OR-of-ranges filter is built from. Exactness means zkey membership
    * ⟺ box membership: NO residual raw-column filter is needed, and
    * q197 gates exactly that equivalence against the raw-column oracle. */
  def zIntervals(xlo: Long, xhi: Long, ylo: Long, yhi: Long): Seq[(Long, Long)] = {
    require(0 <= xlo && xlo <= xhi && xhi <= 255 &&
      0 <= ylo && ylo <= yhi && yhi <= 255, s"bad box [$xlo,$xhi]x[$ylo,$yhi]")
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    def rec(x0: Long, y0: Long, size: Long, zbase: Long): Unit = {
      val x1 = x0 + size - 1; val y1 = y0 + size - 1
      if (x1 < xlo || x0 > xhi || y1 < ylo || y0 > yhi) ()
      else if (x0 >= xlo && x1 <= xhi && y0 >= ylo && y1 <= yhi)
        out += ((zbase, zbase + size * size - 1))
      else {
        val h = size / 2
        // child (dx, dy) holds the node's z sub-range (2*dy + dx)·h²
        // (the interleave puts y's bit above x's)
        for (dy <- 0L to 1L; dx <- 0L to 1L)
          rec(x0 + dx * h, y0 + dy * h, h, zbase + (2 * dy + dx) * h * h)
      }
    }
    rec(0L, 0L, 256L, 0L)
    out.toList.sortBy(_._1)
      .foldLeft(List.empty[(Long, Long)]) {
        case ((a, b) :: t, (c, d)) if c == b + 1 => (a, d) :: t
        case (acc, iv) => iv :: acc
      }.reverse
  }

  /** The zkey-range predicate for [[zIntervals]] of a box: a bounded
    * OR-of-BETWEENs the parquet scan pushes as one Or filter tree. */
  def zBoxPredicate(zkey: Column, xlo: Long, xhi: Long,
      ylo: Long, yhi: Long): Column =
    zIntervals(xlo, xhi, ylo, yhi)
      .map { case (a, b) => zkey.between(a, b) }
      .reduce(_ || _)

  /** Write `df` Z-order-clustered on two integer columns: bucket each to
    * 8 bits over its global range (one bounded min/max aggregate — two
    * rows to the driver), interleave to a 16-bit `zkey`, then
    * range-partition + sort by it. The written files carry the zkey
    * column (so the oracle can gate the interleave arithmetic
    * end-to-end) and — the point — tight per-file min/max footer stats
    * on BOTH raw columns, so a 2-D box read decodes only the files whose
    * z-curve segment crosses the box. Returns (xlo, xhi, ylo, yhi) so a
    * caller can reproduce the bucketing. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      nRanges: Int): (Long, Long, Long, Long) = {
    // withColumn would silently clobber a caller's zkey (requireFresh)
    require(!df.columns.contains("zkey"),
      "input already has a 'zkey' column — rename it before z-ordering")
    val Array(r) = df.agg(
      min(col(xCol).cast("long")), max(col(xCol).cast("long")),
      min(col(yCol).cast("long")), max(col(yCol).cast("long"))).collect()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"cannot z-order an empty frame or all-null $xCol/$yCol")
    val (xlo, xhi, ylo, yhi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val keyed = df.withColumn("zkey", zorderKey(
      bucket256(col(xCol).cast("long"), xlo, xhi),
      bucket256(col(yCol).cast("long"), ylo, yhi)))
    keyed.repartitionByRange(nRanges, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)
    (xlo, xhi, ylo, yhi)
  }

  /** Re-cluster a parquet directory into a Z-ordered layout — the
    * compaction pass for a 2-D-clustered table under incremental
    * ingest: new batches land unsorted (no footer-stat locality),
    * periodic re-clustering restores the pruning [[writeZOrdered]]
    * promised. Any existing zkey column is dropped and re-derived —
    * appended batches may or may not carry one, and the global ranges
    * may have moved since the last clustering. Returns the bucket
    * ranges used. */
  def compactZOrdered(spark: SparkSession, inPath: String, outPath: String,
      xCol: String, yCol: String, nRanges: Int): (Long, Long, Long, Long) =
    writeZOrdered(spark.read.parquet(inPath).drop("zkey"),
      outPath, xCol, yCol, nRanges)

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
