package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed parquet LAYOUT — the co-location tool the 100 TB plan
  * reaches for when the same fact table joins on the same key query
  * after query: pay the shuffle ONCE at write time (`bucketBy` on the
  * join key), and every subsequent join on that key plans with ZERO
  * exchanges — both scans arrive already hash-distributed (and, with
  * one file per bucket, already sorted) on the key.
  *
  * The write repartitions by the bucket key with numPartitions =
  * numBuckets so each task holds exactly one bucket's rows — one file
  * per bucket, which is what lets the sorted-bucket metadata feed the
  * sort-merge join without a per-query sort. Repartition and bucket
  * assignment use the same hash family, so the alignment is exact, not
  * probabilistic.
  *
  * Tables are registered in the session catalog with an explicit
  * `path` (external), memoized per (session, dataset dir), and the
  * scratch directory is cleaned up at JVM exit — a layout cache, not a
  * data product. */
object Bucketed {

  /** Ensure bucket-sorted `lineitem` and `orders` tables (bucketed on
    * their order keys) exist for dataset dir `d`; returns their
    * catalog names. Idempotent per session: rebuilt only when the
    * session catalog lacks them. */
  def ensureOrderTables(s: SparkSession, d: String,
      buckets: Int = 16): (String, String) = synchronized {
    val h = graft.engine.IndexCache.md5Key(s"$d:$buckets", 8)
    val li = s"li_bkt_$h"
    val ord = s"ord_bkt_$h"
    if (!s.catalog.tableExists(li) || !s.catalog.tableExists(ord)) {
      val base = s"${sys.props("java.io.tmpdir")}/graft_bucketed_$h"
      graft.cli.Cleanup.deleteOnExit(base)
      writeBucketed(s, s.read.parquet(s"$d/lineitem.parquet"),
        li, s"$base/lineitem", buckets, "l_orderkey")
      writeBucketed(s, s.read.parquet(s"$d/orders.parquet"),
        ord, s"$base/orders", buckets, "o_orderkey")
    }
    (li, ord)
  }

  /** Write `df` as a bucket-sorted external parquet table: bucketed AND
    * sorted by `key`, one file per bucket (see object doc). */
  def writeBucketed(s: SparkSession, df: DataFrame, table: String,
      path: String, buckets: Int, key: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }
}
