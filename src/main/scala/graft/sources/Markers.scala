package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Tiny applied-batch marker files for at-least-once `foreachBatch`
  * maintenance of persisted indexes (band index, IVF corpus): the applied
  * batch id is recorded AFTER the index write, so a crash between them
  * re-runs the append (detectable torn state), never skips one. Shared by
  * [[graft.streaming.StreamingOps.appendBatchToBandIndex]] and
  * [[graft.operators.Similarity.ivfAppendBatch]].
  */
object Markers {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The recorded last-applied batch id, or -1 when absent. A
    * zero-length/garbled marker (crash between create's truncate and the
    * write) also reads as -1: re-applying a batch is the documented
    * at-least-once behavior, whereas a parse error would wedge the
    * recovery path itself. */
  def readLastBatch(spark: SparkSession, markerPath: String): Long = {
    val p = new Path(markerPath)
    val fs = fsFor(spark, p)
    if (!fs.exists(p)) -1L
    else {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      try Option(in.readLine()).map(_.trim)
        .filter(_.nonEmpty).flatMap(_.toLongOption).getOrElse(-1L)
      finally in.close()
    }
  }

  def writeLastBatch(spark: SparkSession, markerPath: String, batchId: Long): Unit = {
    val p = new Path(markerPath)
    val fs = fsFor(spark, p)
    val out = fs.create(p, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Remove a marker (no-op when absent) — every index REBUILD must call
    * this: a maintenance restart with a fresh checkpoint restarts batch
    * ids at 0, and a stale marker would make every append silently no-op. */
  def delete(spark: SparkSession, markerPath: String): Unit = {
    val p = new Path(markerPath)
    val fs = fsFor(spark, p)
    if (fs.exists(p)) fs.delete(p, false)
  }
}
