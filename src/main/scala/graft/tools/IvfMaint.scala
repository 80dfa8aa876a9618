package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence run for IVF index MAINTENANCE under continuous ingest: the
  * fragmentation curve (files per cell across append batches), the
  * compaction repair ([[graft.operators.Similarity.ivfCompact]] — bounded
  * files per cell, bit-identical search results), and the centroid-drift
  * gauge ([[graft.operators.Similarity.ivfDrift]]) on an un-drifted vs a
  * deliberately SHIFTED corpus — the rebuild-decision signal the append
  * path defers to.
  *
  * Corpus: the [[LargeAnnBench]] synthetic clustered family (md5-derived,
  * rerun-identical). Usage:
  * `sbt "runMain graft.tools.IvfMaint [n] [batches]"` (default 200k, 20).
  * Results recorded in BASELINE.md ("IVF maintenance evidence").
  */
object IvfMaint {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%9.2f s"); r
    }
    import graft.operators.Similarity

    val dims = 64
    val clusters = 64
    def family(ids: org.apache.spark.sql.DataFrame, shift: Double) = {
      val cell = pmod(col("id"), lit(clusters))
      val vec = transform(sequence(lit(0), lit(dims - 1)), d =>
        (Similarity.planeCoef(cell, d) + lit(shift) +
          lit(0.25) * Similarity.planeCoef(col("id") + lit(10000), d))
          .cast("float"))
      ids.select(col("id").as("vec_id"), vec.as("embedding"))
    }
    val vecs = family(spark.range(n).toDF("id"), 0.0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_maint_bench").toString
    graft.cli.Cleanup.deleteOnExit(tmp)
    val idx = time(s"ivfBuild n=$n k=$clusters") {
      Similarity.ivfBuild(spark, vecs, "vec_id", "embedding", clusters, tmp,
        trainIters = 2)
    }
    println(s"files/cell after build: max=${Similarity.ivfCellFiles(idx).values.max}")

    // continuous ingest: `batches` append batches of n/100 vectors each
    val batchN = math.max(1L, n / 100)
    time(s"$batches append batches of $batchN") {
      (1 to batches).foreach { b =>
        Similarity.ivfAppendBatch(idx,
          family(spark.range(n + (b - 1) * batchN, n + b * batchN).toDF("id"), 0.0),
          b.toLong)
      }
    }
    val fragmented = Similarity.ivfCellFiles(idx)
    println(s"files/cell after $batches appends: " +
      s"max=${fragmented.values.max} mean=${fragmented.values.sum / fragmented.size}")

    val qv = vecs.where(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val before = time("search on fragmented index") {
      Similarity.ivfSearchIndexed(idx, qv, nprobe = 4, topK = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val maxFiles = time("ivfCompact target=1M rows/file") {
      Similarity.ivfCompact(idx, targetRecordsPerFile = 1000000L)
    }
    println(s"files/cell after compact: max=$maxFiles")
    val after = time("search on compacted index") {
      Similarity.ivfSearchIndexed(idx, qv, nprobe = 4, topK = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    println(s"search identical across compact: ${before == after}")

    // drift gauge: same distribution reads ~0; a +0.5 per-dim shift of the
    // ingest distribution reads high — the rebuild signal
    val calm = time("ivfDrift (un-drifted, 10% sample)") {
      Similarity.ivfDrift(idx, sampleFraction = 0.1)
        .agg(max("drift")).head().getDouble(0)
    }
    val shiftedTmp = java.nio.file.Files.createTempDirectory("graft_ivf_shift").toString
    graft.cli.Cleanup.deleteOnExit(shiftedTmp)
    family(spark.range(n).toDF("id"), 0.5)
      .write.mode("overwrite").parquet(s"$shiftedTmp/vecs")
    // splice the shifted corpus under the stored (now stale) centroids
    val staleIdx = {
      val shifted = spark.read.parquet(s"$shiftedTmp/vecs")
      val stale = java.nio.file.Files.createTempDirectory("graft_ivf_stale").toString
      graft.cli.Cleanup.deleteOnExit(stale)
      Similarity.ivfBuild(spark, shifted, "vec_id", "embedding", clusters, stale,
        centroids = Some(idx.centroids.select("cell", "ce")))
    }
    val shifted = time("ivfDrift (shifted corpus, 10% sample)") {
      Similarity.ivfDrift(staleIdx, sampleFraction = 0.1)
        .agg(max("drift")).head().getDouble(0)
    }
    println(f"max drift: un-drifted=$calm%.6f shifted=$shifted%.6f")
    spark.stop()
  }
}
