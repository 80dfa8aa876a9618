package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the partitioned kernel index build
  * ([[graft.engine.SeriesOps.indexFast]] → `twoPassBuild`): a synthetic
  * dense series far beyond any testdata scale factor, through the same
  * build + q17-shape probe path the CP queries use. The claim under test:
  * no stage is single-partition and no structure is O(N) on the driver,
  * so build time scales with partition count, not series length, and
  * probe time scales with grid cells, not N.
  *
  * Deterministic input (`sin` + modular ripple over `spark.range`) — no
  * RNG, so reruns are comparable. Usage:
  * `SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.LargeSeriesBench [n] [cells]"`
  * Defaults n = 10^8 rows, 50k grid cells. Results recorded in
  * BASELINE.md ("Large-N kernel evidence").
  */
object LargeSeriesBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000000L)
    val cells = args.lift(1).map(_.toLong).getOrElse(50000L)
    val maxWin = 50L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-34s $s%9.2f s"); (r, s)
    }
    import graft.engine.SeriesOps

    println(s"series n = $n rows, probe grid = $cells cells, maxWin = $maxWin")
    val series = spark.range(1L, n + 1L).select(
      col("id").as("t"),
      (sin(col("id").cast("double") * lit(0.001)) * lit(50.0) + lit(100.0) +
        (col("id") % 7).cast("double") * lit(0.1)).as("y"))

    val (idx, buildS) = time("kernel index build (two-pass)")(
      SeriesOps.indexFast(series, maxWin))
    val (rows, _) = time("index rows (cached)")(idx.df.count())
    require(rows == n, s"index rows $rows != $n")

    // q17-shape probe: `cells` windows [x, x+lx-1] spread over the series,
    // avg from prefix sums + max from the sparse table — 4 probe joins
    val step = (n - maxWin) / cells
    val grid = spark.range(0L, cells).select(
      (col("id") * step + 1L).as("x"),
      (col("id") % (maxWin - 9) + 10L).as("lx"))
    val probed = SeriesOps.windowAgg(
      grid, idx, col("x"), col("x") + col("lx") - 1L, "w",
      needAvg = true, needMax = true)
    val (chk, probeS) = time(s"probe $cells cells (avg+max)")(
      probed.agg(
        round(sum("w_avg"), 2).as("sum_avg"),
        round(sum("w_max"), 2).as("sum_max"),
        count(lit(1)).as("cells")).head())
    println(s"checksum: sum_avg=${chk.getDouble(0)} sum_max=${chk.getDouble(1)} cells=${chk.getLong(2)}")
    println(f"RESULT n=$n build=$buildS%.1f s probe=$probeS%.1f s " +
      f"build_rows_per_s=${n / buildS}%.0f")
    idx.df.unpersist()
    spark.stop()
  }
}
