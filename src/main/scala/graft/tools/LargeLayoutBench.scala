package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-N evidence run for the Z-order layout family
  * (`sources.Layout.writeZOrdered` / `zIntervals` — q194/q197): decode
  * skip measured from scan metrics at row counts the sf testdata can't
  * reach.
  *
  * Data: `n` rows uniform over a 2-D key space (xxhash64-spread x and
  * y), written two ways — Z-order-clustered and single-column x-sorted,
  * 64 range files each.
  *
  * Claims under test (all require-gated):
  *  - a y-band read (the dimension the x-sort cannot serve) decodes
  *    EVERY row on the x-sorted layout and a bounded fraction on the
  *    z-ordered one — footer min/max stats on the raw y column do the
  *    pruning, no zkey needed in the filter;
  *  - the quadrant box as a single pushed zkey range (q194's identity)
  *    decodes ~n/16 + boundary files;
  *  - a general non-aligned box via the exact 38-interval cover (q197)
  *    returns IDENTICAL rows to the raw-column box filter — the
  *    exactness gate at scale — while touching only zkey.
  *
  * Usage: `sbt "runMain graft.tools.LargeLayoutBench [n]"` (default
  * 20_000_000). Results in BASELINE.md and `bench/large_layout.txt`.
  */
object LargeLayoutBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
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
      println(f"$name%-52s $s%9.2f s"); (r, s)
    }
    import graft.sources.Layout

    val base = s"${sys.props("java.io.tmpdir")}/graft_large_layout"
    val zPath = s"$base/z"; val xPath = s"$base/x"
    val df = spark.range(n).select(
      col("id").as("row_id"),
      pmod(xxhash64(col("id")), lit(1000000L)).as("x"),
      pmod(xxhash64(col("id") * 31), lit(1000000L)).as("y"))
    println(s"n = $n rows uniform over 1M x 1M keys; 64 files per layout")

    val ((xlo, xhi, ylo, yhi), _) =
      time("writeZOrdered (bucket + interleave + range shuffle)")(
        Layout.writeZOrdered(df, zPath, "x", "y", nRanges = 64))
    time("writeSorted by x only (the single-dimension control)")(
      Layout.writeSorted(df, xPath, Seq("x"), nRanges = 64))

    def decoded(q: DataFrame): (Long, Long) = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      val cnt = q.count()
      q.collect()
      val rows = graft.plans.PlanWalk.flatten(q.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
      (cnt, rows)
    }

    // --- the y band: full x extent, 1/8 of y — x-sort can never prune it
    val bandLo = 0L; val bandHi = 1000000L / 8 - 1
    val ((bandN, zBand), _) = time("y-band read on z-ordered layout")(
      decoded(spark.read.parquet(zPath).where(col("y").between(bandLo, bandHi))))
    val ((bandN2, xBand), _) = time("y-band read on x-sorted layout")(
      decoded(spark.read.parquet(xPath).where(col("y").between(bandLo, bandHi))))
    require(bandN == bandN2, s"layouts must agree: $bandN vs $bandN2")
    println(f"  band rows $bandN; decoded z = $zBand (${100.0 * zBand / n}%.1f%%)" +
      f" vs x-sorted = $xBand (${100.0 * xBand / n}%.1f%%)")
    require(xBand == n, "the x-sorted layout cannot prune a y band")
    require(zBand <= n / 2, s"z layout must skip most row groups: $zBand")

    // --- the quadrant: one pushed zkey range (q194)
    val ((quadN, zQuad), _) = time("quadrant read via zkey < 4096")(
      decoded(spark.read.parquet(zPath).where(col("zkey") < 4096)))
    println(f"  quadrant rows $quadN (~n/16 = ${n / 16}); decoded $zQuad " +
      f"(${100.0 * zQuad / n}%.1f%%)")
    require(zQuad <= n / 4, s"quadrant must decode ~1/16 + boundaries: $zQuad")

    // --- the general box (q197): exact 38-interval cover == raw filter
    val (b@(bxlo, bxhi, bylo, byhi), _) = ((40L, 171L, 24L, 87L), 0.0)
    val viaKey = spark.read.parquet(zPath)
      .where(Layout.zBoxPredicate(col("zkey"), bxlo, bxhi, bylo, byhi))
    val viaRaw = spark.read.parquet(zPath)
      .where(Layout.bucket256(col("x"), xlo, xhi).between(bxlo, bxhi) &&
        Layout.bucket256(col("y"), ylo, yhi).between(bylo, byhi))
    val ((kN, kRows), _) = time(s"general box $b via 38 zkey intervals")(
      decoded(viaKey))
    val ((rN, _), _) = time("general box via raw-column residual (control)")(
      decoded(viaRaw))
    require(kN == rN, s"interval cover must be exact: $kN vs $rN")
    println(f"  box rows $kN; interval-cover decode $kRows (${100.0 * kRows / n}%.1f%%)")

    spark.stop()
  }
}
