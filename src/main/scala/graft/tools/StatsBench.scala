package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the planner-statistics family
  * (`operators.Stats` — q220/q221/q222/q227/q228): a deterministic
  * synthetic fact table at row counts the sf testdata can't reach.
  *
  * Table: `n` rows with a Zipf-ish skewed key (xxhash64 squared-mod —
  * a heavy head with a long tail), a uniform range column, and a 1%
  * null column.
  *
  * Claims under test:
  *  - [[graft.operators.Stats.columnStats]] is ONE pass whose wall
  *    scales with the scan, not with NDV (the multi-distinct Expand's
  *    partials combine map-side) — measured;
  *  - the equi-width [[graft.operators.Stats.histogram]] builds with
  *    no sort at 10^8 rows and its range estimate lands exactly on
  *    uniform data (require-gated) while the skew column's estimate
  *    error is reported, not hidden;
  *  - the System-R join estimate (n²/ndv) vs the exact Σc² on the
  *    skewed key — the undershoot the sketch tier exists to catch —
  *    is measured at scale (require-gated ≤ 0 by Cauchy–Schwarz).
  *
  * Usage: `sbt "runMain graft.tools.StatsBench [n]"` (default
  * 100_000_000). Results recorded in BASELINE.md and
  * `bench/large_stats.txt`.
  */
object StatsBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000000L)
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
    import graft.operators.{Graph, Stats}

    println(s"n = $n rows: skewed key (squared-hash mod 10^6), uniform " +
      "range col, 1% nulls")
    val df = spark.range(n).select(
      pmod(pmod(xxhash64(col("id")), lit(1000L)) *
        pmod(xxhash64(col("id")), lit(1000L)), lit(1000000L)).as("k"),
      pmod(xxhash64(col("id") * 31), lit(1000000L)).as("u"),
      when(pmod(col("id"), lit(100)) === 0, lit(null).cast("long"))
        .otherwise(col("id")).as("v"))

    val (stats, tStats) = time("columnStats: one pass, 3 columns") {
      Stats.columnStats(df, Seq("k", "u", "v")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
    }
    println(stats.map { case (c, (nn, nu, nd)) =>
      s"$c: n=$nn nulls=$nu ndv=$nd" }.mkString("; "))
    require(stats("v")._2 == n / 100, "planted null share must be exact")

    val (estU, tHist) = time("histogram(16) + range estimate on the uniform col") {
      val h = Stats.histogram(df, "u", 16)
      Stats.histogramRangeEstimate(h, lit(250000L), lit(499999L))
        .collect().head.getLong(0)
    }
    val truthU = df.where(col("u").between(250000L, 499999L)).count()
    val relU = math.abs(estU - truthU).toDouble / truthU
    println(f"uniform range: est $estU truth $truthU rel $relU%.5f")
    require(relU < 0.001, s"uniform-range estimate must be near-exact: $relU")

    val (joinEst, tJoin) = time("System-R join estimate vs exact sum(c^2) on the skewed key") {
      val s1 = df.agg(count(lit(1)).as("nr"), countDistinct("k").as("ndv"))
      val tru = df.groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("t"))
      s1.crossJoin(tru).select(
        Graph.idiv(col("nr") * col("nr"), col("ndv")).as("est"),
        col("t")).collect().head
    }
    val (est, tru) = (joinEst.getLong(0), joinEst.getLong(1))
    println(f"join est $est vs exact $tru (signed err ${est - tru})")
    require(est <= tru,
      "uniformity estimate must undershoot on skew (Cauchy-Schwarz)")

    println(f"TOTAL stats $tStats%.2f s, histogram $tHist%.2f s, " +
      f"join-est $tJoin%.2f s at n=$n")
    spark.stop()
  }
}
