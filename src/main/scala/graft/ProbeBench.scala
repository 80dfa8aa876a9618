package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{RefinementEngine, SeriesOps, WindowProbe}
import graft.parser.QueryParser
import graft.queries.TimeSeriesQueries

/** A/B harness for the probe-planning choice (evidence for PLANS.md): the
  * memoized position-merging probe (one index join per distinct position,
  * see [[graft.engine.MemoProbe]]) vs the per-leg probe (one join per
  * avg/max leg per constraint — the pre-merge shape). Runs the q23-shaped
  * refined query end to end N times each way on SPARK_GRAFT_SF_DIR.
  *
  * Usage: runMain graft.ProbeBench [iters]
  */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val spec = QueryParser.parse(
      "SELECT time_id, offset IN_DOMAIN [1, 2000], [5, 30] FROM events.value " +
        "WHERE avg_amp() in [130, 140] MAX and " +
        "max_amp_excess_right(10) in [0, None] MAX LIMIT REFINED 25")
    val idx = TimeSeriesQueries.cachedIndex(spark, sfDir)
    val b = RefinementEngine.bindDomains(spec, idx.tMin, idx.tMax)

    // the pre-merge probe: one join per window leg (what SeriesOps.probe
    // compiled to before position memoization)
    def perLegProbe: WindowProbe = new WindowProbe {
      val tMinCol: Column = lit(idx.tMin)
      val tMaxCol: Column = lit(idx.tMax)
      def windowAgg(grid: DataFrame, a: Column, b: Column, tag: String,
          needAvg: Boolean, needMax: Boolean): DataFrame = {
        val g = SeriesOps.windowAgg(grid, idx, a, b, tag, needAvg, needMax)
        if (needAvg) g.drop(s"${tag}_sum", s"${tag}_cnt") else g
      }
    }

    def gridWith(p: WindowProbe): DataFrame = {
      var g = RefinementEngine.candidateGrid(spark, b, idx.tMax)
      spec.constraints.zipWithIndex.foreach { case (c, i) =>
        g = graft.engine.ConstraintRegistry(c.name)(g, p, c.args, s"c$i")
      }
      g.select((Seq("x", "lx") ++ spec.constraints.indices.map(i => s"c$i")).map(col): _*)
    }

    def time(label: String, mk: => DataFrame): Double = {
      mk.count() // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        RefinementEngine.refinedTopK(mk, spec, Some(25)).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(iters / 2)
      println(f"[probe-ab] $label%-10s median=$med%.3f s (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      med
    }

    val merged = time("merged", gridWith(SeriesOps.probe(idx)))
    val perLeg = time("per-leg", gridWith(perLegProbe))
    println(f"[probe-ab] per-leg/merged = ${perLeg / merged}%.2fx")
    spark.stop()
  }
}
