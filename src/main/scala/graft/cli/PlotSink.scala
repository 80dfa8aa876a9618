package graft.cli

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result-plot sink (reference: server.py:901-952 draws the series as a line
  * plot plus one rectangle of width `offset` per result). Emitted as a
  * self-contained SVG (no imaging libraries in scope) — same information:
  * the y(t) polyline, and a translucent rectangle spanning
  * [time_id, time_id+offset] for every result pair.
  */
object PlotSink {

  /** Downsample a `(t, y)` series frame to at most `budget` plot points,
    * computed distributed (a grouped aggregate, collect of <= budget rows):
    * the series is bucketed on t and each bucket contributes its min-y and
    * max-y points — the visual envelope a pixel column can show anyway.
    * Series at or under the budget collect unchanged. This bounds the
    * driver's memory at O(budget) regardless of series size (the previous
    * full collect() OOMed the driver at scale). */
  def downsample(series: DataFrame, budget: Int = 4000): Seq[(Long, Double)] = {
    val b = series.agg(min("t"), max("t"), count(lit(1))).head()
    val n = b.getLong(2)
    if (n == 0) return Seq.empty
    val (tMin, tMax) = (b.getLong(0), b.getLong(1))
    if (n <= budget)
      return series.orderBy("t").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val buckets = math.max(1, budget / 2)
    val width = math.max(1L, (tMax - tMin) / buckets + 1)
    series
      .groupBy((((col("t") - lit(tMin)) / lit(width)).cast("long")).as("b"))
      .agg(min_by(struct(col("t"), col("y")), col("y")).as("lo"),
        max_by(struct(col("t"), col("y")), col("y")).as("hi"))
      .select(explode(array(col("lo"), col("hi"))).as("p"))
      .select(col("p.t"), col("p.y"))
      .distinct()
      .orderBy("t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  def svg(
      series: Seq[(Long, Double)],
      results: Seq[(Long, Long)],
      width: Int = 1200,
      height: Int = 400): String = {
    require(series.nonEmpty, "empty series")
    val (tMin, tMax) = (series.map(_._1).min, series.map(_._1).max)
    val (yMin, yMax) = (series.map(_._2).min, series.map(_._2).max)
    val ySpan = if (yMax - yMin == 0) 1.0 else yMax - yMin
    val tSpan = math.max(1L, tMax - tMin)
    def px(t: Long): Double = (t - tMin).toDouble / tSpan * (width - 40) + 20
    def py(y: Double): Double = height - 20 - (y - yMin) / ySpan * (height - 40)

    val line = series.sortBy(_._1)
      .map { case (t, y) => f"${px(t)}%.1f,${py(y)}%.1f" }.mkString(" ")
    val rects = results.map { case (x, lx) =>
      f"""<rect x="${px(x)}%.1f" y="20" width="${math.max(1.0, px(x + lx) - px(x))}%.1f" """ +
        f"""height="${height - 40}" class="res"/>"""
    }.mkString("\n  ")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height">
       |  <style>.res { fill: #2a7fff; fill-opacity: 0.25; stroke: #2a7fff; }</style>
       |  <polyline points="$line" fill="none" stroke="#333" stroke-width="1"/>
       |  $rects
       |</svg>
       |""".stripMargin
  }

  def save(path: String, series: Seq[(Long, Double)], results: Seq[(Long, Long)]): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), svg(series, results))

  /** The reference's scalability chart
    * (scalability_experiment_plotting.py:55-62): per-phase durations
    * stacked over the sweep's grid size, with legend, axis labels and a
    * light grid — emitted as a self-contained SVG like [[svg]].
    * `phases` are (name, seconds-per-x) bottom-up. */
  def sweepSvg(
      xs: Seq[Long],
      phases: Seq[(String, Seq[Double])],
      title: String,
      width: Int = 900,
      height: Int = 480): String = {
    require(xs.nonEmpty && phases.nonEmpty, "empty sweep")
    require(phases.forall(_._2.length == xs.length), "ragged phase series")
    val palette = Seq("#FAF3DD", "#C8D5B9", "#8FC0A9", "#68B0AB",
      "#696D7D", "#243E36", "#086788")
    val (l, r, top, bot) = (70, 20, 50, 50)
    val cum = phases.map(_._2).scanLeft(Seq.fill(xs.length)(0.0)) {
      (acc, p) => acc.lazyZip(p).map(_ + _)
    }
    val yMax = math.max(1e-9, cum.last.max)
    val xMin = xs.min.toDouble
    val xSpan = math.max(1.0, (xs.max - xs.min).toDouble)
    def px(x: Long): Double = (x - xMin) / xSpan * (width - l - r) + l
    def py(y: Double): Double = height - bot - y / yMax * (height - top - bot)
    val bands = phases.indices.map { i =>
      val lower = xs.lazyZip(cum(i)).map { case (x, y) => f"${px(x)}%.1f,${py(y)}%.1f" }
      val upper = xs.lazyZip(cum(i + 1)).map { case (x, y) => f"${px(x)}%.1f,${py(y)}%.1f" }
      val pts = (lower ++ upper.reverse).mkString(" ")
      s"""<polygon points="$pts" fill="${palette(i % palette.length)}" stroke="#555" stroke-width="0.5"/>"""
    }.mkString("\n  ")
    val yTicks = (0 to 4).map { i =>
      val v = yMax * i / 4
      f"""<line x1="$l" y1="${py(v)}%.1f" x2="${width - r}" y2="${py(v)}%.1f" stroke="grey" stroke-width="0.5" stroke-dasharray="4 3"/>
         |  <text x="${l - 8}" y="${py(v) + 4}%.1f" text-anchor="end" font-size="11">$v%.1f</text>""".stripMargin
    }.mkString("\n  ")
    val xTicks = xs.map { x =>
      f"""<text x="${px(x)}%.1f" y="${height - bot + 16}" text-anchor="middle" font-size="11">$x</text>"""
    }.mkString("\n  ")
    val legend = phases.zipWithIndex.map { case ((name, _), i) =>
      val y = top + 8 + i * 16
      s"""<rect x="${l + 10}" y="$y" width="12" height="12" fill="${palette(i % palette.length)}" stroke="#555" stroke-width="0.5"/>
         |  <text x="${l + 27}" y="${y + 10}" font-size="11">$name</text>""".stripMargin
    }.mkString("\n  ")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" font-family="sans-serif">
       |  <text x="${width / 2}" y="20" text-anchor="middle" font-size="14" font-weight="bold">$title</text>
       |  $yTicks
       |  $bands
       |  $xTicks
       |  $legend
       |  <text x="${width / 2}" y="${height - 8}" text-anchor="middle" font-size="12">No. of Decision Variable combinations</text>
       |  <text x="16" y="${height / 2}" text-anchor="middle" font-size="12" transform="rotate(-90 16 ${height / 2})">Time (sec)</text>
       |</svg>
       |""".stripMargin
  }

  /** Parse a `graft.Sweep` CSV (iter, <xCol>, phase1_s.., total_s) into the
    * [[sweepSvg]] inputs: x values + per-phase series (total excluded —
    * it's the stack's envelope, not a band). */
  def parseSweepCsv(lines: Seq[String], xCol: String = "udf_size")
      : (Seq[Long], Seq[(String, Seq[Double])]) = {
    val header = lines.head.split(",").map(_.trim)
    val xi = header.indexOf(xCol)
    require(xi >= 0, s"no $xCol column in ${header.mkString(",")}")
    val phaseIdx = header.zipWithIndex
      .filter { case (h, _) => h.endsWith("_s") && h != "total_s" }
    val rows = lines.tail.filter(_.nonEmpty).map(_.split(",").map(_.trim))
    val xs = rows.map(_(xi).toLong)
    val phases = phaseIdx.toSeq.map { case (h, i) =>
      h.stripSuffix("_s") -> rows.map(_(i).toDouble)
    }
    (xs, phases)
  }
}

/** CSV -> SVG sweep-chart generator: the parquet-world analogue of the
  * reference's `scalability_experiment_plotting.py`. Plain JVM — the sweep
  * CSV is already a tiny committed artifact. */
object SweepPlot {
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("bench/sweep_sf0.01.csv")
    val out = if (args.length > 1) args(1) else in.stripSuffix(".csv") + ".svg"
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(in))
    val (xs, phases) = PlotSink.parseSweepCsv(scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala.toSeq)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      PlotSink.sweepSvg(xs, phases, s"Scalability of recorded durations ($in)"))
    println(s"wrote $out")
  }
}
