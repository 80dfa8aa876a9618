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
}
