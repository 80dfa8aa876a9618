package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.PlotSink

class PlotSinkSpec extends AnyFunSuite {

  test("svg plot contains the series polyline and one rect per result") {
    val series = (1L to 50L).map(t => (t, math.sin(t * 0.3) * 5 + 10))
    val results = Seq((5L, 8L), (30L, 4L))
    val svg = PlotSink.svg(series, results)
    assert(svg.contains("<polyline"))
    assert("<rect ".r.findAllIn(svg).size == 2)
    assert(svg.startsWith("<svg"))
    // flat series must not divide by zero
    val flat = PlotSink.svg((1L to 5L).map(t => (t, 1.0)), Nil)
    assert(flat.contains("<polyline"))
  }

  test("save writes the file") {
    val p = java.nio.file.Files.createTempFile("graft_plot", ".svg")
    PlotSink.save(p.toString, Seq((1L, 1.0), (2L, 2.0)), Seq((1L, 1L)))
    assert(java.nio.file.Files.readString(p).contains("</svg>"))
  }

  test("downsample bounds a 10^6-row series to the point budget, keeps envelope") {
    val spark = TestSpark.spark
    import spark.implicits._
    val n = 1000000
    // y has a single extreme spike the envelope must preserve
    val series = spark.range(1, n + 1).selectExpr(
      "id as t",
      "case when id = 777777 then 999.0 else sin(id * 0.001) * 10 end as y")
    val pts = PlotSink.downsample(series, budget = 4000)
    assert(pts.size <= 4000, s"got ${pts.size} points")
    assert(pts.size > 1000, s"got only ${pts.size} points")
    assert(pts.exists(p => p._1 == 777777L && p._2 == 999.0), "spike lost")
    assert(pts == pts.sortBy(_._1), "points must be t-ordered")
    // small series collect unchanged
    val small = (1L to 10L).map(t => (t, t * 1.0)).toDF("t", "y")
    assert(PlotSink.downsample(small, 4000) == (1L to 10L).map(t => (t, t * 1.0)))
    // and the svg renders from the downsampled points
    assert(PlotSink.svg(pts, Seq((5L, 100L))).contains("<polyline"))
  }

  test("sweep chart stacks one band per phase from the sweep CSV") {
    val csv = Seq(
      "iter,udf_size,fix_domains_s,index_s,grid_s,refine_s,total_s",
      "0,60,0.1,0.5,1.0,0.4,2.0",
      "1,780,0.0,0.3,1.2,0.5,2.0",
      "2,39060,0.0,0.3,1.5,0.6,2.4")
    val (xs, phases) = PlotSink.parseSweepCsv(csv)
    assert(xs == Seq(60L, 780L, 39060L))
    assert(phases.map(_._1) == Seq("fix_domains", "index", "grid", "refine"))
    val svg = PlotSink.sweepSvg(xs, phases, "test sweep")
    assert("<polygon".r.findAllIn(svg).size == 4, svg.take(500))
    assert(svg.contains("Time (sec)") && svg.contains("Decision Variable"))
    assert(svg.contains("refine") && svg.contains("39060"))
    // the committed sweep artifact parses and renders too
    val committed = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("bench/sweep_sf0.01.csv"))
    import scala.jdk.CollectionConverters._
    val (cx, cp) = PlotSink.parseSweepCsv(committed.asScala.toSeq)
    assert(cx.nonEmpty && cp.nonEmpty)
    assert(PlotSink.sweepSvg(cx, cp, "sweep").contains("<polygon"))
  }
}
