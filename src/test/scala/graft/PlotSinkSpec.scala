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
}
