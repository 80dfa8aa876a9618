package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

class IngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("EMG loader drops 3 junk lines, reads header, assigns dense time_id") {
    val dir = Files.createTempDirectory("graft_emg")
    val f = dir.resolve("emg.csv")
    Files.writeString(f,
      "junk line 1\njunk 2\njunk 3\ntimestamp,emg1,emg2\n100,1,5\n200,2,6\n300,3,7\n")
    val df = Ingest.emgCsv(spark, f.toString)
    assert(df.columns.toSeq == Seq("timestamp", "emg1", "emg2", "time_id"))
    val rows = df.orderBy("time_id").collect()
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
  }

  test("GAS loader unions csvs, derives Date from filename, strips unit suffixes") {
    val dir = Files.createTempDirectory("graft_gas")
    Files.writeString(dir.resolve("20090102.csv"),
      "Time (s),CO (ppm)\n0.5,12.0\n1.5,13.0\n")
    Files.writeString(dir.resolve("20090101.csv"),
      "Time (s),CO (ppm)\n0.25,10.0\n1.25,11.0\n")
    val df = Ingest.gasCsvDir(spark, dir.toString)
    assert(df.columns.toSeq == Seq("Time", "CO", "Date", "time_id"))
    val rows = df.orderBy("time_id").collect()
    // sorted by (Date, Time): 0101 rows first, then 0102
    assert(rows.map(_.getLong(2)).toSeq == Seq(20090101L, 20090101L, 20090102L, 20090102L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(10.0, 11.0, 12.0, 13.0))
  }
}
