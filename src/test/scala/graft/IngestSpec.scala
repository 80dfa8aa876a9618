package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

class IngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("EMG loader drops 3 junk lines, reads header, assigns dense time_id") {
    val dir = Files.createTempDirectory("graft_emg")
    graft.cli.Cleanup.deleteOnExit(dir.toString)
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
    graft.cli.Cleanup.deleteOnExit(dir.toString)
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

  test("zip extraction routes single-csv to EMG and multi-csv to GAS") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    def mkZip(path: java.nio.file.Path, entries: (String, String)*): Unit = {
      val zos = new ZipOutputStream(Files.newOutputStream(path))
      try entries.foreach { case (name, body) =>
        zos.putNextEntry(new ZipEntry(name))
        zos.write(body.getBytes("UTF-8"))
        zos.closeEntry()
      } finally zos.close()
    }
    val dir = Files.createTempDirectory("graft_zip")
    graft.cli.Cleanup.deleteOnExit(dir.toString)
    mkZip(dir.resolve("a_emg.zip"),
      "emg.csv" -> "j1\nj2\nj3\ntimestamp,emg1\n100,1\n200,2\n",
      "nested/skip.csv" -> "x\n", // non-top-level members are skipped
      "readme.txt" -> "not a csv\n")
    mkZip(dir.resolve("b_gas.zip"),
      "20090101.csv" -> "Time (s),CO (ppm)\n0.25,10.0\n",
      "20090102.csv" -> "Time (s),CO (ppm)\n0.5,12.0\n")
    val ds = Ingest.unzipData(dir.toString)
    assert(ds.size == 2)
    assert(ds(0).singleCsv && ds(0).csvs == Seq("emg.csv"))
    assert(!ds(1).singleCsv && ds(1).csvs.sorted == Seq("20090101.csv", "20090102.csv"))
    val emg = Ingest.loadUnzipped(spark, ds(0))
    assert(emg.columns.toSeq == Seq("timestamp", "emg1", "time_id") &&
      emg.count() == 2)
    val gas = Ingest.loadUnzipped(spark, ds(1))
    assert(gas.columns.toSeq == Seq("Time", "CO", "Date", "time_id") &&
      gas.count() == 2)
  }

  test("catalog readout lists databases, views and columns like the reference") {
    import spark.implicits._
    Seq((1L, 2.0)).toDF("time_id", "flow_rate").createOrReplaceTempView("gas_data")
    val out = graft.sources.Catalog.readout(spark)
    assert(out.contains("table: gas_data (temporary)") ||
      out.contains("table: gas_data (temp)"), out)
    assert(out.contains("time_id: bigint") && out.contains("flow_rate: double"), out)
  }
}
