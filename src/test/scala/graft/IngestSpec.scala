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

  test("WARC reader: records split by magic, payloads cut by Content-Length, chaff filtered, torn records flagged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.sources.Warc
    val dir = Files.createTempDirectory("graft_warc_test").toString
    graft.cli.Cleanup.deleteOnExit(dir)
    // ids chosen to exercise every branch: 3 → +request chaff,
    // 17 → +metadata chaff, 19 → 404, 2 → plain 200
    val docs = Seq((2L, "plain body two"), (3L, "with request chaff"),
      (17L, "with metadata chaff"), (19L, "gone")).toDF("doc_id", "text")
    Warc.writeSyntheticWarc(docs, s"$dir/warc")
    val recs = Warc.records(spark, s"$dir/warc")
    val byType = recs.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("response" -> 4L, "request" -> 1L, "metadata" -> 1L))
    assert(recs.where(col("truncated")).count() == 0)
    // payload is CUT at Content-Length: no record separator bleeds in
    assert(recs.where(col("payload").contains("\r\n\r\nWARC")).count() == 0)
    val resp = Warc.httpResponses(recs).collect()
      .map(r => r.getAs[String]("uri") ->
        ((r.getAs[Int]("http_status"), r.getAs[String]("body")))).toMap
    assert(resp.size == 4, "chaff must not survive the response filter")
    assert(resp("http://src2.example.org/doc/2") ==
      ((200, "<html><head><title>page</title></head><body><p>" +
        "plain body two</p></body></html>")))
    assert(resp("http://src4.example.org/doc/19")._1 == 404)
    // a record whose Content-Length overruns the payload area is FLAGGED,
    // never silently bled into the next record
    val torn = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x.example/1\r\nContent-Length: 99\r\n\r\n" +
      "short\r\n\r\n"
    Files.write(java.nio.file.Paths.get(s"$dir/torn.warc"),
      torn.getBytes("US-ASCII"))
    val t = Warc.records(spark, s"$dir/torn.warc").collect().head
    assert(t.getAs[Boolean]("truncated"))
    // the round-16 strict walk: a payload CONTAINING the record magic
    // cuts clean at Content-Length (the walk counts, it never searches)
    val planted = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x.example/2\r\nContent-Length: 30\r\n\r\n" +
      "body with WARC/1.0\r\n inside it\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x.example/3\r\nContent-Length: 4\r\n\r\n" +
      "next\r\n\r\n"
    Files.write(java.nio.file.Paths.get(s"$dir/plant.warc"),
      planted.getBytes("US-ASCII"))
    val pr = Warc.records(spark, s"$dir/plant.warc")
      .orderBy("rec_idx").collect()
    assert(pr.length == 2 && !pr.exists(_.getAs[Boolean]("truncated")))
    assert(pr(0).getAs[String]("payload") == "body with WARC/1.0\r\n inside it")
    assert(pr(1).getAs[String]("payload") == "next")
    // the magic-split column plan survives as the executable spec twin:
    // row-identical to the walker on the well-formed ASCII fixture (its
    // stated validity class), and it OVER-SPLITS the planted container
    // the walker just read correctly
    val twin = Warc.recordsSplit(spark, s"$dir/warc")
    val walk = Warc.records(spark, s"$dir/warc")
    assert(twin.orderBy("file", "rec_idx").collect().toSeq ==
      walk.orderBy("file", "rec_idx").collect().toSeq)
    assert(Warc.recordsSplit(spark, s"$dir/plant.warc").count() == 3,
      "the spec twin must still show the over-split the walker closes")
  }

  test("gzip WARC reader: byte-exact Content-Length cuts on multi-byte payloads; member walk; torn + corrupt containers") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.sources.Warc
    val dir = Files.createTempDirectory("graft_warcgz_test").toString
    graft.cli.Cleanup.deleteOnExit(dir)
    // multi-byte text on every doc: byte length != char length is the
    // property the char-denominated text reader cannot represent
    val docs = Seq((2L, "héllo wörld 中文"), (3L, "chaff récord é"),
      (17L, "métadata €5"), (19L, "góne")).toDF("doc_id", "text")
    Warc.writeSyntheticWarcGz(docs, s"$dir/warc")
    val recs = Warc.recordsGz(spark, s"$dir/warc")
    val byType = recs.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("response" -> 4L, "request" -> 1L, "metadata" -> 1L))
    assert(recs.where(col("truncated")).count() == 0)
    // round-trip: the declared Content-Length is the PAYLOAD'S BYTE
    // length, strictly greater than its char length on every response
    // carrying multi-byte text
    val rows = recs.where(col("warc_type") === "response").collect()
    rows.foreach { r =>
      val payload = r.getAs[String]("payload")
      val cl = r.getAs[Long]("content_length")
      assert(cl ==
        payload.getBytes(java.nio.charset.StandardCharsets.UTF_8).length,
        s"byte-denominated length must survive the round-trip: $r")
    }
    assert(rows.exists(r => r.getAs[Long]("content_length") >
      r.getAs[String]("payload").length),
      "at least one payload must have byte length > char length")
    // the body decodes the multi-byte text intact
    val resp = Warc.httpResponses(recs).collect()
      .map(r => r.getAs[String]("uri") -> r.getAs[String]("body")).toMap
    assert(resp("http://src2.example.org/doc/2")
      .contains("héllo wörld 中文"))
    // a member whose Content-Length overruns its payload flags truncated
    def gzMember(s: String): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(buf)
      gz.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      gz.finish(); gz.close(); buf.toByteArray
    }
    val torn = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x.example/1\r\nContent-Length: 99\r\n\r\n" +
      "short\r\n\r\n"
    Files.write(java.nio.file.Paths.get(s"$dir/torn.warc.gz"), gzMember(torn))
    val t = Warc.recordsGz(spark, s"$dir/torn.warc.gz").collect().head
    assert(t.getAs[Boolean]("truncated"))
    // container corruption (no magic at a record boundary) fails LOUD —
    // the strict sequential walk never resynchronizes silently
    Files.write(java.nio.file.Paths.get(s"$dir/corrupt.warc.gz"),
      gzMember("GARBAGE\r\n\r\npayload\r\n\r\n"))
    val e = intercept[Exception] {
      Warc.recordsGz(spark, s"$dir/corrupt.warc.gz").collect()
    }
    assert((e.getMessage != null && e.getMessage.contains("magic")) ||
      Option(e.getCause).exists(c =>
        c.getMessage != null && c.getMessage.contains("magic")))
    // gzip FRAMING corruption is equally loud (round-16: the old
    // GZIPInputStream path treated a malformed next-member header as
    // silent EOF, dropping every subsequent record with no signal)
    def msgOf(e: Throwable): String =
      (Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString(" | "))
    val good = gzMember(
      "WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://x.example/9\r\nContent-Length: 2\r\n\r\n" +
        "ok\r\n\r\n")
    // (a) trailing garbage after the last member
    Files.write(java.nio.file.Paths.get(s"$dir/trail.warc.gz"),
      good ++ "not a gzip member".getBytes("US-ASCII"))
    val e2 = intercept[Exception] {
      Warc.recordsGz(spark, s"$dir/trail.warc.gz").collect()
    }
    assert(msgOf(e2).contains("gzip member magic"), msgOf(e2))
    // (b) a second member whose header is torn off mid-container
    Files.write(java.nio.file.Paths.get(s"$dir/cut.warc.gz"),
      good ++ good.take(good.length / 2))
    val e3 = intercept[Exception] {
      Warc.recordsGz(spark, s"$dir/cut.warc.gz").collect()
    }
    assert(msgOf(e3).nonEmpty)
    // (c) a flipped payload byte fails the member CRC
    val bad = good.clone()
    bad(bad.length - 12) = (bad(bad.length - 12) ^ 0x40).toByte
    Files.write(java.nio.file.Paths.get(s"$dir/crc.warc.gz"), bad)
    val e4 = intercept[Exception] {
      Warc.recordsGz(spark, s"$dir/crc.warc.gz").collect()
    }
    assert(msgOf(e4).contains("CRC32") || msgOf(e4).contains("corrupt deflate") ||
      msgOf(e4).contains("ISIZE") || msgOf(e4).contains("gzip member"),
      msgOf(e4))
    // binary-payload tier: bytes survive undecoded through
    // recordsGzBytes (UTF-8 round-trip of the multi-byte fixture)
    val binRows = Warc.recordsGzBytes(spark, s"$dir/warc")
      .where(col("warc_type") === "response").collect()
    assert(binRows.forall { r =>
      r.getAs[Long]("content_length") == r.getAs[Array[Byte]]("payload").length
    })
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
