package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, GraftShims, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record source — crawl stage-zero's actual input
  * format (the round-13 verdict's gap: the URL → blocklist → strip →
  * boilerplate chain existed, but started from a parquet `documents`
  * table; real crawls arrive as WARC containers).
  *
  * Scale shape: the FILE is the parallelism unit — `binaryFile` yields
  * one row per WARC container and the record walk is a per-file
  * flatMap over it, so a 100 TB crawl parallelizes across its ~100k
  * containers with zero exchanges before the first filter (the same
  * per-file task model production WARC readers use). Task memory is
  * O(container COMPRESSED size + one record): the gzip members decode
  * as a STREAM ([[GunzipMembers]]) and the walker holds one record's
  * payload at a time — the round-15 gunzip-to-one-array shape, which
  * capped uncompressed containers at the JVM's 2 GB array limit, is
  * gone (real ~1 GB `.warc.gz` containers decompress to 4–5 GB).
  *
  * Parse contract (the STRICT sequential walk, shared by the
  * uncompressed and gzip readers since round 16):
  *  - records are walked in order; each must start with the
  *    `WARC/1.0\r\n` magic (a payload CONTAINING the magic never
  *    over-splits — the walk counts, it never searches);
  *  - the payload is cut by `Content-Length` in BYTES (the ISO 28500
  *    denomination); a payload shorter than its declared length
  *    surfaces as `truncated = true` and ends the file;
  *  - a missing magic, unterminated header block, absent
  *    Content-Length, per-record payload above [[MaxRecordBytes]], or
  *    missing record separator fails the task LOUD (container
  *    corruption is not a row-level condition);
  *  - gzip-framing corruption is equally loud: members decode one by
  *    one with CRC32 + ISIZE verified per member and any undecodable
  *    or trailing bytes raise — the `java.util.zip.GZIPInputStream`
  *    silent-EOF-on-malformed-next-member behavior (which dropped
  *    every record after the corruption with no signal) is designed
  *    out.
  *
  * Column shape: [[records]]/[[recordsGz]] decode `payload` as UTF-8
  * (the text-pipeline frame); [[recordsGzBytes]] returns the undecoded
  * BYTES so binary payloads (images inside a crawl) reach
  * [[graft.operators.Multimodal]]'s per-format decode kernels intact.
  *
  * The reference has no crawl sources (csv/zip only,
  * `db_preparation.py`); this extends [[Ingest]] the way the jsonl
  * source did. */
object Warc {

  private val Magic = "WARC/1.0\r\n"
  private val HdrEnd = "\r\n\r\n"
  private val MagicB = Magic.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val SepB = HdrEnd.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Per-record payload cap: a `Content-Length` above this fails the
    * task loud instead of attempting the allocation — records are
    * bounded by their container and production crawls cap containers
    * at ~1 GB, so a larger declared length is corruption, not data. */
  val MaxRecordBytes: Long = 1L << 30

  /** Header-block cap for the same reason: WARC headers are a few
    * hundred bytes; a megabyte without the blank line is a walk off
    * the rails. */
  private val MaxHeaderBytes = 1 << 20

  /** One decoded WARC record row — `content_length` BYTE-denominated
    * (the ISO 28500 contract), `payload` the UTF-8 decode of exactly
    * those bytes. PUBLIC: the Dataset encoder's generated code
    * instantiates it — a private class fails janino compilation and
    * the whole scan falls back to interpreted serialization
    * (CodegenGuard trips). */
  case class WarcRec(file: String, rec_idx: Long, warc_type: String,
      uri: String, content_length: Long, payload: String, truncated: Boolean)

  /** [[WarcRec]] with the payload UNDECODED — the binary-column frame
    * ([[recordsGzBytes]]) that hands image/audio payloads to
    * [[graft.operators.Multimodal]] byte-intact. */
  case class WarcRecBin(file: String, rec_idx: Long, warc_type: String,
      uri: String, content_length: Long, payload: Array[Byte],
      truncated: Boolean)

  /** Streaming decoder for a CONCATENATED-member gzip container (RFC
    * 1952; member-per-record is the Common Crawl layout). Reads the
    * compressed array member by member through one `Inflater`, so the
    * uncompressed container is never materialized — the consumer pulls
    * bytes and memory stays O(compressed input + inflate buffer).
    *
    * FAIL-LOUD framing (the round-15 ADVICE items): every member's
    * CRC32 and ISIZE trailer is verified, a malformed member header
    * mid-container raises (instead of `GZIPInputStream`'s silent
    * treat-as-EOF, which dropped every subsequent record with no
    * signal), and EOF is only reached when ALL container bytes were
    * consumed — trailing undecoded garbage raises too. */
  private final class GunzipMembers(gz: Array[Byte], file: String)
      extends java.io.InputStream {
    private var pos = 0
    private var bodyStart = 0
    private var inf: java.util.zip.Inflater = null
    private val crc = new java.util.zip.CRC32
    private var memberOut = 0L
    private val one = new Array[Byte](1)

    private def u8(i: Int): Int = {
      require(i >= 0 && i < gz.length,
        s"$file: truncated gzip member framing (need byte $i of ${gz.length})")
      gz(i) & 0xff
    }
    private def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)

    /** Parse one member header at `pos` (magic, CM=deflate, optional
      * FEXTRA/FNAME/FCOMMENT/FHCRC fields) and arm the inflater on its
      * body. False only at exact end-of-container. */
    private def openMember(): Boolean = {
      if (pos == gz.length) return false
      require(u8(pos) == 0x1f && u8(pos + 1) == 0x8b,
        s"$file: no gzip member magic at byte $pos — " +
          "malformed member framing or trailing garbage")
      require(u8(pos + 2) == 8,
        s"$file: unsupported gzip compression method ${u8(pos + 2)}")
      val flg = u8(pos + 3)
      var p = pos + 10
      if ((flg & 4) != 0) { val xlen = u8(p) | (u8(p + 1) << 8); p += 2 + xlen }
      if ((flg & 8) != 0) { while (u8(p) != 0) p += 1; p += 1 }
      if ((flg & 16) != 0) { while (u8(p) != 0) p += 1; p += 1 }
      if ((flg & 2) != 0) p += 2
      bodyStart = p
      pos = p
      inf = new java.util.zip.Inflater(true)
      inf.setInput(gz, bodyStart, gz.length - bodyStart)
      crc.reset(); memberOut = 0L
      true
    }

    private def closeMember(): Unit = {
      pos = bodyStart + inf.getBytesRead.toInt
      inf.end(); inf = null
      require(le32(pos) == crc.getValue,
        s"$file: gzip member CRC32 mismatch at byte $pos")
      require(le32(pos + 4) == (memberOut & 0xffffffffL),
        s"$file: gzip member ISIZE mismatch at byte ${pos + 4}")
      pos += 8
    }

    override def read(): Int = {
      val n = read(one, 0, 1)
      if (n <= 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (inf == null && !openMember()) return -1
        val n =
          try inf.inflate(b, off, len)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"$file: corrupt deflate data in member at byte $bodyStart", e)
          }
        if (n > 0) { crc.update(b, off, n); memberOut += n; return n }
        if (inf.finished()) closeMember()
        else require(!inf.needsInput() && !inf.needsDictionary(),
          s"$file: truncated deflate stream (container cut mid-member)")
      }
      -1 // unreachable
    }
  }

  /** The strict sequential record walk over an uncompressed byte
    * stream — one record's payload in memory at a time (see the parse
    * contract in the object scaladoc). Iterator-lazy so the flatMap
    * pipeline never holds more than the current record. */
  private final class RecordWalker(in: java.io.InputStream, file: String)
      extends Iterator[WarcRecBin] {
    private val ClRe = "(?m)^Content-Length: ([0-9]+)\r?$".r
    private val TyRe = "(?m)^WARC-Type: ([a-z]+)\r?$".r
    private val UriRe = "(?m)^WARC-Target-URI: (\\S+)\r?$".r
    private var idx = 0L
    private var consumed = 0L // container-relative byte position (uncompressed)
    private var done = false
    private var pending: WarcRecBin = null

    private def readFully(b: Array[Byte], off: Int, len: Int): Int = {
      var got = 0
      while (got < len) {
        val r = in.read(b, off + got, len - got)
        if (r < 0) return got
        got += r
      }
      got
    }

    /** Header block: bytes after the magic up to (excluding) the blank
      * line; loud past [[MaxHeaderBytes]] or at EOF before the blank
      * line. */
    private def readHeaderBlock(): String = {
      val buf = new java.io.ByteArrayOutputStream(256)
      var tail = 0 // how many of SepB's leading bytes the buffer currently ends with
      while (tail < SepB.length) {
        val b = in.read()
        require(b >= 0,
          s"$file: unterminated header block in record $idx")
        require(buf.size < MaxHeaderBytes,
          s"$file: header block in record $idx exceeds $MaxHeaderBytes bytes")
        buf.write(b)
        tail = if (b == SepB(tail)) tail + 1
        else if (b == SepB(0)) 1
        else 0
      }
      consumed += buf.size
      val all = buf.toByteArray
      new String(all, 0, all.length - SepB.length,
        java.nio.charset.StandardCharsets.UTF_8)
    }

    private def advance(): Unit = {
      if (done || pending != null) return
      val head = new Array[Byte](MagicB.length)
      val got0 = readFully(head, 0, 1)
      if (got0 == 0) { done = true; return } // clean EOF at a record boundary
      val gotRest = readFully(head, 1, MagicB.length - 1)
      require(gotRest == MagicB.length - 1 &&
        java.util.Arrays.equals(head, MagicB),
        s"$file: no WARC/1.0 magic at byte $consumed (record ${idx + 1})")
      consumed += MagicB.length
      idx += 1
      val hdrs = readHeaderBlock()
      val cl = ClRe.findFirstMatchIn(hdrs).map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(
          s"$file: record $idx has no Content-Length"))
      require(cl <= MaxRecordBytes,
        s"$file: record $idx declares $cl payload bytes " +
          s"(cap $MaxRecordBytes) — corrupt length")
      val warcType = TyRe.findFirstMatchIn(hdrs).map(_.group(1)).getOrElse("")
      val uri = UriRe.findFirstMatchIn(hdrs).map(_.group(1)).getOrElse("")
      val want = cl.toInt
      val payload = new Array[Byte](want)
      val got = readFully(payload, 0, want)
      consumed += got
      val truncated = got < want
      val cut = if (truncated) java.util.Arrays.copyOf(payload, got) else payload
      if (truncated) done = true // the old array walk's "ends the file"
      else {
        val sep = new Array[Byte](SepB.length)
        val sgot = readFully(sep, 0, SepB.length)
        require(sgot == SepB.length && java.util.Arrays.equals(sep, SepB),
          s"$file: record $idx missing its record separator")
        consumed += SepB.length
      }
      pending = WarcRecBin(file, idx, warcType, uri, cl, cut, truncated)
    }

    override def hasNext: Boolean = { advance(); pending != null }
    override def next(): WarcRecBin = {
      advance()
      require(pending != null, s"$file: next() past end of container")
      val r = pending; pending = null; r
    }
  }

  /** Shared reader core: one [[WarcRecBin]] per record across every
    * container matched by `glob`, walked strictly (`gunzip = true`
    * streams RFC 1952 members first). Map-only — one binaryFile scan,
    * zero exchanges (PlanSpec pins it). */
  private def recordsBin(spark: SparkSession, glob: String,
      gunzip: Boolean): Dataset[WarcRecBin] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, raw) =>
        val in: java.io.InputStream =
          if (gunzip) new GunzipMembers(raw, file)
          else new java.io.ByteArrayInputStream(raw)
        new RecordWalker(in, file): Iterator[WarcRecBin]
      }
  }

  /** UTF-8 decode of the payload bytes with REPLACEMENT semantics
    * (invalid sequences → U+FFFD, `java.lang.String`'s behavior) — the
    * text tier must keep walking a container whose OTHER records are
    * binary (Spark's `decode` expression throws
    * MALFORMED_CHARACTER_CODING on the first image payload; lossy
    * decode of non-text records is this tier's documented contract,
    * [[recordsGzBytes]] is the lossless path). */
  private def decoded(recs: Dataset[WarcRecBin]): DataFrame = {
    val spark = recs.sparkSession
    import spark.implicits._
    recs.map(r => WarcRec(r.file, r.rec_idx, r.warc_type, r.uri,
        r.content_length,
        new String(r.payload, java.nio.charset.StandardCharsets.UTF_8),
        r.truncated))
      .toDF()
  }

  /** One row per WARC record across every uncompressed container
    * matched by `glob`: `(file, rec_idx, warc_type, uri,
    * content_length, payload, truncated)`, payload decoded as UTF-8.
    * Since round 16 this runs the SAME strict byte walker as
    * [[recordsGz]] (minus the gunzip) — the former regex-split plan's
    * documented magic-in-payload over-split is gone; that plan
    * survives as the executable spec twin [[recordsSplit]]. */
  def records(spark: SparkSession, glob: String): DataFrame =
    decoded(recordsBin(spark, glob, gunzip = false))

  /** BYTE-EXACT gzip WARC reader — the real-crawl container shape.
    * One row per record across every `.warc.gz` matched by `glob`,
    * same schema as [[records]]. See the object scaladoc for the walk
    * and framing contract; non-text payloads survive positionally but
    * decode lossily here — use [[recordsGzBytes]] for them. */
  def recordsGz(spark: SparkSession, glob: String): DataFrame =
    decoded(recordsBin(spark, glob, gunzip = true))

  /** [[recordsGz]] with the payload UNDECODED (`payload: binary`) —
    * the frame that routes in-crawl binary payloads (images, audio) to
    * [[graft.operators.Multimodal]]'s per-format kernels without a
    * lossy UTF-8 round-trip (the round-15 verdict's ask 2). */
  def recordsGzBytes(spark: SparkSession, glob: String): DataFrame =
    recordsBin(spark, glob, gunzip = true).toDF()

  /** COLUMN-PLAN SPEC TWIN of [[records]] (the original round-14
    * reader, kept as an executable spec the way the `*Hof` twins pin
    * the native kernels): locate records by splitting on the magic,
    * cut by Content-Length in CHARACTERS. Correct only for ASCII
    * containers whose payloads never contain the magic — IngestSpec
    * pins it row-identical to [[records]] on exactly that fixture
    * class, and the strict walker exists because real containers
    * violate both assumptions. */
  def recordsSplit(spark: SparkSession, glob: String): DataFrame = {
    val raw = spark.read.format("binaryFile").load(glob)
      .select(col("path").as("file"), decode(col("content"), "UTF-8").as("__t"))
    val recs = raw
      .select(col("file"),
        posexplode(split(col("__t"), java.util.regex.Pattern.quote(Magic))))
      .where(col("pos") > 0)
      .select(col("file"), col("pos").cast("long").as("rec_idx"),
        col("col").as("__rec"))
    val hdrs = substring_index(col("__rec"), HdrEnd, 1)
    val rest = expr(
      s"substring(__rec, length(substring_index(__rec, '\\r\\n\\r\\n', 1)) + 5)")
    val cl = regexp_extract(hdrs, "Content-Length: ([0-9]+)", 1).cast("long")
    recs.select(
      col("file"), col("rec_idx"),
      regexp_extract(hdrs, "WARC-Type: ([a-z]+)", 1).as("warc_type"),
      regexp_extract(hdrs, "WARC-Target-URI: (\\S+)", 1).as("uri"),
      cl.as("content_length"),
      substr(rest, lit(1), cl).as("payload"),
      (length(rest) < cl).as("truncated"))
  }

  /** The HTTP tier over [[records]]: response records only, with the
    * status code, the Content-Type header, and the BODY (payload past
    * the HTTP header block) split out — the frame the stage-zero chain
    * (URL canonicalize → blocklist → [[graft.operators.TextOps
    * .stripHtml]] → boilerplate) consumes. Map-only. */
  def httpResponses(recs: DataFrame): DataFrame = {
    val p = col("payload")
    val httpHdrs = substring_index(p, HdrEnd, 1)
    val body = expr(
      "substring(payload, " +
        "length(substring_index(payload, '\\r\\n\\r\\n', 1)) + 5)")
    recs.where(col("warc_type") === "response")
      .select(col("file"), col("rec_idx"), col("uri"),
        regexp_extract(p, "^HTTP/1\\.[01] ([0-9]{3})", 1).cast("int")
          .as("http_status"),
        regexp_extract(httpHdrs, "Content-Type: ([^\\r\\n]+)", 1)
          .as("content_type"),
        body.as("body"),
        col("truncated"))
  }

  /** One row of [[httpResponseBytes]] — status/Content-Type parsed
    * from the ASCII HTTP header block, `body` the raw bytes after it
    * (PUBLIC for janino, the [[WarcRec]] rule). */
  case class HttpRespBin(file: String, rec_idx: Long, uri: String,
      http_status: Int, content_type: String, body: Array[Byte],
      truncated: Boolean)

  /** The HTTP tier over [[recordsGzBytes]]: like [[httpResponses]] but
    * the body stays BINARY — the header block is ASCII by RFC 9112 so
    * it parses from the bytes directly, and the payload past it is
    * handed on untouched (an image body survives byte-exact). The
    * header/body split is byte work (find the first CRLFCRLF), the
    * same per-record imperative seam as the walk itself. */
  def httpResponseBytes(recs: DataFrame): DataFrame = {
    val spark = recs.sparkSession
    import spark.implicits._
    val StRe = "^HTTP/1\\.[01] ([0-9]{3})".r
    val CtRe = "(?m)^Content-Type: ([^\r\n]+)".r
    recs.where(col("warc_type") === "response")
      .select(col("file"), col("rec_idx"), col("uri"), col("payload"),
        col("truncated"))
      .as[(String, Long, String, Array[Byte], Boolean)]
      .map { case (file, recIdx, uri, payload, truncated) =>
        var sep = -1
        var i = 0
        while (sep < 0 && i + SepB.length <= payload.length) {
          if (java.util.Arrays.equals(payload, i, i + SepB.length,
            SepB, 0, SepB.length)) sep = i
          else i += 1
        }
        val hdrLen = if (sep < 0) payload.length else sep
        val hdrs = new String(payload, 0, hdrLen,
          java.nio.charset.StandardCharsets.US_ASCII)
        val body =
          if (sep < 0) Array.emptyByteArray
          else java.util.Arrays.copyOfRange(payload, sep + SepB.length,
            payload.length)
        HttpRespBin(file, recIdx, uri,
          StRe.findFirstMatchIn(hdrs).map(_.group(1).toInt).getOrElse(0),
          CtRe.findFirstMatchIn(hdrs).map(_.group(1)).getOrElse(""),
          body, truncated)
      }
      .toDF()
  }

  /** One WARC record as a STRING column expression: headers + blank
    * line + payload + record separator. `Content-Length` is derived
    * in-plan from the payload itself — in CHARACTERS for the ASCII
    * fixture ([[writeSyntheticWarc]], where octet == char) or in BYTES
    * for the gzip fixture ([[writeSyntheticWarcGz]], the ISO 28500
    * denomination). */
  private def record(warcType: String, uri: Column, payload: Column,
      byteLengths: Boolean = false): Column =
    concat(
      lit(Magic),
      lit(s"WARC-Type: $warcType\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      lit("Content-Length: "),
      (if (byteLengths) octet_length(encode(payload, "UTF-8"))
       else length(payload)).cast("string"),
      lit("\r\n\r\n"),
      payload, lit("\r\n\r\n"))

  /** One WARC record as a BINARY column expression — the variant that
    * carries an arbitrary-byte payload (in-crawl images): header bytes
    * ++ payload bytes ++ separator, Content-Length = the payload's
    * byte count (`length` on a binary column counts bytes). Everything
    * stays in-plan; only the container framing below is imperative. */
  def recordBinCol(warcType: Column, uri: Column, payload: Column): Column =
    concat(
      encode(concat(
        lit(Magic),
        lit("WARC-Type: "), warcType, lit("\r\n"),
        lit("WARC-Target-URI: "), uri, lit("\r\n"),
        lit("Content-Length: "), length(payload).cast("string"),
        lit("\r\n\r\n")), "UTF-8"),
      payload,
      encode(lit(HdrEnd), "UTF-8"))

  /** Container writer core: one file per non-empty partition under
    * `path`, each input row framed per `frame`. Executor tasks build
    * their FileSystem from the SESSION's Hadoop configuration
    * (broadcast via [[GraftShims.serializableHadoopConf]]) — a bare
    * `new Configuration()` would silently drop `spark.hadoop.*`
    * settings (the round-15 ADVICE item). */
  private def writeContainers(rows: Dataset[Array[Byte]], path: String,
      ext: String)(frame: Array[Byte] => Array[Byte]): Unit = {
    val spark = rows.sparkSession
    val confOf = GraftShims.serializableHadoopConf(spark)
    val root = new org.apache.hadoop.fs.Path(path)
    val fsRoot = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsRoot.exists(root)) fsRoot.delete(root, true)
    fsRoot.mkdirs(root)
    rows.foreachPartition { (it: Iterator[Array[Byte]]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.get().partitionId()
        val p = new org.apache.hadoop.fs.Path(
          s"$path/part-%05d$ext".format(pid))
        val os = p.getFileSystem(confOf()).create(p, true)
        try it.foreach(rec => os.write(frame(rec)))
        finally os.close()
      }
    }
  }

  /** Write pre-framed record rows (`value: binary`, one full WARC
    * record each — [[recordBinCol]] / `encode(record(...))` output) as
    * member-per-record `.warc.gz` containers, one per partition: each
    * row compresses as its own gzip member, members concatenated (the
    * Common Crawl layout; members are the record-level random-access
    * seam real WARC indexes point into). */
  def writeWarcGzRows(rows: DataFrame, path: String): Unit = {
    val spark = rows.sparkSession
    import spark.implicits._
    writeContainers(rows.select(col("value")).as[Array[Byte]], path,
      ".warc.gz") { rec =>
      val buf = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(buf)
      gz.write(rec)
      gz.finish(); gz.close()
      buf.toByteArray
    }
  }

  /** Deterministic synthetic WARC fixture from the `documents` table —
    * the gate input for q239 (and IngestSpec): per ASCII document, a
    * RESPONSE record whose HTTP body wraps the text in the q215-style
    * HTML shell; every 3rd doc also emits a REQUEST record and every
    * 17th a METADATA record (the non-response chaff the filter must
    * drop); every 19th response is a 404 whose body the status gate
    * screens. ASCII-only documents keep byte and char lengths equal
    * (see the parse contract). Containers are written byte-exact
    * (records concatenated, nothing between them) — the strict walker
    * requires it, where the old `.text` writer's row separators only
    * suited the magic-split spec twin.
    *
    * Magic-in-payload plant (round-16): every response body whose
    * doc_id ≡ 0 (mod 23) carries a literal `WARC/1.0` + CRLF inside
    * its HTML — the strict walk cuts straight through it by
    * Content-Length, while [[recordsSplit]] would over-split there
    * (the documented trade the walker closes; q239 gates the walk
    * against an oracle that replays the plant inside the body). */
  def writeSyntheticWarc(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ascii = docs.where(col("text").isNotNull &&
      octet_length(encode(col("text"), "UTF-8")) === length(col("text")))
    // a caller-provided `url` column wins (the q241 crawl-to-corpus
    // fixture plants cosmetic refetch variants); default derivation
    // otherwise (the q239 layout)
    val url = if (docs.columns.contains("url")) col("url")
    else concat(lit("http://src"),
      pmod(col("doc_id"), lit(5)).cast("string"),
      lit(".example.org/doc/"), col("doc_id").cast("string"))
    val html = concat(
      lit("<html><head><title>page</title></head><body><p>"), col("text"),
      when(pmod(col("doc_id"), lit(23)) === 0,
        lit(s" see $Magic archived")).otherwise(lit("")),
      lit("</p></body></html>"))
    val respPayload = when(pmod(col("doc_id"), lit(19)) === 0,
      lit("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body>not found</body></html>"))
      .otherwise(concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html))
    val entry = concat(
      when(pmod(col("doc_id"), lit(3)) === 0,
        record("request", url,
          concat(lit("GET /doc/"), col("doc_id").cast("string"),
            lit(" HTTP/1.1\r\nHost: example.org\r\n"))))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(17)) === 0,
        record("metadata", url, lit("fetchTimeMs: 7\r\n")))
        .otherwise(lit("")),
      record("response", url, respPayload))
    writeContainers(
      ascii.select(encode(entry, "UTF-8").as("value")).as[Array[Byte]],
      path, ".warc")(identity)
  }

  /** Deterministic synthetic `.warc.gz` fixture — the [[recordsGz]]
    * gate input (q246 and IngestSpec): the [[writeSyntheticWarc]]
    * record layout (response per doc, request chaff every 3rd,
    * metadata every 17th, 404s every 19th) with the two properties the
    * real-container reader must prove it handles and the text fixture
    * cannot express:
    *
    *  - NO ASCII restriction — every non-null document participates,
    *    and callers plant multi-byte text so `Content-Length` (BYTES,
    *    via `octet_length`) visibly disagrees with the char length;
    *  - MEMBER-PER-RECORD GZIP — each record compresses as its own
    *    gzip member, members concatenated into one `.warc.gz` per
    *    partition.
    *
    * No magic plant here ([[writeSyntheticWarc]] carries it): q246's
    * oracle replays every body byte-for-byte and the multi-byte plant
    * is this fixture's own discriminating property. */
  def writeSyntheticWarcGz(docs: DataFrame, path: String): Unit =
    writeWarcGzRows(syntheticWarcGzRows(docs), path)

  /** The [[writeSyntheticWarcGz]] record rows as pre-framed BINARY
    * `value` rows — exposed so composite fixtures (q241's container
    * with in-crawl image records) can union extra [[recordBinCol]]
    * rows into ONE container write. */
  def syntheticWarcGzRows(docs: DataFrame): DataFrame = {
    val base = docs.where(col("text").isNotNull)
    val url = if (docs.columns.contains("url")) col("url")
    else concat(lit("http://src"),
      pmod(col("doc_id"), lit(5)).cast("string"),
      lit(".example.org/doc/"), col("doc_id").cast("string"))
    val html = concat(
      lit("<html><head><title>page</title></head><body><p>"), col("text"),
      lit("</p></body></html>"))
    val respPayload = when(pmod(col("doc_id"), lit(19)) === 0,
      lit("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body>not found</body></html>"))
      .otherwise(concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html))
    // one ROW per record (not per doc): each row becomes its own gzip
    // member, so the container layout matches production WARCs
    val recs = base
      .where(pmod(col("doc_id"), lit(3)) === 0)
      .select(record("request", url,
        concat(lit("GET /doc/"), col("doc_id").cast("string"),
          lit(" HTTP/1.1\r\nHost: example.org\r\n")),
        byteLengths = true).as("value"))
      .unionByName(base
        .where(pmod(col("doc_id"), lit(17)) === 0)
        .select(record("metadata", url, lit("fetchTimeMs: 7\r\n"),
          byteLengths = true).as("value")))
      .unionByName(base
        .select(record("response", url, respPayload,
          byteLengths = true).as("value")))
    recs.select(encode(col("value"), "UTF-8").as("value"))
  }
}
