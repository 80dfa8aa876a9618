package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Large-N evidence run for incremental containment screening (q126
  * shape): a winnow-fingerprint index over a corpus orders of magnitude
  * beyond the testdata, probed by an ingest batch with PLANTED
  * containments. The claims under test: the index builds once (the
  * winnow window is the only heavy stage); the per-batch probe cost is
  * the batch's own winnow plus an index equi-join — the corpus is never
  * re-winnowed; and every planted containment is recovered (a copied
  * w+k−1-token run shares ≥ 1 selected fingerprint by the winnowing
  * guarantee) with no random cross-matches (3-gram space ≫ corpus).
  *
  * Corpus shape: n docs × 50 words from a 1000-word vocabulary
  * (splitmix64-mixed, deterministic). Batch: m docs, the even half
  * embedding a 6-token span copied from corpus doc `(idx·97) mod n`,
  * the odd half fresh text.
  *
  * Usage: `SPARK_DRIVER_MEM=32g sbt "runMain graft.tools.LargeWinnowBench [n] [m]"`
  * Defaults n = 1,000,000 corpus docs, m = 10,000 batch docs. Results
  * recorded in BASELINE.md ("Large-N containment evidence").
  */
object LargeWinnowBench {
  final case class Doc(doc_id: Long, text: String)

  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9e3779b97f4a7c15L + b * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def word(v: Long): String = s"w${java.lang.Long.remainderUnsigned(v, 1000L)}"
  private def corpusText(i: Long): String =
    (0 until 50).map(j => word(mix(i, j))).mkString(" ")
  private def span(i: Long, from: Int, len: Int): String =
    (from until from + len).map(j => word(mix(i, j))).mkString(" ")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val m = args.lift(1).map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%9.2f s"); r
    }
    import graft.operators.Dedup
    val enc = Encoders.product[Doc]
    val corpus = spark.range(n).as(Encoders.LONG).mapPartitions(
      _.map(i => Doc(i.longValue, corpusText(i.longValue))))(enc).toDF()
    val batch = spark.range(m).as(Encoders.LONG).mapPartitions(_.map { b =>
      val idx = b.longValue
      val id = n + idx
      if (idx % 2 == 0) {
        val src = (idx * 97L) % n
        Doc(id, span(-idx - 1, 0, 20) + " " + span(src, 10, 6) + " " +
          span(-idx - 1, 20, 20))
      } else Doc(id, span(-idx - 1, 0, 46))
    })(enc).toDF()

    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_large_winidx"
    graft.cli.Cleanup.deleteOnExit(idxPath)
    time(s"index build ($n docs)") {
      Dedup.winnowIndexWrite(
        Dedup.winnowFingerprints(corpus, "text", "doc_id", k = 3, w = 4),
        "doc_id", idxPath)
    }
    val idxRows = spark.read.parquet(s"$idxPath/fps").count()
    println(s"index fps rows=$idxRows (~${idxRows / n} per doc)")
    val pairs = time(s"batch probe ($m docs)") {
      graft.engine.Checkpoints.mark(
        Dedup.winnowIncrementalPairs(spark, idxPath,
          Dedup.winnowFingerprints(batch, "text", "doc_id", k = 3, w = 4),
          "doc_id", minShared = 1))
    }
    val total = pairs.count()
    // every planted batch doc must hit its SOURCE corpus doc
    val planted = pairs
      .where(col("a") === (col("b") - n) * 97L % n &&
        pmod(col("b") - n, lit(2L)) === 0).count()
    println(s"pairs=$total planted_recovered=$planted expected=${m / 2}")
    require(planted == m / 2, s"planted recovery $planted != ${m / 2}")
    graft.engine.Checkpoints.release(pairs)
    spark.stop()
  }
}
