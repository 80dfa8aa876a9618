package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

/** The layout properties the write operators promise: disjoint sorted key
  * ranges across files (what makes footer-stat file pruning work), bounded
  * rows per file, and compaction to the target shard count. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(name).toString
    graft.cli.Cleanup.deleteOnExit(p)
    p
  }

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .toSeq

  test("writeSorted: disjoint per-file key ranges, sorted within each file") {
    val df = (1L to 1000L).map(i => (i * 37 % 1000, s"v$i")).toDF("k", "v")
    val out = tmpDir("graft_layout_sorted")
    Layout.writeSorted(df, out, Seq("k"), nRanges = 4)
    val files = partFiles(out)
    // repartitionByRange samples split points, so exactly-nRanges non-empty
    // partitions is NOT promised on skewed/low-cardinality keys — the
    // contract is AT MOST nRanges, plus disjointness and completeness below
    assert(files.size <= 4 && files.nonEmpty, s"${files.size} files")
    val ranges = files.map { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select("k").collect().map(_.getLong(0))
      assert(rows.sameElements(rows.sorted), s"${f.getName} not sorted")
      (rows.min, rows.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, s"overlap: $ranges")
      case _ => ()
    }
    // nothing lost in the shuffle
    assert(spark.read.parquet(out).count() == 1000)
  }

  test("writeSorted: maxRecordsPerFile bounds every file") {
    val df = (1L to 900L).toDF("k")
    val out = tmpDir("graft_layout_bounded")
    Layout.writeSorted(df, out, Seq("k"), nRanges = 2, maxRecordsPerFile = 100)
    val files = partFiles(out)
    assert(files.size >= 9) // 900 rows / <=100 per file
    files.foreach { f =>
      val c = spark.read.parquet(f.getAbsolutePath).count()
      assert(c <= 100, s"${f.getName} has $c rows")
    }
  }

  test("compact: many small files -> ceil(n/target) sorted shards, content-identical") {
    val smallDir = tmpDir("graft_layout_small")
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("k", "g")
    df.repartition(20).write.mode("overwrite").parquet(smallDir)
    assert(partFiles(smallDir).size == 20)

    val out = tmpDir("graft_layout_compacted")
    val shards = Layout.compact(spark, smallDir, out, Seq("k"), 200)
    assert(shards == 3) // ceil(500/200)
    assert(partFiles(out).size <= 3 && partFiles(out).nonEmpty) // sampled ranges
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("writeNumberedShards + shardManifest: deterministic shard rule, re-export manifests identically, tamper flips a checksum") {
    import graft.sources.Layout
    val df = (0L until 300L).map(i => (i, s"lang${i % 3}", i * 7))
      .toDF("doc_id", "lang", "n_chars")
    val out = tmpDir("graft_shards_a")
    Layout.writeNumberedShards(df, s"$out/e1", Seq("doc_id"), 128)
    val m1 = Layout.shardManifest(spark, s"$out/e1", "doc_id",
      Seq("doc_id", "lang", "n_chars")).orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // fixed-size numbered shards: 128, 128, 44; contiguous key ranges
    assert(m1.map(x => (x._1, x._2)) ==
      Seq((0L, 128L), (1L, 128L), (2L, 44L)))
    assert(m1.map(x => (x._3, x._4)) ==
      Seq((0L, 127L), (128L, 255L), (256L, 299L)))
    // the shard rule is a pure function of the data: a re-export (even
    // from a differently-partitioned frame) manifests IDENTICALLY
    Layout.writeNumberedShards(df.repartition(7), s"$out/e2",
      Seq("doc_id"), 128)
    val m2 = Layout.shardManifest(spark, s"$out/e2", "doc_id",
      Seq("doc_id", "lang", "n_chars")).orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(m2 == m1, "re-export must manifest byte-identically")
    // a single corrupted row flips exactly its shard's checksum
    val tampered = df.withColumn("n_chars",
      when(col("doc_id") === 200L, lit(999999L)).otherwise(col("n_chars")))
    Layout.writeNumberedShards(tampered, s"$out/e3", Seq("doc_id"), 128)
    val m3 = Layout.shardManifest(spark, s"$out/e3", "doc_id",
      Seq("doc_id", "lang", "n_chars")).orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq
    assert(m3(0)._2 == m1(0)._5 && m3(2)._2 == m1(2)._5,
      "untouched shards must keep their checksums")
    assert(m3(1)._2 != m1(1)._5,
      "the tampered row's shard must flip its checksum")
  }
}
