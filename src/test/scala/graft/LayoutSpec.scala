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

  test("zorderKey: known Morton vectors; bucket256: exact integer buckets") {
    val df = Seq((0L, 0L), (255L, 255L), (3L, 5L), (170L, 85L)).toDF("x", "y")
    val got = df.select(Layout.zorderKey(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // hand-interleaved: bit i of x -> 2i, bit i of y -> 2i+1
    assert(got == Seq(0L, 65535L, 39L, 26214L), got)
    val b = (0L to 1023L).toDF("k")
      .select(Layout.bucket256(col("k"), 0L, 1023L).as("b"))
      .collect().map(_.getLong(0))
    assert(b.toSeq == (0L to 1023L).map(_ / 4), "floor(k*256/1024) = k/4")
    assert(b.min == 0L && b.max == 255L)
  }

  test("zIntervals: exact cover — zkey membership <=> box membership over the full 256x256 grid; column and driver interleaves agree") {
    // driver interleave == column interleave on a sample
    val sample = Seq((0L, 0L), (255L, 255L), (40L, 87L), (171L, 24L), (13L, 200L))
    val colKeys = sample.toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y"))).collect().map(_.getLong(0))
    assert(colKeys.toSeq == sample.map { case (x, y) => Layout.zorderKeyL(x, y) })
    // brute-force equivalence for a non-aligned box (the q197 box) and
    // a degenerate one-cell box
    for ((xlo, xhi, ylo, yhi) <- Seq((40L, 171L, 24L, 87L), (7L, 7L, 250L, 250L))) {
      val ivs = Layout.zIntervals(xlo, xhi, ylo, yhi)
      assert(ivs == ivs.sortBy(_._1) &&
        ivs.sliding(2).forall {
          case Seq((_, b), (c, _)) => c > b + 1
          case _ => true
        }, s"intervals must be sorted, disjoint, maximally merged: $ivs")
      def covered(z: Long) = ivs.exists { case (a, b) => a <= z && z <= b }
      for (x <- 0L to 255L; y <- 0L to 255L) {
        val inBox = x >= xlo && x <= xhi && y >= ylo && y <= yhi
        assert(covered(Layout.zorderKeyL(x, y)) == inBox,
          s"($x,$y) box=$inBox cover=${!inBox}")
      }
    }
  }

  test("writeZOrdered: a one-dimension band read decodes a fraction — the dimension a single-column sort cannot serve") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // 200x200 grid; the probe is a narrow band in y ONLY. An x-sorted
    // layout's files all span the full y range (footer stats can never
    // exclude one); z-ordered files cover compact curve segments whose
    // y extent is bounded, so the same filter skips most row groups.
    val n = 40000L
    val df = spark.range(n).select(
      (col("id") % 200).as("x"), (col("id") / 200).cast("long").as("y"))
    val zPath = tmpDir("graft_layout_zorder")
    val xPath = tmpDir("graft_layout_xsorted")
    val (xlo, xhi, ylo, yhi) = Layout.writeZOrdered(df, zPath, "x", "y", nRanges = 16)
    assert((xlo, xhi, ylo, yhi) == (0L, 199L, 0L, 199L))
    Layout.writeSorted(df, xPath, Seq("x"), nRanges = 16)

    def decoded(path: String): Long = {
      val q = spark.read.parquet(path).where(col("y").between(16, 39))
      assert(q.count() == 24 * 200)
      q.collect()
      flattenPlan(q.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
    }
    val zRows = decoded(zPath)
    val xRows = decoded(xPath)
    assert(xRows == n, s"x-sorted layout cannot prune a y band: $xRows")
    assert(zRows <= n / 2, s"z-ordered layout must skip most row groups: $zRows")
    // and the quadrant identity the q194 oracle leans on:
    // zkey < 4096 <=> xb < 64 AND yb < 64
    val z = spark.read.parquet(zPath)
    val viaKey = z.where(col("zkey") < 4096).count()
    val viaBox = z.where(Layout.bucket256(col("x"), xlo, xhi) < 64 &&
      Layout.bucket256(col("y"), ylo, yhi) < 64).count()
    assert(viaKey == viaBox && viaKey > 0, s"$viaKey vs $viaBox")
  }

  private def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    graft.plans.PlanWalk.flatten(p)

  test("compactZOrdered: unsorted small files re-cluster content-identically and the band pruning comes back") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val n = 40000L
    val df = spark.range(n).select(
      (col("id") % 200).as("x"), (col("id") / 200).cast("long").as("y"))
    val rawPath = tmpDir("graft_layout_zc_raw")
    val zPath = tmpDir("graft_layout_zc_z")
    df.repartition(16).write.mode("overwrite").parquet(rawPath)
    val bounds = Layout.compactZOrdered(spark, rawPath, zPath, "x", "y", 16)
    assert(bounds == (0L, 199L, 0L, 199L))
    // content-identical (no row lost/duplicated in the re-cluster)
    val got = spark.read.parquet(zPath).select("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.length == n &&
      got.sameElements(df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted))
    // the y-band skip the unsorted files cannot give is back
    def decoded(path: String): Long = {
      val q = spark.read.parquet(path).where(col("y").between(16, 39))
      q.collect()
      flattenPlan(q.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
    }
    assert(decoded(rawPath) == n, "hash-partitioned files cannot prune")
    assert(decoded(zPath) <= n / 2, "re-clustered layout must skip most row groups")
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
