package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

/** The count-min guarantees, checked against an independent JVM-side
  * reimplementation of the portable hash (MessageDigest md5, not Spark's):
  * estimates never undercount, wide sketches are exact, merge is
  * distributive cell-for-cell, and the cell function is the documented
  * md5 derivation. */
class SketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent replay of [[graft.operators.TextOps.portableHash]] +
    * cell bucketing: md5 hex via java.security, first 15 chars as a
    * long, mod width. */
  private def refCell(d: Long, token: String, width: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${Sketch.CmSeed}:$d:$token".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % width
  }

  private def refSketch(toks: Seq[String], depth: Int,
      width: Int): Map[(Long, Long), Long] =
    (for (t <- toks; d <- 0L until depth.toLong)
      yield (d, refCell(d, t, width))).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }

  private val words =
    Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(7)("gamma") ++
      Seq("delta", "epsilon", "zeta", "eta", "theta")

  test("cmCell matches an independent md5 reimplementation") {
    val got = Seq(("alpha", 0L), ("alpha", 3L), ("zeta", 1L))
      .toDF("t", "d")
      .select(Sketch.cmCell(col("d"), col("t"), 16).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(refCell(0, "alpha", 16), refCell(3, "alpha", 16),
      refCell(1, "zeta", 16)))
  }

  test("countMinCells equals the reference sketch cell-for-cell; estimates never undercount and a wide sketch is exact") {
    val df = words.toDF("w")
    val cells = Sketch.countMinCells(df, "w", depth = 4, width = 8)
    val got = cells.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == refSketch(words, 4, 8))

    val truth = words.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val keys = truth.keys.toSeq.toDF("w")
    val est8 = Sketch.cmEstimate(cells, keys, "w", 4, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (w, n) =>
      assert(est8(w) >= n, s"$w undercounted: ${est8(w)} < $n")
    }
    // 5 distinct words in 4x4096 cells: no collisions, estimates exact
    val wide = Sketch.countMinCells(df, "w", depth = 4, width = 4096)
    val estW = Sketch.cmEstimate(wide, keys, "w", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estW == truth)
  }

  test("cmMerge of disjoint halves equals the whole-corpus sketch") {
    val (a, b) = words.splitAt(words.size / 3)
    def cellsOf(ws: Seq[String]) =
      Sketch.countMinCells(ws.toDF("w"), "w", depth = 4, width = 8)
    val merged = Sketch.cmMerge(cellsOf(a), cellsOf(b)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cellsOf(words).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("cmInnerProduct never undercounts the true join size; a wide sketch is exact") {
    val a = words
    val b = words.drop(15) ++ Seq("alpha", "alpha", "zeta", "omega")
    val truthMap = a.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val truth = b.groupBy(identity).toSeq
      .map { case (w, v) => truthMap.getOrElse(w, 0L) * v.size }.sum
    def cellsOf(ws: Seq[String], width: Int) =
      Sketch.countMinCells(ws.toDF("w"), "w", depth = 4, width = width)
    def est(width: Int): Long =
      Sketch.cmInnerProduct(cellsOf(a, width), cellsOf(b, width))
        .collect().head.getLong(0)
    assert(est(8) >= truth, s"undercounted: ${est(8)} < $truth")
    // 9 distinct words in 4x4096 cells: no collisions, exact
    assert(est(4096) == truth)
  }

  // --- HLL ---

  /** Independent (idx, rank): java Long bit ops over the md5 hash. */
  private def refHll(token: String): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${Sketch.HllSeed}:$token".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    val suffix = h >>> 6
    val rank = if (suffix == 0L) 55L
      else 55L - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
    (h % 64, rank)
  }

  private def refRegisters(toks: Seq[String]): Map[Long, Long] =
    toks.map(refHll).groupBy(_._1).map { case (i, v) => i -> v.map(_._2).max }

  test("hllRegisters matches an independent bit-ops reimplementation; duplicates never change a register") {
    val regs = Sketch.hllRegisters(words.toDF("w"), "w", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(regs == refRegisters(words))
    val doubled = Sketch.hllRegisters((words ++ words).toDF("w"), "w", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(doubled == regs, "max is idempotent: duplicates are free")
  }

  test("hllMerge of halves equals the whole; collapsing per-group sketches equals the global sketch") {
    val (a, b) = words.splitAt(10)
    def regsOf(ws: Seq[String]) = Sketch.hllRegisters(ws.toDF("w"), "w", Nil)
    val merged = Sketch.hllMerge(regsOf(a), regsOf(b), Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == refRegisters(words))
    // grouped build, then collapse the group dimension away
    val grouped = Sketch.hllRegisters(
      words.zipWithIndex.map { case (w, i) => (s"src${i % 3}", w) }
        .toDF("src", "w"), "w", Seq("src"))
    val collapsed = Sketch.hllMergeAll(grouped.select("idx", "rank"), Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(collapsed == refRegisters(words))
  }

  test("hllEstimate: within 2 sigma on 1000 distinct tokens; linear counting keeps tiny cardinalities honest") {
    val big = (1 to 1000).map(i => s"token-$i")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(big.toDF("w"), "w", Nil), Nil)
      .collect().head
    val (v, harmonic, e) = (est.getLong(0), est.getLong(1), est.getDouble(2))
    assert(v >= 0 && harmonic > 0)
    // m = 64 registers -> sigma = 1.04/sqrt(64) = 13%; this fixed hash
    // set lands at 15.4% (1.2 sigma) — deterministic, bound at 2 sigma
    assert(math.abs(e - 1000.0) / 1000.0 < 0.26, s"estimate $e for 1000")
    // 5 distinct tokens: raw HLL would bias high; the linear-counting
    // branch must keep the estimate near the truth
    val small = Seq("a", "b", "c", "d", "e") ++ Seq.fill(100)("a")
    val es = Sketch.hllEstimate(
      Sketch.hllRegisters(small.toDF("w"), "w", Nil), Nil)
      .collect().head.getDouble(2)
    assert(math.abs(es - 5.0) / 5.0 < 0.25, s"estimate $es for 5")
  }

  test("torn-state replay cannot double-count: a batch appended twice dedupes at read time") {
    val path = java.nio.file.Files.createTempDirectory("graft_sketch_torn").toString
    graft.cli.Cleanup.deleteOnExit(path)
    val cells = Sketch.countMinCells(words.toDF("w"), "w", depth = 4, width = 8)
    assert(Sketch.sketchAppendBatch(path, cells, 0L))
    // simulate a crash between parquet append and marker write: the
    // marker vanishes, the batch re-runs and appends the SAME rows again
    graft.sources.Markers.delete(spark, s"$path/lastbatch")
    assert(Sketch.sketchAppendBatch(path, cells, 0L))
    assert(spark.read.parquet(s"$path/parts").count() ==
      2 * cells.count(), "the torn replay really did double-append")
    val got = Sketch.cmRead(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = cells.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == direct, "read-side dedup must restore exactly-once counts")
  }

  test("an unseen key's estimate is bounded by its cells (zero when any cell is empty)") {
    val cells = Sketch.countMinCells(words.toDF("w"), "w", depth = 4, width = 8)
    val ref = refSketch(words, 4, 8)
    val unseen = "never-in-corpus"
    val expected = (0L until 4L)
      .map(d => ref.getOrElse((d, refCell(d, unseen, 8)), 0L)).min
    val got = Sketch.cmEstimate(cells, Seq(unseen).toDF("w"), "w", 4, 8)
      .collect().map(_.getLong(1)).head
    assert(got == expected)
  }

  test("count-min is linear: a negative partial deletes exactly; a replayed delete would corrupt") {
    val (deleted, kept) = words.splitAt(words.size / 4)
    def cells(ws: Seq[String]) =
      Sketch.countMinCells(ws.toDF("w"), "w", depth = 4, width = 8)
    val path =
      java.nio.file.Files.createTempDirectory("graft_cm_delete").toString
    graft.cli.Cleanup.deleteOnExit(path)
    assert(Sketch.sketchAppendBatch(path, cells(words), 0L))
    assert(Sketch.sketchAppendBatch(path,
      cells(deleted).withColumn("cnt", -col("cnt")), 1L))
    def cellMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .filter(_._2 != 0L) // full-minus-deleted leaves exact-zero cells
    assert(cellMap(Sketch.cmRead(spark, path)) == cellMap(cells(kept)),
      "full + negative-delete must equal the kept-corpus sketch")
    // the replay guard is what stands between a retry and a DOUBLE
    // delete: the second identical delete batch must refuse
    assert(!Sketch.sketchAppendBatch(path,
      cells(deleted).withColumn("cnt", -col("cnt")), 1L))
    assert(cellMap(Sketch.cmRead(spark, path)) == cellMap(cells(kept)))
  }

  // --- KMV bottom-k ---

  /** Independent replay of the KMV hash (seed 71). */
  private def refKmvHash(token: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${Sketch.KmvSeed}:$token".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def refKmv(toks: Seq[String], k: Int): Seq[Long] =
    toks.map(refKmvHash).distinct.sorted.take(k)

  test("kmvSketch's two-phase bottom-k equals the independent md5 sample, per group") {
    val rows = (words.map(("g1", _)) ++
      words.drop(10).map(w => ("g2", w + "x"))).toDF("g", "w")
    val got = Sketch.kmvSketch(rows, "w", Seq("g"), k = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (g, v) => g -> v.sortBy(_._2).map(_._3).toSeq }
    assert(got("g1") == refKmv(words, 4))
    assert(got("g2") == refKmv(words.drop(10).map(_ + "x"), 4))
    // positions are 1..k with no gaps
    assert(Sketch.kmvSketch(rows, "w", Seq("g"), k = 4)
      .groupBy("g").agg(min("pos"), max("pos"), count(lit(1)))
      .collect().forall(r => r.getInt(1) == 1 && r.getInt(2) == 4 &&
        r.getLong(3) == 4L))
  }

  test("kmvMinK is idempotent and merges per-shard samples into the union's sample") {
    val (a, b) = words.splitAt(words.size / 3)
    def sample(ws: Seq[String]) =
      Sketch.kmvSketch(ws.toDF("w"), "w", Nil, k = 6)
    val direct = sample(words).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val merged = Sketch
      .kmvMinK(sample(a).unionByName(sample(b)).select("h"), Nil, k = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(merged == direct)
    val again = Sketch.kmvMinK(sample(words).select("h"), Nil, k = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(again == direct, "min-k of a sample is the sample")
  }

  test("the KMV cardinality estimate lands within the k-sized error band") {
    val n = 5000
    val vals = (0 until n).map(i => s"item_$i").toDF("w")
    val k = 64
    val sk = Sketch.kmvSketch(vals, "w", Nil, k = k)
    val theta = sk.agg(max("h")).collect().head.getLong(0)
    val est = (k - 1).toDouble * math.pow(2.0, 60) / theta.toDouble
    assert(math.abs(est - n) / n < 0.4,
      s"estimate $est vs true $n off by more than 40% at k=$k")
  }

  test("kmvIntersect: exact in the sub-k regime, estimate tracks true overlap beyond it") {
    // sub-k: two tiny sets, union smaller than k -> theta is the union
    // max and n_inter IS the exact sample intersection
    val small = (Seq("a", "b", "c", "d").map(("A", _)) ++
      Seq("c", "d", "e").map(("B", _))).toDF("g", "w")
    val smp = Sketch.kmvSketch(small, "w", Seq("g"), k = 16)
    val row = Sketch.kmvIntersect(smp, "g", k = 16).collect().head
    assert(row.getAs[Long]("k_u") == 5L) // |union| = 5 distinct
    assert(row.getAs[Long]("n_inter") == 2L) // {c, d}
    assert(row.getAs[Long]("theta") ==
      refKmv(Seq("a", "b", "c", "d", "e"), 16).last)

    // beyond k: planted 30% overlap between two 3000-element sets
    val big = ((0 until 3000).map(i => ("A", s"v$i")) ++
      (2100 until 5100).map(i => ("B", s"v$i"))).toDF("g", "w")
    val k = 64
    val bs = Sketch.kmvSketch(big, "w", Seq("g"), k = k)
    val r = Sketch.kmvIntersect(bs, "g", k = k).collect().head
    val unionEst =
      (r.getAs[Long]("k_u") - 1).toDouble * math.pow(2.0, 60) /
        r.getAs[Long]("theta").toDouble
    val interEst =
      r.getAs[Long]("n_inter").toDouble / r.getAs[Long]("k_u") * unionEst
    assert(math.abs(interEst - 900.0) / 900.0 < 0.6,
      s"intersection estimate $interEst vs true 900")
  }

  test("maintained KMV: replayed batches are free for min-k, read equals direct") {
    val path =
      java.nio.file.Files.createTempDirectory("graft_kmv_maint").toString
    graft.cli.Cleanup.deleteOnExit(path)
    val (a, b) = words.splitAt(words.size / 2)
    def sample(ws: Seq[String]) =
      Sketch.kmvSketch(ws.toDF("w"), "w", Nil, k = 6)
    assert(Sketch.sketchAppendBatch(path, sample(a), 0L))
    assert(Sketch.sketchAppendBatch(path, sample(b), 1L))
    assert(!Sketch.sketchAppendBatch(path, sample(b), 1L))
    val got = Sketch.kmvRead(spark, path, Nil, k = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val direct = sample(words).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == direct)
  }
}
