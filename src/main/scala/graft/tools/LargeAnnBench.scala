package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-N evidence run for the IVF ANN path: build + probe + recall over
  * a deterministic synthetic corpus with PLANTED cluster structure (the
  * testdata embeddings are near-random, which bounds what any
  * bucket/cell method can recall — see BASELINE's "ANN recall" table;
  * production embedding spaces cluster, and this bench measures the
  * operator in that regime).
  *
  * Corpus: `n` 64-d vectors in 64 clusters; vector i = center(i % 64) +
  * 0.25 × noise(i), both md5-derived ([[graft.operators.Similarity
  * .planeCoef]] family — no RNG, reruns identical). Claims under test:
  * ivfBuild is O(corpus) with driver-free Lloyd training; probe cost
  * scales with nprobe/k of the corpus, not the corpus; recall climbs
  * with nprobe and hits ~1 at nprobe=k.
  *
  * Usage: `sbt "runMain graft.tools.LargeAnnBench [n]"` (default 500k).
  * Results recorded in BASELINE.md ("Large-N ANN evidence").
  */
object LargeAnnBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-34s $s%9.2f s"); (r, s)
    }
    import graft.operators.Similarity

    val dims = 64
    val clusters = 64
    // center(c, d) in [-1, 1] md5-derived; noise(i, d) likewise, offset
    // seed so it never collides with a center row
    val cell = pmod(col("id"), lit(clusters))
    val vec = transform(sequence(lit(0), lit(dims - 1)), d =>
      (Similarity.planeCoef(cell, d) +
        lit(0.25) * Similarity.planeCoef(col("id") + lit(10000), d))
        .cast("float"))
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .cache()
    println(s"n = $n vectors, $dims-d, $clusters planted clusters")
    time("corpus materialize")(vecs.count())

    val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_large_ann_ivf"
    graft.cli.Cleanup.deleteOnExit(ivfPath)
    val (idx, _) = time(s"ivfBuild k=32, 2 Lloyd rounds")(
      Similarity.ivfBuild(spark, vecs, "vec_id", "embedding", k = 32,
        path = ivfPath))

    val k = 10
    val nq = 20
    val step = math.max(1L, n / nq)
    val queries = vecs.where(pmod(col("vec_id"), lit(step)) === 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).take(nq)

    def ids(df: DataFrame): Set[Long] = df.collect().map(_.getLong(0)).toSet
    val exact = queries.map { case (qid, qv) =>
      qid -> ids(Similarity.bruteForceTopK(vecs, "vec_id", "embedding", qv, k))
    }.toMap
    val (_, tBrute) = time(s"brute force, $nq queries")(
      queries.foreach { case (_, qv) =>
        Similarity.bruteForceTopK(vecs, "vec_id", "embedding", qv, k).collect() })

    Seq(1, 2, 4, 8).foreach { np =>
      var hit = 0; var tot = 0
      val (_, t) = time(s"ivf probe nprobe=$np, $nq queries")(
        queries.foreach { case (qid, qv) =>
          val got = ids(Similarity.ivfSearchIndexed(idx, qv.map(_.toDouble),
            nprobe = np, topK = k))
          hit += (exact(qid) intersect got).size; tot += exact(qid).size
        })
      println(f"  recall@$k = ${hit.toDouble / tot}%.3f" +
        f"  (${t / nq}%.2f s/query vs brute ${tBrute / nq}%.2f)")
    }

    // BATCH paths: the whole query set in one job — brute batch reads the
    // corpus once (vs once per query above), IVF batch reads one pruned
    // scan of the union of probed cells. Same results as the loops.
    val qDf = vecs.where(col("vec_id").isin(queries.map(_._1).toIndexedSeq: _*))
    def byQuery(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    val (bb, tBatch) = time(s"brute force BATCH, $nq queries, one scan")(
      byQuery(Similarity.bruteForceTopKBatch(vecs, qDf, "vec_id", "embedding", k)
        .collect()))
    val agree = queries.count { case (qid, _) => bb(qid) == exact(qid) }
    println(f"  batch == per-query for $agree/$nq queries; " +
      f"${tBrute / tBatch}%.1f x faster than the loop")
    val (ib, tIvfB) = time(s"ivf BATCH nprobe=8, $nq queries, one pruned scan")(
      byQuery(Similarity.ivfSearchIndexedBatch(idx, qDf, nprobe = 8, topK = k)
        .collect()))
    val hitB = queries.map { case (qid, _) =>
      (exact(qid) intersect ib.getOrElse(qid, Set())).size }.sum
    println(f"  recall@$k = ${hitB.toDouble / (nq * k)}%.3f, " +
      f"${tBrute / tIvfB}%.1f x faster than the brute loop")

    // BINARY-QUANTIZED tier (q171's shape): persist the 8 B/vector sign
    // codes once, shortlist by hamming over the code column only, exact
    // re-rank on the fetched shortlist. The code scan is 32x smaller
    // than the float scan; recall measured against the same exact truth.
    val codePath = s"${sys.props("java.io.tmpdir")}/graft_large_ann_bq"
    graft.cli.Cleanup.deleteOnExit(codePath)
    val (_, tCode) = time("bqQuantize + persist codes (8 B/vector)")({
      Similarity.bqQuantize(vecs, "vec_id", "embedding")
        .write.mode("overwrite").parquet(codePath)
    })
    val codes = spark.read.parquet(codePath)
    // sign codes COLLAPSE a planted cluster into one hamming plateau
    // (center dominates the 0.25 noise in every dimension's sign), so
    // the shortlist must cover the plateau: measure the degenerate
    // geometry honestly at 100 and the plateau-covering 2% of corpus
    Seq(100, (n / 50).toInt).foreach { sl =>
      val (bq, tBq) = time(s"BQ shortlist=$sl + exact re-rank BATCH, $nq queries")(
        byQuery(Similarity.bqSearchRerankCodes(codes, vecs, qDf, "vec_id",
            "embedding", shortlist = sl, k = k).collect()))
      val hitBq = queries.map { case (qid, _) =>
        (exact(qid) intersect bq.getOrElse(qid, Set())).size }.sum
      println(f"  recall@$k = ${hitBq.toDouble / (nq * k)}%.3f, " +
        f"${tBrute / tBq}%.1f x vs the brute loop " +
        f"(code persist ${tCode}%.2f s once)")
    }

    // IVF-PRUNED BQ tier (q176's shape, round 13): the codes
    // re-partitioned by the float index's trained cells, so the hamming
    // phase scans only the PROBED cells' code bytes — the scan-bytes
    // row below is the tier's whole claim, measured from the parquet
    // layout itself (probed cell partitions vs full code table vs the
    // float corpus).
    val bqIvfPath = s"${sys.props("java.io.tmpdir")}/graft_large_ann_bqivf"
    graft.cli.Cleanup.deleteOnExit(bqIvfPath)
    val (bqIdx, _) = time("bqIvfBuild (codes partitioned by cell)")(
      Similarity.bqIvfBuild(idx, bqIvfPath))
    val sl2 = (n / 50).toInt
    val (bi, tBqIvf) = time(s"BQ-IVF nprobe=8 shortlist=$sl2 BATCH")(
      byQuery(Similarity.bqIvfSearchBatch(bqIdx, vecs, qDf,
        nprobe = 8, shortlist = sl2, k = k).collect()))
    val hitBi = queries.map { case (qid, _) =>
      (exact(qid) intersect bi.getOrElse(qid, Set())).size }.sum
    println(f"  recall@$k = ${hitBi.toDouble / (nq * k)}%.3f, " +
      f"${tBrute / tBqIvf}%.1f x vs the brute loop")
    // scan bytes: union of probed cells (re-derived with the same probe
    // rule: top-8 centroid cosine per query, distinct) vs everything
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      graft.functions.DotProduct.dot_product(x, y)
    val probed = qDf.select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("qe"))
      .crossJoin(broadcast(bqIdx.centroids))
      .select(col("q_id"), col("cell"),
        (dot(col("ce"), col("qe")) / col("cnorm") /
          sqrt(dot(col("qe"), col("qe")))).as("pc"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("pc").desc, col("cell"))))
      .where(col("r") <= 8).select("cell").distinct()
      .collect().map(_.get(0).toString).toSet
    def bytesUnder(p: String, cells: Option[Set[String]]): Long = {
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(d: org.apache.hadoop.fs.Path): Long =
        fs.listStatus(d).map { st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet")) st.getLen
          else 0L
        }.sum
      cells match {
        case None => walk(root)
        case Some(cs) => fs.listStatus(root)
          .filter(st => st.isDirectory &&
            cs.exists(c => st.getPath.getName == s"cell=$c"))
          .map(st => walk(st.getPath)).sum
      }
    }
    val floatBytes = bytesUnder(s"$ivfPath/corpus", None)
    val codeBytes = bytesUnder(s"$bqIvfPath/corpus", None)
    val probedBytes = bytesUnder(s"$bqIvfPath/corpus", Some(probed))
    println(f"  scan bytes: float corpus ${floatBytes / 1e6}%.1f MB; " +
      f"full code table ${codeBytes / 1e6}%.1f MB " +
      f"(${floatBytes.toDouble / codeBytes}%.1f x smaller); " +
      f"probed ${probed.size}/32 cells ${probedBytes / 1e6}%.1f MB " +
      f"(${floatBytes.toDouble / probedBytes}%.1f x less than the float scan)")
    spark.stop()
  }
}
