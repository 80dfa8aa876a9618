package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model._

/** The 100 TB generalization of [[RefinementEngine]]: the same CP-refinement
  * semantics over a corpus of MANY series `(sid, t, y)`, with every stage
  * partitioned by `sid`:
  *
  *   - index build: `Window.partitionBy(sid).orderBy(t)` — prefix sums and
  *     sparse-table levels are computed inside each series partition, no
  *     global sort, no single-partition bottleneck;
  *   - domain binding: None sides resolve to PER-SERIES extents (a
  *     broadcastable `(sid, tMin, tMax)` aggregate), reference semantics
  *     applied independently per series (the reference's two datasets are
  *     two sids);
  *   - candidate grid: per-series `explode(sequence)` — partition-local;
  *   - probes: equi-joins on `(sid, t)` — shuffle hash joins that scale out;
  *   - extrema: `groupBy(sid)` instead of a global aggregate;
  *   - refined top-k: `row_number over (partition by sid order by key)` —
  *     a per-series top-k with bounded state per partition.
  *
  * [[RefinementEngine]] stays the single-series fast path (its global top-k
  * compiles to TakeOrderedAndProject); this engine is the horizontal path.
  * Formulas (VC/RD/RK/RP, clamps) are identical — see the cross-check in
  * MultiSeriesSpec.
  */
object MultiSeriesEngine {

  final case class MsIndex(df: DataFrame, bounds: DataFrame, levels: Int)

  /** The [[WindowProbe]] view of an [[MsIndex]]: same constraint formulas as
    * the single-series path, with per-series `tMin`/`tMax` grid columns and
    * `(sid, t)`-keyed lookups. Position-memoizing — see [[MemoProbe]];
    * create one instance per query. */
  def probe(idx: MsIndex): WindowProbe = new MemoProbe {
    val tMinCol: Column = col("tMin")
    val tMaxCol: Column = col("tMax")
    protected def lookupAll(grid: DataFrame, pos: Column, prefix: String): DataFrame =
      MultiSeriesEngine.lookupAt(grid, idx, pos, prefix, Seq("y", "s", "ms"))
  }

  /** Index a multi-series frame `(sid, t, y)`; t dense ascending per sid.
    * `boundsOpt` lets a caller that already derived the per-series bounds
    * aggregate pass it in instead of re-deriving it. */
  def index(series: DataFrame, maxWin: Long, boundsOpt: Option[DataFrame] = None): MsIndex = {
    val levels = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxWin)))
    val w = Window.partitionBy("sid").orderBy("t")
    var df = series
      .select(col("sid"), col("t").cast("long").as("t"), col("y").cast("double").as("y"))
      .withColumn("s", sum("y").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("m0", col("y"))
    for (j <- 1 until levels) {
      df = df.withColumn(
        s"m$j",
        greatest(col(s"m${j - 1}"),
          coalesce(lead(col(s"m${j - 1}"), 1 << (j - 1)).over(w), lit(Double.NegativeInfinity))))
    }
    val indexed = df
      .withColumn("ms", array((0 until levels).map(j => col(s"m$j")): _*))
      .drop((0 until levels).map(j => s"m$j"): _*)
    val bounds = boundsOpt.getOrElse(
      series.groupBy("sid").agg(min("t").as("tMin"), max("t").as("tMax")))
    MsIndex(indexed, bounds, levels)
  }

  /** Row shape produced by [[indexFast]]. */
  final case class MsIndexedPoint(sid: Long, t: Long, y: Double, s: Double, ms: Array[Double])

  /** Per-sid row budget for the kernel build's in-task buffer: a run of
    * `maxRunRows` rows buffers roughly rows x (point + levels x 8 B) per
    * task, so the default keeps the working set a few hundred MB — well
    * inside an executor task's share. Series above it are routed to the
    * single-series engine's partitioned two-pass build ([[indexRouted]] /
    * [[execute]]); [[indexFast]] itself fails fast rather than OOM. */
  val DefaultMaxRunRows: Long = 4 * 1000 * 1000

  /** Kernel build of [[index]]: hash-partition by sid, sort (sid, t) within
    * partitions, then compute each series' prefix sums and ALL sparse-table
    * levels imperatively in one pass over each series' contiguous run — one
    * shuffle + one sort instead of 1 + log2(maxWin) sequential window stages.
    * Equality with the declarative build is asserted in MultiSeriesSpec.
    * Assumes a series fits its executor's partition (the same working-set
    * assumption the per-sid window build makes); the assumption is ENFORCED:
    * a run longer than `maxRunRows` fails fast with a routing message
    * instead of silently OOMing the task ([[indexRouted]] is the caller
    * that routes instead of failing).
    */
  def indexFast(series: DataFrame, maxWin: Long, boundsOpt: Option[DataFrame] = None,
      maxRunRows: Long = DefaultMaxRunRows): MsIndex = {
    val levels = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxWin)))
    val spark = series.sparkSession
    import spark.implicits._
    val sorted = series
      .select(col("sid").cast("long").as("sid"),
        col("t").cast("long").as("t"), col("y").cast("double").as("y"))
      .repartition(col("sid"))
      .sortWithinPartitions("sid", "t")
      .as[(Long, Long, Double)]
    val indexed = sorted.mapPartitions { it =>
      val rows = it.buffered
      new Iterator[Iterator[MsIndexedPoint]] {
        def hasNext: Boolean = rows.hasNext
        def next(): Iterator[MsIndexedPoint] = {
          // consume one sid's contiguous run
          val sid = rows.head._1
          val ts = new scala.collection.mutable.ArrayBuffer[Long]
          val ys = new scala.collection.mutable.ArrayBuffer[Double]
          while (rows.hasNext && rows.head._1 == sid) {
            val r = rows.next(); ts += r._2; ys += r._3
            if (ts.length > maxRunRows) throw new IllegalStateException(
              s"series sid=$sid exceeds maxRunRows=$maxRunRows for the per-partition " +
                "kernel build; route oversized series through " +
                "MultiSeriesEngine.indexRouted (or SeriesOps.indexFast per series)")
          }
          val arr = ys.toArray
          val m = SeriesOps.buildLevels(arr, levels)
          var acc = 0.0
          val s = arr.map { v => acc += v; acc }
          Iterator.tabulate(arr.length) { k =>
            MsIndexedPoint(sid, ts(k), arr(k), s(k),
              Array.tabulate(levels)(j => m(j)(k)))
          }
        }
      }.flatten
    }.toDF()
    val bounds = boundsOpt.getOrElse(
      series.groupBy("sid").agg(min("t").as("tMin"), max("t").as("tMax")))
    MsIndex(indexed, bounds, levels)
  }

  /** [[indexFast]] with the working-set assumption enforced by ROUTING
    * rather than failing: series whose row count exceeds `maxRunRows` are
    * built by the single-series engine's partitioned two-pass kernel
    * ([[SeriesOps.indexFast]] — range-partitioned, halo-exchanged, no
    * whole-series buffering anywhere) and unioned back; everything else
    * takes the per-sid single-pass path. `stats` must be the per-sid
    * `(sid, tMin, tMax, n)` aggregate (callers need it for bounds anyway,
    * so it is computed once and shared). The oversized-sid list is a
    * bounded driver collect: sids above millions of rows are few by
    * construction (their count is capped by corpus size / maxRunRows). */
  def indexRouted(series: DataFrame, maxWin: Long, stats: DataFrame,
      maxRunRows: Long = DefaultMaxRunRows): MsIndex = {
    val bounds = stats.select("sid", "tMin", "tMax")
    val bigSids = stats.where(col("n") > maxRunRows)
      .select("sid").collect().map(_.getLong(0)).toSeq
    if (bigSids.isEmpty) indexFast(series, maxWin, Some(bounds), maxRunRows)
    else {
      val small = indexFast(
        series.where(!col("sid").isin(bigSids: _*)), maxWin, Some(bounds), maxRunRows)
      val bigDfs = bigSids.map { sid =>
        SeriesOps.indexFast(series.where(col("sid") === sid).select("t", "y"), maxWin)
          .df.select(lit(sid).as("sid"), col("t"), col("y"), col("s"), col("ms"))
      }
      MsIndex(
        bigDfs.foldLeft(small.df.select("sid", "t", "y", "s", "ms"))(_ unionByName _),
        bounds, small.levels)
    }
  }

  private def lookupAt(
      grid: DataFrame, idx: MsIndex, pos: Column, prefix: String,
      cols: Seq[String]): DataFrame = {
    val probe = idx.df.select(
      (col("sid").as(s"${prefix}_sid") +: col("t").as(s"${prefix}_t") +:
        cols.map(c => col(c).as(s"${prefix}_$c"))): _*)
    grid
      .join(probe,
        col("sid") === col(s"${prefix}_sid") && pos === col(s"${prefix}_t"), "left")
      .drop(s"${prefix}_sid", s"${prefix}_t")
  }

  /** Same probe formulas as [[SeriesOps.windowAgg]], keyed by (sid, t). */
  def windowAgg(
      grid: DataFrame, idx: MsIndex, a: Column, b: Column, tag: String,
      needAvg: Boolean, needMax: Boolean): DataFrame = {
    var g = grid.withColumn(s"${tag}_a", a.cast("long")).withColumn(s"${tag}_b", b.cast("long"))
    val ac = col(s"${tag}_a")
    val bc = col(s"${tag}_b")
    if (needAvg) {
      g = lookupAt(g, idx, ac, s"${tag}_la", Seq("s", "y"))
      g = lookupAt(g, idx, bc, s"${tag}_lb", Seq("s"))
      val len = (bc - ac + lit(1)).cast("double")
      val sumc = col(s"${tag}_lb_s") - col(s"${tag}_la_s") + col(s"${tag}_la_y")
      g = g.withColumn(s"${tag}_avg", sumc / len)
        .drop(s"${tag}_la_s", s"${tag}_la_y", s"${tag}_lb_s")
    }
    if (needMax) {
      val len = bc - ac + lit(1)
      val j = SeriesOps.log2Floor(len)
      val p2 = pow(lit(2.0), j.cast("double")).cast("long")
      g = g.withColumn(s"${tag}_j", j).withColumn(s"${tag}_b2", bc - p2 + lit(1))
      g = lookupAt(g, idx, ac, s"${tag}_ma", Seq("ms"))
      g = lookupAt(g, idx, col(s"${tag}_b2"), s"${tag}_mb", Seq("ms"))
      g = g.withColumn(
          s"${tag}_max",
          greatest(
            element_at(col(s"${tag}_ma_ms"), col(s"${tag}_j") + lit(1)),
            element_at(col(s"${tag}_mb_ms"), col(s"${tag}_j") + lit(1))))
        .drop(s"${tag}_ma_ms", s"${tag}_mb_ms", s"${tag}_j", s"${tag}_b2")
    }
    g.drop(s"${tag}_a", s"${tag}_b")
  }

  /** Per-series candidate grid with per-series domain binding: None sides
    * resolve to (tMin, tMax) of EACH series; offset default [1, extent]. */
  def candidateGrid(idx: MsIndex, spec: QuerySpec): DataFrame = {
    val xLo = spec.xDomain.lo.map(lit(_)).getOrElse(col("tMin"))
    val xHi = spec.xDomain.hi.map(lit(_)).getOrElse(col("tMax"))
    val lxLo = spec.lxDomain.lo.map(lit(_)).getOrElse(lit(1L))
    val lxHi = spec.lxDomain.hi.map(lit(_)).getOrElse(col("tMax") - col("tMin") + 1)
    idx.bounds
      .withColumn("x", explode(sequence(xLo.cast("long"), xHi.cast("long"))))
      .withColumn("lx", explode(sequence(lxLo.cast("long"), lxHi.cast("long"))))
      .where(col("x") + col("lx") <= col("tMax"))
      .select("sid", "x", "lx", "tMin", "tMax")
  }

  /** Execute the query independently over every series; returns
    * `(sid, time_id, offset)` in canonical per-series order. */
  def execute(spark: SparkSession, series: DataFrame, spec: QuerySpec,
      maxRunRows: Long = DefaultMaxRunRows): DataFrame = {
    // one per-sid stats pass (tiny checkpointed result, one row per sid):
    // feeds domain binding, the oversized-series routing decision, AND the
    // grid bounds — replacing the post-build bounds re-aggregation
    val stats = series.groupBy("sid")
      .agg(min("t").as("tMin"), max("t").as("tMax"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    // when lx is unbounded ("whole series") the sparse-table depth needs
    // the max extent as a driver value (levels is a structural plan
    // parameter — the same binding step the reference does)
    val lxHi = spec.lxDomain.hi.getOrElse {
      stats.agg(max(col("tMax") - col("tMin") + lit(1))).head().getLong(0) - 1
    }
    val maxWin = spec.constraints
      .map(c => ConstraintRegistry(c.name).maxWindow(lxHi, c.args))
      .foldLeft(lxHi + 1)(math.max)
    // materialize the index ONCE (lineage truncated): every probe join
    // reads the checkpointed blocks instead of re-running the kernel build
    // inside its own broadcast; series too large for the per-partition
    // kernel are routed to the partitioned two-pass build
    val built = indexRouted(series, maxWin, stats, maxRunRows)
    val ckpt = built.df.localCheckpoint(true)
    val bounds = stats.select("sid", "tMin", "tMax")
    // bounded domains probe only [xLo - win, xHi + lxHi + win] in every
    // series: pre-filter the probe view so lookups join O(domain) rows per
    // series, not O(series) (bounds still read the full index)
    val probeDf = (spec.xDomain.lo, spec.xDomain.hi, spec.lxDomain.hi) match {
      case (Some(xl), Some(xh), Some(lxh)) =>
        val slack = 1L << built.levels
        ckpt.where(col("t").between(xl - slack, xh + lxh + slack))
      case _ => ckpt // an unbounded side binds per series; keep the full view
    }
    val idx = MsIndex(probeDf, bounds, built.levels)
    var g = candidateGrid(idx, spec)
    val cs = spec.constraints.zipWithIndex
    val p = probe(idx)
    cs.foreach { case (c, i) => g = ConstraintRegistry(c.name)(g, p, c.args, s"c$i") }
    // drop the memoized probe intermediates before scoring/persisting
    g = g.select((Seq("sid", "x", "lx") ++ cs.map { case (_, i) => s"c$i" }).map(col): _*)

    def satCol(c: Constraint, v: Column): Column =
      c.lo.map(v >= lit(_)).getOrElse(lit(true)) &&
        c.hi.map(v <= lit(_)).getOrElse(lit(true))

    if (!spec.refined) {
      val allSat = cs.map { case (c, i) => satCol(c, col(s"c$i")) }.reduce(_ && _)
      val sat = g.where(allSat)
      val ordered = spec.limit match {
        case Some(k) =>
          val w = Window.partitionBy("sid").orderBy(col("x"), col("lx"))
          sat.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k).drop("__rn")
        case None => sat
      }
      ordered.select(col("sid"), col("x").as("time_id"), col("lx").as("offset"))
        .orderBy("sid", "time_id", "offset")
    } else {
      val k = spec.limit.getOrElse(Int.MaxValue)
      // persist only when the output is bounded (k rows per series): the
      // cached grid is released after the result materializes below. With no
      // limit, stay lazy — the extrema aggregate recomputes the probes once.
      val persisted = spec.limit.isDefined
      if (persisted) g = g.persist()
      // per-series extrema (the reference's 'mins'/'maxs', per sid)
      val ext = g.groupBy("sid").agg(
        cs.flatMap { case (_, i) =>
          Seq(min(col(s"c$i")).as(s"min_c$i"), max(col(s"c$i")).as(s"max_c$i"))
        }.head,
        cs.flatMap { case (_, i) =>
          Seq(min(col(s"c$i")).as(s"min_c$i"), max(col(s"c$i")).as(s"max_c$i"))
        }.tail: _*)
      var s = g.join(broadcast(ext), "sid")
      cs.foreach { case (c, i) => s = s.withColumn(s"sat$i", satCol(c, col(s"c$i"))) }
      val nSat = cs.map { case (_, i) => col(s"sat$i").cast("int") }.reduce(_ + _)
      s = s.withColumn("sat", cs.map { case (_, i) => col(s"sat$i") }.reduce(_ && _))
        .withColumn("vc", (lit(cs.size) - nSat).cast("double") / lit(cs.size))
      val rds = cs.map { case (c, i) =>
        val t = col(s"c$i")
        val above = c.hi.map(bb => when(t > lit(bb), (t - lit(bb)) / (col(s"max_c$i") - lit(bb))))
        val below = c.lo.map(aa => when(t < lit(aa), (lit(aa) - t) / (lit(aa) - col(s"min_c$i"))))
        (above, below) match {
          case (Some(ab), Some(be)) => ab.otherwise(be.otherwise(lit(0.0)))
          case (Some(ab), None)     => ab.otherwise(lit(0.0))
          case (None, Some(be))     => be.otherwise(lit(0.0))
          case (None, None)         => lit(0.0)
        }
      }
      val maxRd = if (rds.size == 1) rds.head else greatest(rds: _*)
      s = s.withColumn("rp", lit(0.5) * maxRd + lit(0.5) * col("vc"))
      val w = 1.0 / cs.size
      val rkSum = cs.map { case (c, i) =>
        val t = col(s"c$i")
        val a = c.lo.map(lit(_)).getOrElse(col(s"min_c$i"))
        val b = c.hi.map(lit(_)).getOrElse(col(s"max_c$i"))
        val num = c.target match {
          case Target.Max => b - t
          case Target.Min => a - t
        }
        lit(w) * when(b - a =!= lit(0.0), num / (b - a)).otherwise(lit(0.0))
      }.reduce(_ + _)
      s = s.withColumn("rk", lit(1.0) - rkSum)
      val rankW = Window.partitionBy("sid").orderBy(
        col("sat").desc,
        when(col("sat"), -col("rk")).otherwise(col("rp")).asc,
        col("x").asc, col("lx").asc)
      val res = s.withColumn("__rn", row_number().over(rankW))
        .where(col("__rn") <= k)
        .select(col("sid"), col("x").as("time_id"), col("lx").as("offset"))
        .orderBy("sid", "time_id", "offset")
      if (persisted) {
        // materialize the bounded result, truncate its lineage off the cached
        // grid, then release the cache (no block accumulation across queries)
        val out = res.localCheckpoint(true)
        g.unpersist()
        out
      } else res
    }
  }
}
