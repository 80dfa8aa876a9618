package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-first building blocks for range aggregates over a time series.
  *
  * The reference materializes each grid cell's window aggregate by slicing a
  * NumPy array per cell — O(cells x window) work with an O(N) index lookup
  * per cell (reference: server.py:303-351, 332-333, 955-1016). Here we build,
  * once per query:
  *
  *   - an inclusive prefix-sum column `s` — any window SUM/AVG becomes two
  *     O(1) lookups: `sum[a,b] = s(b) - s(a) + y(a)`;
  *   - a sparse-table RMQ column `ms` where `ms[j] = max(y[t .. t+2^j-1])`,
  *     built with ceil(log2(maxWin)) chained `lead` window passes — any
  *     window MAX becomes two O(1) lookups:
  *     `max[a,b] = greatest(ms(a)[j], ms(b-2^j+1)[j])`, j = floor(log2(len)).
  *
  * Lookups are plain equi-joins on the integer time key, so at cluster scale
  * they are shuffle/broadcast hash joins — no per-cell scans, no driver loop.
  * Total cost: O(N log maxWin) build + O(cells) probes, vs the reference's
  * O(cells x window).
  *
  * NOTE on partitioning: the reference is single-series, so the build windows
  * here are `Window.orderBy(t)` (one partition). For a multi-series corpus at
  * 100 TB, add a `series_id` column and `Window.partitionBy(series_id)
  * .orderBy(t)` — every formula below is unchanged within a partition.
  */
object SeriesOps {

  /** A series `(t: Long dense ascending, y: Double)` indexed for O(1) range
    * sum/max probes. `df` columns: t, y, s (inclusive prefix sum),
    * ms (array, ms[j] = max over [t, t+2^j-1] clamped at series end).
    */
  final case class SeriesIndex(df: DataFrame, tMin: Long, tMax: Long, levels: Int)

  /** Assign the reference's dense ascending surrogate key
    * (`time_id BIGSERIAL`, reference: db_preparation.py:59,93).
    *
    * Implemented as `row_number` over a total order. This is a single-partition
    * sort — fine up to ~10^8 rows; at 100 TB assign per-partition offsets
    * instead (zipWithIndex-style: partition row counts -> prefix offsets).
    */
  def withTimeId(df: DataFrame, orderCols: Seq[Column], as: String = "t"): DataFrame =
    df.withColumn(as, row_number().over(Window.orderBy(orderCols: _*)).cast("long"))

  /** Build the index. `maxWin` = largest window length (in rows) any probe
    * will ask for; levels = floor(log2(maxWin)) + 1.
    */
  def index(series: DataFrame, maxWin: Long): SeriesIndex = {
    val levels = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxWin)))
    val w = Window.orderBy("t")
    var df = series
      .select(col("t").cast("long").as("t"), col("y").cast("double").as("y"))
      .withColumn("s", sum("y").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("m0", col("y"))
    for (j <- 1 until levels) {
      // ms[j](t) = max(ms[j-1](t), ms[j-1](t + 2^(j-1))); truncated windows
      // near the series end are never probed (probe guarantees b <= tMax).
      df = df.withColumn(
        s"m$j",
        greatest(col(s"m${j - 1}"),
          coalesce(lead(col(s"m${j - 1}"), 1 << (j - 1)).over(w), lit(Double.NegativeInfinity))))
    }
    val indexed = df
      .withColumn("ms", array((0 until levels).map(j => col(s"m$j")): _*))
      .drop((0 until levels).map(j => s"m$j"): _*)
    val bounds = series.agg(min("t"), max("t")).head()
    SeriesIndex(indexed, bounds.getLong(0), bounds.getLong(1), levels)
  }

  /** Row shape produced by [[indexFast]]. */
  final case class IndexedPoint(t: Long, y: Double, s: Double, ms: Array[Double])

  /** Single-pass index build: buffers each (sorted) partition and computes
    * prefix sums + all sparse-table levels imperatively — one shuffle + one
    * sort instead of log2(maxWin) sequential window stages. Semantically
    * identical to [[index]] (asserted in EngineSpec); use for single-series
    * or per-partition-complete series. The declarative build remains the
    * reference formulation (and the multi-series engine's path).
    */
  def indexFast(series: DataFrame, maxWin: Long): SeriesIndex = {
    val levels = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxWin)))
    val spark = series.sparkSession
    import spark.implicits._
    val sorted = series
      .select(col("t").cast("long"), col("y").cast("double"))
      .as[(Long, Double)]
      .repartition(1)
      .sortWithinPartitions("t")
    val indexed = sorted.mapPartitions { it =>
      val buf = it.toArray
      if (buf.isEmpty) Iterator.empty
      else {
        val ys = buf.map(_._2)
        val s = prefixSums(ys)
        val m = buildLevels(ys, levels)
        Iterator.tabulate(buf.length) { k =>
          IndexedPoint(buf(k)._1, ys(k), s(k), Array.tabulate(levels)(j => m(j)(k)))
        }
      }
    }.toDF()
    val bounds = series.agg(min("t"), max("t")).head()
    SeriesIndex(indexed, bounds.getLong(0), bounds.getLong(1), levels)
  }

  /** [[indexFast]] fused with ordinal-key assignment: sorts by `orderCol`
    * and assigns the dense `t = 1..N` positionally inside the same pass —
    * one stage instead of row_number-window + re-sort. `tMax` needs the row
    * count (cheap parquet-footer count). */
  def indexFastFromOrdered(
      df: DataFrame, orderCol: String, valueCol: String, maxWin: Long): SeriesIndex = {
    val n = df.count()
    val spark = df.sparkSession
    import spark.implicits._
    val levels = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxWin)))
    val ys = df.select(col(orderCol), col(valueCol).cast("double").as("y"))
      .repartition(1)
      .sortWithinPartitions(orderCol)
      .select("y")
      .as[Double]
    val indexed = ys.mapPartitions { it =>
      val buf = it.toArray
      val m = buildLevels(buf, levels)
      val s = prefixSums(buf)
      Iterator.tabulate(buf.length) { k =>
        IndexedPoint(k + 1L, buf(k), s(k), Array.tabulate(levels)(j => m(j)(k)))
      }
    }.toDF()
    SeriesIndex(indexed, 1L, n, levels)
  }

  private def prefixSums(ys: Array[Double]): Array[Double] = {
    val s = new Array[Double](ys.length)
    var acc = 0.0
    var i = 0
    while (i < ys.length) { acc += ys(i); s(i) = acc; i += 1 }
    s
  }

  private def buildLevels(ys: Array[Double], levels: Int): Array[Array[Double]] = {
    val n = ys.length
    val m = Array.ofDim[Double](levels, n)
    System.arraycopy(ys, 0, m(0), 0, n)
    var j = 1
    while (j < levels) {
      val half = 1 << (j - 1)
      var i = 0
      while (i < n) {
        val other = if (i + half < n) m(j - 1)(i + half) else Double.NegativeInfinity
        m(j)(i) = math.max(m(j - 1)(i), other)
        i += 1
      }
      j += 1
    }
    m
  }

  /** Join `grid` to the index at position `pos` (an expression over grid
    * columns), adding the requested index columns renamed with `prefix`.
    * Left join: positions outside [tMin,tMax] yield nulls (callers clamp).
    *
    * NOTE on broadcast reuse: each probe builds its own broadcast of the
    * (column-pruned) index. Sharing one exchange across probes is not
    * worth forcing — Catalyst's column pruning keeps an avg probe from
    * broadcasting the sparse-table arrays an s/y lookup never reads, which
    * is the right trade at scale.
    */
  def lookupAt(
      grid: DataFrame,
      idx: SeriesIndex,
      pos: Column,
      prefix: String,
      cols: Seq[String]): DataFrame = {
    val probe = idx.df.select(
      (col("t").as(s"${prefix}_t") +: cols.map(c => col(c).as(s"${prefix}_$c"))): _*)
    grid
      .join(probe, pos === col(s"${prefix}_t"), "left")
      .drop(s"${prefix}_t")
  }

  /** floor(log2(len)) as an int column; len >= 1, exact for len <= 2^53.
    *
    * The double log is only ulp-accurate, so near powers of two a naive
    * floor(+epsilon) can land one level off (probing a sparse-table range
    * with b2 < a, or past the array end). Instead correct the approximate
    * level by comparing against exact powers of two — 2^j is exactly
    * representable as a double for every level we can hold (j < 64).
    */
  private[engine] def log2Floor(len: Column): Column = {
    val d = len.cast("double")
    val j0 = floor(log(2.0, d)).cast("int")
    val p = pow(lit(2.0), j0.cast("double"))
    when(p > d, j0 - lit(1))
      .when(p * lit(2.0) <= d, j0 + lit(1))
      .otherwise(j0)
  }

  /** The [[WindowProbe]] view of a [[SeriesIndex]]: constraint formulas are
    * written once against this surface and run identically on the
    * multi-series path ([[MultiSeriesEngine.probe]]). */
  def probe(idx: SeriesIndex): WindowProbe = new WindowProbe {
    val tMinCol: Column = lit(idx.tMin)
    val tMaxCol: Column = lit(idx.tMax)
    def windowAgg(grid: DataFrame, a: Column, b: Column, tag: String,
        needAvg: Boolean, needMax: Boolean): DataFrame = {
      val g = SeriesOps.windowAgg(grid, idx, a, b, tag, needAvg, needMax)
      if (needAvg) g.drop(s"${tag}_sum", s"${tag}_cnt") else g
    }
  }

  /** Append `{tag}_sum`, `{tag}_cnt`, `{tag}_avg` and/or `{tag}_max` for the
    * inclusive window [a, b] (caller guarantees tMin <= a <= b <= tMax).
    * Costs at most 3 equi-joins; shared positions could be merged by callers
    * that batch several windows.
    */
  def windowAgg(
      grid: DataFrame,
      idx: SeriesIndex,
      a: Column,
      b: Column,
      tag: String,
      needAvg: Boolean,
      needMax: Boolean): DataFrame = {
    var g = grid.withColumn(s"${tag}_a", a.cast("long")).withColumn(s"${tag}_b", b.cast("long"))
    val ac = col(s"${tag}_a")
    val bc = col(s"${tag}_b")
    if (needAvg) {
      g = lookupAt(g, idx, ac, s"${tag}_la", Seq("s", "y"))
      g = lookupAt(g, idx, bc, s"${tag}_lb", Seq("s"))
      val len = (bc - ac + lit(1)).cast("double")
      val sumc = col(s"${tag}_lb_s") - col(s"${tag}_la_s") + col(s"${tag}_la_y")
      g = g.withColumn(s"${tag}_sum", sumc)
        .withColumn(s"${tag}_cnt", len)
        .withColumn(s"${tag}_avg", sumc / len)
        .drop(s"${tag}_la_s", s"${tag}_la_y", s"${tag}_lb_s")
    }
    if (needMax) {
      val len = bc - ac + lit(1)
      val j = log2Floor(len)
      // shiftleft's numBits arg is a literal Int, so compute 2^j via pow
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
}
