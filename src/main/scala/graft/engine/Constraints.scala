package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.SeriesOps.SeriesIndex

/** Registry of named interval-aggregate constraint functions — the engine's
  * extensibility point, mirroring the reference's `available_functions`
  * whitelist + name-dispatch (reference: client.py:160, server.py:328-343).
  *
  * Each function appends one Double column to the candidate grid, computed
  * for the window defined by the grid's `x` (start) and `lx` (length)
  * columns, probing the [[SeriesOps.SeriesIndex]] with O(1) equi-join
  * lookups. New constraints register as pure `DataFrame => DataFrame`
  * builders — no UDFs, everything stays inside whole-stage codegen.
  */
trait ConstraintFunction {
  def name: String
  def arity: Int

  /** Largest window length (rows) this function probes for a given grid cell;
    * used to size the sparse table. */
  def maxWindow(lxHi: Long, args: Seq[Long]): Long

  /** Append column `as` to `grid` (columns x, lx; x+lx <= tMax guaranteed). */
  def apply(grid: DataFrame, idx: SeriesIndex, args: Seq[Long], as: String): DataFrame
}

/** Mean amplitude over [x, x+lx] inclusive (reference: server.py:955-964,
  * call site 330-335). Prefix-sum formulation: two lookups per cell. */
object AvgAmp extends ConstraintFunction {
  val name = "avg_amp"
  val arity = 0
  def maxWindow(lxHi: Long, args: Seq[Long]): Long = lxHi + 1
  def apply(grid: DataFrame, idx: SeriesIndex, args: Seq[Long], as: String): DataFrame =
    SeriesOps.windowAgg(grid, idx, col("x"), col("x") + col("lx"), as + "_w",
        needAvg = true, needMax = false)
      .withColumn(as, col(as + "_w_avg"))
      .drop(as + "_w_sum", as + "_w_cnt", as + "_w_avg")
}

/** max(y[x..x+lx]) - max(y[x+lx..x+lx+n']) with n' clamped at the series end
  * (reference: server.py:967-992). */
object MaxAmpExcessRight extends ConstraintFunction {
  val name = "max_amp_excess_right"
  val arity = 1
  def maxWindow(lxHi: Long, args: Seq[Long]): Long = math.max(lxHi + 1, args.head + 1)
  def apply(grid: DataFrame, idx: SeriesIndex, args: Seq[Long], as: String): DataFrame = {
    val n = args.head
    val xp = col("x") + col("lx")
    val g1 = SeriesOps.windowAgg(grid, idx, col("x"), xp, as + "_m",
      needAvg = false, needMax = true)
    // n' = min(n, tMax - x') (reference: server.py:977-981)
    val g2 = SeriesOps.windowAgg(g1, idx, xp, least(xp + lit(n), lit(idx.tMax)),
      as + "_r", needAvg = false, needMax = true)
    g2.withColumn(as, col(as + "_m_max") - col(as + "_r_max"))
      .drop(as + "_m_max", as + "_r_max")
  }
}

/** max(y[x..x+lx]) - max(y[x-n'..x]) with n' clamped at the series start
  * (reference: server.py:995-1016, clamp at 1007-1008). */
object MaxAmpExcessLeft extends ConstraintFunction {
  val name = "max_amp_excess_left"
  val arity = 1
  def maxWindow(lxHi: Long, args: Seq[Long]): Long = math.max(lxHi + 1, args.head + 1)
  def apply(grid: DataFrame, idx: SeriesIndex, args: Seq[Long], as: String): DataFrame = {
    val n = args.head
    val g1 = SeriesOps.windowAgg(grid, idx, col("x"), col("x") + col("lx"),
      as + "_m", needAvg = false, needMax = true)
    val g2 = SeriesOps.windowAgg(g1, idx, greatest(col("x") - lit(n), lit(idx.tMin)),
      col("x"), as + "_l", needAvg = false, needMax = true)
    g2.withColumn(as, col(as + "_m_max") - col(as + "_l_max"))
      .drop(as + "_m_max", as + "_l_max")
  }
}

object ConstraintRegistry {
  private var fns: Map[String, ConstraintFunction] =
    Seq(AvgAmp, MaxAmpExcessRight, MaxAmpExcessLeft).map(f => f.name -> f).toMap

  def register(fn: ConstraintFunction): Unit = synchronized { fns += (fn.name -> fn) }
  def apply(name: String): ConstraintFunction =
    fns.getOrElse(name, throw graft.model.ParseException(
      s"unknown constraint function '$name'; available: ${fns.keys.mkString(", ")}"))
  def names: Set[String] = fns.keySet
}
