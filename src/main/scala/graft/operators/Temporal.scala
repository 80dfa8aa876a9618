package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark has no built-in for: as-of join and gap-based
  * sessionization. Both are single-shuffle formulations chosen for the
  * 100 TB case — no range-join explosion, no per-row subqueries.
  *
  * The reference engine is single-series and has no joins at all
  * (SURVEY §2.3); these extend the engine for the event-stream tables a
  * training-data pipeline carries alongside its time series.
  */
object Temporal {

  /** Backward as-of join: for every left row, the LATEST right row with
    * `right.time <= left.time`, matched per `keys`.
    *
    * Implementation is the scalable union trick, not a range join:
    * tag both inputs, union them (right-value columns are null on left rows
    * and vice versa), then one `last(value, ignoreNulls)` running window per
    * right column, ordered by `(time, side)` inside each key partition —
    * right rows sort before left rows at equal time, so an exact-time match
    * is taken. One shuffle on `keys`, one sort, O(1) state per row — versus
    * the O(|L| x |R|) blow-up of the naive inequality join.
    *
    * Left rows with no earlier right row keep null `asof_*` columns (filter
    * on them for inner semantics). Right columns are emitted as
    * `{prefix}{col}`; include `rightTime` in `rightCols` to get the matched
    * timestamp. Ties inside the right side on `(keys, time)` are broken by
    * `rightTiebreak` (pass a unique id column for full determinism).
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTiebreak: Option[String] = None,
      prefix: String = "asof_"): DataFrame = {
    val l2 = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast("long").as("__t"), lit(0).as("__side"),
          rightTiebreak.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("__tie")) ++
        rightCols.map(c => col(c).as(prefix + c)): _*)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(prefix + c, last(col(prefix + c), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1).drop("__t", "__side", "__tie")
  }

  /** Gap-based sessionization: within each `keys` partition ordered by
    * `(timeCol, tiebreak)`, a new session starts when the gap to the previous
    * row exceeds `gap` (same unit as `timeCol`). Appends `as` = 0-based
    * per-key session ordinal. One shuffle on `keys`; lag + running sum, O(1)
    * state per row — the batch analogue of the streaming session window.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      gap: Long,
      tiebreak: Seq[String] = Seq.empty,
      as: String = "session_id"): DataFrame = {
    val ord: Seq[Column] = col(timeCol).cast("long") +: tiebreak.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    // first row per key: lag is null -> comparison null -> otherwise(0)
    val brk = when(
      col(timeCol).cast("long") - lag(col(timeCol).cast("long"), 1).over(w) > gap,
      lit(1)).otherwise(lit(0))
    df.withColumn("__brk", brk)
      .withColumn(as,
        sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .drop("__brk")
  }
}
