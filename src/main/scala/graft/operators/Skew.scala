package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling for hot keys at cluster scale. AQE's skew-join split covers
  * sort-merge joins; these cover the two shapes AQE doesn't: skewed
  * aggregation and a skewed fact side joined against a replicable dimension.
  *
  * Salting is deterministic (hash-derived), so results stay reproducible.
  */
object Skew {

  /** One aggregate in a salted two-phase plan: `partial` runs per
    * (key, salt), `fin` recombines partials per key — e.g. sum/sum,
    * count/sum, max/max. */
  final case class SaltedAgg(
      valueCol: String,
      partial: Column => Column,
      fin: Column => Column,
      as: String)

  /** Two-phase salted aggregation: a hot group key is split across
    * `numSalts` sub-keys for the partial aggregate, then re-combined. Only
    * the (tiny) per-(key, salt) partials cross the second shuffle, so no
    * single reducer ever sees a hot key's full row set.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      numSalts: Int,
      aggs: Seq[SaltedAgg]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltSource), lit(numSalts)))
    val partial = salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(aggs.head.partial(col(aggs.head.valueCol)).as("__p0"),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.partial(col(a.valueCol)).as(s"__p${i + 1}")
        }: _*)
    partial
      .groupBy(col("key"))
      .agg(aggs.head.fin(col("__p0")).as(aggs.head.as),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.fin(col(s"__p${i + 1}")).as(a.as)
        }: _*)
  }

  /** Salted join of a skewed fact table against a small dimension: the fact
    * side gets a deterministic salt in [0, numSalts); the dimension is
    * replicated once per salt (cheap — the dim is small), and the join key
    * becomes (key, salt), so every salt bucket of a hot key lands on a
    * different reducer.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      numSalts: Int,
      saltSource: Column): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltSource), lit(numSalts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
