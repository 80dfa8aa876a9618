package graft.model

/** Core query model for CP-refinement queries over time series.
  *
  * Mirrors the observable semantics of the reference's query IR
  * (reference: client.py:163-175 `query_dict`) re-expressed as typed
  * case classes. Pure — no Spark dependency.
  */
sealed trait Target
object Target {
  /** reference: 'maximization' (client.py:260-266) */
  case object Max extends Target
  /** reference: 'minimization' */
  case object Min extends Target
}

/** Closed integer interval; `None` side = unbounded
  * (reference: client.py:159, server.py:146-169 resolves None from MIN/MAX). */
final case class Domain(lo: Option[Long], hi: Option[Long])

/** A named interval constraint: `name(args) in [lo, hi] target`
  * (reference: client.py:236-268; bst_class.py:26-51 NodeVariable). */
final case class Constraint(
    name: String,
    args: Seq[Long],
    lo: Option[Double],
    hi: Option[Double],
    target: Target)

/** A parsed CP-refinement query
  * (grammar: reference README.md:62-82).
  *
  * Decision variables are always the pair `(time_id, offset)`
  * (reference: client.py:208-211). `refined` selects automatic
  * relaxation/tightening (reference: server.py:60-78).
  */
final case class QuerySpec(
    table: String,
    column: String,
    xDomain: Domain,
    lxDomain: Domain,
    constraints: Seq[Constraint],
    limit: Option[Int],
    refined: Boolean)

/** Typed parse failure — replaces the reference's `earlyDeath`/`quit(1)`
  * (client.py:296-303) with a recoverable error. */
final case class ParseException(message: String) extends Exception(message)
