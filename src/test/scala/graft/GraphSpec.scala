package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** The integer-PageRank contracts: exact hand-computed flow for one
  * round, the uniform fixed point on a regular cycle, dangling mass
  * shed (never invented), the global mass ceiling, and partitioning
  * invariance (the sums are integer, so layout can't change a digit).
  */
class GraphSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)],
      iters: Int): Map[String, (Long, Long, Long)] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("one round matches the hand-computed integer flow") {
    // A -(2)-> B, A -(1)-> C, B -(1)-> C, C -(1)-> A; n = 3
    // pr0 = 10^12 div 3 = 333333333333; damp = (pr0*85) div 100 =
    // 283333333333; teleport = (15*10^10) div 3 = 50000000000
    // A (W=3): to B (damp div 3)*2 + ((damp mod 3)*2) div 3 = 188888888888
    //          to C (damp div 3)*1 = 94444444444
    // B (W=1): to C damp = 283333333333;  C (W=1): to A damp
    val got = ranks(
      Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L), ("C", "A", 1L)),
      iters = 1)
    assert(got("A") == ((3L, 1L, 50000000000L + 283333333333L)))
    assert(got("B") == ((1L, 2L, 50000000000L + 188888888888L)))
    assert(got("C") == ((1L, 2L, 50000000000L + 94444444444L + 283333333333L)))
  }

  test("a regular cycle is the uniform fixed point at any depth") {
    val cycle = Seq(("A", "B", 1L), ("B", "C", 1L), ("C", "A", 1L))
    val got = ranks(cycle, iters = 5)
    // pr stays at the uniform start: teleport + damp(pr) = pr exactly
    // for pr = 10^12 div 3 (50000000000 + 283333333333 = 333333333333)
    got.values.foreach { case (_, _, pr) => assert(pr == 333333333333L) }
  }

  test("redistributeDangling: hand-computed chain; off-mode unchanged; no-op without dangling nodes") {
    // A -> B -> C, C dangling; n = 3, pr0 = 333333333333 each,
    // damp = 283333333333, teleport = 50000000000.
    // D = damp(C) = 283333333333, share = D div 3 = 94444444444.
    // pr1(A) = teleport + share = 144444444444
    // pr1(B) = teleport + damp(A) + share = 427777777777
    // pr1(C) = teleport + damp(B) + share = 427777777777
    val chain = Seq(("A", "B", 1L), ("B", "C", 1L)).toDF("src", "dst", "w")
    val on = Graph.pageRank(chain, "src", "dst", "w", iters = 1,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(on == Map("A" -> 144444444444L, "B" -> 427777777777L,
      "C" -> 427777777777L))
    assert(on.values.sum <= Graph.PrScale, "floors still only shed mass")
    // flag OFF keeps the absorb semantics (the default is unchanged)
    val off = Graph.pageRank(chain, "src", "dst", "w", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(off("A") == 50000000000L && on.values.sum > off.values.sum)
    // on a graph with NO dangling nodes the flag is a bit-exact no-op
    val cyc = Seq(("A", "B", 1L), ("B", "C", 1L), ("C", "A", 1L))
      .toDF("src", "dst", "w")
    val a = Graph.pageRank(cyc, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val b = Graph.pageRank(cyc, "src", "dst", "w", iters = 3,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a == b)
    // and the converged form is a drop-in for the fixed form with the
    // flag threaded through
    val c = Graph.pageRankConverged(chain, "src", "dst", "w",
      maxIters = 3, tolScaled = 0L, redistributeDangling = true)
    val got = c.ranks.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.engine.Checkpoints.release(c.ranks)
    val fixed = Graph.pageRank(chain, "src", "dst", "w", iters = c.rounds,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == fixed)
  }

  test("dangling nodes absorb mass; nothing is invented") {
    // A -> B, B dangling: B's damp share leaves the system
    val got = ranks(Seq(("A", "B", 1L)), iters = 1)
    // n = 2: pr0 = 500000000000, teleport = 75000000000
    assert(got("A") == ((1L, 0L, 75000000000L)))
    assert(got("B") == ((0L, 1L, 75000000000L + 425000000000L)))
    val total = got.values.map(_._3).sum
    assert(total < Graph.PrScale, "dangling mass must shed, not conserve")
  }

  test("total mass never exceeds the scale (floors only shed)") {
    val edges = for {
      i <- 0 until 40
      j <- Seq((i * 7 + 3) % 40, (i * 13 + 5) % 40) if j != i
    } yield (s"n$i", s"n$j", (i % 3 + 1).toLong)
    for (it <- Seq(1, 3, 6)) {
      val total = ranks(edges, it).values.map(_._3).sum
      assert(total <= Graph.PrScale, s"iters=$it: mass $total > scale")
      assert(total > Graph.PrScale * 9L / 10L,
        s"iters=$it: implausible shed (no dangling nodes here): $total")
    }
  }

  test("result is invariant to input partitioning (integer sums)") {
    val edges = (for {
      i <- 0 until 25
      j <- Seq((i * 11 + 2) % 25, (i * 3 + 7) % 25) if j != i
    } yield (s"h$i", s"h$j", ((i * j) % 5 + 1).toLong)).toDF("src", "dst", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, "src", "dst", "w", 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    assert(run(edges.repartition(7)) == run(edges.coalesce(1)))
  }

  test("personalized PageRank: one hand-computed seeded round") {
    // same graph as the first test, all mass starting at seed A:
    // damp(A) = (10^12*85) div 100 = 850000000000, W = 3
    //   to B: (damp div 3)*2 + ((damp mod 3)*2) div 3 = 566666666666
    //   to C: damp div 3 = 283333333333
    // B and C start at 0 and contribute nothing; teleport 15e10 at A only
    val got = Graph.personalizedPageRank(
      Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L), ("C", "A", 1L))
        .toDF("src", "dst", "w"),
      "src", "dst", "w", iters = 1, seed = "A")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("A") == 150000000000L)
    assert(got("B") == 566666666666L)
    assert(got("C") == 283333333333L)
  }

  test("personalized PageRank: hosts unreachable from the seed rank exactly 0") {
    val got = Graph.personalizedPageRank(
      Seq(("A", "B", 1L), ("C", "A", 1L)).toDF("src", "dst", "w"),
      "src", "dst", "w", iters = 3, seed = "A")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("C") == 0L, "C has no in-path from A: structural zero")
    assert(got("A") > 0L && got("B") > 0L)
  }

  test("non-positive edge weights fail loud, not silently corrupt") {
    val bad = Seq(("A", "B", 0L), ("B", "A", 1L)).toDF("src", "dst", "w")
    val e = intercept[Exception] {
      Graph.pageRank(bad, "src", "dst", "w", 1).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("non-positive edge weight") ||
        Option(e.getCause).exists(
          _.getMessage.contains("non-positive edge weight"))),
      s"got: ${e.getMessage}")
  }

  test("multi-edge rows pre-sum into one weighted edge") {
    // (A,B) listed twice must equal (A,B) with the summed weight
    val split = ranks(Seq(("A", "B", 1L), ("A", "B", 1L), ("B", "A", 2L)), 2)
    val merged = ranks(Seq(("A", "B", 2L), ("B", "A", 2L)), 2)
    assert(split == merged)
  }

  test("pageRankConverged: early exact convergence stops the loop and equals fixed-iters") {
    // a regular cycle reaches its integer fixed point after ROUND 1
    // (uniform start is already the fixed point), so with tol 0 the
    // convergence form must stop at rounds = 1 with delta = 0 and match
    // pageRank at ANY fixed depth bit for bit
    val cycle = Seq(("A", "B", 1L), ("B", "C", 1L), ("C", "A", 1L))
      .toDF("src", "dst", "w")
    val c = Graph.pageRankConverged(cycle, "src", "dst", "w",
      maxIters = 20, tolScaled = 0L)
    assert(c.rounds == 1 && c.delta == 0L)
    val got = c.ranks.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    graft.engine.Checkpoints.release(c.ranks)
    assert(got == ranks(Seq(("A", "B", 1L), ("B", "C", 1L), ("C", "A", 1L)), 7))
  }

  test("pageRankConverged: on a non-trivial graph, rounds-run equals fixed-iters bit for bit") {
    val edges = Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L),
      ("C", "A", 1L)).toDF("src", "dst", "w")
    var observed = List.empty[(Int, Long)]
    val c = Graph.pageRankConverged(edges, "src", "dst", "w",
      maxIters = 4, tolScaled = 0L,
      onRound = (r, d) => observed = (r, d) :: observed)
    // this graph does not hit an exact integer fixed point in 4 rounds:
    // the loop must run to maxIters, and the observer fires per round
    // with non-increasing-to-zero deltas recorded in order
    assert(c.rounds == 4)
    assert(observed.reverse.map(_._1) == List(1, 2, 3, 4))
    assert(observed.head._2 == c.delta)
    val got = c.ranks.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.engine.Checkpoints.release(c.ranks)
    val fixed = Graph.pageRank(edges, "src", "dst", "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == fixed, "convergence form must be a drop-in, not a second semantics")
  }

  test("personalizedPageRankConverged: seeded converged equals seeded fixed-iters bit for bit") {
    val edges = Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L),
      ("C", "A", 1L)).toDF("src", "dst", "w")
    val c = Graph.personalizedPageRankConverged(edges, "src", "dst", "w",
      maxIters = 4, tolScaled = 0L, seed = "A")
    assert(c.rounds == 4)
    val got = c.ranks.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.engine.Checkpoints.release(c.ranks)
    val fixed = Graph.personalizedPageRank(edges, "src", "dst", "w",
        iters = 4, seed = "A")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == fixed,
      "seeded convergence form must be a drop-in for the seeded fixed form")
    // structural zero survives the converged loop: a node unreachable
    // from the seed stays at rank 0 through every round
    val c2 = Graph.personalizedPageRankConverged(
      Seq(("A", "B", 1L), ("C", "A", 1L)).toDF("src", "dst", "w"),
      "src", "dst", "w", maxIters = 6, tolScaled = 0L, seed = "A")
    val got2 = c2.ranks.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.engine.Checkpoints.release(c2.ranks)
    assert(got2("C") == 0L && got2("A") > 0L && got2("B") > 0L)
  }

  test("small-graph local solve equals the distributed rounds bit for bit, all modes") {
    // the scale-adaptive fork: under the conf gates the whole iteration
    // runs in one task; this pins local ≡ distributed on seeded random
    // weighted graphs (with planted dangling sinks) for the uniform,
    // seeded, and dangling-redistribution modes, fixed AND converged
    // forms — so the hand-computed pins above (which now exercise the
    // local kernel) transfer to the distributed path and vice versa.
    def collectRanks(df: org.apache.spark.sql.DataFrame) = {
      val m = df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      graft.engine.Checkpoints.release(df)
      m
    }
    def forceDistributed[A](body: => A): A = {
      spark.conf.set(Graph.LocalEdgeLimitKey, "0")
      try body finally spark.conf.unset(Graph.LocalEdgeLimitKey)
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 8 + rnd.nextInt(8)
      val hosts = (0 until n).map(i => s"h$i")
      val edges = (Seq.fill(12 + rnd.nextInt(20))(
        (hosts(rnd.nextInt(n)), hosts(rnd.nextInt(n)),
          1L + rnd.nextInt(4))) ++
        // planted dangling sinks: in-links only
        Seq((hosts(0), "sink0", 2L), (hosts(1 % n), "sink1", 1L)))
        .toDF("src", "dst", "w")
      for (redistribute <- Seq(false, true)) {
        val local = collectRanks(Graph.pageRank(
          edges, "src", "dst", "w", iters = 4, redistribute))
        val dist = forceDistributed(collectRanks(Graph.pageRank(
          edges, "src", "dst", "w", iters = 4, redistribute)))
        assert(local == dist, s"seed $seed uniform redistribute=$redistribute")
      }
      val localSeeded = collectRanks(Graph.personalizedPageRank(
        edges, "src", "dst", "w", iters = 4, seed = hosts(0)))
      val distSeeded = forceDistributed(collectRanks(
        Graph.personalizedPageRank(
          edges, "src", "dst", "w", iters = 4, seed = hosts(0))))
      assert(localSeeded == distSeeded, s"seed $seed seeded")
      val localConv = Graph.pageRankConverged(
        edges, "src", "dst", "w", maxIters = 6, tolScaled = 0L)
      val distConv = forceDistributed(Graph.pageRankConverged(
        edges, "src", "dst", "w", maxIters = 6, tolScaled = 0L))
      assert(localConv.rounds == distConv.rounds &&
        localConv.delta == distConv.delta, s"seed $seed converged stats")
      assert(collectRanks(localConv.ranks) == collectRanks(distConv.ranks),
        s"seed $seed converged ranks")
    }
  }
}
