package graft

import org.apache.spark.sql.DataFrame

/** Constructed- and randomized-graph proofs for [[operators.KCore]] —
  * the fixture query's DuckDB oracle pins cross-engine convergence;
  * this suite pins the SEMANTICS against an independent plain-Scala
  * peeler, including the cascade case (a chain peels one vertex per
  * round) and the empty-core case.
  */
class KCoreSpec extends SparkSpecBase {

  /** Independent reference: peel undirected edges to the k-core. */
  private def peel(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var alive = edges.flatMap(e => Set(e._1, e._2))
    var done = false
    while (!done) {
      val deg = alive.map { v =>
        v -> edges.count { case (a, b) =>
          (a == v && alive(b)) || (b == v && alive(a))
        }
      }.toMap
      val next = alive.filter(deg(_) >= k)
      done = next == alive
      alive = next
    }
    alive.map { v =>
      v -> edges.count { case (a, b) =>
        (a == v && alive(b)) || (b == v && alive(a))
      }
    }.toMap
  }

  private def df(edges: Set[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("u", "v")
  }

  private def run(edges: Set[(Long, Long)], k: Int): (Map[Long, Long], Int) = {
    val (res, rounds) = operators.KCore.runWithRounds(df(edges), k)
    (res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("KCore peels a chain-with-clique cascade one vertex per round") {
    // K4 clique (1,2,3,4) + chain 4-5-6-7: the chain peels from the tail,
    // one vertex per round (7, then 6, then 5) at k=2.
    val edges = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L))
    val (got, rounds) = run(edges, 2)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(rounds >= 4, s"cascade should take one round per chain vertex, got $rounds")
  }

  test("KCore returns empty when no k-core exists") {
    // a tree has no 2-core
    val edges = Set((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 6L))
    val (got, _) = run(edges, 2)
    assert(got.isEmpty)
  }

  test("KCore equals the plain-Scala peeler on randomized graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(20)
      val m = n + rnd.nextInt(2 * n)
      val edges = (1 to m).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).toSet
      val k = 2 + rnd.nextInt(2)
      val expect = peel(edges, k).map { case (v, d) => v -> d.toLong }
      val (got, _) = run(edges, k)
      assert(got == expect, s"trial $trial k=$k: got $got expected $expect")
    }
  }
}
