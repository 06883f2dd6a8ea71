package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent BigInt replay of the pageRank contract — same Q18 base,
    * same floor-divisions, written against the MATH (not the code). */
  private def replay(edges: Seq[(Long, Long)], iters: Int,
                     d: Int = 850): Map[Long, BigInt] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val od = edges.groupBy(_._1).view.mapValues(es => BigInt(es.size)).toMap
    val base = BigInt(10).pow(18) / n
    var r = nodes.map(v => v -> base).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(od.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / od(s) }.sum).toMap
      r = nodes.map(v => v -> (
        (BigInt(1000 - d) * base +
          BigInt(d) * (contrib.getOrElse(v, BigInt(0)) + dm / n)) / 1000)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  stage: Boolean = false): Map[Long, Long] =
    Graphs.pageRank(edges.toDF("src", "dst"), "src", "dst", iters,
        stagePerIteration = stage)
      .as[(Long, Long)].collect().toMap

  test("pageRank matches an independent BigInt replay (dangling node included)") {
    // 1→2, 2→1, 2→3; node 3 is dangling — its mass redistributes
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L))
    val got = run(edges, 3)
    val want = replay(edges, 3).map { case (k, v) => k -> v.toLong }
    assert(got == want)
    // sink-fed node 3 outranks nobody pointing at it would suggest; the
    // recirculating pair must outrank the dangling sink
    assert(got(2L) > got(3L))
    // total mass stays ≈ 10^18 (floor leaks only)
    val mass = got.values.map(BigInt(_)).sum
    assert((BigInt(10).pow(18) - mass) < BigInt(1000),
      s"mass leaked more than flooring allows: $mass")
  }

  test("pageRank honors parallel-edge multiplicity as link weight") {
    // 1 links twice to 2 and once to 3: 2 must receive double share
    val weighted = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val got = run(weighted, 2)
    val want = replay(weighted, 2).map { case (k, v) => k -> v.toLong }
    assert(got == want)
    assert(got(2L) > got(3L))
  }

  test("pageRank stagePerIteration is bit-identical to the lazy plan") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    assert(run(edges, 3) == run(edges, 3, stage = true))
  }

  test("pageRank guards its parameters and reserved columns") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](
      Graphs.pageRank(e, "src", "dst", 0))
    intercept[IllegalArgumentException](
      Graphs.pageRank(e, "src", "dst", 1, dampingPerMille = 1001))
    intercept[IllegalArgumentException](
      Graphs.pageRank(Seq((1L, 2L, 3L)).toDF("src", "dst", "rank_q"),
        "src", "dst", 1))
    intercept[IllegalArgumentException](
      Graphs.pageRank(spark.emptyDataFrame
        .withColumn("src", lit(1L)).withColumn("dst", lit(2L)),
        "src", "dst", 1))
  }
}
