package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of the mergeable sketches (x79 count–min, x80 HyperLogLog). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def stream = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
    Seq.fill(9)("gamma") ++ Seq.fill(1)("delta")

  test("cms: est >= exact for every value; exact when collision-free") {
    val df = stream.toDF("v")
    val sk = Sketch.cmsSketch(df, "v", 2048, 4)
    val est = Sketch.cmsEstimate(df, sk, "v", 2048, 4)
      .as[(String, Long)].collect().toMap
    val exact = stream.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} < exact $n")
    }
    // 4 distinct values in 4×2048 cells: no collisions, est == exact
    assert(est == exact, s"$est vs $exact")
    // a value never seen estimates 0 (its cells may be empty)
    val unseen = Sketch.cmsEstimate(Seq("zz9qx").toDF("v"), sk, "v", 2048, 4)
      .as[(String, Long)].collect().toMap
    assert(unseen("zz9qx") >= 0L)
  }

  test("cms: width-1 forces total-count collisions; deeper sketch estimates tighter") {
    val df = stream.toDF("v")
    // every value hashes to the single cell per row → est = stream size
    val sk1 = Sketch.cmsSketch(df, "v", 1, 2)
    val est1 = Sketch.cmsEstimate(df, sk1, "v", 1, 2)
      .as[(String, Long)].collect().toMap
    assert(est1.values.toSet == Set(stream.size.toLong), est1.toString)
    // min over more rows can only tighten: est(depth 4) <= est(depth 1)
    // on a deliberately collision-heavy width
    val skA = Sketch.cmsSketch(df, "v", 2, 1)
    val skB = Sketch.cmsSketch(df, "v", 2, 4)
    val a = Sketch.cmsEstimate(df, skA, "v", 2, 1).as[(String, Long)]
      .collect().toMap
    val b = Sketch.cmsEstimate(df, skB, "v", 2, 4).as[(String, Long)]
      .collect().toMap
    a.keys.foreach(k => assert(b(k) <= a(k), s"$k: ${b(k)} > ${a(k)}"))
  }

  test("cms: cells merge across shards (sum) to the one-shot sketch; null/empty handling") {
    val (s1, s2) = stream.splitAt(30)
    val merged = Sketch.cmsSketch(s1.toDF("v"), "v", 64, 3)
      .unionByName(Sketch.cmsSketch(s2.toDF("v"), "v", 64, 3))
      .groupBy("row", "pos").agg(sum("c").as("c"))
    val oneShot = Sketch.cmsSketch(stream.toDF("v"), "v", 64, 3)
    assert(merged.as[(Int, Long, Long)].collect().sorted.toSeq ==
      oneShot.as[(Int, Long, Long)].collect().sorted.toSeq)
    // nulls are skipped, not hashed
    val withNull = (stream :+ null.asInstanceOf[String]).toDF("v")
    assert(Sketch.cmsSketch(withNull, "v", 64, 3)
      .agg(sum("c")).as[Long].head() == stream.size.toLong * 3)
    intercept[IllegalArgumentException] {
      Sketch.cmsSketch(stream.toDF("v"), "v", 0, 4)
    }
    intercept[IllegalArgumentException] {
      Sketch.cmsEstimate(stream.toDF("v"), oneShot.drop("c"), "v", 64, 3)
    }
  }

  test("hll: registers max-merge across shards to the one-shot state") {
    val vals = (1L to 5000L).map(i => ("g", s"tok$i")).toDF("k", "v")
    val (a, b) = ((1L to 3000L), (2500L to 5000L)) // overlapping shards
    val ra = Sketch.hllRegisters(
      a.map(i => ("g", s"tok$i")).toDF("k", "v"), Seq("k"), "v", 8)
    val rb = Sketch.hllRegisters(
      b.map(i => ("g", s"tok$i")).toDF("k", "v"), Seq("k"), "v", 8)
    val merged = ra.unionByName(rb).groupBy("k", "bucket")
      .agg(max("reg").as("reg"))
    val oneShot = Sketch.hllRegisters(vals, Seq("k"), "v", 8)
    assert(merged.as[(String, Long, Long)].collect().sorted.toSeq ==
      oneShot.as[(String, Long, Long)].collect().sorted.toSeq)
  }

  test("hll: deterministic estimate lands within the 1.04/sqrt(m) error band") {
    // md5 hashing → the error is DETERMINISTIC, so these are exact pins,
    // not flaky statistical bounds: p=8 (m=256) expects ~6.5% rel error
    val n = 20000L
    val vals = (1L to n).map(i => ("g", s"item:$i")).toDF("k", "v")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(vals, Seq("k"), "v", 8), Seq("k"), 8)
      .as[(String, Long)].head()._2
    assert(math.abs(est - n).toDouble / n < 0.10, s"est $est for n $n")
    // duplicates don't move the registers: distinct-ness is the point
    val dup = vals.unionByName(vals).unionByName(vals)
    val estDup = Sketch.hllEstimate(
      Sketch.hllRegisters(dup, Seq("k"), "v", 8), Seq("k"), 8)
      .as[(String, Long)].head()._2
    assert(estDup == est)
  }

  test("hll: small-range linear counting engages and stays accurate") {
    val n = 30L
    val vals = (1L to n).map(i => ("g", s"s$i")).toDF("k", "v")
    val regs = Sketch.hllRegisters(vals, Seq("k"), "v", 8)
    // fewer observed buckets than values is possible, but V <= n << m
    assert(regs.count() <= n)
    val est = Sketch.hllEstimate(regs, Seq("k"), 8)
      .as[(String, Long)].head()._2
    assert(math.abs(est - n).toDouble / n < 0.25, s"est $est for n $n")
    // grouped: keys estimate independently
    val two = vals.unionByName(
      (1L to 4000L).map(i => ("h", s"t$i")).toDF("k", "v"))
    val byK = Sketch.hllEstimate(
      Sketch.hllRegisters(two, Seq("k"), "v", 8), Seq("k"), 8)
      .as[(String, Long)].collect().toMap
    assert(byK("g") == est, "an unrelated key must not disturb g")
    assert(math.abs(byK("h") - 4000L).toDouble / 4000 < 0.10, byK.toString)
    intercept[IllegalArgumentException] {
      Sketch.hllRegisters(vals, Seq("k"), "v", 3)
    }
    intercept[IllegalArgumentException] {
      Sketch.hllRegisters(vals, Seq("bucket"), "v", 8)
    }
  }

  test("kmv: state is the k smallest distinct hashes; merge == one-shot") {
    val vals = (1 to 500).map(i => s"v$i").toDF("v")
    val k = 32
    val st = Sketch.kmvState(vals, "v", k).as[Long].collect()
    assert(st.length == k && st.distinct.length == k)
    // the state IS the bottom-k of the full distinct hash set
    val all = Sketch.kmvState(vals, "v", 1 << 16).as[Long].collect().sorted
    assert(st.sorted.toSeq == all.take(k).toSeq)
    // shard merge equals the one-shot state bit-for-bit
    val sh1 = Sketch.kmvState(vals.filter(length($"v") % 2 === 0), "v", k)
    val sh2 = Sketch.kmvState(vals.filter(length($"v") % 2 === 1), "v", k)
    val merged = Sketch.kmvMerge(Seq(sh1, sh2), k).as[Long].collect().sorted
    assert(merged.toSeq == st.sorted.toSeq, "merge must equal one-shot")
    // duplicates and nulls don't perturb the sample
    val dup = Sketch.kmvState(vals.unionByName(vals)
      .unionByName(Seq.empty[String].toDF("v")
        .unionByName(spark.sql("SELECT CAST(NULL AS STRING) AS v"))), "v", k)
      .as[Long].collect().sorted
    assert(dup.toSeq == st.sorted.toSeq)
    intercept[IllegalArgumentException] { Sketch.kmvState(vals, "v", 1) }
  }

  test("kmv: overlap estimates union/intersection; exact in the small regime") {
    // big regime: 600 left-only, 600 shared, 600 right-only, k=128
    val a = ((1 to 600).map(i => s"l$i") ++ (1 to 600).map(i => s"s$i")).toDF("v")
    val b = ((1 to 600).map(i => s"r$i") ++ (1 to 600).map(i => s"s$i")).toDF("v")
    val k = 128
    val row = Sketch.kmvOverlap(
      Sketch.kmvState(a, "v", k), Sketch.kmvState(b, "v", k), k)
      .as[(Long, Long, Long, Long)].head()
    val (kEff, jNum, unionEst, interEst) = row
    assert(kEff == k)
    // true union 1800, intersection 600, jaccard 1/3
    assert(math.abs(unionEst - 1800.0) / 1800 < 0.25, s"union_est $unionEst")
    assert(math.abs(interEst - 600.0) / 600 < 0.40, s"inter_est $interEst")
    assert(interEst == jNum * unionEst / kEff)
    // small regime: everything fits in k -> all four EXACT
    val sa = Seq("a", "b", "c", "d").toDF("v")
    val sb = Seq("c", "d", "e").toDF("v")
    val ex = Sketch.kmvOverlap(
      Sketch.kmvState(sa, "v", k), Sketch.kmvState(sb, "v", k), k)
      .as[(Long, Long, Long, Long)].head()
    assert(ex == ((5L, 2L, 5L, 2L)), s"small regime must be exact: $ex")
    // disjoint small corpora: zero intersection, no div-by-zero paths
    val dj = Sketch.kmvOverlap(
      Sketch.kmvState(sa, "v", k),
      Sketch.kmvState(Seq("z1", "z2").toDF("v"), "v", k), k)
      .as[(Long, Long, Long, Long)].head()
    assert(dj == ((6L, 0L, 6L, 0L)), dj.toString)
  }

  test("cms inner product: join-size est >= exact, exact when collision-free, disjoint reads 0") {
    val a = (Seq.fill(5)("u1") ++ Seq.fill(3)("u2") ++ Seq("u3")).toDF("k")
    val b = (Seq.fill(2)("u1") ++ Seq.fill(4)("u3") ++ Seq.fill(7)("u9")).toDF("k")
    val (w, d) = (2048, 4)
    val sa = Sketch.cmsSketch(a, "k", w, d)
    val sb = Sketch.cmsSketch(b, "k", w, d)
    val est = Sketch.cmsJoinSizeEstimate(sa, sb, d).as[Long].head()
    val exact = 5L * 2 + 1L * 4 // u1: 5·2, u3: 1·4
    assert(est >= exact, s"inner product must overestimate only: $est")
    assert(est == exact, s"6 keys in 4×2048 cells should be collision-free: $est")
    // width-1 degeneracy: one cell holds everything -> est = |A|·|B|
    val est1 = Sketch.cmsJoinSizeEstimate(
      Sketch.cmsSketch(a, "k", 1, d), Sketch.cmsSketch(b, "k", 1, d), d)
      .as[Long].head()
    assert(est1 == 9L * 13L, s"width-1 must read |A|·|B|: $est1")
    // disjoint key sets: every depth row reads its true 0 (the literal
    // row frame keeps rows with no colliding cells in the MIN)
    val dj = Sketch.cmsJoinSizeEstimate(
      Sketch.cmsSketch(Seq("zz1", "zz2").toDF("k"), "k", w, d), sb, d)
      .as[Long].head()
    assert(dj == 0L, s"disjoint sketches must estimate 0: $dj")
    // EMPTY sketch (zero cell rows): exact join size is 0 — must
    // short-circuit to 0, NOT trip the depth-drift raise
    val empty = Sketch.cmsSketch(
      Seq.empty[String].toDF("k").filter(col("k").isNotNull), "k", w, d)
    val ez = Sketch.cmsJoinSizeEstimate(empty, sb, d).as[Long].head()
    assert(ez == 0L, s"empty sketch must estimate 0: $ez")
    val ez2 = Sketch.cmsJoinSizeEstimate(sa, empty, d).as[Long].head()
    assert(ez2 == 0L, s"empty right sketch must estimate 0: $ez2")
    // NON-empty sketch with a depth claim larger than its build depth:
    // the row-set drift raise fires (a silent 0-row left-join read would
    // invert the overestimate-only guarantee)
    val wrongDepth = intercept[Exception] {
      Sketch.cmsJoinSizeEstimate(sa, sb, d + 2).as[Long].head()
    }
    assert(wrongDepth.getMessage.contains("depth mismatch"),
      wrongDepth.getMessage)
    intercept[IllegalArgumentException] {
      Sketch.cmsJoinSizeEstimate(sa.drop("c"), sb, d)
    }
  }

  test("quantile sketch: per-key bottom-k state; merge == one-shot; take-all regime exact") {
    // key a: 300 rows (sampled regime at k=64); key b: 40 rows (take-all)
    val df = ((1 to 300).map(i => ("a", i.toLong, i * 3L)) ++
      (1 to 40).map(i => ("b", 1000L + i, i * 10L))).toDF("k", "id", "v")
    val k = 64
    val st = Sketch.qsState(df, Seq("k"), "id", "v", k)
    val stc = st.as[(String, Long, Long)].collect()
    assert(stc.count(_._1 == "a") == k && stc.count(_._1 == "b") == 40)
    // shard merge equals the one-shot state bit-for-bit
    val sh1 = Sketch.qsState(df.filter($"id" % 2 === 0), Seq("k"), "id", "v", k)
    val sh2 = Sketch.qsState(df.filter($"id" % 2 === 1), Seq("k"), "id", "v", k)
    val merged = Sketch.qsMerge(Seq(sh1, sh2), Seq("k"), k)
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(merged == stc.sorted.toSeq, "merge must equal one-shot")
    // take-all regime: the estimates ARE the group's exact quantiles
    val q = Sketch.qsQuantiles(st, Seq("k"), Seq(500, 900, 1000))
      .as[(String, Long, Long)].collect().toSeq
    val bq = q.filter(_._1 == "b").map(t => t._2 -> t._3).toMap
    assert(bq == Map(500L -> 200L, 900L -> 360L, 1000L -> 400L), bq.toString)
    // sampled regime: median of the 3..900 staircase (true p50 = 450)
    // within the ~1/√k sampling band — deterministic given md5, so this
    // pins the OBSERVED error, not a probabilistic bound
    val aq = q.filter(_._1 == "a").map(t => t._2 -> t._3).toMap
    assert(math.abs(aq(500L) - 450L) <= 170, aq.toString)
    assert(aq(1000L) <= 900L && aq(1000L) >= 450L, aq.toString)
    // ungrouped form: constant-key partition, same take-all exactness
    val ug = Sketch.qsQuantiles(
      Sketch.qsState(df.filter($"k" === "b"), Nil, "id", "v", k),
      Nil, Seq(500)).as[(Long, Long)].collect().toSeq
    assert(ug == Seq((500L, 200L)), ug.toString)
    // fractional values raise loudly; bad params raise loudly
    val bad = Seq(("a", 1L, 2.5)).toDF("k", "id", "v")
    intercept[Exception] {
      Sketch.qsState(bad, Seq("k"), "id", "v", k).collect()
    }
    intercept[IllegalArgumentException] {
      Sketch.qsState(df, Seq("k"), "id", "v", 1)
    }
    intercept[IllegalArgumentException] {
      Sketch.qsQuantiles(st, Seq("k"), Seq(900, 500))
    }
  }
}
