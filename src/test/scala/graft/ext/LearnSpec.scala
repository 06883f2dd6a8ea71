package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LearnSpec extends SparkSpec {
  import spark.implicits._

  /** Independent replay of the perceptron contract in plain Scala BigInt
    * — same md5 bucket hash, same batch-update epochs, written against
    * the MATH (not the code): tokens split on whitespace, bucket = first
    * two md5 hex digits mod n, bias is bucket n, epoch updates sum
    * y·count over docs with y·score ≤ 0. */
  private def replayTrain(docs: Seq[(Long, String, Long)], nBuckets: Int,
                          epochs: Int): Map[Int, BigInt] = {
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = f"${md(0) & 0xff}%02x"
      Integer.parseInt(hex, 16) % nBuckets
    }
    val feats: Seq[(Long, Long, Map[Int, Long])] = docs
      .filter { case (_, t, _) => t != null && t.trim.nonEmpty }
      .map { case (id, t, y) =>
        val counts = t.trim.split("\\s+").toSeq
          .groupBy(bucket).view.mapValues(_.size.toLong).toMap
        (id, y, counts + (nBuckets -> (counts.getOrElse(nBuckets, 0L) + 1L)))
      }
    var w = Map.empty[Int, BigInt].withDefaultValue(BigInt(0))
    for (_ <- 1 to epochs) {
      val mis = feats.filter { case (_, y, cnt) =>
        val s = cnt.map { case (b, c) => w(b) * c }.sum
        BigInt(y) * s <= 0
      }
      val upd = mis.flatMap { case (_, y, cnt) =>
        cnt.map { case (b, c) => b -> BigInt(y) * c } }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      w = (w.keySet ++ upd.keySet).map(b =>
        b -> (w(b) + upd.getOrElse(b, BigInt(0)))).toMap
        .withDefaultValue(BigInt(0))
    }
    w
  }

  private def score(t: String, w: Seq[Long], nBuckets: Int): BigInt = {
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      Integer.parseInt(f"${md(0) & 0xff}%02x", 16) % nBuckets
    }
    t.trim.split("\\s+").map(tok => BigInt(w(bucket(tok)))).sum +
      BigInt(w(nBuckets))
  }

  private val fixture = Seq(
    (1L, "alpha beta beta gamma", 1L),
    (2L, "delta epsilon zeta", -1L),
    (3L, "alpha alpha beta", 1L),
    (4L, "zeta zeta eta theta", -1L),
    (5L, "beta gamma gamma", 1L),
    (6L, "epsilon eta eta", -1L),
    (7L, "", 1L), // empty text: excluded from training and scoring
    (8L, null.asInstanceOf[String], -1L),
    // a positive leaning on negative vocabulary ('eta' is negative-class
    // elsewhere): epoch 1's all-docs update misclassifies it, so epochs
    // 2 and 3 make REAL corrections (verified: update sets of size 7/1/1
    // across epochs 1..3, zero training error from epoch 4)
    (9L, "gamma eta eta", 1L))

  private def trainFixture(epochs: Int, nBuckets: Int = 16,
                           stage: Boolean = false): Seq[Long] =
    Learn.perceptronTrain(fixture.toDF("doc_id", "text", "y"),
      "text", "doc_id", "y", nBuckets, epochs, stageFeatures = stage)

  test("perceptronTrain matches an independent BigInt replay, epoch by epoch") {
    for (epochs <- 1 to 3) {
      val got = trainFixture(epochs)
      val want = replayTrain(fixture, 16, epochs)
      (0 to 16).foreach { b =>
        assert(BigInt(got(b)) == want(b),
          s"epochs=$epochs bucket=$b: got ${got(b)}, want ${want(b)}")
      }
    }
  }

  test("weights are order- and partitioning-invariant (batch updates are sums)") {
    val base = trainFixture(3)
    val shuffled = Learn.perceptronTrain(
      fixture.reverse.toDF("doc_id", "text", "y").repartition(7),
      "text", "doc_id", "y", 16, 3)
    assert(base == shuffled)
  }

  test("stageFeatures is bit-identical to the lazy plan") {
    assert(trainFixture(3) == trainFixture(3, stage = true))
  }

  test("separable data trains to zero training error") {
    // the fixture is linearly separable in bucket space (checked by
    // hand against the bucket map; 'alpha'/'epsilon' collide at bucket
    // 12 and doc 9 leans on negative vocabulary, so separation is
    // non-trivial) — verified empirically that 5 batch epochs reach a
    // separator and stay there
    val w = trainFixture(5)
    val errs = fixture.filter { case (_, t, _) => t != null && t.trim.nonEmpty }
      .count { case (_, t, y) =>
        val s = score(t, w, 16)
        (if (s > 0) 1L else -1L) != y
      }
    assert(errs == 0, s"still $errs training errors after 5 epochs")
  }

  test("perceptronScore matches the replay's deployment scoring") {
    val w = trainFixture(3)
    val got = fixture.toDF("doc_id", "text", "y")
      .filter(col("text").isNotNull && TextStats.wsTrim(col("text")) =!= "")
      .select(col("doc_id"),
        Learn.perceptronScore(col("text"), w).cast("long").as("s"))
      .as[(Long, Long)].collect().toMap
    fixture.filter { case (_, t, _) => t != null && t.trim.nonEmpty }
      .foreach { case (id, t, _) =>
        assert(BigInt(got(id)) == score(t, w, 16), s"doc $id")
      }
  }

  /** Independent BigInt replay of the centroid-threshold contract: Q20
    * floor-div mean-difference weights, threshold = accuracy-maximizing
    * candidate over distinct training scores ∪ the all-positive
    * sentinel, ties to the smallest T. */
  private def replayCentroid(docs: Seq[(Long, String, Long)],
                             nBuckets: Int,
                             hexDigits: Int = 2): (Map[Int, BigInt], BigInt) = {
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.take((hexDigits + 1) / 2).map(b => f"${b & 0xff}%02x")
        .mkString.take(hexDigits)
      Integer.parseInt(hex, 16) % nBuckets
    }
    val feats = docs.filter { case (_, t, _) => t != null && t.trim.nonEmpty }
      .map { case (id, t, y) =>
        (id, y, t.trim.split("\\s+").toSeq.groupBy(bucket)
          .view.mapValues(ts => BigInt(ts.size)).toMap)
      }
    val nPos = BigInt(feats.count(_._2 > 0))
    val nNeg = BigInt(feats.count(_._2 < 0))
    val q20 = BigInt(1) << 20
    val buckets = feats.flatMap(_._3.keys).distinct
    val w = buckets.map { b =>
      val cp = feats.filter(_._2 > 0).map(_._3.getOrElse(b, BigInt(0))).sum
      val cn = feats.filter(_._2 < 0).map(_._3.getOrElse(b, BigInt(0))).sum
      b -> ((cp * q20) / nPos - (cn * q20) / nNeg)
    }.toMap.withDefaultValue(BigInt(0))
    val scored = feats.map { case (_, y, c) =>
      (c.map { case (b, n) => w(b) * n }.sum, y) }
    val cands = (scored.map(_._1).min - 1) +: scored.map(_._1).distinct.sorted
    val best = cands.map { t =>
      (BigInt(scored.count { case (s, y) =>
        (if (s > t) 1L else -1L) == y }), t)
    }.maxBy { case (acc, t) => (acc, -t) } // acc desc, then SMALLEST t
    (w, best._2)
  }

  test("centroidThresholdTrain matches an independent BigInt replay (weights + threshold)") {
    val (wantW, wantT) = replayCentroid(fixture, 16)
    val (gotW, gotT) = Learn.centroidThresholdTrain(
      fixture.toDF("doc_id", "text", "y"), "text", "doc_id", "y", 16)
    (0 until 16).foreach { b =>
      assert(BigInt(gotW(b)) == wantW(b), s"bucket $b: ${gotW(b)} vs ${wantW(b)}")
    }
    assert(BigInt(gotT) == wantT, s"threshold $gotT vs $wantT")
  }

  test("centroid trainer is order- and partitioning-invariant") {
    val a = Learn.centroidThresholdTrain(
      fixture.toDF("doc_id", "text", "y"), "text", "doc_id", "y", 16)
    val b = Learn.centroidThresholdTrain(
      fixture.reverse.toDF("doc_id", "text", "y").repartition(5),
      "text", "doc_id", "y", 16)
    assert(a == b)
  }

  test("centroid trainer LEARNS the length rule on the real corpus (beats majority)") {
    // the catalog's degenerate-model guard: on documents with the
    // y = (>= 40 tokens) label, training accuracy must clear 0.9 — far
    // above the ~0.69 majority share — and both classes must appear in
    // the predictions (measured 0.972 at sf0.001)
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lenLabel = when(size(split(TextStats.wsTrim(col("text")),
      "\\s+")) >= 40, 1L).otherwise(-1L)
    val (w, thr) = Learn.centroidThresholdTrain(
      d.withColumn("_y", lenLabel), "text", "doc_id", "_y", 64)
    val scored = d
      .filter(col("text").isNotNull && TextStats.wsTrim(col("text")) =!= "")
      .select(lenLabel.as("y"),
        (Learn.centroidScore(col("text"), w) > thr).as("p"))
      .as[(Long, Boolean)].collect()
    val acc = scored.count { case (y, p) => (y == 1L) == p }.toDouble / scored.length
    val maj = math.max(scored.count(_._1 == 1L), scored.count(_._1 == -1L))
      .toDouble / scored.length
    assert(acc >= 0.9 && acc > maj, s"acc $acc vs majority $maj")
    assert(scored.exists(_._2) && scored.exists(!_._2), "degenerate predictions")
  }

  test("quantStep > 1 sweeps floored candidates and stays exact") {
    // step 4: scores floor to multiples of 4; deployment compares the
    // floored score against thresholdQ*step. Replay driver-side.
    val (w, tq) = Learn.centroidThresholdTrain(
      fixture.toDF("doc_id", "text", "y"), "text", "doc_id", "y", 16,
      quantStep = 4L)
    val (wantW, _) = replayCentroid(fixture, 16)
    (0 until 16).foreach(b => assert(BigInt(w(b)) == wantW(b)))
    def floorDiv(a: BigInt, b: BigInt) = (a - a.mod(b)) / b
    val feats = fixture.filter { case (_, t, _) => t != null && t.trim.nonEmpty }
    def score(t: String): BigInt = {
      def bucket(tok: String): Int = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes("UTF-8"))
        Integer.parseInt(f"${md(0) & 0xff}%02x", 16) % 16
      }
      t.trim.split("\\s+").map(tok => BigInt(w(bucket(tok)))).sum
    }
    val qs = feats.map { case (_, t, y) => (floorDiv(score(t), 4), y) }
    val cands = (qs.map(_._1).min - 1) +: qs.map(_._1).distinct.sorted
    val bestT = cands.map { c =>
      (BigInt(qs.count { case (q, y) => (if (q > c) 1L else -1L) == y }), c)
    }.maxBy { case (acc, c) => (acc, -c) }._2
    assert(BigInt(tq) == bestT, s"quantized threshold $tq vs $bestT")
  }

  test("both trainers reject labels outside the exact ±1 contract") {
    // a 0 or +2 label would silently split engine (y > 0) and oracle
    // (y = 1 CASE) semantics — must fail loudly instead
    val bad = Seq((1L, "alpha beta", 1L), (2L, "gamma delta", 0L))
      .toDF("doc_id", "text", "y")
    assert(intercept[IllegalArgumentException] {
      Learn.centroidThresholdTrain(bad, "text", "doc_id", "y", 16)
    }.getMessage.contains("+1/-1"))
    assert(intercept[IllegalArgumentException] {
      Learn.perceptronTrain(bad, "text", "doc_id", "y", 16, 1)
    }.getMessage.contains("+1/-1"))
  }

  test("join trainer (hexDigits=2) trains the bit-identical artifact to the literal trainer") {
    val df = fixture.toDF("doc_id", "text", "y")
    val (wl, tl) = Learn.centroidThresholdTrain(df, "text", "doc_id", "y", 16)
    val (wdf, tj) = Learn.centroidThresholdTrainJoin(df, "text", "doc_id",
      "y", 16, hexDigits = 2)
    assert(tj == tl, s"threshold $tj vs $tl")
    val wm = wdf.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 16).foreach(b =>
      assert(wm.getOrElse(b, 0L) == wl(b), s"bucket $b: ${wm.get(b)} vs ${wl(b)}"))
    // deployment parity: the broadcast-join scorer equals the literal
    // scorer doc-for-doc (absent weight rows score 0)
    val litScores = df
      .filter(col("text").isNotNull && TextStats.wsTrim(col("text")) =!= "")
      .select(col("doc_id"),
        Learn.centroidScore(col("text"), wl).cast("long").as("s"))
      .as[(Long, Long)].collect().toMap
    val joinScores = Learn.centroidScoreJoin(df, "text", "doc_id", wdf, 16,
        hexDigits = 2)
      .select(col("doc_id"), col("score").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(joinScores == litScores)
  }

  test("wide trainer (4096 buckets, 4 hex digits) matches an independent BigInt replay") {
    val (wantW, wantT) = replayCentroid(fixture, 4096, hexDigits = 4)
    val (wdf, gotT) = Learn.centroidThresholdTrainJoin(
      fixture.toDF("doc_id", "text", "y"), "text", "doc_id", "y", 4096)
    assert(BigInt(gotT) == wantT, s"threshold $gotT vs $wantT")
    val wm = wdf.collect().map(r => r.getInt(0) -> BigInt(r.getLong(1))).toMap
    wantW.foreach { case (b, v) =>
      assert(wm.getOrElse(b, BigInt(0)) == v, s"bucket $b: ${wm.get(b)} vs $v") }
    wm.foreach { case (b, v) =>
      assert(wantW.getOrElse(b, BigInt(0)) == v, s"stray bucket $b = $v") }
  }

  test("threshold sweep is census-bounded: too many candidates fails loudly with a quantStep hint") {
    // the fixture's 7 nonempty docs score distinctly; a 2-candidate
    // ceiling must fail BEFORE the single-partition window runs, and the
    // message must tell the caller which knob to turn
    val e = intercept[IllegalArgumentException] {
      Learn.centroidThresholdTrain(fixture.toDF("doc_id", "text", "y"),
        "text", "doc_id", "y", 16, maxSweepCandidates = 2L)
    }
    assert(e.getMessage.contains("quantStep"), e.getMessage)
    assert(e.getMessage.contains("maxSweepCandidates"), e.getMessage)
    // a quantStep coarse enough to land under the ceiling trains fine
    // with the SAME ceiling (all scores floor into <= 2 candidates)
    val (w, _) = Learn.centroidThresholdTrain(
      fixture.toDF("doc_id", "text", "y"), "text", "doc_id", "y", 16,
      quantStep = 1L << 40, maxSweepCandidates = 2L)
    val (wantW, _) = replayCentroid(fixture, 16)
    (0 until 16).foreach(b => assert(BigInt(w(b)) == wantW(b)))
  }

  test("centroid weight fold fails loudly on long overflow (no silent wrap)") {
    // a class bucket sum near 2^63: (c·2^20) div n overflows a long —
    // must raise, never wrap into a silently-wrong model
    intercept[ArithmeticException] {
      Learn.centroidWeightFold(Seq((1L, 0, BigInt(Long.MaxValue))), 1, 1L, 1L)
    }
    // the non-overflowing fold stays exact: (3·2^20) div 2 − (2·2^20) div 2
    assert(Learn.centroidWeightFold(
      Seq((1L, 0, BigInt(3)), (-1L, 0, BigInt(2))), 1, 2L, 2L)
      == Seq(((BigInt(3) << 20) / 2 - (BigInt(2) << 20) / 2).toLong))
  }

  test("epoch 1 from zero weights updates on every doc (margin 0 is misclassified)") {
    val got = trainFixture(1)
    // epoch-1 weights = sum of y·cnt over ALL nonempty docs — the bias
    // bucket (index 16) is Σy over them: 4 positives, 3 negatives → +1
    assert(got(16) == 1L)
    // and at least one token bucket is nonzero (classes differ)
    assert(got.take(16).exists(_ != 0L))
  }

  test("aucExact: hand-counted pairs, tie half-credit, degenerate classes, census guard") {
    // pos scores {3, 2}, neg {2, 1}: wins (3>2, 3>1, 2>1) = 3, ties
    // (2=2) = 1 -> auc2 = 2*3 + 1 = 7 over 2*2*2 = 8 -> 875 per mille
    val scored = Seq((1L, 3L), (1L, 2L), (-1L, 2L), (-1L, 1L))
      .toDF("y", "s")
    val got = Learn.aucExact(scored, "y", "s")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(got == ((2L, 2L, 7L, Some(875L))), got.toString)
    // perfect separation -> AUC 1000; inverted -> 0
    assert(Learn.aucExact(Seq((1L, 9L), (1L, 8L), (-1L, 2L)).toDF("y", "s"),
      "y", "s").as[(Long, Long, Long, Option[Long])].collect().head
      == ((2L, 1L, 4L, Some(1000L))))
    assert(Learn.aucExact(Seq((1L, 1L), (-1L, 5L)).toDF("y", "s"),
      "y", "s").as[(Long, Long, Long, Option[Long])].collect().head
      == ((1L, 1L, 0L, Some(0L))))
    // one-class input: numerator 0, per-mille NULL (undefined, not 0)
    assert(Learn.aucExact(Seq((1L, 4L), (1L, 2L)).toDF("y", "s"),
      "y", "s").as[(Long, Long, Long, Option[Long])].collect().head
      == ((2L, 0L, 0L, None)))
    // the census guard fires loudly past the candidate ceiling
    intercept[IllegalArgumentException] {
      Learn.aucExact(scored, "y", "s", maxScoreCandidates = 2)
    }
  }
  test("eceCalibration: hand-computed reliability bins, prior fallback, negative-score bin, guards") {
    // quantStep 10. cal rows: bin0 {+5, -7}, bin1 {+12}, bin3 {-35}
    // -> tc=4, tp=2, prior = (2^20*2) div 4 = 524288. test rows:
    // bin0 {+3, +9} obs 2^20, bin1 {-15} obs 0, bin2 {+25} (no cal ->
    // prior), bin-1 {-3} (floor(-3/10) = -1, no cal -> prior).
    // ece = (2*524288 + 1*1048576 + 1*524288 + 1*524288) div 5 = 629145
    val rows = Seq(
      (1L, 5L, true), (-1L, 7L, true), (1L, 3L, false), (1L, 9L, false),
      (1L, 12L, true), (-1L, 15L, false),
      (1L, 25L, false),
      (-1L, 35L, true),
      (-1L, -3L, false)).toDF("y", "s", "cal")
    val got = Learn.eceCalibration(rows, "y", "s", col("cal"), 10L)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (-1L, 0L, 0L, 1L, 0L, 524288L, 0L, 524288L, 629145L),
      (0L, 2L, 1L, 2L, 2L, 524288L, 1048576L, 524288L, 629145L),
      (1L, 1L, 1L, 1L, 0L, 1048576L, 0L, 1048576L, 629145L),
      (2L, 0L, 0L, 1L, 1L, 524288L, 1048576L, 524288L, 629145L)), got.toString)
    // cal-only bin 3 is absent from the output but counted in the prior
    assert(!got.exists(_._1 == 3L))
    // zero/NULL labels raise per row (the aucExact contract)
    intercept[Exception] {
      Learn.eceCalibration(Seq((0L, 5L, true), (1L, 6L, false))
        .toDF("y", "s", "cal"), "y", "s", col("cal"), 10L).collect()
    }
    // fractional scores raise per row (the Q contract)
    intercept[Exception] {
      Learn.eceCalibration(Seq((1L, 1.5, true), (1L, 6.0, false))
        .toDF("y", "s", "cal"), "y", "s", col("cal"), 10L).collect()
    }
    // empty calibration split raises loudly (the prior divides by it)
    intercept[IllegalArgumentException] {
      Learn.eceCalibration(rows, "y", "s", lit(false), 10L)
    }
    // the bin census guard names a quantStep that fits
    intercept[IllegalArgumentException] {
      Learn.eceCalibration(rows, "y", "s", col("cal"), 1L, maxBins = 2L)
    }
  }
  test("calibrateScores: bin confidence deploys by broadcast join, prior for unseen bins") {
    // calibration bins (quantStep 10): bin0 {+5, -7} conf 524288,
    // bin1 {+12} conf 2^20, bin3 {-35} conf 0; prior (2*2^20) div 4
    val cal = Seq((1L, 5L), (-1L, 7L), (1L, 12L), (-1L, 35L)).toDF("y", "s")
    val dep = Seq((1L, 3L), (2L, 25L), (3L, -3L), (4L, 35L))
      .toDF("doc_id", "s")
    val got = Learn.calibrateScores(cal, dep.withColumn("y", lit(1L)),
        "y", "s", "doc_id", 10L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 0L, 524288L),
      (2L, 25L, 2L, 524288L),   // unseen bin -> prior
      (3L, -3L, -1L, 524288L),  // negative-score unseen bin -> prior
      (4L, 35L, 3L, 0L)), got.toString)
    // empty calibration raises; census guard names a fitting quantStep
    intercept[IllegalArgumentException] {
      Learn.calibrateScores(cal.filter(lit(false)), dep, "y", "s",
        "doc_id", 10L)
    }
    intercept[IllegalArgumentException] {
      Learn.calibrateScores(cal, dep, "y", "s", "doc_id", 1L, maxBins = 2L)
    }
  }
  test("pavCalibration: hand-computed isotonic fit, monotone, ECE <= histogram, guards") {
    // quantStep 1 so bin = score. Calibration rates by bin:
    // [0/2, 2/2, 0/2, 2/2] — bins 1,2 violate monotonicity; PAV pools
    // them to 2/4 = 0.5, so iso = [0, 1/2, 1/2, 1] (hand-checked via
    // the minimax identity too). Test rates are the TRUE monotone
    // [0, 1/2, 1/2, 1] plus a never-calibrated bin 5 (prior = 4/8):
    // PAV nails every test bin (ece_pav = 0) while histogram misses
    // bins 1-2 by 2^19 each (ece_hist = (8*524288) div 18 = 233016).
    val cal = Seq(
      (-1L, 0L), (-1L, 0L), (1L, 1L), (1L, 1L),
      (-1L, 2L), (-1L, 2L), (1L, 3L), (1L, 3L)).map(r => (r._1, r._2, true))
    val test = Seq(
      (-1L, 0L), (-1L, 0L), (-1L, 0L), (-1L, 0L),
      (1L, 1L), (1L, 1L), (-1L, 1L), (-1L, 1L),
      (1L, 2L), (1L, 2L), (-1L, 2L), (-1L, 2L),
      (1L, 3L), (1L, 3L), (1L, 3L), (1L, 3L),
      (1L, 5L), (-1L, 5L)).map(r => (r._1, r._2, false))
    val rows = (cal ++ test).toDF("y", "s", "cal")
    val got = Learn.pavCalibration(rows, "y", "s", col("cal"), 1L)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 0L, 4L, 0L, 0L, 0L, 0L, 0L, 0L, 233016L, 0L),
      (1L, 2L, 2L, 4L, 2L, 1048576L, 524288L, 524288L, 524288L, 0L,
        233016L, 0L),
      (2L, 2L, 0L, 4L, 2L, 0L, 524288L, 524288L, 524288L, 0L,
        233016L, 0L),
      (3L, 2L, 2L, 4L, 4L, 1048576L, 1048576L, 1048576L, 0L, 0L,
        233016L, 0L),
      (5L, 0L, 0L, 2L, 1L, 524288L, 524288L, 524288L, 0L, 0L,
        233016L, 0L)), got.toString)
    // the two pins the family promises: the isotonic fit is MONOTONE
    // over calibration-carrying bins, and its test ECE never reads
    // worse than histogram binning ON THIS FIXTURE (noisy small bins)
    val calBins = got.filter(_._2 > 0)
    assert(calBins.map(_._7) == calBins.map(_._7).sorted,
      s"pav_q20 must be non-decreasing in bin: ${calBins.map(_._7)}")
    assert(got.head._12 <= got.head._11,
      s"ece_pav ${got.head._12} > ece_hist ${got.head._11}")
    // already-monotone calibration: PAV == per-bin histogram rates
    val mono = Seq((-1L, 0L, true), (1L, 1L, true), (1L, 1L, true),
      (-1L, 1L, true), (1L, 2L, true), (1L, 0L, false), (1L, 1L, false),
      (1L, 2L, false))
      .toDF("y", "s", "cal")
    val mg = Learn.pavCalibration(mono, "y", "s", col("cal"), 1L)
      .orderBy("bin").as[(Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Long)].collect().toSeq
    assert(mg.map(r => (r._1, r._6, r._7)) == Seq(
      (0L, 0L, 0L), (1L, 699050L, 699050L), (2L, 1048576L, 1048576L)),
      mg.toString)
    // guards: empty calibration split; the cube-bound census names a
    // fitting quantStep; the shared label/score contracts raise per row
    intercept[IllegalArgumentException] {
      Learn.pavCalibration(rows, "y", "s", lit(false), 1L)
    }
    intercept[IllegalArgumentException] {
      Learn.pavCalibration(rows, "y", "s", col("cal"), 1L, maxBins = 2L)
    }
    intercept[Exception] {
      Learn.pavCalibration(Seq((0L, 5L, true), (1L, 6L, false))
        .toDF("y", "s", "cal"), "y", "s", col("cal"), 10L).collect()
    }
  }
  test("pavCalibrateScores: step-function deploy, clamped extrapolation, zero-exchange plan") {
    // same calibration as the pavCalibration fixture: fitted steps
    // [bin0 -> 0, bin1 -> 2^19, bin2 -> 2^19, bin3 -> 2^20]. Deploy
    // scores probe below the lowest bin (clamp to step 0), exact hits,
    // a gap bin (takes the largest fitted bin below), and far above
    // (clamps to the last step) — and the output is monotone in score,
    // which the x96b prior-fallback deploy cannot promise.
    val cal = Seq((-1L, 0L), (-1L, 0L), (1L, 1L), (1L, 1L),
      (-1L, 2L), (-1L, 2L), (1L, 3L), (1L, 3L)).toDF("y", "s")
    val dep = Seq((1L, -5L), (2L, 0L), (3L, 2L), (4L, 4L), (5L, 99L))
      .toDF("doc_id", "s")
    val got = Learn.pavCalibrateScores(cal, dep, "y", "s", "doc_id", 1L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, -5L, -5L, 0L),
      (2L, 0L, 0L, 0L),
      (3L, 2L, 2L, 524288L),
      (4L, 4L, 4L, 1048576L),
      (5L, 99L, 99L, 1048576L)), got.toString)
    assert(got.sortBy(_._2).map(_._4) == got.sortBy(_._2).map(_._4).sorted,
      "deployed probabilities must be monotone in the score")
    // the deploy side is a pure projection over a plan literal: no
    // Exchange anywhere (one better than the x96b broadcast join)
    val plan = Learn.pavCalibrateScores(cal, dep, "y", "s", "doc_id", 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException] {
      Learn.pavCalibrateScores(cal.filter(lit(false)), dep, "y", "s",
        "doc_id", 1L)
    }
    intercept[IllegalArgumentException] {
      Learn.pavCalibrateScores(cal, dep, "y", "s", "doc_id", 1L,
        maxBins = 2L)
    }
  }
  test("cohenKappaQ20: hand-computed kappa, exact -1, degenerate NULL, null labels excluded") {
    // key k: cells (L,L)x3, (L,S)x1, (S,S)x2 -> n=6, agree=5,
    // marginals na={L:4,S:2}, nb={L:3,S:3}, pe=4*3+2*3=18,
    // kappa = (30-18)/(36-18) = 2/3 -> floor(2^21/3) = 699050.
    // key d: perfect disagreement (L,S),(S,L) -> kappa = -1 exactly.
    // key c: both raters constant 'L' -> pe = 1 -> NULL.
    // a NULL-labeled row in k is excluded (carries no signal).
    val df = Seq(
      ("k", "L", "L"), ("k", "L", "L"), ("k", "L", "L"),
      ("k", "L", "S"), ("k", "S", "S"), ("k", "S", "S"),
      ("k", null, "L"),
      ("d", "L", "S"), ("d", "S", "L"),
      ("c", "L", "L"), ("c", "L", "L")
    ).toDF("g", "ra", "rb")
    val got = Learn.cohenKappaQ20(df, Seq("g"), "ra", "rb")
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("c", 2L, 2L, None),
      ("d", 2L, 0L, Some(-1048576L)),
      ("k", 6L, 5L, Some(699050L))), got.toString)
    intercept[IllegalArgumentException] {
      Learn.cohenKappaQ20(df, Nil, "ra", "rb")
    }
    // ingest identity: cells are sums, so shard cells re-sum to the
    // one-shot table and kappa matches bit-for-bit (the x98b pin)
    val half1 = Seq(("k", "L", "L"), ("k", "L", "L"), ("d", "L", "S"),
      ("c", "L", "L")).toDF("g", "ra", "rb")
    val half2 = Seq(("k", "L", "L"), ("k", "L", "S"), ("k", "S", "S"),
      ("k", "S", "S"), ("d", "S", "L"), ("c", "L", "L"))
      .toDF("g", "ra", "rb")
    val merged = Learn.cohenKappaFromCells(
      Learn.mergeConfusionCells(Seq(
        Learn.confusionCells(half1, Seq("g"), "ra", "rb"),
        Learn.confusionCells(half2, Seq("g"), "ra", "rb")), Seq("g")),
      Seq("g"))
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(merged == got, s"merged=$merged one=$got")
  }
  test("fleissKappaQ20: hand-computed three-rater kappa, Scott's pi at m=2, degenerate NULL, null exclusion") {
    // key k (m=3): items AAA, AAB, BBB, ABB ->
    // S = 9+5+9+5 = 28, T = 12, C_A = C_B = 6, sumC^2 = 72.
    // kappa = [12·16 - 2·72]/[2·(144-72)] = 48/144 = 1/3
    //   (classic check: P_bar = 2/3, P_e = 1/2) -> floor(2^20/3) = 349525.
    // key c: every rating identical -> P_e = 1 -> NULL.
    // an item with ANY null label is excluded whole.
    val df = Seq(
      ("k", "A", "A", "A"), ("k", "A", "A", "B"),
      ("k", "B", "B", "B"), ("k", "A", "B", "B"),
      ("k", "A", null, "A"),
      ("c", "A", "A", "A"), ("c", "A", "A", "A")
    ).toDF("g", "ra", "rb", "rc")
    val got = Learn.fleissKappaQ20(df, Seq("g"), Seq("ra", "rb", "rc"))
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("c", 2L, 6L, None),
      ("k", 4L, 12L, Some(349525L))), got.toString)
    // m = 2 is Scott's pi, NOT Cohen's kappa: perfect systematic
    // disagreement (A,B),(B,A) reads exactly -1 (pooled marginals)
    val two = Seq(("d", "A", "B"), ("d", "B", "A")).toDF("g", "ra", "rb")
    val pi = Learn.fleissKappaQ20(two, Seq("g"), Seq("ra", "rb"))
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(pi == (("d", 2L, 4L, Some(-1048576L))), pi.toString)
    // ingest identity: Fleiss cells are item-sums, so shard cells
    // re-sum to the one-shot table and kappa matches bit-for-bit
    // (the x98d pin)
    val half1 = Seq(("k", "A", "A", "A"), ("k", "A", "A", "B"),
      ("c", "A", "A", "A")).toDF("g", "ra", "rb", "rc")
    val half2 = Seq(("k", "B", "B", "B"), ("k", "A", "B", "B"),
      ("k", "A", null, "A"), ("c", "A", "A", "A"))
      .toDF("g", "ra", "rb", "rc")
    val merged = Learn.fleissKappaFromCells(
      Learn.mergeFleissCells(Seq(
        Learn.fleissCells(half1, Seq("g"), Seq("ra", "rb", "rc")),
        Learn.fleissCells(half2, Seq("g"), Seq("ra", "rb", "rc"))),
        Seq("g")), Seq("g"), m = 3)
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(merged == got, s"merged=$merged one=$got")
    // a restated m that cannot divide the rating total raises in-plan
    // (wrong rater count or corrupted cells)
    intercept[Exception] {
      Learn.fleissKappaFromCells(
        Learn.fleissCells(Seq(("k", "A", "A", "A")).toDF("g", "ra", "rb", "rc"),
          Seq("g"), Seq("ra", "rb", "rc")), Seq("g"), m = 2).collect()
    }
    intercept[IllegalArgumentException] {
      Learn.fleissKappaQ20(df, Nil, Seq("ra", "rb", "rc"))
    }
    intercept[IllegalArgumentException] {
      Learn.fleissKappaQ20(df, Seq("g"), Seq("ra"))
    }
    intercept[IllegalArgumentException] {
      Learn.fleissKappaQ20(df.withColumnRenamed("g", "_fk_l"),
        Seq("_fk_l"), Seq("ra", "rb", "rc"))
    }
  }
  test("krippendorffAlphaQ20: hand-computed alpha with abstentions, perfect 2^20, degenerate NULL, <2-rating exclusion") {
    // key k (3 raters, L = lcm(1,2) = 2):
    //   AAA: m=3, sumsq=9, term 0;  AAB: m=3, sumsq=5, term 4;
    //   A,B,null: m=2, sumsq=2, term (4-2)*2 = 4;
    //   A,null,null: m=1 -> EXCLUDED (nothing pairable).
    // N=8, C_A=6, C_B=2, sumC^2=40; den=2(64-40)=48;
    // num part = 48 - 7*8 = -8 -> alpha = -1/6
    //   (direct check: D_o = 1/2, D_e = 3/7, 1 - 7/6 = -1/6)
    // -> floor(-2^20/6) = -174763.
    // key p: two unanimous items with an abstention each -> alpha = 1.
    // key c: every pairable value identical -> D_e = 0 -> NULL.
    val df = Seq(
      ("k", "A", "A", "A"), ("k", "A", "A", "B"),
      ("k", "A", "B", null), ("k", "A", null, null),
      ("p", "A", "A", null), ("p", "B", "B", null),
      ("c", "A", "A", null), ("c", "A", "A", null)
    ).toDF("g", "ra", "rb", "rc")
    val got = Learn.krippendorffAlphaQ20(df, Seq("g"), Seq("ra", "rb", "rc"))
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("c", 2L, 4L, None),
      ("k", 3L, 8L, Some(-174763L)),
      ("p", 2L, 4L, Some(1048576L))), got.toString)
    intercept[IllegalArgumentException] {
      Learn.krippendorffAlphaQ20(df, Nil, Seq("ra", "rb", "rc"))
    }
    intercept[IllegalArgumentException] {
      Learn.krippendorffAlphaQ20(df, Seq("g"), Seq("ra"))
    }
    intercept[IllegalArgumentException] {
      Learn.krippendorffAlphaQ20(df.withColumnRenamed("g", "n_values"),
        Seq("n_values"), Seq("ra", "rb", "rc"))
    }
  }
  test("mcnemarQ20: hand-computed paired test, never-disagree NULL, null exclusion, guards") {
    // key k: 5 concordant rows, b = 4 (A right, B wrong), c = 1 ->
    // (4-1)^2/(4+1) = 9/5 = 1.8 -> floor(1.8*2^20) = 1887436.
    // key d: the models never disagree -> b+c = 0 -> NULL.
    // a NULL label or prediction is excluded.
    val df = (Seq.fill(3)(("k", 1L, 1L, 1L)) ++
      Seq.fill(2)(("k", -1L, -1L, -1L)) ++
      Seq.fill(4)(("k", 1L, 1L, -1L)) ++
      Seq(("k", 1L, -1L, 1L)) ++
      Seq(("d", 1L, 1L, 1L), ("d", 1L, -1L, -1L)))
      .toDF("g", "y", "pa", "pb")
      .unionByName(Seq(("k", Option.empty[Long], Option(1L), Option(1L)))
        .toDF("g", "y", "pa", "pb"))
    val got = Learn.mcnemarQ20(df, Seq("g"), "y", "pa", "pb")
      .as[(String, Long, Long, Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("d", 2L, 0L, 0L, None),
      ("k", 10L, 4L, 1L, Some(1887436L))), got.toString)
    intercept[IllegalArgumentException] {
      Learn.mcnemarQ20(df, Nil, "y", "pa", "pb")
    }
    intercept[IllegalArgumentException] {
      Learn.mcnemarQ20(df.withColumnRenamed("g", "n"), Seq("n"),
        "y", "pa", "pb")
    }
  }
  test("kendallTauAQ20: exact +-2^20 pins, tie neutrality, duplicate cells, census raise, guards") {
    // perfect agreement (1,1)(2,2)(3,3): C=3, D=0, n=3 ->
    // tau = 2*3/(3*2) = 1 -> 2^20; reversal -> exactly -2^20.
    val asc = Seq(("k", 1L, 1L), ("k", 2L, 2L), ("k", 3L, 3L))
      .toDF("g", "x", "y")
    val one = Learn.kendallTauAQ20(asc, Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Option[Long])].collect().head
    assert(one == (("k", 3L, 3L, 0L, Some(1048576L))), one.toString)
    val desc = Seq(("k", 1L, 3L), ("k", 2L, 2L), ("k", 3L, 1L))
      .toDF("g", "x", "y")
    val neg = Learn.kendallTauAQ20(desc, Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Option[Long])].collect().head
    assert(neg == (("k", 3L, 0L, 3L, Some(-1048576L))), neg.toString)
    // ties count neither (tau-a): (1,1)(1,2)(2,2) -> only (1,1)-(2,2)
    // concordant; tau = 2*1/(3*2) = 1/3 -> 349525
    val ties = Seq(("k", 1L, 1L), ("k", 1L, 2L), ("k", 2L, 2L))
      .toDF("g", "x", "y")
    val tt = Learn.kendallTauAQ20(ties, Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Option[Long])].collect().head
    assert(tt == (("k", 3L, 1L, 0L, Some(349525L))), tt.toString)
    // duplicate points weight by cell product: (1,1)x2 vs (2,2) ->
    // C = 2, tau = 4/6 -> floor(2^21/3) = 699050
    val dup = Seq(("k", 1L, 1L), ("k", 1L, 1L), ("k", 2L, 2L))
      .toDF("g", "x", "y")
    val dd = Learn.kendallTauAQ20(dup, Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Option[Long])].collect().head
    assert(dd == (("k", 3L, 2L, 0L, Some(699050L))), dd.toString)
    // a single observation has no pairs: NULL
    val solo = Learn.kendallTauAQ20(Seq(("s", 1L, 1L)).toDF("g", "x", "y"),
        Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Option[Long])].collect().head
    assert(solo == (("s", 1L, 0L, 0L, None)), solo.toString)
    // the cell census is load-bearing: 3 cells over maxCells = 2 raises
    intercept[Exception] {
      Learn.kendallTauAQ20(asc, Seq("g"), "x", "y", maxCells = 2L)
        .collect()
    }
    // fractional scores raise per row
    intercept[Exception] {
      Learn.kendallTauAQ20(Seq(("k", 1.5, 1.0)).toDF("g", "x", "y"),
        Seq("g"), "x", "y").collect()
    }
    intercept[IllegalArgumentException] {
      Learn.kendallTauAQ20(asc, Nil, "x", "y")
    }
    intercept[IllegalArgumentException] {
      Learn.kendallTauAQ20(asc.withColumnRenamed("g", "tau_q20"),
        Seq("tau_q20"), "x", "y")
    }
  }
  test("kendallTauAQ20 censuses BEFORE the quadratic sweep: both pair-join inputs carry the raise gate") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, RaiseError}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val asc = Seq(("k", 1L, 1L), ("k", 2L, 2L), ("k", 3L, 3L))
      .toDF("g", "x", "y")
    val plan = Learn.kendallTauAQ20(asc, Seq("g"), "x", "y")
      .queryExecution.optimizedPlan
    // the quadratic cell self-join is the one whose condition compares
    // _kt_x2 against _kt_x (the strict-upper sweep)
    val quad = plan.collect {
      case j: Join if j.condition.exists(_.exists {
        case a: AttributeReference => a.name == "_kt_x2"
        case _ => false
      }) => j
    }
    assert(quad.nonEmpty, plan.toString)
    // EVERY input side of that join must sit above a raise_error census
    // gate, so an over-budget key throws while PRODUCING the join's
    // inputs — never after paying the |cells|² sweep
    quad.foreach { j =>
      j.children.foreach { side =>
        assert(side.exists(_.expressions.exists(_.exists(
          _.isInstanceOf[RaiseError]))),
          s"pair-join input lacks the census gate:\n$side")
      }
    }
  }
  test("chiSquareAssocQ20: hand-computed 2x2, zero cells carry expectation, single-label dof 0, null exclusion") {
    // key k: cells (X,L)=4 (X,S)=1 (Y,L)=1 (Y,S)=4; N=10, all marginals
    // 5. True chi2 = 4*(1.5^2/2.5) = 3.6. Engine floors: every cell
    // d = +-15, t = 225 // 25 = 9, sum 36 -> floor(2^20*36/10) =
    // 3774873 (= floor(3.6*2^20) — the two-stage floor loses nothing
    // here). dof = 1. A NULL-labeled row is excluded.
    val k = Seq.fill(4)(("k", "X", "L")) ++ Seq(("k", "X", "S")) ++
      Seq(("k", "Y", "L")) ++ Seq.fill(4)(("k", "Y", "S")) ++
      Seq(("k", "X", null))
    val got = Learn.chiSquareAssocQ20(k.toDF("g", "a", "b"),
        Seq("g"), "a", "b")
      .as[(String, Long, Long, Long)].collect().head
    assert(got == (("k", 10L, 1L, 3774873L)), got.toString)
    // zero cells contribute their expectation: perfect association on
    // a 2x2 with N=4 reads exactly chi2 = N -> 4*2^20 (every cell
    // including the two EMPTY ones contributes t = 16 // 4 = 4)
    val z = Seq(("z", "X", "L"), ("z", "X", "L"),
      ("z", "Y", "S"), ("z", "Y", "S"))
    val zres = Learn.chiSquareAssocQ20(z.toDF("g", "a", "b"),
        Seq("g"), "a", "b")
      .as[(String, Long, Long, Long)].collect().head
    assert(zres == (("z", 4L, 1L, 4194304L)), zres.toString)
    // a single-label column is vacuously independent: dof 0, chi2 0
    val s = Seq(("s", "X", "L"), ("s", "X", "S"))
    val sres = Learn.chiSquareAssocQ20(s.toDF("g", "a", "b"),
        Seq("g"), "a", "b")
      .as[(String, Long, Long, Long)].collect().head
    assert(sres == (("s", 2L, 0L, 0L)), sres.toString)
    intercept[IllegalArgumentException] {
      Learn.chiSquareAssocQ20(z.toDF("g", "a", "b"), Nil, "a", "b")
    }
    intercept[IllegalArgumentException] {
      Learn.chiSquareAssocQ20(z.toDF("dof", "a", "b"), Seq("dof"), "a", "b")
    }
    // ingest identity: contingency cells are sums — shard cells re-sum
    // to the one-shot table and chi2 matches bit-for-bit (the x99c pin)
    val half1 = k.take(5).toDF("g", "a", "b")
    val half2 = k.drop(5).toDF("g", "a", "b")
    val merged = Learn.chiSquareFromCells(
      Learn.mergeChiSquareCells(Seq(
        Learn.chiSquareCells(half1, Seq("g"), "a", "b"),
        Learn.chiSquareCells(half2, Seq("g"), "a", "b")), Seq("g")),
      Seq("g")).as[(String, Long, Long, Long)].collect().head
    assert(merged == got, s"merged=$merged one=$got")
  }
}
