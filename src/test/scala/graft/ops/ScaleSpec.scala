package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg matches plain aggregation on a skewed key") {
    val df = (Seq.fill(1000)("hot") ++ Seq("a", "b", "b")).toDF("k")
      .withColumn("v", lit(2.0))
    val salted = Scale.saltedAgg(df, Seq("k"), 8)(
      Seq(count(lit(1)).as("n") -> sum(col("n")).as("n"),
        sum(col("v")).as("s") -> sum(col("s")).as("s")))
      .orderBy("k").as[(String, Long, Double)].collect()
    assert(salted.sameElements(Array(("a", 1L, 2.0), ("b", 2L, 4.0), ("hot", 1000L, 2000.0))))
  }

  test("saltedJoin matches plain join on a skewed key") {
    val big = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("b", 3))).toDF("k", "v")
    val small = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("miss", "M")).toDF("k", "tag")
    val out = Scale.saltedJoin(big, small, "k", 4)
    assert(out.count() == 502)
    assert(out.filter(col("k") === "hot").select(countDistinct("tag")).as[Long].head() == 1)
    val plain = big.join(small, Seq("k"))
    assert(out.orderBy("k", "v").collect().toSeq ==
      plain.select("k", "v", "tag").orderBy("k", "v").collect().toSeq)
  }

  test("saltedRunningSum matches the plain one-window running sum (incl. a hot key)") {
    import org.apache.spark.sql.expressions.Window
    // hot key 7 holds 900 of 1000 rows — the straggler shape
    val df = (1 to 1000).map(i => (if (i <= 900) 7L else i.toLong, i.toLong, i * 1.5))
      .toDF("k", "ord", "v")
    val salted = Scale.saltedRunningSum(df, "k", "ord", col("v"), "rt", 100L)
      .select(col("k"), col("ord"), col("rt"))
    val w = Window.partitionBy(col("k")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = df.select(col("k"), col("ord"), sum(col("v")).over(w).as("rt"))
    assert(salted.orderBy("k", "ord").collect().toSeq ==
      plain.orderBy("k", "ord").collect().toSeq)
    // phase-1 windows really are chunk-bounded: the hot key spans >1 chunk
    assert(df.filter(col("k") === 7)
      .select(countDistinct(floor(col("ord") / 100))).as[Long].head() > 1)
  }

  test("saltedTopK matches the plain one-window top-k on a skewed key") {
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toLong, i * 2.0))
      .toDF("k", "id", "score")
    val salted = Scale.saltedTopK(df, "k", Seq(col("score").desc, col("id")), 3, 8)
      .select(col("k"), col("id"), col("rnk"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id"))
    val plain = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("k"), col("id"), col("rnk"))
    assert(salted.orderBy("k", "id").collect().toSeq ==
      plain.orderBy("k", "id").collect().toSeq)
  }

  test("writeRangeSorted: files cover disjoint key ranges (min/max prunable)") {
    val out = java.nio.file.Files.createTempDirectory("rs").toString
    val df = (1 to 4000).map(i => ((i * 7919) % 4001, s"row$i")).toDF("k", "v")
    Scale.writeRangeSorted(df, out, "k", 4)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length == 4, parts.map(_.getName).mkString(","))
    // per-file key ranges must be pairwise disjoint — that is exactly what
    // parquet min/max footer stats need for file/row-group pruning
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("k")), max(col("k"))).as[(Int, Int)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, ranges.mkString(","))
      case _ => ()
    }
    // a key-range read over the layout stays correct
    assert(spark.read.parquet(out).filter(col("k") < 1000).count() ==
      df.filter(col("k") < 1000).count())
  }

  test("compactParquet: many small files rewrite to the target count, losslessly") {
    val src = java.nio.file.Files.createTempDirectory("cmp").resolve("src").toString
    val dest = src.stripSuffix("src") + "dest"
    val df = (1 to 3000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    df.repartition(40).write.parquet(src) // the decayed small-file state
    val nSrc = new java.io.File(src).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(nSrc == 40)
    val files = Scale.compactParquet(spark, src, dest, 1000L)
    assert(files == 3) // ceil(3000/1000)
    val nDest = new java.io.File(dest).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(nDest == 3)
    // lossless: same multiset of rows
    assert(spark.read.parquet(dest).exceptAll(df).isEmpty &&
      df.exceptAll(spark.read.parquet(dest)).isEmpty)
    // refuses in-place rewrite (reading and overwriting the same dir)
    val e = intercept[IllegalArgumentException] {
      Scale.compactParquet(spark, src, src, 1000L)
    }
    assert(e.getMessage.contains("separate dest"))
    // logical aliases of the same dir are caught too: dest spelled with
    // `..` segments, and a RELATIVE dest naming the absolute src — both
    // qualify to the same location (a raw-URI compare misses them)
    val aliased = src.stripSuffix("src") + "dest/../src"
    val e2 = intercept[IllegalArgumentException] {
      Scale.compactParquet(spark, src, aliased, 1000L)
    }
    assert(e2.getMessage.contains("separate dest"))
    val cwd = new java.io.File(".").getCanonicalPath
    if (src.startsWith(cwd + "/")) { // relative spelling only exists under cwd
      val rel = src.stripPrefix(cwd + "/")
      val e3 = intercept[IllegalArgumentException] {
        Scale.compactParquet(spark, src, rel, 1000L)
      }
      assert(e3.getMessage.contains("separate dest"))
    }
  }

  test("compactIvfCells: hot cells rewrite to one file, cold cells untouched, reads lossless") {
    import graft.ext.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cvec"))
    def assign(b: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssignJoin(b, cents, "vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_compact").toString
    // resident write + two appends: every touched cell accretes a file
    // per batch (the small-file decay the maintenance pass exists for)
    Similarity.writeIvfPartitioned(assign(emb.filter(col("vec_id") % 3 === 0)), path)
    Similarity.appendIvfPartitioned(assign(emb.filter(col("vec_id") % 3 === 1)), path)
    Similarity.appendIvfPartitioned(assign(emb.filter(col("vec_id") % 3 === 2)), path)
    val before = spark.read.parquet(path)
      .select(col("vec_id"), col("embedding"), col("cid")).collect().toSet
    def cellFiles(cid: Int) = new java.io.File(s"$path/cid=$cid").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val hot = (0 until 8).filter(c => new java.io.File(s"$path/cid=$c").isDirectory
      && cellFiles(c) > 1)
    assert(hot.nonEmpty, "fixture must accrete multi-file cells")
    val report = Similarity.compactIvfCells(spark, path, 1L << 20)
    // every hot cell compacted to ONE file (1M-row target >> cell size),
    // report says so, and nothing else was touched
    assert(report.map(_._1).toSet == hot.toSet, s"$report vs hot=$hot")
    report.foreach { case (cid, nBefore, nAfter) =>
      assert(nBefore > 1 && nAfter == 1, s"cell $cid: $nBefore -> $nAfter")
      assert(cellFiles(cid) == 1, s"cell $cid still has ${cellFiles(cid)} files")
    }
    // the staging dir is gone and the layout reads back losslessly —
    // same rows, same cells, partition pruning still derives cid from
    // the unchanged directory names
    assert(!new java.io.File(s"$path/.compact").exists())
    val after = spark.read.parquet(path)
      .select(col("vec_id"), col("embedding"), col("cid")).collect().toSet
    assert(after == before)
    // idempotent: a second pass finds nothing hot
    assert(Similarity.compactIvfCells(spark, path, 1L << 20).isEmpty)
  }

  test("compactIvfCells: oversized cells take the per-cell multi-file path; stale staging refused") {
    import graft.ext.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // ONE cell holds everything (a single centroid), appended twice so
    // it runs hot; a 100-row target forces the cell (500 rows) through
    // the per-cell compactParquet fallback into ceil(500/100) files
    val cents = emb.filter(col("vec_id") === 0)
      .select(lit(0).as("cid"), col("embedding").as("cvec"))
    def assign(b: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssignJoin(b, cents, "vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_compact_big").toString
    Similarity.writeIvfPartitioned(assign(emb.filter(col("vec_id") % 2 === 0)), path)
    Similarity.appendIvfPartitioned(assign(emb.filter(col("vec_id") % 2 === 1)), path)
    val before = spark.read.parquet(path).count()
    val report = Similarity.compactIvfCells(spark, path, 100L)
    assert(report.map(_._1) == Seq(0), report.toString)
    val (_, nBefore, nAfter) = report.head
    assert(nBefore >= 2 && nAfter == 5, s"$nBefore -> $nAfter (want 5 = ceil(500/100))")
    assert(new java.io.File(s"$path/cid=0").listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")) == 5)
    // lossless through the fallback path too
    assert(spark.read.parquet(path).count() == before)
    assert(!new java.io.File(s"$path/.compact").exists())
    // a leftover .compact (interrupted commit — may hold a cell's only
    // copy) is REFUSED, never wiped
    Similarity.appendIvfPartitioned(assign(emb.filter(col("vec_id") % 2 === 0)), path)
    assert(new java.io.File(s"$path/.compact/old-cid=0").mkdirs())
    assert(intercept[IllegalArgumentException] {
      Similarity.compactIvfCells(spark, path, 100L)
    }.getMessage.contains("did not commit cleanly"))
    assert(new java.io.File(s"$path/.compact/old-cid=0").exists(),
      "the guard must not delete the stale staging dir")
  }

  test("compactPartitionedLayout: the data is read EXACTLY once (footer census, no count pass)") {
    // the small-vs-big census comes from parquet footer metadata — the
    // earlier groupBy(partCol).count() was a SECOND full read of the
    // data about to be rewritten. Pin it with task input metrics: total
    // records read across the whole compaction must be ~the row count
    // (one pruned read feeding the rewrite), not ~2x.
    import graft.ops.Scale
    val path = java.nio.file.Files.createTempDirectory("census_compact").toString
    def batch(lo: Int) = (lo until lo + 60)
      .map(i => (i.toLong, if (i % 2 == 0) "x" else "y"))
      .toDF("id", "bucket").repartition(1)
    Seq(0, 60).foreach(lo =>
      batch(lo).write.mode("append").partitionBy("bucket").parquet(path))
    val rows = 120L
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val report = Scale.compactPartitionedLayout(spark, path, "bucket",
        1L << 20, 1, ks => col("bucket").isin(ks: _*))
      // listener events are async — poll until the counter stabilizes
      var last = -1L
      var tries = 0
      while (read.get() != last && tries < 100) {
        last = read.get(); Thread.sleep(100); tries += 1
      }
      assert(report.map(_._1).toSet == Set("x", "y"), report.toString)
      val n = read.get()
      assert(n >= rows, s"expected the one rewrite pass (~$rows records), saw $n")
      assert(n < 2 * rows,
        s"compaction read $n records for $rows rows — a second data pass " +
          "(the census must come from footers, not a count job)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the layout still reads back whole
    assert(spark.read.parquet(path).count() == rows)
  }

  test("compactPartitionedLayout: all-numeric string keys round-trip (zero-padded dirs survive)") {
    // md5-hex bucket keys can draw an ALL-DIGIT key set; partition-type
    // inference would then parse "07" as int 7 — the census would miss
    // the hot key ("7" != "07") and the commit would rename the only
    // copy aside and delete it while the staged rewrite sat in
    // bucket=7. The pass pins the partition column to string, so
    // zero-padded directories survive with their data.
    import graft.ops.Scale
    val path = java.nio.file.Files.createTempDirectory("numkey_compact").toString
    def batch(lo: Int) = (lo until lo + 40)
      .map(i => (i.toLong, if (i % 2 == 0) "07" else "12"))
      .toDF("id", "bucket").repartition(1)
    Seq(0, 40, 80).foreach(lo =>
      batch(lo).write.mode("append").partitionBy("bucket").parquet(path))
    def files(k: String) = new java.io.File(s"$path/bucket=$k").listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files("07") == 3 && files("12") == 3, "fixture must accrete files")
    val before = spark.read.parquet(path)
      .select(col("id"), col("bucket").cast("string")).collect().toSet
    val report = Scale.compactPartitionedLayout(spark, path, "bucket",
      1L << 20, 1, ks => col("bucket").isin(ks: _*))
    assert(report.map(_._1).toSet == Set("07", "12"), report.toString)
    assert(new java.io.File(s"$path/bucket=07").isDirectory,
      "the zero-padded directory must survive compaction")
    assert(files("07") == 1 && files("12") == 1)
    val after = spark.read.parquet(path)
      .select(col("id"), col("bucket").cast("string")).collect().toSet
    assert(after == before, "compaction lost or rewrote rows")
  }

  test("compactIndexBuckets: hot postings buckets rewrite to one file; probe results unchanged") {
    import graft.ext.Retrieval
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("bm25_compact").toString
    // three append batches: every touched bucket accretes ~1 file per
    // batch — the small-file decay the maintenance pass exists for
    (0 to 2).foreach { par =>
      Retrieval.appendIndexBatch(docs.filter(col("doc_id") % 3 === par),
        "text", "doc_id", path)
    }
    val queries = Seq(1L -> "customer filter join", 2L -> "window merge sort")
    def rows(k: Int) = Retrieval.bm25TopKStaged(path, queries, k)
      .select(col("qid"), col("doc_id"), col("score_q20"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    val before = rows(5)
    def bucketFiles(b: String) = new java.io.File(s"$path/postings/bucket=$b")
      .listFiles().count(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
    val bucketDirs = new java.io.File(s"$path/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=")).toSeq
    val hot = bucketDirs.filter(bucketFiles(_) > 1)
    assert(hot.nonEmpty, "fixture must accrete multi-file buckets")
    val report = Retrieval.compactIndexBuckets(spark, path, 1L << 20)
    assert(report.map(_._1).toSet == hot.toSet, s"$report vs hot=$hot")
    report.foreach { case (b, nBefore, nAfter) =>
      assert(nBefore > 1 && nAfter == 1, s"bucket $b: $nBefore -> $nAfter")
      assert(bucketFiles(b) == 1, s"bucket $b still has ${bucketFiles(b)} files")
    }
    assert(!new java.io.File(s"$path/postings/.compact").exists())
    // compaction is invisible to the probe: identical rows, and a second
    // pass finds nothing hot
    assert(rows(5) == before)
    assert(Retrieval.compactIndexBuckets(spark, path, 1L << 20).isEmpty)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("id", "bv")
    Scale.writeBucketed(a, "bkt_a", "id", 8)
    Scale.writeBucketed(b, "bkt_b", "id", 8)
    // disable broadcast so the large-large path (the case bucketing is FOR)
    // is what gets planned
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("writeZOrdered clusters BOTH keys per file; single-key layout only one") {
    // 64×64 grid, one row per (kx, ky) cell: after a 16-file Z-order
    // rewrite every file should cover a bounded window of EACH key range
    // (ideal Morton quadrants: 1/4 per dim), so parquet min/max stats
    // prune reads for predicates on EITHER key — the layout's contract.
    // A single-key range layout clusters kx but leaves ky at full range.
    val n = 64
    val df = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("kx"), (col("id") / n).cast("long").as("ky"))
    def coverage(dir: String): Array[(Double, Double)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(((max("kx") - min("kx") + 1) / n.toDouble).as("cx"),
              ((max("ky") - min("ky") + 1) / n.toDouble).as("cy")).head()
          (r.getDouble(0), r.getDouble(1))
        }
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    Scale.writeZOrdered(df, zdir, "kx", "ky", 16)
    val zcov = coverage(zdir)
    assert(zcov.length == 16, s"expected 16 files, got ${zcov.length}")
    assert(zcov.forall { case (cx, cy) => cx <= 0.5 && cy <= 0.5 },
      s"every file must cover a bounded window of both keys: ${zcov.toSeq}")
    // lossless rewrite: same cells come back, _z never leaks
    val back = spark.read.parquet(zdir)
    assert(back.columns.sorted.sameElements(Array("kx", "ky")))
    assert(back.distinct().count() == n.toLong * n)
    val rdir = java.nio.file.Files.createTempDirectory("rorder").toString
    Scale.writeRangeSorted(df, rdir, "kx", 16)
    assert(coverage(rdir).exists { case (_, cy) => cy > 0.9 },
      "single-key layout should leave the second key unclustered")
  }

  test("footer-stats manifest agrees with the data-scan manifest; pruning unchanged") {
    import org.apache.spark.sql.DataFrame
    val n = 4096L
    // single-key range layout
    val df = spark.range(0, n).select(col("id").as("k"), (col("id") % 64).as("v"))
    val rdir = java.nio.file.Files.createTempDirectory("manifest_f").toString
    Scale.writeRangeSorted(df, rdir, "k", 16)
    def canon(m: DataFrame, keys: Seq[String]) = m.select(
        (regexp_extract(col("file"), "([^/]+)$", 1).as("f") +:
          col("n_rows").cast("long").as("n_rows") +:
          keys.flatMap(k => Seq(col(s"min_$k").cast("long"), col(s"max_$k").cast("long")))): _*)
      .orderBy("f").collect().toSeq
    val footer = Scale.parquetManifestFooters(spark, rdir, Seq("k"))
    assert(canon(footer, Seq("k")) == canon(Scale.parquetManifest(spark, rdir, Seq("k")), Seq("k")))
    // the footer manifest drives the same file-skip decision prunedRead makes
    val picked = footer.filter(!(col("max_k") < 100 || col("min_k") > 150))
      .select("file").collect().map(_.getString(0)).toSet
    assert(picked.size <= 2, s"footer manifest must skip: ${picked.size} of 16")
    assert(Scale.prunedRead(spark, rdir, "k", 100, 150).inputFiles
      .map(_.split('/').last).toSet == picked.map(_.split('/').last))
    // and a read THROUGH the prebuilt footer manifest equals the full scan
    val viaFooter = Scale.prunedReadWith(spark, footer, rdir, "k", 100, 150)
    assert(viaFooter.inputFiles.length <= 2)
    val full = spark.read.parquet(rdir).filter(col("k").between(100, 150))
    assert(viaFooter.exceptAll(full).isEmpty && full.exceptAll(viaFooter).isEmpty)
    // two-key agreement on a Z-order layout (int-backed second key too)
    val grid = spark.range(0, n).select(
      (col("id") % 64).as("kx"), (col("id") / 64).cast("int").as("ky"))
    val zdir = java.nio.file.Files.createTempDirectory("manifest_fz").toString
    Scale.writeZOrdered(grid, zdir, "kx", "ky", 16)
    assert(canon(Scale.parquetManifestFooters(spark, zdir, Seq("kx", "ky")), Seq("kx", "ky")) ==
      canon(Scale.parquetManifest(spark, zdir, Seq("kx", "ky")), Seq("kx", "ky")))
  }

  test("writeZOrdered validates the 21-bit key domain before rewriting") {
    // negative (and >= 2^21) keys alias under zSpread's 21-bit mask — the
    // write must fail loudly instead of silently destroying clustering
    val bad = spark.range(0, 10).select((col("id") - 5).as("kx"), col("id").as("ky"))
    val dir = java.nio.file.Files.createTempDirectory("zbad").toString
    val e = intercept[IllegalArgumentException] {
      Scale.writeZOrdered(bad, dir, "kx", "ky", 2)
    }
    assert(e.getMessage.contains("2^21"), e.getMessage)
    val wide = spark.range(0, 10).select(
      (col("id") + (1L << 21)).as("kx"), col("id").as("ky"))
    intercept[IllegalArgumentException] {
      Scale.writeZOrdered(wide, dir, "kx", "ky", 2)
    }
    // explicit opt-out still writes (reads stay correct — prunedRead
    // re-applies the exact predicate — only locality degrades)
    Scale.writeZOrdered(bad, dir, "kx", "ky", 2, validate = false)
    assert(spark.read.parquet(dir).count() == 10)
  }

  test("manifest-driven pruned read skips files on clustered layouts, equals the full scan") {
    val n = 4096L
    val df = spark.range(0, n).select(col("id").as("k"), (col("id") % 64).as("v"))
    val rdir = java.nio.file.Files.createTempDirectory("manifest_r").toString
    Scale.writeRangeSorted(df, rdir, "k", 16)
    val manifest = Scale.parquetManifest(spark, rdir, Seq("k"))
    assert(manifest.count() == 16)
    assert(manifest.agg(sum("n_rows")).head().getLong(0) == n)
    // a 51-key window on a 16-file range layout lives in at most 2 files
    val pruned = Scale.prunedRead(spark, rdir, "k", 100, 150)
    assert(pruned.inputFiles.length <= 2, s"read ${pruned.inputFiles.length} of 16 files")
    val full = spark.read.parquet(rdir).filter(col("k").between(100, 150))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    // a window outside the domain reads nothing and returns empty
    assert(Scale.prunedRead(spark, rdir, "k", 10 * n, 20 * n).count() == 0)
    // Z-order layout: a predicate on EITHER key prunes (here the SECOND —
    // the one a single-key layout cannot skip on at all)
    val grid = spark.range(0, n).select(
      (col("id") % 64).as("kx"), (col("id") / 64).cast("long").as("ky"))
    val zdir = java.nio.file.Files.createTempDirectory("manifest_z").toString
    Scale.writeZOrdered(grid, zdir, "kx", "ky", 16)
    val zpruned = Scale.prunedRead(spark, zdir, "ky", 0, 15)
    assert(zpruned.inputFiles.length < 16,
      s"second-key predicate must skip files: read ${zpruned.inputFiles.length}")
    val zfull = spark.read.parquet(zdir).filter(col("ky").between(0, 15))
    assert(zpruned.exceptAll(zfull).isEmpty && zfull.exceptAll(zpruned).isEmpty)
    // both-key window: the intersection skips still more — the read
    // pattern the Z-order layout exists for
    val z2 = Scale.prunedRead2(spark, zdir, "kx", 0, 15, "ky", 0, 15)
    assert(z2.inputFiles.length <= 4,
      s"both-key window should touch ~1 quadrant: read ${z2.inputFiles.length}")
    val z2full = spark.read.parquet(zdir)
      .filter(col("kx").between(0, 15) && col("ky").between(0, 15))
    assert(z2.exceptAll(z2full).isEmpty && z2full.exceptAll(z2).isEmpty)
  }
}
