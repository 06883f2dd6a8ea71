package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the HITS half-step layout question (r16 verdict #7:
  * 293 s at 100× is the rehearsal table's worst absolute row):
  *
  *   A (shipped): stage TWO bucketed edge copies — by _ht_src for the
  *     authority half-step, by _ht_dst for the hub half-step — so
  *     neither per-round join exchanges or sorts the edge side; costs
  *     one extra bucketed build up front.
  *   B (fused single copy): stage ONE src-bucketed copy + the skeleton;
  *     the authority half-step rides the bucket; the hub half-step
  *     joins the SAME copy on _ht_dst with the |V|-row score table as
  *     the shuffled-hash build side (the rank-side re-key) — the edge
  *     side pays a per-round Exchange-by-dst but never a second
  *     bucketed build or a sort.
  *
  * Both arms produce bit-identical Q9 scores (asserted below on the
  * factor-1 corpus); the question is purely which layout is cheaper at
  * which scale/iteration count. Diagnostic tool, not engine surface —
  * run after ScaleRehearsal has prepared /tmp/graft_rehearsal corpora:
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.HitsAb [factor]"
  */
object HitsAb {
  def main(args: Array[String]): Unit = {
    val work = "/tmp/graft_rehearsal"
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edgesOf(dir: String): DataFrame = {
      val pairs = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
          col("o_orderkey") === col("l_orderkey"))
      val fwd = pairs.select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val rev = pairs.filter(col("l_quantity") > 25)
        .select((col("l_suppkey") * 2 + 1).as("src"),
          (col("o_custkey") * 2).as("dst"))
      fwd.union(rev)
    }

    // ARM B: single src-bucketed copy; hub half-step re-keys the rank
    // side (shuffle_hash build on scores). Same Q9 algebra as
    // Graphs.hits, verbatim — only the edge-layout decision differs.
    def hitsSingleCopy(edges: DataFrame, iters: Int): DataFrame = {
      val s9 = 1000000000L
      val e0 = edges.select(col("src").cast("long").as("_ht_src"),
        col("dst").cast("long").as("_ht_dst"))
      val st = graft.ext.Graphs.stageEdgeTable(e0, "_ht_src", "_ht_dst")
      try {
        // (the stage projects to (_pr_src, _pr_dst) internally; rename back)
        val eBySrc = st.edges.select(col("_pr_src").as("_ht_src"),
          col("_pr_dst").as("_ht_dst"))
        val nodes = spark.read.parquet(graft.ext.Dedup.stageSignatures(
          eBySrc.select(col("_ht_src").as("node"))
            .union(eBySrc.select(col("_ht_dst").as("node"))).distinct()))
        def halfStep(scores: DataFrame, scoreCol: String,
                     fromEnd: String, toEnd: String,
                     outCol: String): DataFrame = {
          val sc = scores.select(col("node"), col(scoreCol)).hint("shuffle_hash")
          val raw = eBySrc.join(sc, col(fromEnd) === col("node"))
            .groupBy(col(toEnd)).agg(sum(col(scoreCol)).as("_ht_s"))
          val tab = nodes.join(raw, col("node") === col(toEnd), "left")
            .select(col("node"), coalesce(col("_ht_s"), lit(0L)).as("_ht_raw"))
          val mx = tab.agg(max(col("_ht_raw")).as("_ht_m"))
          tab.crossJoin(broadcast(mx))
            .select(col("node"), expr(
              s"cast((cast(_ht_raw as decimal(38,0)) * $s9) div _ht_m" +
                " as bigint)").as(outCol))
        }
        var hub = nodes.withColumn("hub_q9", lit(s9))
        var auth: DataFrame = null
        for (_ <- 1 to iters) {
          auth = halfStep(hub, "hub_q9", "_ht_src", "_ht_dst", "auth_q9")
          hub = halfStep(auth, "auth_q9", "_ht_dst", "_ht_src", "hub_q9")
          auth = spark.read.parquet(graft.ext.Dedup.stageSignatures(auth))
          hub = spark.read.parquet(graft.ext.Dedup.stageSignatures(hub))
        }
        hub.join(auth.withColumnRenamed("node", "_ht_n2"),
            col("node") === col("_ht_n2"))
          .select(col("node"), col("hub_q9"), col("auth_q9"))
      } finally st.drop()
    }

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      graft.ext.Dedup.drainStageDirs()
      System.gc()
      println(f"[hits-ab] $label rows=$n ${dt}%.2fs")
      dt
    }

    // parity first (factor 1): both arms must agree bit-for-bit
    val e1 = edgesOf(s"$work/x1_graph")
    val a1 = graft.ext.Graphs.hits(e1, "src", "dst", 2,
      stagePerIteration = true).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b1 = hitsSingleCopy(e1, 2).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(a1 == b1, s"arms disagree: |A|=${a1.size} |B|=${b1.size}")
    println(s"[hits-ab] parity OK (${a1.size} nodes)")

    for (d <- Seq(s"$work/x1_graph", s"$work/x${factor}_graph")) {
      // warmup then measure, per arm
      time(s"A dual-copy warm $d") {
        graft.ext.Graphs.hits(edgesOf(d), "src", "dst", 2,
          stagePerIteration = true).count() }
      val ta = time(s"A dual-copy $d") {
        graft.ext.Graphs.hits(edgesOf(d), "src", "dst", 2,
          stagePerIteration = true).count() }
      time(s"B single-copy warm $d") { hitsSingleCopy(edgesOf(d), 2).count() }
      val tb = time(s"B single-copy $d") { hitsSingleCopy(edgesOf(d), 2).count() }
      println(f"[hits-ab] SUMMARY dir=$d A=$ta%.2fs B=$tb%.2fs")
    }
    spark.stop()
  }
}
