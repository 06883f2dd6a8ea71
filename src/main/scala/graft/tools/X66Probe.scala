package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe for the x66b bench anomaly (12.2 s in BENCH_r09 vs a
  * 0.16 s x66 extraction component): is the composed extract→clean
  * projection re-evaluating the extraction chain per downstream
  * reference, or was the r09 number box noise? A/B:
  *   x66  — extraction alone;
  *   x66b — the composed catalog query as shipped;
  *   barrier — extraction staged to parquet, line rules over the stage.
  * If x66b ≫ barrier + x66, the composition re-evaluates. */
object X66Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // measurement tool: parallelism follows the box (or the bench env
    // var), never a hardcoded width — A/B numbers from a differently
    // sized machine would otherwise mislead
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    def built(name: String): DataFrame =
      graft.SparkEntry.queries(name)(spark, sfDir)

    // warm the JVM + file scan once
    built("x66_html_extract").count()
    for (round <- 1 to 3) {
      time(s"x66#$round")(built("x66_html_extract").count())
      time(s"x66b#$round")(built("x66b_crawl_clean").count())
      time(s"barrier#$round") {
        val extracted = built("x66_html_extract")
          .select(col("doc_id"), col("text_main").as("text"))
        val staged = spark.read.parquet(
          graft.ext.Dedup.stageSignatures(extracted))
        graft.ext.Curation.c4LineClean(staged, "text", "doc_id",
          minWordsPerLine = 3, banned = Seq("cookie"), minKeptLines = 1)
          .count()
      }
    }
    spark.stop()
  }
}
