package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main — per-stage wall-clock breakdown of the
  * x86b incremental all-pairs chain (index staging vs join), for the
  * r13→r14 write-amplification adjudication. Not part of the engine
  * surface. */
object X86Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[x86probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to 2).foreach { round =>
      println(s"[x86probe] --- round $round ---")
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.ext.Dedup.wordNgrams(col("text"), 3).as("gs"))
      val idx = t("index-stage")(graft.ext.Dedup.allPairsIndex(
        d.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "gs", 6, 10))
      val n = t("incremental-join")(graft.ext.Dedup.allPairsJoinIncremental(
        d.filter(pmod(col("doc_id"), lit(5)) === 0), idx, "doc_id", "gs",
        6, 10).count())
      println(s"[x86probe] rows $n")
      graft.ext.Dedup.drainStageDirs()
    }
    spark.stop()
  }
}
