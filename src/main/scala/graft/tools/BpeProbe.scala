package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE deep-run measurement main: per-round wall time of
  * TextStats.bpeTrain at a merge count past the oracle fixture's three,
  * lazy-chain vs stagePerIteration. The staged path re-reads a flat
  * parquet stage each round (constant plan size); the lazy path re-derives
  * an ever-deeper replace chain — this harness shows where the crossover
  * lands so the scaladoc's "deep runs should stage" advice stays measured,
  * not asserted. Fixture dir as args(0), merge count as args(1). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val n = if (args.length > 1) args(1).toInt else 12
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("text"))
    for (staged <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val merges = graft.ext.TextStats.bpeTrain(docs, "text", n,
        stagePerIteration = staged)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"staged=$staged%-5s merges=${merges.size}%3d total=$secs%7.2f s " +
        f"(last pair: ${merges.lastOption.map(m => s"'${m.a}' + '${m.b}' x${m.n}")})")
    }
    spark.stop()
  }
}
