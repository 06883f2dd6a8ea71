package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** ANN quality measurement main: recall@5 of every approximate path
  * (IVF seed/trained centroids at several nProbe, PQ seed/trained
  * codebooks) against the exact brute-force top-k on the sf0.001
  * fixture. The bounds pinned in ExtSpec's recall test came from this
  * harness — re-run it when tuning any ANN knob. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Similarity
    // fixture dir as args(0) so the shipped jar isn't pinned to one box
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id").cast("long"), col("n_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5,
      (a, b) => Similarity.quantizedDot(a, b)))
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cvec"))
    for (nProbe <- Seq(2, 4, 8)) {
      val ivf = pairs(Similarity.ivfTopKJoin(emb, cents, q, "vec_id", "embedding", 5, nProbe))
      println(s"IVF nProbe=$nProbe recall=${(ivf & exact).size.toDouble / exact.size}")
    }
    val cbSeed = Similarity.pqCodebook(emb, "vec_id", "embedding", 4, 16, 64)
    val pqS = pairs(Similarity.pqTopK(emb, q, "vec_id", "embedding", cbSeed, 5))
    println(s"PQ seed-codebook recall=${(pqS & exact).size.toDouble / exact.size}")
    val cbTr = Similarity.pqCodebookTrained(emb, "vec_id", "embedding", 4, 16, 64, 2)
    val pqT = pairs(Similarity.pqTopK(emb, q, "vec_id", "embedding", cbTr, 5))
    println(s"PQ trained-codebook recall=${(pqT & exact).size.toDouble / exact.size}")
    val km = Similarity.kMeansTrain(emb, cents, "vec_id", "embedding", 2)
    val ivfT = pairs(Similarity.ivfTopKJoin(emb, km, q, "vec_id", "embedding", 5, 2))
    println(s"IVF trained-centroids nProbe=2 recall=${(ivfT & exact).size.toDouble / exact.size}")
    spark.stop()
  }
}
