package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Scale design: the query set is the small side — it is broadcast and the
  * corpus is streamed through it (one task per corpus partition, no corpus
  * shuffle for scoring). The only shuffle is the per-query top-k, which
  * carries (q_id, n_id, score) triples, never vectors.
  *
  * Two arithmetic paths:
  *  - `dot`/`cosine`: double fold — fastest, used for real ranking;
  *  - `decimalDot`: per-element products cast to decimal then summed —
  *    order-independent and exact, used on oracle-checked paths so the
  *    result is bit-identical across engines regardless of reduction order.
  */
object Similarity {

  /** Dot product of two float vectors as a left-to-right double fold.
    * Elements are widened to double BEFORE multiplying: the product of two
    * 24-bit mantissas fits a double exactly, so each term is exact. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Order-independent, engine-portable dot product via Q30 fixed point:
    * each exact double product (see [[dot]]) is scaled by 2^30 (exact —
    * power of two) and floored to a long; longs sum exactly in any order;
    * the final divide by 2^30 is again exact. Quantization error ≤
    * dim·2^-30; every step is deterministic IEEE arithmetic with no
    * rounding-mode dependence, so results are bit-identical across engines. */
  def quantizedDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.DotQ30(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k: every corpus row scored against every (broadcast)
    * query row, then per-query top-k via the bounded [[graft.functions.TopKAgg]]
    * aggregator — the map side already truncates to k, so the shuffle
    * carries O(k·partitions·|queries|) rows, not the full scored set (a
    * window/row_number formulation shuffles everything). Ids must be
    * long-castable; ordering is score desc, id asc — identical to a
    * row_number ranking. Exact baseline / ground truth for the ANN paths. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     score: (Column, Column) => Column): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .crossJoin(q)
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id").cast("long").as("_1"),
        struct(score(col("q_vec"), col("n_vec")).as("score"),
          col("n_id").cast("long").as("id")).as("_2"))
      .as[(Long, graft.functions.Scored)]
    scored.groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.TopKAgg(k).toColumn.name("topk"))
      .toDF("q_id", "topk")
      .select(col("q_id"), posexplode(col("topk")).as(Seq("r", "c")))
      .select(col("q_id"), col("c.id").as("n_id"), col("c.score").as("score"),
        (col("r") + 1).as("rank"))
  }

  /** Random-hyperplane LSH signature for cosine similarity: bit p of the
    * signature is the sign of ⟨v, plane_p⟩ with planes drawn once from a
    * seeded RNG (deterministic across runs/executors — the plane matrix is
    * generated on the driver and folded into the plan as literals, i.e.
    * broadcast). Vectors with close cosine agree on most bits, so equal
    * signatures (or signature bands) are near-dup candidates: a pure
    * projection + an equi-join on a long key — the shuffle carries only
    * (signature, id) pairs, never vectors. */
  def rhpSignature(vec: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column = {
    require(nPlanes <= 63, "signature packs into one long")
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    (0 until nPlanes).map { p =>
      val plane = array(planes(p).map(lit): _*)
      when(aggregate(zip_with(vec, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Candidate near-dup pairs via exact RHP-signature collision, verified
    * with the exact cosine. `minCos` filters the verified pairs. */
  def rhpNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                      nPlanes: Int, minCos: Double): DataFrame = {
    val sig = df.select(col(idCol), col(vecCol),
      rhpSignature(col(vecCol), dim, nPlanes).as("sig"))
    val a = sig.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"), col("sig"))
    val b = sig.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"),
      col("sig").as("sig_b"))
    a.join(b, col("sig") === col("sig_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosine(col("a_vec"), col("b_vec")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** IVF-style ANN: assign every corpus vector to its nearest centroid
    * (centroids: a small DataFrame of (cid, vec), broadcast), then search
    * only the `nProbe` closest centroids' partitions for each query.
    * At 100 TB this turns a full scan per query into a scan of
    * nProbe/nCentroids of the corpus; the bucketed corpus can be written
    * partitioned by cid for static pruning. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String): DataFrame = {
    val c = broadcast(centroids.select(col("cid"), col("cvec")))
    val scored = corpus.crossJoin(c)
      .select(col("*"), dot(col(vecCol), col("cvec")).as("cscore"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("cscore").desc, col("cid"))
    scored.withColumn("crank", row_number().over(w)).filter(col("crank") === 1)
      .drop("cvec", "cscore", "crank")
  }

  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
    val qAssigned = {
      val c = broadcast(centroids.select(col("cid"), col("cvec")))
      val scored = queries.crossJoin(c)
        .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("cid"),
          dot(col(vecCol), col("cvec")).as("cscore"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cscore").desc, col("cid"))
      scored.withColumn("crank", row_number().over(w)).filter(col("crank") <= nProbe)
        .select(col("q_id"), col("q_vec"), col("cid"))
    }
    val candidates = assigned.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("cid"))
      .join(broadcast(qAssigned), Seq("cid"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), dot(col("q_vec"), col("n_vec")).as("score"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
