package graft.render

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KGX property-graph assembly (SURVEY.md K2, A8).
  *
  * The reference emits one `{nodes:[], edges:[]}` JSON document
  * (get_bdc_studies_from_gen3.py:258-352): a study node per base
  * accession (consent-suffix variants collapsed, first wins), a consent
  * node per row, and `related_to` edges consent→study. Spark-first: nodes
  * and edges are two DataFrames (exactly the GraphFrames model);
  * [[toJsonDocument]] renders the reference's single-doc layout for
  * metadata-scale parity.
  */
object KgxAssembler {

  /** Collapse studies to one node per base accession (A8: deterministic
    * first = min consent), emit biolink-ish study nodes. */
  def studyNodes(studies: DataFrame, idCol: String, nameCol: String,
                 programCol: String): DataFrame =
    studies
      .withColumn("base_id", substring_index(col(idCol), ".c", 1))
      .groupBy(col("base_id").as("id"))
      .agg(min(col(nameCol)).as("name"),
        min(col(programCol)).as("program"),
        concat_ws("|", array_sort(collect_set(col(idCol)))).as("consents"))
      .withColumn("categories", array(lit("biolink:Study")))
      .withColumn("iri", concat(lit("https://identifiers.org/dbgap:"), col("id")))

  /** One consent node per original row + an edge consent→study. */
  def consentNodesAndEdges(studies: DataFrame, idCol: String): (DataFrame, DataFrame) = {
    val nodes = studies.select(
      col(idCol).as("id"),
      col(idCol).as("name"),
      array(lit("biolink:StudyPopulation")).as("categories"))
    val edges = studies.select(
      col(idCol).as("subject"),
      lit("biolink:related_to").as("predicate"),
      substring_index(col(idCol), ".c", 1).as("object"))
    (nodes, edges)
  }

  /** Render the single `{"nodes":[…],"edges":[…]}` document (metadata
    * scale; large graphs should use [[writeGraph]]). Node and edge order is
    * made deterministic by sorting on id/subject. Collects to the driver,
    * so a row-count ceiling raises on data-scale misuse instead of OOMing. */
  def toJsonDocument(nodes: DataFrame, edges: DataFrame,
                     maxRows: Long = 1000000L): String = {
    Seq("nodes" -> nodes, "edges" -> edges).foreach { case (what, df) =>
      val n = df.limit(DocumentSink.probeLimit(maxRows)).count()
      require(n <= maxRows,
        s"toJsonDocument collects $what to the driver (> $maxRows rows); " +
          "use writeGraph for large graphs")
    }
    val nodeJson = nodes.orderBy("id").toJSON.collect().mkString(",")
    val edgeJson = edges.orderBy("subject", "object").toJSON.collect().mkString(",")
    s"""{"nodes":[$nodeJson],"edges":[$edgeJson]}"""
  }

  /** Distributed sink: nodes/edges as JSON-lines datasets. */
  def writeGraph(nodes: DataFrame, edges: DataFrame, baseDir: String): Unit = {
    nodes.write.mode("overwrite").json(s"$baseDir/nodes")
    edges.write.mode("overwrite").json(s"$baseDir/edges")
  }

  /** Typed view of the graph (compile-time field checks for pipeline code
    * traversing it; the KGX node/edge shapes of graft.model). Missing
    * optional columns are filled with nulls. */
  def typedGraph(nodes: DataFrame, edges: DataFrame)
      : (org.apache.spark.sql.Dataset[graft.model.KgxNode],
         org.apache.spark.sql.Dataset[graft.model.KgxEdge]) = {
    val spark = nodes.sparkSession
    import spark.implicits._
    def opt(df: DataFrame, c: String): Column =
      if (df.columns.contains(c)) col(c).cast("string") else lit(null).cast("string")
    val n = nodes.select(col("id").cast("string").as("id"),
        col("name").cast("string").as("name"),
        col("categories").cast("array<string>").as("categories"),
        opt(nodes, "description").as("description"),
        opt(nodes, "iri").as("iri"),
        opt(nodes, "program").as("program"))
      .as[graft.model.KgxNode]
    val e = edges.select(col("subject").cast("string").as("subject"),
        col("predicate").cast("string").as("predicate"),
        col("object").cast("string").as("object"))
      .as[graft.model.KgxEdge]
    (n, e)
  }
}
