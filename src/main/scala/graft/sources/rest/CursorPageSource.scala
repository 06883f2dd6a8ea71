package graft.sources.rest

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Cursor-chain REST scan (SURVEY.md S5): FHIR-bundle-style pagination
  * where each response carries an OPAQUE token for the next page
  * (`link[rel=next]`, Elasticsearch PIT/search_after, JDBC keyset).
  *
  * Contract difference vs [[RestPageSource]] (offset paging): the page
  * sequence is DISCOVERED, not computed — page N's address is only known
  * after fetching page N-1, so the scan is inherently sequential. This
  * source is honest about that: ONE input partition whose reader walks
  * the chain lazily, emitting rows as pages arrive (bounded memory —
  * one page held at a time), with LIMIT pushdown ending the walk early
  * (a `limit(25)` on a 10k-row chain fetches only ⌈25/pageSize⌉ pages).
  * Parallelism comes downstream: land the chain, then repartition — or
  * use offset paging where the API supports it.
  */
trait CursorFetcher extends Serializable {
  /** Token addressing the first page. */
  def firstToken: String
  /** One page: (payload rows, next token or null when the chain ends). */
  def fetchPage(token: String): (Seq[String], String)
}

/** Fetcher resolution — same two paths as [[PageFetchers]]: a JVM-local
  * registry name (tests/local mode) or a reflectively-instantiated
  * provider class shipped with the partition (multi-JVM deployments). */
trait CursorFetcherProvider {
  def create(config: Map[String, String]): CursorFetcher
}

object CursorFetchers {
  private val fetchers = new java.util.concurrent.ConcurrentHashMap[String, CursorFetcher]()
  def register(name: String, f: CursorFetcher): Unit = fetchers.put(name, f)

  private val instances = new java.util.concurrent.ConcurrentHashMap[String, CursorFetcher]()

  def resolve(name: String, providerClass: String,
              config: Map[String, String]): CursorFetcher =
    if (providerClass.nonEmpty) {
      val key = providerClass + "|" +
        config.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
      instances.computeIfAbsent(key, _ =>
        Class.forName(providerClass).getDeclaredConstructor()
          .newInstance().asInstanceOf[CursorFetcherProvider].create(config))
    } else {
      val f = fetchers.get(name)
      require(f != null,
        s"no CursorFetcher registered under '$name' in this JVM — in a " +
          "multi-JVM deployment pass fetcher_provider=<class> instead")
      f
    }
}

class CursorPageSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "rest-cursor"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CursorPageSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CursorTable(properties.asScala.toMap)
}

object CursorPageSource {
  val schema: StructType = StructType(Seq(
    StructField("row_idx", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))
}

final class CursorTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"rest-cursor(${props.getOrElse("fetcher", "?")})"
  override def schema(): StructType = CursorPageSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val config = props ++ options.asCaseSensitiveMap().asScala
    new CursorScanBuilder(
      options.getOrDefault("fetcher", props.getOrElse("fetcher", "")),
      options.getOrDefault("fetcher_provider", props.getOrElse("fetcher_provider", "")),
      config)
  }
}

final class CursorScanBuilder(fetcherName: String, providerClass: String,
                              config: Map[String, String])
    extends ScanBuilder with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {
  private var limit: Option[Int] = None
  private var required: StructType = CursorPageSource.schema

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"rest-cursor fetcher=$fetcherName limit=${limit.getOrElse(-1)} " +
        s"columns=${required.fieldNames.mkString(",")}"
    override def planInputPartitions(): Array[InputPartition] =
      Array(CursorInputPartition(fetcherName, providerClass, config,
        limit.getOrElse(-1), required.fieldNames))
    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] =
          new CursorPartitionReader(p.asInstanceOf[CursorInputPartition])
      }
  }
}

final case class CursorInputPartition(fetcherName: String, providerClass: String,
                                      config: Map[String, String], limit: Int,
                                      columns: Array[String]) extends InputPartition

/** Walks the cursor chain lazily: at most one page buffered; the chain
  * stops at a null next-token or once the pushed LIMIT is satisfied. */
final class CursorPartitionReader(p: CursorInputPartition)
    extends PartitionReader[InternalRow] {
  private lazy val fetcher =
    CursorFetchers.resolve(p.fetcherName, p.providerClass, p.config)
  private var token: String = _
  private var started = false
  private var page: Iterator[String] = Iterator.empty
  private var emitted = 0L
  private var current: String = _

  override def next(): Boolean = {
    if (p.limit >= 0 && emitted >= p.limit) return false
    while (!page.hasNext) {
      if (!started) { token = fetcher.firstToken; started = true }
      if (token == null) return false
      val (rows, nextTok) = fetcher.fetchPage(token)
      token = nextTok
      page = rows.iterator
      if (!page.hasNext && token == null) return false
    }
    current = page.next()
    emitted += 1
    true
  }

  override def get(): InternalRow = {
    val values = p.columns.map {
      case "row_idx" => java.lang.Long.valueOf(emitted - 1)
      case "payload" =>
        if (current == null) null else UTF8String.fromString(current)
      case _ => null
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = ()
}
