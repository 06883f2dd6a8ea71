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

/** Paginated-REST scan as a DataSourceV2 (SURVEY.md S3/S4, §4 limit
  * pushdown).
  *
  * The reference pages through Gen3 MDS with `&limit=&offset=` loops
  * (get_bdc_studies_from_gen3.py:32-82) and pushes its row cap into the
  * URL. This source makes that a first-class scan:
  *  - one InputPartition per page ⇒ pages fetch in parallel across the
  *    cluster (the reference is sequential);
  *  - `SupportsPushDownLimit`: a query-level LIMIT shrinks the page plan
  *    before any fetch happens — the §4 "limit pushdown to source" row;
  *  - rows surface as (offset, payload-JSON) for downstream `from_json`.
  *
  * Transport is pluggable via [[PageFetcher]] (registered by name in
  * [[PageFetchers]]): production would install an HTTP fetcher with
  * pooled connections + retries; this environment has zero egress, so
  * tests install in-memory fetchers. The engine-side contract (planning,
  * pushdown, parallelism) is identical either way.
  */
trait PageFetcher extends Serializable {
  /** Total row count (the reference learns this from the first page). */
  def totalRows: Int
  /** Fetch rows [offset, offset+limit) as JSON payload strings. */
  def fetch(offset: Int, limit: Int): Seq[String]
}

/** Deployment-safe fetcher construction: a zero-arg-constructible factory
  * named by CLASS in the scan options (`fetcher_provider`), shipped to
  * executors as a string and instantiated lazily in each task JVM with the
  * serialized option map — the production path (an HTTP provider builds
  * its pooled client here, once per executor, from config). */
trait PageFetcherProvider {
  def create(config: Map[String, String]): PageFetcher
}

/** Fetcher resolution. Two paths:
  *  - `fetcher_provider` (class name): reflective instantiation executor-
  *    side from the InputPartition's config — works in any JVM topology;
  *  - `fetcher` (registry name): JVM-local registry, for tests/local mode
  *    where driver and executors share the JVM. Using a bare name in a
  *    multi-JVM deployment fails fast with a message naming the fix.
  * Provider instances cache per (class, config) so e.g. connection pools
  * are built once per executor, not once per task. */
object PageFetchers {
  private val fetchers = new java.util.concurrent.ConcurrentHashMap[String, PageFetcher]()
  def register(name: String, f: PageFetcher): Unit = fetchers.put(name, f)
  def apply(name: String): PageFetcher = {
    val f = fetchers.get(name)
    require(f != null,
      s"no PageFetcher registered under '$name' in this JVM — in a " +
        "multi-JVM deployment pass fetcher_provider=<class> instead of a " +
        "registry name (or register fetchers in an executor startup hook)")
    f
  }

  private val instances = new java.util.concurrent.ConcurrentHashMap[String, PageFetcher]()

  def resolve(name: String, providerClass: String,
              config: Map[String, String]): PageFetcher =
    if (providerClass.nonEmpty) {
      val key = providerClass + "|" +
        config.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
      instances.computeIfAbsent(key, _ =>
        Class.forName(providerClass).getDeclaredConstructor()
          .newInstance().asInstanceOf[PageFetcherProvider].create(config))
    } else apply(name)
}

class RestPageSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "rest-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestPageSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RestTable(properties.asScala.toMap)
}

object RestPageSource {
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))
}

final class RestTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"rest-pages(${props.getOrElse("fetcher", "?")})"
  override def schema(): StructType = RestPageSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val config = props ++ options.asCaseSensitiveMap().asScala
    new RestScanBuilder(
      options.getOrDefault("fetcher", props.getOrElse("fetcher", "")),
      options.getOrDefault("fetcher_provider", props.getOrElse("fetcher_provider", "")),
      options.getInt("pagesize", props.get("pagesize").map(_.toInt).getOrElse(50)),
      config)
  }
}

final class RestScanBuilder(fetcherName: String, providerClass: String,
                            pageSize: Int, config: Map[String, String])
    extends ScanBuilder with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {
  private var limit: Option[Int] = None
  private var required: StructType = RestPageSource.schema

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  // column pruning: a count() or offset-only query never materializes the
  // payload JSON strings
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"rest-pages fetcher=$fetcherName pageSize=$pageSize " +
        s"limit=${limit.getOrElse(-1)} columns=${required.fieldNames.mkString(",")}"

    override def planInputPartitions(): Array[InputPartition] = {
      val total = PageFetchers.resolve(fetcherName, providerClass, config).totalRows
      val effective = limit.fold(total)(math.min(_, total))
      (0 until effective by pageSize).map { start =>
        RestInputPartition(fetcherName, providerClass, config, start,
          math.min(pageSize, effective - start),
          required.fieldNames): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
          val rp = p.asInstanceOf[RestInputPartition]
          new RestPartitionReader(rp)
        }
      }
  }
}

/** Carries everything an executor JVM needs to build the fetcher locally:
  * provider class name + serialized config (the registry name only works
  * when driver and executor share a JVM). */
final case class RestInputPartition(fetcherName: String, providerClass: String,
                                    config: Map[String, String], start: Int,
                                    n: Int, columns: Array[String])
    extends InputPartition

final class RestPartitionReader(p: RestInputPartition)
    extends PartitionReader[InternalRow] {
  private val wantOffset = p.columns.contains("offset")
  private val wantPayload = p.columns.contains("payload")
  // page fetched lazily on first next(): planning never triggers IO;
  // fetcher resolved IN THE TASK JVM (reflective provider path)
  private lazy val rows =
    PageFetchers.resolve(p.fetcherName, p.providerClass, p.config)
      .fetch(p.start, p.n).iterator
  private var i = p.start - 1
  private var current: String = _
  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); i += 1; true } else false
  }
  override def get(): InternalRow = {
    val values = p.columns.map {
      case "offset" if wantOffset => java.lang.Long.valueOf(i.toLong)
      case "payload" if wantPayload =>
        if (current == null) null else UTF8String.fromString(current)
      case _ => null
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = ()
}
