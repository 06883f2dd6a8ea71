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

/** JVM-local fetcher registry: partitions reference fetchers by name so
  * nothing non-serializable crosses the task boundary. */
object PageFetchers {
  private val fetchers = new java.util.concurrent.ConcurrentHashMap[String, PageFetcher]()
  def register(name: String, f: PageFetcher): Unit = fetchers.put(name, f)
  def apply(name: String): PageFetcher = {
    val f = fetchers.get(name)
    require(f != null, s"no PageFetcher registered under '$name'")
    f
  }
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
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(
      options.getOrDefault("fetcher", props.getOrElse("fetcher", "")),
      options.getInt("pagesize", props.get("pagesize").map(_.toInt).getOrElse(50)))
}

final class RestScanBuilder(fetcherName: String, pageSize: Int)
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
      val total = PageFetchers(fetcherName).totalRows
      val effective = limit.fold(total)(math.min(_, total))
      (0 until effective by pageSize).map { start =>
        RestInputPartition(fetcherName, start,
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

final case class RestInputPartition(fetcherName: String, start: Int, n: Int,
                                    columns: Array[String]) extends InputPartition

final class RestPartitionReader(p: RestInputPartition)
    extends PartitionReader[InternalRow] {
  private val wantOffset = p.columns.contains("offset")
  private val wantPayload = p.columns.contains("payload")
  // page fetched lazily on first next(): planning never triggers IO
  private lazy val rows = PageFetchers(p.fetcherName).fetch(p.start, p.n).iterator
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
