package graft.sources.dsv2

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.ShopifyClient

/** DataSource V2 Shopify source (SURVEY §7.4 stretch goal): the
  * extraction client surfaced as `spark.read.format("shopify")` with
  * real filter pushdown — range predicates on `updated_at` become the
  * Shopify search query `updated_at:>'x'`, evaluated SERVER-side, the
  * DSv2 formalization of the reference's incremental pull
  * (extarct_incremental.py:71-80).
  *
  * Schema is `(updated_at STRING, edge STRING)`: the watermark column
  * for pushdown + the raw edge JSON, which downstream parses with
  * `from_json(col("edge"), Schemas.<entity>Node)` and flattens via
  * `silver.Flatten`. One input partition: the API is rate-limited to
  * ~2 req/s, so reader parallelism buys nothing (the heavy lifting
  * happens after bronze landing).
  *
  * Options: `shop`, `token`, `resource` (e.g. orders), `graphql` (the
  * query text). Tests inject a fake transport via
  * [[ShopifySource.transportOverride]] (same-JVM local mode).
  */
class ShopifySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "shopify"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShopifySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ShopifyTable(new CaseInsensitiveStringMap(properties))
}

object ShopifySource {
  val schema: StructType = StructType(Seq(
    StructField("updated_at", StringType), StructField("edge", StringType)))

  /** Test seam: when set, readers use this transport instead of HTTP. */
  @volatile var transportOverride: Option[ShopifyClient.Transport] = None
}

private[dsv2] class ShopifyTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String =
    s"shopify:${options.get("shop")}/${options.get("resource")}"
  override def schema(): StructType = ShopifySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ShopifyScanBuilder(options)
}

private[dsv2] class ShopifyScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownFilters {

  // (value, inclusive) — `>=` MUST push Shopify's `>=`, not `>`:
  // mapping >= to > would drop the exact watermark-boundary row and the
  // residual Spark filter can only remove rows, never restore them
  private var since: Option[(String, Boolean)] = None
  private var until: Option[(String, Boolean)] = None
  private var pushed: Array[Filter] = Array.empty

  /** Accept range predicates on updated_at with exact operator
    * fidelity; everything else stays in Spark. All filters are still
    * returned as residual so Spark re-verifies (the server pre-filter
    * may be a superset, never a subset). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case GreaterThan("updated_at", v: String) => since = tighterSince(since, v, inclusive = false)
      case GreaterThanOrEqual("updated_at", v: String) => since = tighterSince(since, v, inclusive = true)
      case LessThan("updated_at", v: String) => until = tighterUntil(until, v, inclusive = false)
      case LessThanOrEqual("updated_at", v: String) => until = tighterUntil(until, v, inclusive = true)
      case _ => ()
    }
    pushed = filters.filter {
      case GreaterThan("updated_at", _: String) | GreaterThanOrEqual("updated_at", _: String) |
           LessThan("updated_at", _: String) | LessThanOrEqual("updated_at", _: String) => true
      case _ => false
    }
    filters // all residual: source-side filter is a pre-filter, Spark re-verifies
  }
  // keep the TIGHTEST bound; on equal values an exclusive bound is tighter
  private def tighterSince(a: Option[(String, Boolean)], v: String, inclusive: Boolean) =
    Some(a.fold((v, inclusive)) { case (x, xi) =>
      if (v > x || (v == x && !inclusive)) (v, inclusive) else (x, xi) })
  private def tighterUntil(a: Option[(String, Boolean)], v: String, inclusive: Boolean) =
    Some(a.fold((v, inclusive)) { case (x, xi) =>
      if (v < x || (v == x && !inclusive)) (v, inclusive) else (x, xi) })

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val filter = (since.map { case (v, inc) =>
        s"updated_at:${if (inc) ">=" else ">"}'$v'" } ++
      until.map { case (v, inc) =>
        s"updated_at:${if (inc) "<=" else "<"}'$v'" }).mkString(" AND ")
    new ShopifyScan(options, if (filter.isEmpty) None else Some(filter))
  }
}

private[dsv2] class ShopifyScan(options: CaseInsensitiveStringMap,
                                searchFilter: Option[String])
  extends Scan with Batch {
  override def readSchema(): StructType = ShopifySource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ShopifyScan(pushedFilter=$searchFilter)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ShopifyInputPartition(
      options.get("shop"), options.get("token"),
      options.get("resource"), options.get("graphql"), searchFilter))
  override def createReaderFactory(): PartitionReaderFactory =
    new ShopifyReaderFactory
}

private[dsv2] case class ShopifyInputPartition(
    shop: String, token: String, resource: String, graphql: String,
    searchFilter: Option[String]) extends InputPartition

private[dsv2] class ShopifyReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShopifyInputPartition]
    new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper()
      private val client = new ShopifyClient(p.shop, p.token,
        ShopifySource.transportOverride.getOrElse(ShopifyClient.httpTransport))
      private val edges = client.fetchAllPages(p.graphql, p.resource,
        p.searchFilter.map(f => Map("query" -> f)).getOrElse(Map.empty)).iterator
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!edges.hasNext) return false
        val edge = edges.next()
        val updated = mapper.readTree(edge).path("node").path("updatedAt").asText(null)
        current = InternalRow(
          if (updated == null) null else UTF8String.fromString(updated),
          UTF8String.fromString(edge))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
