package graft.sources

import java.io.{BufferedReader, File, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for scrape-drop directories (SURVEY.md §2.1 S1/S2).
  *
  * The reference's scrapers enumerate newest-first and stop at a limit —
  * snscrape breaks at `tweet_limit` (`twitter/lambda_function.py:27-29`),
  * praw `.new(limit=N)` (`reddit/lambda_function_initial.py:46`) — then
  * land each pull as a timestamped S3 JSON drop. This source makes those
  * semantics first-class at the SCAN level instead of filter+limit over a
  * full read:
  *
  * Layout contract (what a periodic scraper naturally produces): a
  * directory of JSON-lines files, one per pull, named `<anything>-<maxTs>
  * .json` where `maxTs` is the newest row's value of the ordering field
  * (`tsField` option, default `ts_us`, ascending epoch micros) and pulls
  * cover DISJOINT time ranges (pull N+1 strictly newer than pull N). Files
  * are non-empty (a drop exists because the scrape returned items).
  *
  * That contract lets the planner prune whole files without opening them:
  * - `LIMIT n` (SupportsPushDownLimit) → read only the newest n files
  *   (≥1 row/file ⇒ they hold ≥ n rows; Spark's own limit stays on top).
  * - `ORDER BY ts DESC|ASC LIMIT n` (SupportsPushDownTopN) → newest or
  *   oldest n files: disjoint time ranges mean every top-n row lives
  *   there. Reported partially-pushed, so Spark re-sorts exactly.
  * - `ts >= since` (SupportsPushDownFilters) → drop files whose maxTs
  *   predates `since` — the scraper's checkpoint-resume semantics
  *   (`reddit/lambda_function_aggregate.py:38`'s 2-day re-crawl window).
  * - Column pruning (SupportsPushDownRequiredColumns) → readers parse
  *   only requested JSON fields.
  *
  * One InputPartition per surviving file, so a 1000-executor cluster reads
  * a large drop history file-parallel, and `LIMIT 100` over years of
  * drops opens ~100 files regardless of history size.
  */
class ScrapeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-scrape"
  override def supportsExternalMetadata(): Boolean = true

  /** Schema inference: parse the first row of the newest drop (integral →
    * long, fractional → double, bool, else string). Prefer an explicit
    * `.schema(...)` in production — inference reads one line of one file.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = ScrapeSource.listDrops(ScrapeSource.path(options))
    require(files.nonEmpty, s"graft-scrape: no drop files in ${ScrapeSource.path(options)}")
    val reader = new BufferedReader(new InputStreamReader(
      new FileInputStream(files.head.file), StandardCharsets.UTF_8))
    try {
      val line = reader.readLine()
      require(line != null, s"graft-scrape: empty drop file ${files.head.file}")
      val node = new ObjectMapper().readTree(line)
      StructType(node.properties().asScala.toSeq.map { e =>
        val v = e.getValue
        val dt =
          if (v.isIntegralNumber) LongType
          else if (v.isFloatingPointNumber) DoubleType
          else if (v.isBoolean) BooleanType
          else StringType
        StructField(e.getKey, dt)
      })
    } finally reader.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ScrapeTable(schema, new CaseInsensitiveStringMap(properties))
}

object ScrapeSource {
  /** A drop file and the max ordering-field value encoded in its name. */
  case class Drop(file: File, maxTs: Long)

  private val NamePattern = """.*-(\d+)\.json""".r

  def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-scrape: .load(path) is required")
    p
  }

  /** All drops, newest first (descending name-ts). Non-conforming names
    * and empty files are rejected loudly — a silent skip would turn a
    * mis-landed drop into silently missing data.
    */
  def listDrops(dir: String): Seq[Drop] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".json"))
    files.map { f =>
      f.getName match {
        case NamePattern(ts) => Drop(f, ts.toLong)
        case _ => throw new IllegalArgumentException(
          s"graft-scrape: drop name must end in -<ts>.json: ${f.getName}")
      }
    }.sortBy(-_.maxTs).toSeq
  }
}

class ScrapeTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"scrape(${ScrapeSource.path(options)})"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScrapeScanBuilder(tableSchema, ScrapeSource.path(options),
      options.getOrDefault("tsField", "ts_us"))
}

class ScrapeScanBuilder(fullSchema: StructType, dir: String, tsField: String)
    extends ScanBuilder
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = fullSchema
  private var limit: Int = -1
  private var since: Option[Long] = None // rows with ts < since are dead
  private var accepted: Array[Filter] = Array.empty
  private var newestFirst = true

  /** `LIMIT n`: any n files hold ≥ n rows; take the newest (scrape reads
    * newest-first). Partially pushed — Spark's limit stays for exactness. */
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  /** `ORDER BY tsField DESC (or ASC NULLS LAST) LIMIT n`: time-disjoint files make the
    * newest (resp. oldest) n files a superset of the top n rows. Only a
    * single-key ordering on the drop field is claimable — anything else
    * must be sorted by Spark from a full scan. */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean =
    orders match {
      case Array(o) =>
        o.expression() match {
          case ref: NamedReference if ref.fieldNames().sameElements(Array(tsField)) &&
              // File pruning keeps the n newest/oldest files by ts: a
              // null-ts row in a PRUNED file would be lost even though
              // NULLS FIRST puts it in the top — only safe when nulls sort
              // last, or when a pushed since-bound excludes them entirely.
              (since.isDefined ||
                o.nullOrdering() == org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_LAST) =>
            limit = n
            newestFirst = o.direction() == SortDirection.DESCENDING
            true
          case _ => false
        }
      case _ => false
    }
  override def isPartiallyPushed(): Boolean = true

  /** Lower bounds on the drop field (`ts > v`, `ts >= v` — the scraper's
    * since-checkpoint) are absorbed COMPLETELY: files whose newest row
    * predates the bound are pruned unopened, and the reader applies the
    * exact row-level comparison to the surviving files. No residual means
    * no Filter node above the scan, so top-N/limit pushdown composes with
    * a since bound — the newest-K-since-checkpoint scrape plan. All other
    * filters are left to Spark untouched. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      // v+1 below must not overflow; ts > Long.MaxValue stays with Spark.
      case GreaterThan(a, v: Long) if a == tsField && v < Long.MaxValue => true
      case GreaterThanOrEqual(a, _: Long) if a == tsField => true
      // Catalyst pairs every bound with an implied IsNotNull; absorb it or
      // the leftover Filter node blocks top-N composition. The reader's
      // null-ts skip IS this predicate (since=MinValue when it stands alone).
      case IsNotNull(a) if a == tsField => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan(_, v: Long) => since = Some(merge(v + 1))
      case GreaterThanOrEqual(_, v: Long) => since = Some(merge(v))
      case IsNotNull(_) => since = Some(merge(Long.MinValue))
      case _ => ()
    }
    accepted = ours
    residual
  }
  private def merge(v: Long): Long = math.max(v, since.getOrElse(Long.MinValue))
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(required: StructType): Unit = { requiredSchema = required }

  override def build(): Scan = {
    val all = ScrapeSource.listDrops(dir)
    // since-prune: a file whose newest row predates `since` is all-dead.
    val alive = since match {
      case Some(s) => all.filter(_.maxTs >= s)
      case None => all
    }
    // limit/top-n prune: newest-first list is already sorted descending.
    val selected =
      if (limit < 0) alive
      else if (newestFirst) alive.take(limit)
      else alive.takeRight(limit)
    new ScrapeScan(selected, requiredSchema, all.size, limit, since, tsField)
  }
}

class ScrapeScan(drops: Seq[ScrapeSource.Drop], schema: StructType,
                 totalFiles: Int, limit: Int, since: Option[Long],
                 tsField: String)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** Post-pruning size, so Catalyst's join planning sees what will
    * actually be read: a newest-K or since-bounded scrape over a deep
    * drop history is tiny and should broadcast. JSON-text bytes are a
    * conservative (over-)estimate of row bytes. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(drops.map(_.file.length()).sum)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
  override def description(): String =
    s"graft-scrape files=${drops.size}/$totalFiles limit=$limit since=${since.getOrElse("-")}"
  override def planInputPartitions(): Array[InputPartition] =
    drops.map(d => ScrapePartition(d.file.getAbsolutePath): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ScrapeReaderFactory(schema, tsField, since)
}

case class ScrapePartition(path: String) extends InputPartition

class ScrapeReaderFactory(schema: StructType, tsField: String,
                          since: Option[Long]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ScrapeFileReader(p.asInstanceOf[ScrapePartition].path, schema, tsField, since)
}

/** JSON-lines reader for one drop file, parsing only the pruned schema's
  * fields (Jackson tree per line; missing / null JSON fields → null).
  * A fully-pushed since bound is applied here exactly: rows whose ts is
  * below it — or null, matching SQL comparison semantics — are skipped.
  */
class ScrapeFileReader(path: String, schema: StructType, tsField: String,
                       since: Option[Long])
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val reader = new BufferedReader(new InputStreamReader(
    new FileInputStream(path), StandardCharsets.UTF_8))
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      if (!line.trim.isEmpty) {
        val node = mapper.readTree(line)
        if (alive(node)) { current = convert(node); return true }
      }
      line = reader.readLine()
    }
    false
  }

  /** Row-exact since bound: null/missing ts fails the comparison, matching
    * SQL `ts >= v` semantics. */
  private def alive(node: com.fasterxml.jackson.databind.JsonNode): Boolean =
    since match {
      case None => true
      case Some(s) =>
        val v = node.get(tsField)
        v != null && v.isIntegralNumber && v.asLong() >= s
    }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()

  private def convert(node: com.fasterxml.jackson.databind.JsonNode): InternalRow = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val v = node.get(f.name)
      values(i) =
        if (v == null || v.isNull) null
        else f.dataType match {
          case LongType => v.asLong()
          case IntegerType => v.asInt()
          case DoubleType => v.asDouble()
          case BooleanType => v.asBoolean()
          case StringType =>
            UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
          case dt => throw new UnsupportedOperationException(
            s"graft-scrape: unsupported field type $dt for ${f.name}")
        }
      i += 1
    }
    new GenericInternalRow(values)
  }
}
