package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 over a canonical `base/ALIAS/YYYY/MM/DD[/edition]`
  * issue tree — the SURVEY.md §4 / §7.3 "custom FileIndex for partition
  * pruning on raw trees" realized as a v2 source.
  *
  * `spark.read.format("graft.sources.IssueTreeSource").load(base)`
  * yields issue descriptors (alias, date, edition, path). The scan
  * builder receives pushed filters and prunes DIRECTORIES during
  * planning: alias equality/membership skips whole title subtrees, and
  * date bounds skip year/month/day levels before anything is listed —
  * at 100 TB an issue tree holds millions of directories, and a
  * config-driven import touches a sliver of them. Alias filters are
  * fully consumed (reported as pushed); date filters are applied
  * opportunistically for pruning but returned as residuals so Spark
  * re-evaluates them row-wise (safe under any edge case).
  *
  * The row payload is descriptor-sized: parsing stays in the importers
  * ([[graft.jobs.ImportJob]] consumes these descriptors), so the source
  * never reads file contents.
  */
class IssueTreeSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IssueTreeSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "IssueTreeSource requires exactly one path: " +
        "spark.read.format(...).load(<base dir>)")
    new IssueTreeTable(path)
  }
}

object IssueTreeSource {
  val Schema: StructType = StructType(Seq(
    StructField("alias", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("edition", StringType, nullable = false),
    StructField("path", StringType, nullable = false)))

  // Hadoop-FS listing: the pruned walk works over local disk, HDFS or
  // object stores alike (graft.util.FsWalk)
  private[sources] def subdirs(path: String): Seq[graft.util.FsWalk.Dir] =
    graft.util.FsWalk.subdirs(path)
}

private class IssueTreeTable(base: String) extends Table with SupportsRead {
  override def name(): String = s"issue_tree($base)"
  override def schema(): StructType = IssueTreeSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IssueTreeScanBuilder(base)
}

private class IssueTreeScanBuilder(base: String)
    extends ScanBuilder with SupportsPushDownFilters {

  private var aliasFilters: Array[Filter] = Array.empty
  private var dateBounds: (Option[Int], Option[Int]) = (None, None) // epoch days

  private def epochDay(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (alias, rest) = filters.partition {
      case EqualTo("alias", _) | In("alias", _) => true
      case _ => false
    }
    aliasFilters = alias
    // date bounds tighten directory pruning but stay residual
    rest.foreach {
      case GreaterThan("date", v) =>
        epochDay(v).foreach(d => dateBounds = (maxOpt(dateBounds._1, d + 1), dateBounds._2))
      case GreaterThanOrEqual("date", v) =>
        epochDay(v).foreach(d => dateBounds = (maxOpt(dateBounds._1, d), dateBounds._2))
      case LessThan("date", v) =>
        epochDay(v).foreach(d => dateBounds = (dateBounds._1, minOpt(dateBounds._2, d - 1)))
      case LessThanOrEqual("date", v) =>
        epochDay(v).foreach(d => dateBounds = (dateBounds._1, minOpt(dateBounds._2, d)))
      case EqualTo("date", v) =>
        epochDay(v).foreach(d => dateBounds =
          (maxOpt(dateBounds._1, d), minOpt(dateBounds._2, d)))
      case _ => ()
    }
    rest // alias filters fully handled; everything else residual
  }
  private def maxOpt(a: Option[Int], b: Int) = Some(a.fold(b)(math.max(_, b)))
  private def minOpt(a: Option[Int], b: Int) = Some(a.fold(b)(math.min(_, b)))

  override def pushedFilters(): Array[Filter] = aliasFilters

  override def build(): Scan =
    new IssueTreeScan(base, aliasFilters, dateBounds)
}

private class IssueTreeScan(base: String, aliasFilters: Array[Filter],
    dateBounds: (Option[Int], Option[Int])) extends Scan with Batch {
  import IssueTreeSource._

  override def readSchema(): StructType = Schema
  override def toBatch: Batch = this
  override def description(): String = {
    val af = aliasFilters.mkString(",")
    s"IssueTreeScan(base=$base, prunedBy=[$af], dateBounds=$dateBounds)"
  }

  private def aliasAccepted(a: String): Boolean =
    aliasFilters.forall {
      case EqualTo(_, v) => a == v
      case In(_, vs) => vs.contains(a)
      case _ => true
    }

  /** Driver-side pruned walk: alias dirs filtered by the pushed alias
    * predicates, year/month/day levels by the date bounds. */
  private def prunedIssueDirs(): Seq[(String, Int, String, String)] = {
    val (lo, hi) = dateBounds
    def yearOk(y: Int): Boolean = {
      val first = java.time.LocalDate.of(y, 1, 1).toEpochDay
      val last = java.time.LocalDate.of(y, 12, 31).toEpochDay
      lo.forall(_ <= last) && hi.forall(_ >= first)
    }
    for {
      alias <- subdirs(base) if aliasAccepted(alias.name)
      year <- subdirs(alias.path) if year.name.matches("\\d{4}") &&
        yearOk(year.name.toInt)
      month <- subdirs(year.path) if month.name.matches("\\d{2}")
      day <- subdirs(month.path) if day.name.matches("\\d{2}")
      // a malformed vendor dir (month 13, day 32) skips, not fails:
      // one stray directory must not kill every read of the tree
      epoch <- scala.util.Try(java.time.LocalDate.of(year.name.toInt,
        month.name.toInt, day.name.toInt).toEpochDay.toInt).toOption.toSeq
      if lo.forall(_ <= epoch) && hi.forall(_ >= epoch)
      (edition, path) <- {
        val eds = subdirs(day.path)
        if (eds.isEmpty) Seq("a" -> day.path)
        else eds.map(e => e.name -> e.path)
      }
    } yield (alias.name, epoch, edition, path)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val dirs = prunedIssueDirs()
    // descriptor rows are tiny: group into a bounded partition count
    val chunks = math.max(1, math.min(dirs.size, 64))
    dirs.grouped(math.max(1, (dirs.size + chunks - 1) / chunks))
      .map(g => IssueTreePartition(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new IssueTreeReaderFactory
}

private case class IssueTreePartition(
    rows: Array[(String, Int, String, String)]) extends InputPartition

private class IssueTreeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[IssueTreePartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (alias, epoch, edition, path) = rows(i)
        InternalRow(UTF8String.fromString(alias), epoch,
          UTF8String.fromString(edition), UTF8String.fromString(path))
      }
      override def close(): Unit = ()
    }
  }
}
