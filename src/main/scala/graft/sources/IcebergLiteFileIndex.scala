package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One live data file of an Iceberg-lite snapshot, with the manifest-carried
  * pruning inputs: Hive/identity partition values and per-column min/max +
  * null-count statistics (strings, typed lazily against the table schema).
  */
final case class LiteDataFile(
    path: String,
    size: Long,
    recordCount: Long,
    partitionValues: Map[String, String],
    lower: Map[String, String],
    upper: Map[String, String],
    nullCounts: Map[String, Long])

/** Spark [[FileIndex]] over an Iceberg-lite snapshot's manifest entries.
  *
  * This is where 100 TB queries stop being full-table scans: Catalyst hands
  * `listFiles` the query's partition filters and data filters at planning
  * time, and files are dropped using the partition tuple and the
  * manifest-carried column bounds — before any scan task is scheduled. The
  * reference gets the equivalent from DuckDB's iceberg extension
  * (reference README.md:198,233 "partition pruning / file skipping"); here
  * the same pruning plugs into Spark's own scan planning, so
  * FileSourceScanExec metrics (numFiles, filesSize) reflect it directly.
  */
final class IcebergLiteFileIndex(
    spark: SparkSession,
    tablePath: Path,
    files: Seq[LiteDataFile],
    override val partitionSchema: StructType,
    statTypes: Map[String, DataType]) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(tablePath)

  override def inputFiles: Array[String] = files.map(_.path).toArray

  override def refresh(): Unit = ()

  override lazy val sizeInBytes: Long = files.map(_.size).sum

  private val fieldTypes: Map[String, DataType] =
    partitionSchema.fields.map(f => f.name -> f.dataType).toMap

  /** Typed partition tuple for a file, in partitionSchema order. */
  private def partitionRow(f: LiteDataFile): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { field =>
      f.partitionValues.get(field.name) match {
        case None | Some("__HIVE_DEFAULT_PARTITION__") => null
        case Some(v) => castPartitionValue(v, field.dataType)
      }
    })

  private def castPartitionValue(v: String, dt: DataType): Any = dt match {
    case LongType => v.toLong
    case IntegerType => v.toInt
    case DoubleType => v.toDouble
    case BooleanType => v.toBoolean
    case DateType => DateTimeUtils.stringToDate(UTF8String.fromString(v)).getOrElse(null)
    case _ => UTF8String.fromString(v)
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val partPred = partitionFilters.reduceOption(And).map { expr =>
      val bound = expr.transform {
        case a: AttributeReference =>
          BoundReference(partitionSchema.fieldIndex(a.name),
            fieldTypes(a.name), nullable = true)
      }
      Predicate.createInterpreted(bound)
    }
    val kept = files.filter { f =>
      val row = partitionRow(f)
      partPred.forall(_.eval(row)) &&
        !dataFilters.exists(e => StatsPruning.canSkip(e, f))
    }
    kept.groupBy(partitionRow).toSeq.map { case (row, fs) =>
      PartitionDirectory(row, fs.map(f =>
        new FileStatus(f.size, false, 1, 128L * 1024 * 1024, 0L, new Path(f.path))).toArray)
    }
  }
}

/** Min/max + null-count file skipping straight off the Catalyst filter
  * expressions (literal values arrive Catalyst-internal: UTF8String for
  * strings, days for DATE, micros for TIMESTAMP — exactly the encoding the
  * bounds store). Conservative in every unknown case: a file is skipped
  * only when the bounds PROVE no row can match.
  */
object StatsPruning {

  def canSkip(e: Expression, f: LiteDataFile): Boolean = e match {
    case And(l, r) => canSkip(l, f) || canSkip(r, f)
    case Or(l, r) => canSkip(l, f) && canSkip(r, f)
    case EqualTo(a: AttributeReference, l: Literal) => outside(a.name, l, f)
    case EqualTo(l: Literal, a: AttributeReference) => outside(a.name, l, f)
    case GreaterThan(a: AttributeReference, l: Literal) => // a > v: skip when max <= v
      cmpUpper(a.name, l, f).exists(_ <= 0)
    case GreaterThan(l: Literal, a: AttributeReference) => // v > a: skip when min >= v
      cmpLower(a.name, l, f).exists(_ >= 0)
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      cmpUpper(a.name, l, f).exists(_ < 0)
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      cmpLower(a.name, l, f).exists(_ > 0)
    case LessThan(a: AttributeReference, l: Literal) => // a < v: skip when min >= v
      cmpLower(a.name, l, f).exists(_ >= 0)
    case LessThan(l: Literal, a: AttributeReference) => // v < a: skip when max <= v
      cmpUpper(a.name, l, f).exists(_ <= 0)
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      cmpLower(a.name, l, f).exists(_ > 0)
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      cmpUpper(a.name, l, f).exists(_ < 0)
    case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall(v => outside(a.name, v.asInstanceOf[Literal], f))
    case InSet(a: AttributeReference, vs) if vs.nonEmpty =>
      vs.forall(v => outside(a.name, Literal.create(v, a.dataType), f))
    case IsNull(a: AttributeReference) => f.nullCounts.get(a.name).contains(0L)
    case IsNotNull(a: AttributeReference) =>
      f.nullCounts.get(a.name).exists(n => n > 0 && n == f.recordCount)
    case _ => false
  }

  /** v provably outside [min, max] of the file's column. */
  private def outside(c: String, l: Literal, f: LiteDataFile): Boolean =
    cmpUpper(c, l, f).exists(_ < 0) || cmpLower(c, l, f).exists(_ > 0)

  /** sign(file-min - v); None when no bound / not comparable. */
  private def cmpLower(c: String, l: Literal, f: LiteDataFile): Option[Int] =
    f.lower.get(c).flatMap(b => cmp(b, l))

  /** sign(file-max - v). */
  private def cmpUpper(c: String, l: Literal, f: LiteDataFile): Option[Int] =
    f.upper.get(c).flatMap(b => cmp(b, l))

  /** Bounds store the parquet-physical encoding (longs for integral, date
    * days, timestamp micros; doubles; raw strings) — the same shapes
    * Catalyst literals use internally.
    */
  private def cmp(bound: String, l: Literal): Option[Int] =
    if (l.value == null) None
    else (l.dataType, l.value) match {
      case (ByteType | ShortType | IntegerType | LongType | DateType | _: TimestampType, n: Number) =>
        Some(java.lang.Long.compare(bound.toLong, n.longValue()))
      case (FloatType, n: Number) =>
        Some(java.lang.Double.compare(bound.toDouble, n.doubleValue()))
      case (DoubleType, n: Number) =>
        Some(java.lang.Double.compare(bound.toDouble, n.doubleValue()))
      case (StringType, s: UTF8String) => Some(bound.compareTo(s.toString))
      case (BooleanType, b: java.lang.Boolean) =>
        Some(java.lang.Boolean.compare(bound.toBoolean, b))
      case _ => None
    }
}
