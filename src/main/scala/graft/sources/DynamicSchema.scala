package graft.sources

import org.apache.spark.sql.types._

/** Schema-evolution rules for dynamic ("computing") tables — the
  * reference's `relkind='g'` tables whose columns materialize from inserted
  * documents (see /root/reference components/catalog/catalog_codes.hpp:17 and
  * the NEW / SAME-TYPE / TYPE-EVOLUTION classification at
  * components/physical_plan/operators/operator.hpp:93-99).
  *
  * Pure functions over `StructType`s; the I/O side lives in
  * [[graft.api.GraftSession]]. Each ingest batch keeps its own parquet
  * schema on disk; reads cast every batch to the evolved union schema, so
  * old data survives type evolution (the reference's
  * `dynamic_schema_type_evolution_multistep` semantics) without rewriting
  * files — at 100 TB an evolve is a metadata operation, never a data scan.
  */
object DynamicSchema {

  sealed trait ColumnChange
  case object NewColumn extends ColumnChange
  case object SameType extends ColumnChange
  final case class TypeEvolution(from: DataType, to: DataType, widened: DataType)
    extends ColumnChange

  /** Classify what an incoming column does to the current schema. */
  def classify(current: StructType, name: String, incoming: DataType): ColumnChange =
    current.fields.find(_.name == name) match {
      case None => NewColumn
      case Some(f) if f.dataType == incoming => SameType
      case Some(f) =>
        TypeEvolution(f.dataType, incoming, widen(f.dataType, incoming))
    }

  /** Widening lattice: numeric types promote along
    * byte < short < int < long < float/double; decimal unions take max
    * precision/scale; mismatched families fall back to string (every value
    * has a faithful textual form); nested structs/arrays/maps merge
    * recursively. */
  private def intRank(t: DataType): Option[Int] = t match {
    case ByteType => Some(1)
    case ShortType => Some(2)
    case IntegerType => Some(3)
    case LongType => Some(4)
    case _ => None
  }
  private def isFloating(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    case (x, y) if intRank(x).isDefined && intRank(y).isDefined =>
      if (intRank(x).get >= intRank(y).get) x else y
    case (x, y) if intRank(x).isDefined && isFloating(y) => y
    case (x, y) if isFloating(x) && intRank(y).isDefined => x
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (d1: DecimalType, d2: DecimalType) =>
      val scale = math.max(d1.scale, d2.scale)
      val intDigits = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
      DecimalType(math.min(DecimalType.MAX_PRECISION, intDigits + scale), scale)
    case (d: DecimalType, y) if intRank(y).isDefined => d
    case (x, d: DecimalType) if intRank(x).isDefined => d
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
      ArrayType(widen(e1, e2), n1 || n2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) =>
      MapType(widen(k1, k2), widen(v1, v2), n1 || n2)
    case (s1: StructType, s2: StructType) => merge(s1, s2)
    case _ => StringType
  }

  /** Union of two schemas under the widening rules; field order = first
    * appearance (the reference materializes columns in insert order). */
  def merge(current: StructType, incoming: StructType): StructType = {
    val existing = current.fields.map { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(in) if in.dataType != f.dataType =>
          StructField(f.name, widen(f.dataType, in.dataType), nullable = true)
        case _ => f.copy(nullable = true)
      }
    }
    val added = incoming.fields
      .filterNot(f => current.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(existing ++ added)
  }
}
