package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DynamicSchema._

class DynamicSchemaSpec extends AnyFunSuite {
  test("classify: new / same-type / type-evolution") {
    val cur = StructType(Seq(StructField("a", IntegerType)))
    assert(classify(cur, "b", StringType) == NewColumn)
    assert(classify(cur, "a", IntegerType) == SameType)
    classify(cur, "a", LongType) match {
      case TypeEvolution(IntegerType, LongType, LongType) =>
      case other => fail(s"unexpected $other")
    }
  }

  test("widen follows the numeric lattice") {
    assert(widen(IntegerType, LongType) == LongType)
    assert(widen(LongType, IntegerType) == LongType)
    assert(widen(IntegerType, DoubleType) == DoubleType)
    assert(widen(FloatType, DoubleType) == DoubleType)
    assert(widen(IntegerType, StringType) == StringType)
    assert(widen(BooleanType, IntegerType) == StringType)
    assert(widen(DecimalType(10, 2), DecimalType(5, 4)) == DecimalType(12, 4))
    assert(widen(DateType, TimestampType) == TimestampType)
  }

  test("widen merges nested types recursively") {
    assert(widen(ArrayType(IntegerType), ArrayType(LongType))
      == ArrayType(LongType))
    val s1 = StructType(Seq(StructField("x", IntegerType)))
    val s2 = StructType(Seq(StructField("x", DoubleType),
      StructField("y", StringType)))
    val m = widen(s1, s2).asInstanceOf[StructType]
    assert(m.fields.map(f => f.name -> f.dataType).toMap
      == Map("x" -> DoubleType, "y" -> StringType))
  }

  test("merge keeps first-appearance order and adds new fields") {
    val cur = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    val in = StructType(Seq(StructField("c", DoubleType),
      StructField("a", LongType)))
    val m = merge(cur, in)
    assert(m.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(m("a").dataType == LongType)
    assert(m.fields.forall(_.nullable))
  }
}
