package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector-similarity expressions with whole-stage codegen.
  *
  * The declarative spelling — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * is correct but interpreted: higher-order functions allocate a lambda
  * frame per element and box every float (SURVEY §4 "custom Catalyst work
  * actually needed"). ANN candidate scoring evaluates millions of pairs,
  * so these are real `Expression`s compiling to a tight primitive loop —
  * the preference-order (b) path from the build brief: a scalar Catalyst
  * expression, not a UDF (boxing) and not a new operator (overkill).
  *
  * Numeric contract: identical IEEE-754 double sequence as the HOF
  * spelling and the DuckDB oracle — elements cast to double, products
  * summed left-to-right — so swapping implementations never changes
  * results, only speed.
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with Serializable {
  override def nullIntolerant: Boolean = true
  // can yield NULL even for non-null inputs (length mismatch / null
  // element) — without this override nullSafeCodeGen would never declare
  // the isNull variable for non-nullable children and the generated
  // `isNull = true` wouldn't compile
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _))
      if Seq(l, r).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  protected def getter(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  protected def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Null semantics MUST match the declarative fold the optimizer rule
    * replaces: zip_with pads length mismatches with NULL and a NULL
    * element nullifies the product and the running sum — so mismatched
    * lengths or any NULL element yield NULL, never a partial sum. */
  protected def elementsMayBeNull: Boolean =
    Seq(left, right).exists(_.dataType.asInstanceOf[ArrayType].containsNull)

  protected def anyNullElement(a: ArrayData, b: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Codegen guard: length check always; per-element null scan only when
    * the schema admits null elements (keeps the hot loop branch-free). */
  protected def nullGuards(a: String, b: String, n: String,
                           isNull: String): String = {
    val elemScan = if (elementsMayBeNull) {
      s"""
        for (int _g = 0; _g < $n && !$isNull; _g++) {
          if ($a.isNullAt(_g) || $b.isNullAt(_g)) $isNull = true;
        }"""
    } else ""
    s"""
      if ($a.numElements() != $b.numElements()) $isNull = true;
      $elemScan
    """
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ, left-to-right. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    if (elementsMayBeNull && anyNullElement(a, b, n)) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, ta, i) * get(b, tb, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left), elemType(right))
      // every block-level local must be freshName'd: with non-nullable
      // children nullSafeCodeGen splices this code unscoped into the
      // shared method body, so two graft_dot calls in one projection
      // would otherwise declare duplicate locals → Janino failure →
      // silent interpreted fallback
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements();
        ${nullGuards(a, b, n, ev.isNull)}
        if (!${ev.isNull}) {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ${getter(ta, a, i)} * ${getter(tb, b, i)};
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot/(√Σaᵢ²·√Σbᵢ²) with the same fold order as the HOF
  * spelling: three independent left-to-right sums. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    if (elementsMayBeNull && anyNullElement(a, b, n)) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left), elemType(right))
      // freshName for all block-level locals — see DotProduct.doGenCode
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        int $n = $a.numElements();
        ${nullGuards(a, b, n, ev.isNull)}
        if (!${ev.isNull}) {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double x = ${getter(ta, a, i)};
            double y = ${getter(tb, b, i)};
            $dot += x * y; $na += x * x; $nb += y * y;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
