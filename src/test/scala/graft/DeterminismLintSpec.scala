package graft

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Round, BRound}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._

/** Determinism lint (VERDICT r8 #7): `round(<transcendental>) → DECIMAL`
  * declared hash-exact is a cross-engine landmine — libm `ln`/`exp`/`pow`
  * are not correctly rounded, so two engines can disagree by 1 ULP, which
  * flips the 6-dp rounding exactly at a 0.5·10⁻⁶ boundary (this killed
  * d18/g3/ir2 in CORRECTNESS_r08 while passing the local DuckDB). The
  * sanctioned shape is the literal-injection pattern: compute the bounded
  * transcendental model ONCE on the driver and inject identical DECIMAL
  * literals into the plan AND the oracle — see [[graft.OracleLiterals]],
  * [[graft.operators.Mixing.importanceModel]],
  * [[graft.operators.Retrieval.Bm25Model]].
  *
  * This spec sweeps every oracle-checked registry query's ANALYZED plan
  * (subqueries included) and fails on any Cast-to-Decimal whose subtree
  * rounds a transcendental. sqrt/cbrt are excluded: IEEE 754 requires
  * sqrt correctly rounded (deterministic), and cbrt is unused.
  */
class DeterminismLintSpec extends SparkSpec {

  import org.apache.spark.sql.catalyst.expressions.{
    Log, Logarithm, Log2, Log10, Log1p, Exp, Expm1, Pow,
    Sin, Cos, Tan, Sinh, Cosh, Tanh, Asin, Acos, Atan, Atan2}

  private def isTranscendental(e: Expression): Boolean = e match {
    case _: Log | _: Logarithm | _: Log2 | _: Log10 | _: Log1p |
         _: Exp | _: Expm1 | _: Pow |
         _: Sin | _: Cos | _: Tan | _: Sinh | _: Cosh | _: Tanh |
         _: Asin | _: Acos | _: Atan | _: Atan2 => true
    case _ => false
  }

  private def isRound(e: Expression): Boolean =
    e.isInstanceOf[Round] || e.isInstanceOf[BRound]

  /** All decimal-bound rounded-transcendental chains in one expression. */
  private def chains(root: Expression): Seq[String] =
    root.collect {
      case c: Cast if c.dataType.isInstanceOf[DecimalType] &&
          c.exists(e => isRound(e) && e.exists(isTranscendental)) =>
        s"${c.sql.take(160)}"
    }

  private def lint(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val analyzed = df.queryExecution.analyzed
    analyzed.collectWithSubqueries {
      case node => node.expressions.flatMap(chains)
    }.flatten
  }

  test("no oracle-checked query rounds an in-plan transcendental into DECIMAL") {
    val offenders = scala.collection.mutable.Buffer[String]()
    val oracleKeys = SparkEntry.oracleSql.keySet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => oracleKeys(n) }
      .foreach { case (name, fn) =>
        val found =
          try lint(fn(spark, sf))
          catch { case e: Throwable => Seq(s"(failed to build: $e)") }
        found.foreach(f => offenders +=
          s"$name: $f — use the OracleLiterals literal-injection pattern " +
            "(driver-side model, identical DECIMAL literals in plan+oracle)")
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the lint catches a seeded round(ln)->DECIMAL regression") {
    import spark.implicits._
    val df = Seq((1L, 4.0)).toDF("id", "x")
      .select(col("id"),
        round(log(col("x") / 3.0), 6).cast("decimal(20,6)").as("w"))
    assert(lint(df).nonEmpty)
  }

  test("the lint ignores rational chains and literal-injected decimals") {
    import spark.implicits._
    val df = Seq((1L, 4.0, "0.287682")).toDF("id", "x", "wtxt")
      .select(col("id"),
        round(col("x") / 3.0, 6).cast("decimal(20,6)").as("ok_rational"),
        col("wtxt").cast("decimal(20,6)").as("ok_literal"),
        sqrt(col("x")).cast("decimal(20,6)").as("ok_sqrt"))
    assert(lint(df).isEmpty)
  }
}
