package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Presentation-layer casts that fail LOUDLY at their documented scale
  * ceiling.
  *
  * The registry presents money/measure totals as exact BIGINT micro-units
  * (the ds37/ds38/ds39/e9 convention — decimals ACCUMULATE, integers
  * PRESENT; decimal output columns are read-path-fragile, PLANS.md §ds38).
  * That convention has a ceiling: micro-dollar grand totals hold to roughly
  * SF1k, and past it Spark's non-ANSI `CAST(decimal AS BIGINT)` silently
  * wraps or NULLs while DuckDB's same cast errors — the worst possible
  * divergence (wrong rows here, loud abort there). [[bigintExact]] closes
  * that failure mode: in-range values present exactly as before, while an
  * out-of-range value raises at runtime with the remedy in the message,
  * matching the oracle's loud-failure behavior. The guard is a scalar CASE
  * over final presentation rows (dozens, not corpus-shaped), so it costs
  * nothing at any scale.
  */
object Present {
  private val Lo = java.lang.Long.MIN_VALUE
  private val Hi = java.lang.Long.MAX_VALUE

  /** Present an exact DECIMAL accumulation as BIGINT, raising (instead of
    * wrapping/NULLing) when the value falls outside BIGINT range. NULL
    * passes through as NULL, as a plain cast would. */
  def bigintExact(c: Column, site: String): Column =
    when(c.isNotNull &&
        (c > lit(Hi.toString).cast("decimal(38,0)") ||
          c < lit(Lo.toString).cast("decimal(38,0)")),
      raise_error(concat(
        lit(s"graft: $site exceeds the BIGINT micro-unit presentation " +
          "range (the documented ~SF1k ceiling, PLANS.md §ds38) — widen " +
          "this deployment's presentation (DOUBLE or coarser units); " +
          "value: "),
        c.cast("string"))))
      .otherwise(c)
      .cast("bigint")
}
