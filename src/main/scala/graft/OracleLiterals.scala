package graft

/** Driver-computed literal fragments shared between a Spark plan and its
  * DuckDB oracle.
  *
  * Why this exists: a handful of operators (DSIR weights, BM25 idf,
  * hashed-LM log-probs) need `round(ln(<exact ratio>), 6)`. `ln` is not
  * correctly rounded by libm, so two engines can disagree by 1 ULP —
  * harmless until the value sits within that ULP of a 0.5·10⁻⁶ rounding
  * boundary, where the 6-dp decimals differ and a hash-exact check fails
  * (CORRECTNESS_r08: d18/g3/ir2). The model behind each of these is
  * BOUNDED metadata (64 buckets, O(#query-terms) dfs), so the fix is to
  * compute the transcendental ONCE on the driver and inject the SAME
  * decimal literal text into BOTH the Spark plan and the oracle SQL —
  * cross-engine identity by construction, no `ln` runs inside either
  * engine. (The hyperplane-literal LSH oracle, VectorQueries.litList,
  * is the data-independent ancestor of this pattern.)
  *
  * Mechanics: `SparkEntry.oracleSql` is rendered by Verify AFTER every
  * query has executed, so a query function stashes its fragment here at
  * build time and the oracle template reads it back. Each template must
  * supply a fallback (the self-contained in-SQL spelling) so the map is
  * complete even if oracles are rendered without running queries (e.g.
  * static registry checks); the fallback carries the old boundary risk
  * but never produces wrong SQL.
  */
object OracleLiterals {
  private val stash = scala.collection.concurrent.TrieMap.empty[String, String]

  def put(key: String, sqlFragment: String): Unit = stash.put(key, sqlFragment)

  def get(key: String, fallback: => String): String =
    stash.getOrElse(key, fallback)

  /** round-half-up to 6 dp — the exact decimal literal text both engines
    * will consume. */
  def round6(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)

  /** round6 of ln(num/den). One libm call, driver-side only. */
  def ln6(num: Double, den: Double): java.math.BigDecimal =
    round6(math.log(num / den))

  /** `name(c1, c2) AS (SELECT c1, CAST(c2txt AS DOUBLE) ...)` VALUES CTE
    * body for a (key → decimal) model: keys are BIGINT, values arrive as
    * exact decimal text cast once to the requested SQL type. */
  def valuesCte(name: String, c1: String, c2: String, castTo: String,
                rows: Seq[(Long, java.math.BigDecimal)]): String = {
    val vs = rows.map { case (k, v) => s"($k, '${v.toPlainString}')" }
      .mkString(", ")
    s"""$name($c1, $c2) AS (
       SELECT v1, CAST(v2 AS $castTo) FROM (VALUES $vs) AS t(v1, v2))"""
  }

  /** Triple-long-keyed → decimal model (e.g. a PQ ADC lookup table keyed
    * by (q_id, m, code)). */
  def valuesCte3(name: String, c1: String, c2: String, c3: String,
                 c4: String, castTo: String,
                 rows: Seq[(Long, Long, Long, java.math.BigDecimal)])
      : String = {
    val vs = rows.map { case (a, b, c, v) =>
      s"($a, $b, $c, '${v.toPlainString}')" }.mkString(", ")
    s"""$name($c1, $c2, $c3, $c4) AS (
       SELECT CAST(v1 AS BIGINT), CAST(v2 AS BIGINT), CAST(v3 AS BIGINT),
         CAST(v4 AS $castTo)
       FROM (VALUES $vs) AS t(v1, v2, v3, v4))"""
  }

  /** Same for string-keyed models (e.g. per-term idf). */
  def valuesCteStr(name: String, c1: String, c2: String, castTo: String,
                   rows: Seq[(String, java.math.BigDecimal)]): String = {
    val vs = rows.map { case (k, v) =>
      s"('${k.replace("'", "''")}', '${v.toPlainString}')" }.mkString(", ")
    s"""$name($c1, $c2) AS (
       SELECT v1, CAST(v2 AS $castTo) FROM (VALUES $vs) AS t(v1, v2))"""
  }
}
