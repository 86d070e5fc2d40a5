package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.types._
import graft.operators.Skew
import graft.sources.DynamicSchema

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted stats equal plain groupBy on a skewed distribution") {
    // 90% of rows share one key — the pathological case salting targets
    val rows = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
    }
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedStats(df, Seq("k"), "v", buckets = 8)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"),
        min("v").as("mn"), max("v").as("mx"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("mixByWeights: rates derive from token mass and clamp at 1.0") {
    import graft.operators.Mixing
    val rows = (1 to 400).map { i =>
      val lang = if (i % 4 == 0) "de" else "en" // en has 3x de's mass
      (i.toLong, lang, "tok " * 10)
    }
    val df = rows.toDF("id", "lang", "body")
    val tok = lit(10L)
    // budget >= total mass of both strata at their weights → keep all
    val all = Mixing.mixByWeights(df, "lang", tok,
      Map("en" -> 0.5, "de" -> 0.5), tokenBudget = 100000,
      keyCols = Seq("id"))
    assert(all.count() == 400)
    // tight budget: each stratum keeps ≈ weight·budget tokens
    val mixed = Mixing.mixByWeights(df, "lang", tok,
      Map("en" -> 0.7, "de" -> 0.3), tokenBudget = 1000,
      keyCols = Seq("id"))
    val byLang = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected ≈ 70 and 30 rows (10 tokens each); deterministic hash →
    // binomial noise only, generous bounds
    assert(byLang("en") > 40 && byLang("en") < 100, byLang.toString)
    assert(byLang("de") > 10 && byLang("de") < 50, byLang.toString)
    // unmapped stratum is dropped
    val dropped = Mixing.mixByWeights(df, "lang", tok,
      Map("en" -> 1.0), tokenBudget = 100000, keyCols = Seq("id"))
    assert(dropped.filter(col("lang") === "de").count() == 0)
  }

  test("temperatureShares: α=2 shares are exact floor ppm and sum ≤ 10⁶") {
    import graft.operators.Mixing
    // token masses 10 / 20 / 30 → squares 100/400/900, total 1400
    val df = Seq(("a", 10L), ("b", 20L), ("c", 30L))
      .toDF("src", "n")
    val out = Mixing.temperatureShares(df, "src", col("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((10L, 100L * 1000000L / 1400L)))   // 71428
    assert(out("b") == ((20L, 400L * 1000000L / 1400L)))   // 285714
    assert(out("c") == ((30L, 900L * 1000000L / 1400L)))   // 642857
    assert(out.values.map(_._2).sum <= 1000000L)           // floors
  }

  test("importanceWeights: target-like docs score above off-target docs") {
    import graft.operators.Mixing
    // target docs share a vocabulary; doc 100 mimics it, doc 101 doesn't
    val target = (1 to 20).map(i =>
      (i.toLong, true, "alpha beta gamma delta alpha beta"))
    val noise = (21 to 40).map(i =>
      (i.toLong, false, s"rock$i paper$i scissors$i lizard$i spock$i x$i"))
    val probes = Seq(
      (100L, false, "alpha beta gamma delta"),
      (101L, false, "quux corge grault garply"))
    val df = (target ++ noise ++ probes).toDF("id", "is_t", "body")
    val w = Mixing.importanceWeights(df, "body", "id", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(100L) > 0, s"target-like probe should be positive: ${w(100L)}")
    assert(w(100L) > w(101L))
    // weight scales with evidence: the full target docs outrank the probe
    assert(w(1L) > w(100L))
  }

  test("chunking: windows cover every token with the configured overlap") {
    import graft.operators.Mixing
    import spark.implicits._
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc")).toDF("id", "body")
    val out = Mixing.chunkByTokens(df, "body", "id", maxTokens = 32,
        overlap = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: starts 0, 24, 48, 72, 96 → 5 chunks; doc 2: one short chunk
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2, 3, 4))
    assert(d1.map(_._4).toSeq == Seq(32, 32, 32, 28, 4))
    // consecutive chunks share exactly `overlap` tokens (full windows)
    assert(d1(0)._3.split(" ").takeRight(8).toSeq ==
      d1(1)._3.split(" ").take(8).toSeq)
    // every token appears in at least one chunk
    assert(d1.flatMap(_._3.split(" ")).distinct.length == 100)
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._4)).toSeq == Seq((0, 2)))
  }

  test("token packing: packs respect the budget modulo one overflow doc") {
    import graft.operators.Mixing
    val docs = Tables.load(spark, sf, "documents")
    val packs = Mixing.packByTokenBudget(docs, "source", "doc_id", 512)
      .groupBy(col("source"), col("pack_id"))
      .agg(sum(col("n_tok")).as("tok"), max(col("n_tok")).as("biggest"))
      .collect()
    assert(packs.nonEmpty)
    // a pack only exceeds the budget by (at most) its final document
    packs.foreach { r =>
      assert(r.getLong(2) <= 512 + r.getLong(3),
        s"pack ${r.getString(0)}/${r.getLong(1)} too large: $r")
    }
  }

  test("stratified sample hits requested fractions and is deterministic") {
    import graft.operators.Mixing
    val docs = Tables.load(spark, sf, "documents")
    val sampled = Mixing.stratifiedSample(docs, "lang",
      Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.0, "es" -> 1.0, "zh" -> 1.0))
    val counts = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("fr"))
    assert(counts("de") == full("de"))
    val ratio = counts("en").toDouble / full("en")
    assert(ratio > 0.3 && ratio < 0.7, s"en ratio $ratio")
    // deterministic: same seed → identical sample
    assert(Mixing.stratifiedSample(docs, "lang", Map("en" -> 0.5))
      .count() == Mixing.stratifiedSample(docs, "lang", Map("en" -> 0.5))
      .count())
  }

  test("approx_count_distinct stays within 5% of exact") {
    val e = Tables.load(spark, sf, "events")
    val both = e.agg(
      approx_count_distinct(col("user_id")).as("a"),
      countDistinct(col("user_id")).as("x")).head()
    val (a, x) = (both.getLong(0).toDouble, both.getLong(1).toDouble)
    assert(math.abs(a - x) / x < 0.05, s"approx=$a exact=$x")
    // the k4 registry query's exact-distinct companion bound: the HLL
    // estimate must hold per group too, not just globally
    val perType = e.groupBy(col("event_type")).agg(
      approx_count_distinct(col("user_id")).as("a"),
      countDistinct(col("user_id")).as("x")).collect()
    perType.foreach { r =>
      val (ga, gx) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(ga - gx) / gx < 0.05,
        s"event_type ${r.getString(0)}: approx=$ga exact=$gx")
    }
  }

  test("salted join equals plain join") {
    val big = (1 to 1000).map(i => (i % 5, i)).toDF("key", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e"))
      .toDF("key", "name")
    val plain = big.join(small, "key").agg(count(lit(1)), sum("v")).collect()
    val salted = Skew.saltedJoin(big, small, "key")
      .agg(count(lit(1)), sum("v")).collect()
    assert(salted.toSeq == plain.toSeq)
  }
}

/** Property tests for the schema-widening lattice (SURVEY §5: "ScalaCheck
  * property tests for type coercion/dynamic-schema merge"). */
class DynamicSchemaProps extends SparkSpec {
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val leafGen: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, DateType, TimestampType,
    DecimalType(10, 2), DecimalType(20, 4))

  test("widen is commutative on unordered-width pairs, idempotent, total") {
    check(Prop.forAll(leafGen, leafGen) { (a, b) =>
      val ab = DynamicSchema.widen(a, b)
      val ba = DynamicSchema.widen(b, a)
      // both operands must be representable in the widened type family:
      // widening to either operand or a supertype; commutativity may pick
      // the left of equals, so compare up to defaultSize equivalence
      DynamicSchema.widen(a, a) == a &&
        DynamicSchema.widen(ab, ab) == ab &&
        ab.defaultSize >= math.min(a.defaultSize, b.defaultSize) &&
        ab.getClass == ba.getClass
    })
  }

  test("merge never loses fields and is idempotent") {
    val fieldGen = for {
      n <- Gen.choose(1, 6)
      names <- Gen.listOfN(n, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5)))
      types <- Gen.listOfN(n, leafGen)
    } yield StructType(names.distinct.zip(types).map {
      case (nm, t) => StructField(nm, t)
    })
    check(Prop.forAll(fieldGen, fieldGen) { (a, b) =>
      val m = DynamicSchema.merge(a, b)
      val names = m.fieldNames.toSet
      a.fieldNames.forall(names.contains) &&
        b.fieldNames.forall(names.contains) &&
        DynamicSchema.merge(m, m).fieldNames.toSeq == m.fieldNames.toSeq
    })
  }
}
