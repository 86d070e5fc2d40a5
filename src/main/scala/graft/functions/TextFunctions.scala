package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, shingling,
  * MinHash and SimHash signatures.
  *
  * Everything here is built from codegen'd Spark SQL functions (no UDFs),
  * so expressions stay inside whole-stage codegen and scale linearly with
  * input partitions — no shuffle is introduced by any scalar function.
  *
  * ANSI-mode safe: no raw 64-bit multiply/add chains that could overflow
  * (Spark 4 runs with spark.sql.ansi.enabled=true); per-hash-function
  * diversity comes from salting the hashed bytes, not affine transforms.
  */
object TextFunctions {
  private val WS = "\\s+"

  /** Whitespace tokenization of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), WS)

  def tokenCount(c: Column): Column = size(tokens(c)).cast("bigint")

  /** |distinct tokens| / |tokens| — low values indicate boilerplate /
    * repetitive documents (a standard pretraining quality filter). */
  def distinctTokenRatio(c: Column): Column = {
    val t = tokens(c)
    size(array_distinct(t)).cast("double") / size(t).cast("double")
  }

  /** Mean token length in characters (whitespace removed / token count). */
  def meanTokenLength(c: Column): Column =
    length(regexp_replace(c, WS, "")).cast("double") /
      size(tokens(c)).cast("double")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val t = tokens(c)
    size(filter(t, x => x.isInCollection(stopwords))).cast("double") /
      size(t).cast("double")
  }

  /** Number of tokens of `c` contained in `words`. */
  def hitCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), x => x.isInCollection(words))).cast("bigint")

  /** Stopword tables for the n-gram-free language-ID heuristic. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"))

  /** Heuristic language ID: argmax of per-language stopword hit counts,
    * ties broken by the order of [[LangStopwords]]; "unk" when no hits. */
  def langId(c: Column): Column = {
    val hits = LangStopwords.map { case (lang, words) =>
      lang -> hitCount(c, words)
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("unk")) { case ((lang, h), els) =>
      when(h > 0 && h === best, lang).otherwise(els)
    }
  }

  /** 64-bit content fingerprint (xxhash64 of normalized text). */
  def fingerprint64(c: Column): Column = xxhash64(lower(trim(c)))

  /** Hex fingerprint oracle-matchable in any engine with md5. */
  def fingerprintMd5(c: Column): Column =
    substring(md5(lower(trim(c))), 1, 16)

  /** Character n-gram shingles; documents shorter than n yield [text]. */
  def charShingles(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n))))
      .otherwise(array(c))

  /** Word n-gram shingles over whitespace tokens. */
  def wordShingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** k-element MinHash signature over a shingle array column. Hash i is
    * xxhash64(shingle ++ "#i") — salting gives k independent hash families
    * without overflow-prone affine transforms. */
  def minHash(shinglesCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shinglesCol, s => xxhash64(s, lit(i))))
    }: _*)

  /** Estimated Jaccard similarity of two equal-length MinHash signatures:
    * fraction of agreeing components. */
  def minHashSimilarity(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p))
      .cast("double") / size(a).cast("double")

  /** Exact Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    inter / (size(da) + size(db) - size(array_intersect(da, db)))
      .cast("double")
  }

  /** 64-bit SimHash over tokens: bit i of the signature is the sign of
    * sum over tokens of (bit i of xxhash64(token) ? +1 : -1). */
  def simHash(c: Column): Column = {
    val t = tokens(c)
    val bitCols = (0 until 64).map { i =>
      val votes = aggregate(t, lit(0L),
        (acc, tok) =>
          acc + when((shiftright(xxhash64(tok), i) % 2) =!= 0, 1L)
            .otherwise(-1L))
      when(votes > 0, lit(1L)).otherwise(lit(0L))
    }
    // Assemble as bit-string → avoids 2^63 overflow under ANSI mode.
    conv(concat(bitCols.reverse.map(b => b.cast("string")): _*), 2, 16)
      .as("simhash")
  }

  /** Hamming distance between two hex SimHash signatures. */
  def hammingHex(a: Column, b: Column): Column = {
    // compare bit-by-bit via unhex → byte arrays is awkward without UDFs;
    // xor via bigint halves (each 32-bit half fits a long safely).
    def half(c: Column, from: Int): Column =
      conv(substring(lpad(c, 16, "0"), from, 8), 16, 10).cast("bigint")
    def popcount32(x: Column): Column =
      (0 until 32).map(i => (shiftright(x, i) % 2).cast("int"))
        .reduce(_ + _)
    popcount32(half(a, 1).bitwiseXOR(half(b, 1))) +
      popcount32(half(a, 9).bitwiseXOR(half(b, 9)))
  }
}
