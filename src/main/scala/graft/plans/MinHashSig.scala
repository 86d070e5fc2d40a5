package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native k-family MinHash signature over a shingle array.
  *
  * Semantics identical to the declarative spelling
  * `transform(sequence(0,k-1), i -> array_min(transform(sh, s -> xxhash64(s, i))))`
  * — Spark's xxhash64(s, i) folds as hashLong(i, hashBytes(s, 42)) — but
  * evaluated as one pass: each shingle's byte hash is computed ONCE and
  * mixed k times with a cheap hashLong, instead of k full string hashes
  * through interpreted lambda frames. O(|sh|·(bytes + k)) vs
  * O(|sh|·k·bytes) with object churn; the signature stage dominates
  * MinHash-LSH dedup cost at corpus scale.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_minhash"
  override def nullIntolerant: Boolean = true
  // NULL for empty / all-null shingle arrays (see nullSafeEval)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, k>0), got " +
        s"${child.dataType.catalogString} with k=$k")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val s = arr.getUTF8String(j)
        val h1 = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < k) {
          val h = XXH64.hashInt(i, h1)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    // no (non-null) shingles → NULL signature, so empty docs can never
    // "agree" with each other the way a Long.MaxValue sentinel would
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h = ctx.freshName("h")
      val seen = ctx.freshName("seen")
      s"""
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        boolean $seen = false;
        for (int $j = 0; $j < $arr.numElements(); $j++) {
          if (!$arr.isNullAt($j)) {
            $seen = true;
            org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($j);
            long $h1 = $xxh.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            for (int $i = 0; $i < $k; $i++) {
              long $h = $xxh.hashInt($i, $h1);
              if ($h < $mins[$i]) $mins[$i] = $h;
            }
          }
        }
        if (!$seen) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
