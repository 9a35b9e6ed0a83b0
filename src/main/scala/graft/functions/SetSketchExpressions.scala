package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native set/sketch kernels over per-document token arrays — the
  * shuffle-elimination primitives behind the near-dup family's corpus-scale
  * formulation.
  *
  * The round-3 formulation kept token sets EXPLODED as (id, token) rows:
  * MinHash signatures were a groupBy(id) over the full exploded corpus, and
  * exact-Jaccard verification joined candidates against the exploded frame
  * twice — the second join keyed (b, token) streamed |candidates| ×
  * |tokens-per-doc| rows through the shuffle (~1.2B hashed shingles at the
  * 10× corpus, the measured super-linear point of `q_dedup_minhash_pairs`,
  * BENCH/BASELINE.md). With the token set as ONE sorted in-row array:
  *  - the signature is a per-row kernel call ([[MinHashSig]]) — no explode,
  *    no groupBy, no shuffle at all;
  *  - verification joins candidates against ONE row per doc and counts the
  *    intersection in-row ([[SortedIntersectCount]]) — rows through the
  *    shuffle drop from O(candidates × tokens/doc) to O(docs + candidates),
  *    and the candidate side is small enough for AQE to broadcast.
  *
  * Hash parity: all kernels reproduce Spark's own `xxhash64` fold (seed 42,
  * then per-child XXH64 steps), so signatures, band keys, candidate sets and
  * verified outputs are bit-identical to the exploded SQL formulation —
  * asserted per-family in SetSketchParitySpec.
  */
final class MinHashSigKernel(k: Int, isString: Boolean) extends Serializable {
  /** Per-seed minima of xxhash64(elem, seed i) over the array: exactly
    * `min(xxhash64(token, lit(i)))` per doc — Spark folds that two-child
    * hash as hashInt(i, hash*(token, 42)). One base hash per element, k
    * cheap integer finalizers. Null elements are skipped (a null token
    * contributes nothing to the set, matching the exploded formulation
    * where `min` ignores null hashes); an array with NO non-null elements
    * returns null (the exploded groupBy drops tokenless docs entirely). */
  def sig(arr: ArrayData): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val base =
          if (isString) XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
          else XXH64.hashLong(arr.getLong(i), 42L)
        var j = 0
        while (j < k) {
          val v = XXH64.hashInt(j, base)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }
}

/** `minhash_sig(tokens, k)` — the k-slot MinHash signature of a token array
  * (`array<long>` or `array<string>`) as `array<long>`, bit-identical to
  * `min(xxhash64(token, lit(i)))` over the exploded frame. `k` must be a
  * foldable int ≥ 1. An EMPTY array (or one holding only nulls) yields a
  * NULL signature — matching the exploded formulation, where tokenless
  * docs simply vanish from the groupBy — rather than a k×Long.MaxValue
  * sentinel that would collide every tokenless doc into one LSH bucket. */
case class MinHashSig(arr: Expression, k: Expression) extends BinaryExpression {

  override def left: Expression = arr
  override def right: Expression = k

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: DataType = arr.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case LongType | StringType =>
      // k.eval() may be null (e.g. CAST(NULL AS INT) is foldable IntegerType)
      // — that must be a TypeCheckFailure, not an analysis-time NPE
      val kv = if (k.dataType == IntegerType && k.foldable) k.eval() else null
      if (kv != null && kv.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("minhash_sig expects a foldable non-null int k >= 1")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<long> or array<string>, got ${arr.dataType.catalogString}")
  }

  @transient private lazy val kernel: MinHashSigKernel =
    new MinHashSigKernel(k.eval().asInstanceOf[Int], elemType == StringType)

  override def nullSafeEval(a: Any, kv: Any): Any = kernel.sig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kr = ctx.addReferenceObj("minHashSigKernel", kernel, classOf[MinHashSigKernel].getName)
    // the kernel returns null for effectively-empty input — propagate it as
    // SQL NULL (ev.isNull), not a null-valued "non-null" slot
    nullSafeCodeGen(ctx, ev,
      (a, _) => s"${ev.value} = $kr.sig($a); ${ev.isNull} = (${ev.value} == null);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(arr = newLeft, k = newRight)

  override def prettyName: String = "minhash_sig"
}

final class IntersectCountKernel(isString: Boolean) extends Serializable {
  /** |a ∩ b| for two SORTED duplicate-free arrays by linear merge — no per
    * -call hash set, no allocation. Sort order must be Spark's `array_sort`
    * order for the element type (numeric for longs, binary/UTF8String for
    * strings — both match the comparators used here). Null elements never
    * match anything and `array_sort` places them LAST, so the merge simply
    * stops at the first null on either side — user-supplied arrays with
    * null slots degrade to ignoring them instead of crashing the task. */
  def count(a: ArrayData, b: ArrayData): Long = {
    var na = a.numElements(); var nb = b.numElements()
    while (na > 0 && a.isNullAt(na - 1)) na -= 1
    while (nb > 0 && b.isNullAt(nb - 1)) nb -= 1
    var i = 0; var j = 0; var c = 0L
    if (isString) {
      while (i < na && j < nb) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }
}

/** `sorted_intersect_count(a, b)` — intersection size of two sorted
  * duplicate-free arrays (both `array<long>` or both `array<string>`) as a
  * long. The in-row replacement for the exploded
  * join-on-(id,token) + groupBy(a,b) count: one linear merge per candidate
  * pair instead of |a|+|b| shuffled rows. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (LongType, LongType) | (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count expects two array<long> or two array<string> arguments, " +
          s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  @transient private lazy val kernel: IntersectCountKernel =
    new IntersectCountKernel(elemType(left) == StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kr = ctx.addReferenceObj("intersectCountKernel", kernel, classOf[IntersectCountKernel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kr.count($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

final class SimHashKernel extends Serializable {
  /** 64-bit SimHash of a token MULTISET (duplicates weight the bit votes):
    * per-bit sign-sum of xxhash64(token) — bit b of the result is set iff
    * strictly more tokens have bit b set than clear, exactly the
    * `sum(when(h & (1<<b) != 0, 1, -1)) > 0` fold of the exploded SQL
    * formulation. Null elements are skipped — a null token casts no bit
    * votes, exactly as the exploded explode+groupBy drops null rows. */
  def simhash(arr: ArrayData): Long = {
    val cnt = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }
}

/** `simhash64(tokens)` — 64-bit SimHash of an `array<string>` token multiset,
  * bit-identical to the exploded 64-way conditional-sum aggregation (which
  * shuffled every token of the corpus); empty arrays hash to 0, so callers
  * that must match the exploded formulation (where tokenless docs simply
  * vanish from the groupBy) filter `size(w) > 0` first. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.catalogString}")
  }

  @transient private lazy val kernel: SimHashKernel = new SimHashKernel

  override def nullSafeEval(a: Any): Any = kernel.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kr = ctx.addReferenceObj("simHashKernel", kernel, classOf[SimHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kr.simhash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
