package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row winnowing kernel over a TRUE polynomial rolling hash: one
  * multiply-add per byte for the k-gram hashes (O(n), vs the md5 mode's
  * fresh digest per gram — O(n·k) hashing plus a 32-char hex string
  * allocation per gram), then O(n) sliding-window minima via a monotonic
  * deque. This is the corpus-scale configuration of
  * [[graft.ops.Dedup.winnowingFingerprints]]; the md5 mode is retained as
  * the DuckDB-oracle configuration (lexicographic minima over hex strings
  * are reproducible in ANSI SQL, 64-bit modular arithmetic is not).
  *
  * Guarantee parity with the md5 mode (asserted in OpsSpec): any shared
  * substring of ≥ k+window-1 bytes contributes a shared fingerprint,
  * because both modes hash the same k-gram positions and keep each
  * window's minimum — only the hash function differs.
  *
  * Grams are over UTF-8 BYTES (callers normalize the text first); the
  * rolling recurrence is h_{i+1} = (h_i - b_{i}·B^{k-1})·B + b_{i+k} over
  * wrapping 64-bit arithmetic, base 1000003. */
final class WinnowKernel(k: Int, window: Int) extends Serializable {
  private val B = 1000003L
  private val powK1: Long = {
    var p = 1L; var i = 1
    while (i < k) { p *= B; i += 1 }
    p
  }

  def fingerprints(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val nGrams = n - k + 1
    if (nGrams < window) return new GenericArrayData(Array.emptyLongArray)
    // rolling k-gram hashes
    val hs = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hs(0) = h
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * powK1) * B + (bytes(i) & 0xff)
      hs(i - k + 1) = h
      i += 1
    }
    // sliding-window minima (by VALUE — matches the md5 mode's array_min),
    // monotonic deque of indices; minima are deduped in first-seen order
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // deque in [head, tail)
    val seen = new java.util.HashSet[Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - window) head += 1
      if (i >= window - 1) {
        val m = hs(deque(head))
        if (seen.add(m)) out.add(m)
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `winnow_fingerprints(text, k, window)` — distinct sliding-window minima
  * of polynomial rolling k-gram hashes as `array<long>`, the O(n) scale
  * path for winnowing document fingerprinting. `k` and `window` must be
  * foldable ints ≥ 1: both fold once into a [[WinnowKernel]] carried into
  * generated code as a reference object. */
case class WinnowFingerprints(str: Expression, k: Expression, window: Expression)
    extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = k
  override def third: Expression = window

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects a string, got ${str.dataType.catalogString}")
    else if (k.dataType != IntegerType || !k.foldable ||
             window.dataType != IntegerType || !window.foldable)
      TypeCheckResult.TypeCheckFailure(
        "winnow_fingerprints expects foldable int k and window")
    else {
      val (kv, wv) = (k.eval().asInstanceOf[Int], window.eval().asInstanceOf[Int])
      if (kv < 1 || wv < 1)
        TypeCheckResult.TypeCheckFailure("winnow_fingerprints needs k >= 1 and window >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val kernel: WinnowKernel =
    new WinnowKernel(k.eval().asInstanceOf[Int], window.eval().asInstanceOf[Int])

  override def nullSafeEval(s: Any, kv: Any, wv: Any): Any =
    kernel.fingerprints(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kr = ctx.addReferenceObj("winnowKernel", kernel, classOf[WinnowKernel].getName)
    nullSafeCodeGen(ctx, ev, (s, _, _) => s"${ev.value} = $kr.fingerprints($s);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(str = newFirst, k = newSecond, window = newThird)

  override def prettyName: String = "winnow_fingerprints"
}
