package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row token-set builders (optimization round r06). The near-dup and
  * text-analysis operators previously BUILT their in-row token sets with
  * chains of higher-order functions (`transform(sequence(...))` + `substr` +
  * `xxhash64` + `array_distinct` + `array_sort`, or 8 × `filter(words, ...)`
  * marker scans). Spark's HOFs are CodegenFallback: every element pays an
  * interpreted lambda frame plus expression-tree evaluation — measured
  * ~4 ms/doc for 5-char shingling of 300-char docs (JobProbe,
  * q_dedup_minhash_pairs: 2.0 s of a 2.7 s query in that ONE project).
  * These kernels fuse each set build into one loop per row (guide §4.1:
  * prefer codegen-friendly expressions over interpreted per-element paths).
  *
  * Hash/byte parity with the HOF formulations they replace is asserted in
  * TokenSetParitySpec: same xxhash64 values (seed 42), same sorted-distinct
  * ordering, same clamped-window edge cases.
  */

/** `shingle_set(text, n)` — sorted distinct xxhash64 hashes of every n-CHAR
  * window of the text, bit-identical to
  * `array_sort(array_distinct(transform(sequence(1, greatest(len-(n-1), 1)),
  *   i => xxhash64(substr(text, i, n)))))`
  * including the short-text clamp: a text shorter than n chars (even empty)
  * yields exactly ONE hash — of the whole remaining text. */
final class ShingleSetKernel(n: Int) extends Serializable {
  def shingles(s: UTF8String): ArrayData = {
    val numChars = s.numChars()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val numBytes = s.numBytes()
    // byte offset of each char start (+ terminal), ASCII fast path
    val hs =
      if (numBytes == numChars) {
        val nW = math.max(numChars - n + 1, 1)
        val out = new Array[Long](nW)
        var i = 0
        while (i < nW) {
          val end = math.min(i + n, numChars)
          out(i) = XXH64.hashUnsafeBytes(base, off + i, end - i, 42L)
          i += 1
        }
        out
      } else {
        val offs = new Array[Int](numChars + 1)
        var b = 0; var c = 0
        while (b < numBytes) {
          offs(c) = b
          b += UTF8String.numBytesForFirstByte(s.getByte(b))
          c += 1
        }
        offs(numChars) = numBytes
        val nW = math.max(numChars - n + 1, 1)
        val out = new Array[Long](nW)
        var i = 0
        while (i < nW) {
          val end = math.min(i + n, numChars)
          out(i) = XXH64.hashUnsafeBytes(base, off + offs(i), offs(end) - offs(i), 42L)
          i += 1
        }
        out
      }
    new GenericArrayData(sortedDistinct(hs))
  }

  private def sortedDistinct(a: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(a)
    var w = 0; var i = 0
    while (i < a.length) {
      if (w == 0 || a(w - 1) != a(i)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == a.length) a else java.util.Arrays.copyOf(a, w)
  }
}

case class CharShingleSet(str: Expression, n: Expression) extends BinaryExpression {
  override def left: Expression = str
  override def right: Expression = n
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_set expects a string, got ${str.dataType.catalogString}")
    else {
      val nv = if (n.dataType == IntegerType && n.foldable) n.eval() else null
      if (nv != null && nv.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("shingle_set expects a foldable non-null int n >= 1")
    }

  @transient private lazy val kernel: ShingleSetKernel =
    new ShingleSetKernel(n.eval().asInstanceOf[Int])

  override def nullSafeEval(s: Any, nv: Any): Any =
    kernel.shingles(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kr = ctx.addReferenceObj("shingleSetKernel", kernel, classOf[ShingleSetKernel].getName)
    nullSafeCodeGen(ctx, ev, (s, _) => s"${ev.value} = $kr.shingles($s);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(str = newLeft, n = newRight)

  override def prettyName: String = "shingle_set"
}

/** `ngram_hash_set(words, n)` — sorted distinct xxhash64 hashes of every
  * space-joined n-gram of a word array, bit-identical to
  * `array_sort(array_distinct(transform(
  *   transform(sequence(0, size(w)-n), i => concat_ws(" ", slice(w, i+1, n))),
  *   g => xxhash64(g))))`
  * for arrays with `size(w) >= n` (callers gate on that, as the HOF
  * formulation did); smaller arrays yield an empty set. Null elements are
  * skipped inside their gram — `concat_ws` semantics (no separator either). */
final class NgramHashSetKernel(n: Int) extends Serializable {
  def grams(arr: ArrayData): ArrayData = {
    val sz = arr.numElements()
    val nG = sz - n + 1
    if (nG <= 0) return new GenericArrayData(Array.emptyLongArray)
    // materialize element bytes once
    val words = new Array[Array[Byte]](sz)
    var i = 0
    while (i < sz) {
      words(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val hs = new Array[Long](nG)
    var g = 0
    var buf = new Array[Byte](64)
    while (g < nG) {
      var len = 0
      var first = true
      var j = g
      while (j < g + n) {
        val w = words(j)
        if (w != null) {
          val need = len + w.length + (if (first) 0 else 1)
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!first) { buf(len) = ' '; len += 1 }
          System.arraycopy(w, 0, buf, len, w.length)
          len += w.length
          first = false
        }
        j += 1
      }
      hs(g) = XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      g += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < hs.length) {
      if (w == 0 || hs(w - 1) != hs(i)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }
}

case class NgramHashSet(words: Expression, n: Expression) extends BinaryExpression {
  override def left: Expression = words
  override def right: Expression = n
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = words.dataType match {
    case ArrayType(StringType, _) =>
      val nv = if (n.dataType == IntegerType && n.foldable) n.eval() else null
      if (nv != null && nv.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("ngram_hash_set expects a foldable non-null int n >= 1")
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash_set expects array<string>, got ${t.catalogString}")
  }

  @transient private lazy val kernel: NgramHashSetKernel =
    new NgramHashSetKernel(n.eval().asInstanceOf[Int])

  override def nullSafeEval(a: Any, nv: Any): Any =
    kernel.grams(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kr = ctx.addReferenceObj("ngramHashSetKernel", kernel, classOf[NgramHashSetKernel].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $kr.grams($a);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(words = newLeft, n = newRight)

  override def prettyName: String = "ngram_hash_set"
}

/** Single source of truth for the language-marker table — referenced by
  * [[graft.ops.TextAnalysis.langMarkers]] (from which the DuckDB oracle SQL
  * is generated) AND by the [[LangIdWords]] kernel, so the two cannot
  * drift. */
object LangMarkers {
  val table: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "und", "die", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Seq("le", "et", "la", "les", "est", "des", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "y", "los", "las", "es", "un", "una", "por", "con", "para"),
    "it" -> Seq("il", "e", "di", "che", "per", "della", "sono", "anche", "come", "alla"),
    "pt" -> Seq("o", "os", "as", "um", "uma", "para", "com", "mais", "mas", "seu"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "niet", "met", "voor", "zijn"),
    "sv" -> Seq("och", "att", "det", "som", "en", "är", "av", "för", "den", "till"))
}

/** One-pass replacement for the 8 × `filter(words, w => marker ORs)` marker
  * scans + greatest + CASE chain of the stopword language heuristic: count
  * marker hits per language over the word array (empty/null words ignored —
  * they were filtered out before the HOF scans), then pick the FIRST
  * language in table order with a strictly positive maximal count, else
  * "und". A marker shared by several languages counts for each (the word is
  * looked up against every language's set), exactly as each language's
  * independent `filter` counted it. */
final class LangIdKernel extends Serializable {
  private val langs: Array[UTF8String] =
    LangMarkers.table.map(l => UTF8String.fromString(l._1)).toArray
  private val nLangs = langs.length
  // marker -> bitmask of languages containing it
  @transient private lazy val markerLangs: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    LangMarkers.table.zipWithIndex.foreach { case ((_, markers), i) =>
      markers.foreach { mk =>
        val k = UTF8String.fromString(mk)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }
  private val und = UTF8String.fromString("und")

  def langId(words: ArrayData): UTF8String = {
    val counts = new Array[Int](nLangs)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        if (w.numBytes() > 0) {
          val mask = markerLangs.get(w)
          if (mask != null) {
            var m = mask.intValue()
            while (m != 0) {
              val b = java.lang.Integer.numberOfTrailingZeros(m)
              counts(b) += 1
              m &= m - 1
            }
          }
        }
      }
      i += 1
    }
    var best = 0
    i = 0
    while (i < nLangs) { if (counts(i) > best) best = counts(i); i += 1 }
    if (best == 0) return und
    i = 0
    while (i < nLangs && counts(i) != best) i += 1
    langs(i)
  }
}

/** `lang_id_words(words)` — language code from marker-word counts over an
  * `array<string>` of lower-cased words (empties ignored), identical to the
  * HOF formulation retained in TextAnalysis.langIdHof (parity-asserted). */
case class LangIdWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_id_words expects array<string>, got ${t.catalogString}")
  }

  @transient private lazy val kernel: LangIdKernel = new LangIdKernel

  override def nullSafeEval(a: Any): Any = kernel.langId(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kr = ctx.addReferenceObj("langIdKernel", kernel, classOf[LangIdKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kr.langId($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lang_id_words"
}

/** `count_nonempty(arr)` — `size(filter(arr, x => length(x) > 0))` for an
  * `array<string>` in one fused loop (null elements excluded, exactly as
  * `length(null) > 0` is not true). */
case class CountNonEmpty(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_nonempty expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0; var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getUTF8String(i).numBytes() > 0) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("cneN")
    val c = ctx.freshName("cneC")
    val i = ctx.freshName("cneI")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $a.getUTF8String($i).numBytes() > 0) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "count_nonempty"
}
