package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression for cosine similarity over numeric array
  * columns — the one hot-loop primitive the built-in surface cannot express
  * efficiently: the `zip_with` + `aggregate` higher-order-function chain
  * allocates a lambda frame per element and stays interpreted, while this
  * expression compiles (doGenCode) to a single fused primitive loop with no
  * allocation. Used by the ANN/similarity operators where the per-row cost
  * is O(dim) on billions of rows.
  *
  * Accumulation order matches the HOF formulation (sequential left-to-right
  * double sums), so results are bit-identical to the previous
  * `aggregate(zip_with(...))` implementation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float> or array<double> arguments, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (tx, ty) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = get(x, tx, i); val yi = get(y, ty, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, e: Expression) = elemType(e) match {
      case FloatType => s"(double) $arr.getFloat(i)"
      case _ => s"$arr.getDouble(i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, nx = 0.0, ny = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double xi = ${getter(a, left)};
         |  double yi = ${getter(b, right)};
         |  dot += xi * yi; nx += xi * xi; ny += yi * yi;
         |}
         |${ev.value} = dot / (java.lang.Math.sqrt(nx) * java.lang.Math.sqrt(ny));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Per-row IVF kernel: the centroid matrix lives here as plain JVM arrays —
  * computed ONCE per expression (from a single foldable literal) and carried
  * into generated code as a codegen reference object. This is what keeps the
  * plan O(1) in nCentroids: 10⁴ cells × 768 dims is one reference object of
  * ~60 MB shipped with the task binary, not 10⁷ Catalyst literal nodes. Cost
  * per row is one fused O(k·dim) loop. */
/* Shipping cost of the matrix: the kernel rides the serialized task
 * closure, which Spark itself broadcasts ONCE per stage (DAGScheduler's
 * taskBinary is a Broadcast) — each executor fetches the 10⁴×768 ≈ 60 MB
 * matrix once per stage, not once per task. Scope of that claim: for a
 * SINGLE stage a user-level Broadcast variable moves the same bytes; for
 * MULTI-stage plans the taskBinary is re-built and re-fetched per stage
 * while a Broadcast variable is fetched once per executor for the job
 * lifetime, and a ≥60 MB closure also pays per-stage driver serialization
 * and trips Spark's large-task-binary warning — so probe-heavy multi-stage
 * pipelines at the 10⁴-cell end should prefer an explicit broadcast.
 * Measured at k=10⁴ (tools/TaskBinaryProbe, ledger in BENCH/BASELINE.md):
 * the matrix actually ships TWICE per task binary (foldable Literal child
 * + kernel reference object, ≈123 MB at 10⁴×768) and every TASK re-pays
 * the deserialization (~5.4 s) — so the literal form is for SMALL-to-MID k
 * only; [[NearestCellsBcast]] is the large-k form (one explicit Broadcast
 * of the shared [[CentroidMatrix]], fetched once per executor for the job
 * lifetime, expression serializes as a handle). */
final class CentroidMatrix(val mat: Array[Array[Double]]) extends Serializable {
  val norms: Array[Double] = mat.map { r =>
    var s = 0.0; var i = 0
    while (i < r.length) { s += r(i) * r(i); i += 1 }
    math.sqrt(s)
  }
}

final class CentroidKernel(shared: CentroidMatrix, probes: Int, vecIsFloat: Boolean)
    extends Serializable {
  def this(mat: Array[Array[Double]], probes: Int, vecIsFloat: Boolean) =
    this(new CentroidMatrix(mat), probes, vecIsFloat)
  private val mat: Array[Array[Double]] = shared.mat
  private val norms: Array[Double] = shared.norms
  private val p = math.min(math.max(probes, 1), math.max(mat.length, 1))

  /** Indices of the `probes` max-cosine centroids, cosine desc, ties broken
    * by LOWER index (strict-> insertion keeps the earlier cell ahead —
    * deterministic across runs and partitionings). */
  def assign(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var nv = 0.0
    var j = 0
    while (j < n) {
      val x = if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      nv += x * x; j += 1
    }
    val nvs = math.sqrt(nv)
    val bc = Array.fill(p)(Double.NegativeInfinity)
    val bi = Array.fill(p)(-1)
    var i = 0
    while (i < mat.length) {
      val c = mat(i)
      val m = math.min(n, c.length)
      var dot = 0.0
      var t = 0
      while (t < m) {
        val x = if (vecIsFloat) vec.getFloat(t).toDouble else vec.getDouble(t)
        dot += x * c(t); t += 1
      }
      val cos = dot / (nvs * norms(i))
      if (cos > bc(p - 1)) {
        var pos = p - 1
        while (pos > 0 && cos > bc(pos - 1)) {
          bc(pos) = bc(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
        }
        bc(pos) = cos; bi(pos) = i
      }
      i += 1
    }
    var cnt = 0
    while (cnt < p && bi(cnt) >= 0) cnt += 1
    if (cnt == 0 && mat.length > 0) {
      // zero-magnitude / NaN vector: every cosine is NaN and nothing beats
      // -Inf. Assign cell 0 deterministically — callers do
      // element_at(cells, 1), which would throw under ANSI on an empty array.
      new GenericArrayData(Array(0))
    } else {
      val out = new Array[Int](cnt)
      System.arraycopy(bi, 0, out, 0, cnt)
      new GenericArrayData(out)
    }
  }
}

/** `ivf_cells(vec, centroids, nProbe)` — the nProbe nearest centroid indices
  * by cosine (descending; ties → lower index) as `array<int>`. `centroids`
  * must be a FOLDABLE `array<array<double>>` (one literal holding the whole
  * k×dim matrix) and `nProbe` a foldable int: both are evaluated once into a
  * [[CentroidKernel]], so codegen per row is a single kernel call and the
  * expression tree never grows with k. This replaces the earlier
  * `array(struct(lit…))` formulation whose k·dim literal NODES capped IVF at
  * toy cell counts. */
case class NearestCells(vec: Expression, centroids: Expression, probes: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = centroids
  override def third: Expression = probes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def vecElemType: DataType = vec.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vecElemType match { case FloatType | DoubleType => true; case _ => false }
    val centOk = centroids.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"ivf_cells expects an array<float|double> vector, got ${vec.dataType.catalogString}")
    else if (!centOk || !centroids.foldable)
      TypeCheckResult.TypeCheckFailure(
        "ivf_cells expects a foldable array<array<double>> centroid matrix")
    else if (probes.dataType != IntegerType || !probes.foldable)
      TypeCheckResult.TypeCheckFailure("ivf_cells expects a foldable int nProbe")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val kernel: CentroidKernel = {
    val ad = centroids.eval().asInstanceOf[ArrayData]
    val mat = Array.tabulate(ad.numElements()) { i =>
      val row = ad.getArray(i)
      Array.tabulate(row.numElements())(j => row.getDouble(j))
    }
    new CentroidKernel(mat, probes.eval().asInstanceOf[Int], vecElemType == FloatType)
  }

  override def nullSafeEval(v: Any, c: Any, p: Any): Any =
    kernel.assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("centroidKernel", kernel, classOf[CentroidKernel].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"${ev.value} = $k.assign($v);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, centroids = newSecond, probes = newThird)

  override def prettyName: String = "ivf_cells"
}

/** Broadcast-backed variant of [[NearestCells]] for LARGE centroid matrices
  * (TaskBinaryProbe: at 10⁴×768 the literal form ships ≈123 MB per task
  * binary and every task re-pays ~5.4 s of deserialization). Here the
  * shared [[CentroidMatrix]] (vectors + precomputed norms) lives in ONE
  * explicit `Broadcast`: the expression serializes as a tiny handle, each
  * executor fetches and deserializes the matrix ONCE for the job lifetime,
  * and per generated-code instance the kernel wrapper is rebuilt from the
  * cached broadcast value (allocation-only — norms ride the broadcast).
  * Results are bit-identical to `ivf_cells` (same [[CentroidKernel]]).
  *
  * Built via [[GraftFunctions.registerCentroidBcast]], which registers a
  * session function bound to the broadcast (a runtime object cannot ride a
  * SQL literal) — callers then use `call_function(name, vecCol)`. */
case class NearestCellsBcast(vec: Expression, probes: Int,
    matBcast: org.apache.spark.broadcast.Broadcast[CentroidMatrix])
    extends UnaryExpression {

  override def child: Expression = vec

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_cells_bcast expects an array<float|double> vector, got ${t.catalogString}")
  }

  @transient private lazy val kernel: CentroidKernel =
    new CentroidKernel(matBcast.value, probes, vecIsFloat)

  override def nullSafeEval(v: Any): Any = kernel.assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val bc = ctx.addReferenceObj("centroidMatBcast", matBcast, bcCls)
    // kernel built ONCE per generated-class instance from the executor's
    // cached broadcast value — not per row
    val kern = ctx.addMutableState(classOf[CentroidKernel].getName, "centroidBcastKernel",
      v => s"$v = new ${classOf[CentroidKernel].getName}(" +
        s"(${classOf[CentroidMatrix].getName}) $bc.value(), $probes, $vecIsFloat);")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $kern.assign($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)

  override def prettyName: String = "ivf_cells_bcast"
}

/** Per-row sign-sketch kernel. The pseudo-random hyperplane component
  * (i, j) ∈ {-1,+1} is the parity of `xxhash64(i, j)` — EXACTLY the Spark
  * `xxhash64(lit(i), j)` chain (seed 42, then hashInt per child), so sketches
  * are bit-identical to the portable HOF formulation in
  * `Similarity.signSketchHof` (asserted in PlanSpec). The ±1 plane matrix is
  * derived once per observed dimension and cached (volatile swap — benign
  * idempotent race), so the per-row cost is one fused bits×dim loop instead
  * of `bits` interpreted `aggregate(zip_with(...))` lambda passes. */
final class SignSketchKernel(bits: Int, vecIsFloat: Boolean) extends Serializable {
  @transient @volatile private var cache: (Int, Array[Byte]) = _

  private def planes(dim: Int): Array[Byte] = {
    val c = cache
    if (c != null && c._1 == dim) return c._2
    val s = new Array[Byte](bits * dim)
    var i = 0
    while (i < bits) {
      val hi = XXH64.hashInt(i, 42L)
      var j = 0
      while (j < dim) {
        s(i * dim + j) = if ((XXH64.hashInt(j, hi) & 1L) == 0L) 1 else -1
        j += 1
      }
      i += 1
    }
    cache = (dim, s)
    s
  }

  def sketch(vec: ArrayData): Long = {
    val dim = vec.numElements()
    val s = planes(dim)
    var out = 0L
    var i = 0
    while (i < bits) {
      val off = i * dim
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val x = if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        acc += x * s(off + j)
        j += 1
      }
      if (acc > 0) out |= 1L << i
      i += 1
    }
    out
  }
}

/** `sign_sketch(vec, bits)` — random-hyperplane LSH sign sketch as one
  * fused native loop (see [[SignSketchKernel]]). `bits` must be a foldable
  * int ≤ 64. */
case class SignSketch(vec: Expression, bits: Expression) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = bits

  override def dataType: DataType = LongType

  private def vecElemType: DataType = vec.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vecElemType match { case FloatType | DoubleType => true; case _ => false }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"sign_sketch expects an array<float|double> vector, got ${vec.dataType.catalogString}")
    else if (bits.dataType != IntegerType || !bits.foldable)
      TypeCheckResult.TypeCheckFailure("sign_sketch expects a foldable int bit count (<= 64)")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val kernel: SignSketchKernel = {
    val b = bits.eval().asInstanceOf[Int]
    require(b >= 1 && b <= 64, s"sign_sketch bits must be in [1, 64], got $b")
    new SignSketchKernel(b, vecElemType == FloatType)
  }

  override def nullSafeEval(v: Any, b: Any): Any =
    kernel.sketch(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("signSketchKernel", kernel, classOf[SignSketchKernel].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $k.sketch($v);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, bits = newRight)

  override def prettyName: String = "sign_sketch"
}

/** Session registration for graft's native expressions; idempotent. Call
  * once per SparkSession, then use `call_function("cosine_sim", a, b)` etc.
  * (the public column API for registry functions). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ivf_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "ivf_cells"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "ivf_cells takes exactly 3 arguments")
        NearestCells(children.head, children(1), children(2))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sign_sketch"),
      new ExpressionInfo(classOf[SignSketch].getName, "sign_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sign_sketch takes exactly 2 arguments")
        SignSketch(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "winnow_fingerprints takes exactly 3 arguments")
        WinnowFingerprints(children.head, children(1), children(2))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_sig takes exactly 2 arguments")
        MinHashSig(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sorted_intersect_count takes exactly 2 arguments")
        SortedIntersectCount(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64 takes exactly 1 argument")
        SimHash64(children.head)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[CharShingleSet].getName, "shingle_set"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "shingle_set takes exactly 2 arguments")
        CharShingleSet(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ngram_hash_set"),
      new ExpressionInfo(classOf[NgramHashSet].getName, "ngram_hash_set"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "ngram_hash_set takes exactly 2 arguments")
        NgramHashSet(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lang_id_words"),
      new ExpressionInfo(classOf[LangIdWords].getName, "lang_id_words"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "lang_id_words takes exactly 1 argument")
        LangIdWords(children.head)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("count_nonempty"),
      new ExpressionInfo(classOf[CountNonEmpty].getName, "count_nonempty"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "count_nonempty takes exactly 1 argument")
        CountNonEmpty(children.head)
      })
  }

  /** Broadcast a centroid matrix once and register a session function bound
    * to it: `call_function(<returned name>, vecCol)` ≡
    * `ivf_cells(vecCol, <matrix literal>, nProbe)` but with the matrix
    * moving as ONE per-executor broadcast instead of twice per task binary.
    * The name is keyed on the broadcast id + nProbe, so re-registration for
    * the same broadcast is idempotent. Callers own the broadcast lifecycle
    * (destroy() when the index is dropped). */
  def registerCentroidBcast(spark: SparkSession,
      matBcast: org.apache.spark.broadcast.Broadcast[CentroidMatrix],
      nProbe: Int): String = {
    val name = s"ivf_cells_bcast_${matBcast.id}_$nProbe"
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[NearestCellsBcast].getName, name),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"$name takes exactly 1 argument (the vector column)")
        NearestCellsBcast(children.head, nProbe, matBcast)
      })
    name
  }

  /** Drop a function registered by [[registerCentroidBcast]]. The registry
    * builder closure strongly references the Broadcast handle — left
    * registered it would pin the matrix blocks for the session lifetime
    * (the ContextCleaner only reclaims a broadcast once its driver handle
    * becomes unreachable) and grow the registry by one entry per broadcast.
    * Callers must resolve their plans first (analysis inlines the bound
    * expression into the plan), then drop. */
  def dropCentroidBcast(spark: SparkSession, name: String): Unit = {
    spark.sessionState.functionRegistry.dropFunction(FunctionIdentifier(name))
    ()
  }
}
