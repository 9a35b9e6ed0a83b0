package graft.functions

import graft.SparkTestBase
import graft.ops.Similarity
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property-style randomized checks over the three native kernels
  * (cosine_sim, sign_sketch, ivf_cells): bit-identity with the portable
  * HOF/Scala formulations across random dimensions, magnitudes and both
  * array element types, plus null-row propagation. Fixed seeds — each case
  * is deterministic. */
class KernelPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def randVec(rnd: Random, dim: Int): Seq[Double] =
    Seq.fill(dim)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(4) - 1))

  private def cosSeq(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("cosine_sim matches the HOF form bit-for-bit on random dims/magnitudes") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- Seq(1L, 7L, 42L)) {
      val rnd = new Random(seed)
      val dim = 1 + rnd.nextInt(64)
      val rows = (0 until 50).map(i => (i.toLong, randVec(rnd, dim))).toDF("id", "v")
      val q = array(randVec(rnd, dim).map(lit): _*)
      val both = rows.select(
        Similarity.cosineNative($"v", q).as("native"),
        Similarity.cosine($"v", q).as("hof")).collect()
      assert(both.forall(r => r.getDouble(0) == r.getDouble(1)), s"seed=$seed dim=$dim")
    }
  }

  test("sign_sketch matches the HOF form bit-for-bit on random dims and bit widths") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- Seq(3L, 19L, 77L)) {
      val rnd = new Random(seed)
      val dim = 1 + rnd.nextInt(48)
      val bits = 1 + rnd.nextInt(32)
      // float vectors — the production embedding type
      val rows = (0 until 60).map(i => (i.toLong, randVec(rnd, dim).map(_.toFloat))).toDF("id", "v")
      val both = rows.select(
        Similarity.signSketch($"v", bits).as("native"),
        Similarity.signSketchHof($"v", bits).as("hof")).collect()
      assert(both.forall(r => r.getLong(0) == r.getLong(1)), s"seed=$seed dim=$dim bits=$bits")
    }
  }

  test("ivf_cells top-p ordering matches a driver-side reference on random inputs") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- Seq(5L, 23L, 91L)) {
      val rnd = new Random(seed)
      val dim = 2 + rnd.nextInt(16)
      val k = 2 + rnd.nextInt(12)
      val p = 1 + rnd.nextInt(k)
      val centroids = Array.fill(k)(randVec(rnd, dim))
      val vecs = (0 until 40).map(i => (i.toLong, randVec(rnd, dim)))
      val got = vecs.toDF("id", "v")
        .select($"id", call_function("ivf_cells",
          $"v", typedLit(centroids.toSeq), lit(p)).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.foreach { case (id, v) =>
        val expected = centroids.zipWithIndex
          .map { case (c, i) => (i, cosSeq(v, c)) }
          .sortBy { case (i, cos) => (-cos, i) }
          .take(p).map(_._1).toSeq
        assert(got(id) == expected, s"seed=$seed id=$id dim=$dim k=$k p=$p")
      }
    }
  }

  test("ivf_cells assigns zero-magnitude vectors to cell 0, never an empty array") {
    // every cosine is NaN for a zero vector; callers do element_at(cells, 1),
    // which throws under ANSI mode on an empty array — the kernel must fall
    // back to a deterministic cell
    graft.functions.GraftFunctions.register(spark)
    val cent = typedLit(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val rows = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(3.0f, 4.0f))).toDF("id", "v")
    val got = rows.select($"id",
        call_function("ivf_cells", $"v", cent, lit(1)).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(0), s"zero vector must land in cell 0, got ${got(1L)}")
    assert(got(2L) == Seq(1))
  }

  test("null vectors propagate null through all three kernels") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, Option.empty[Seq[Float]]))
      .toDF("id", "v")
    val cent = typedLit(Seq(Seq(1.0, 0.0)))
    val out = rows.select($"id",
        call_function("cosine_sim", $"v", $"v").as("c"),
        call_function("sign_sketch", $"v", lit(8)).as("s"),
        call_function("ivf_cells", $"v", cent, lit(1)).as("cells"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).isNullAt(1) && !out(1L).isNullAt(2) && !out(1L).isNullAt(3))
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2) && out(2L).isNullAt(3))
  }

  // ---- set-sketch kernels (minhash_sig, sorted_intersect_count, simhash64) ----

  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  // empty set → null signature (round-5 semantics: matches the exploded
  // groupBy that simply drops tokenless docs)
  private def refMinHashLong(arr: Seq[Long], k: Int): Option[Seq[Long]] =
    if (arr.isEmpty) None
    else Some((0 until k).map(i => arr.map(t => XXH64.hashInt(i, XXH64.hashLong(t, 42L))).min))

  private def refMinHashStr(arr: Seq[String], k: Int): Option[Seq[Long]] =
    if (arr.isEmpty) None
    else Some((0 until k).map(i =>
      arr.map(t => XXH64.hashInt(i, XXH64.hashUTF8String(UTF8String.fromString(t), 42L))).min))

  test("minhash_sig matches the XXH64 reference fold on random long and string sets") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- Seq(2L, 13L, 59L)) {
      val rnd = new Random(seed)
      val k = 1 + rnd.nextInt(24)
      val longRows = (0 until 40).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(30))(rnd.nextLong()).distinct)
      }
      val gotL = longRows.toDF("id", "sh")
        .select($"id", call_function("minhash_sig", $"sh", lit(k)).as("s"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
      longRows.foreach { case (id, arr) =>
        assert(gotL(id) == refMinHashLong(arr, k), s"seed=$seed k=$k id=$id (long)")
      }
      val strRows = (0 until 40).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(20))(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString).distinct)
      }
      val gotS = strRows.toDF("id", "sh")
        .select($"id", call_function("minhash_sig", $"sh", lit(k)).as("s"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
      strRows.foreach { case (id, arr) =>
        assert(gotS(id) == refMinHashStr(arr, k), s"seed=$seed k=$k id=$id (string)")
      }
    }
  }

  test("sorted_intersect_count matches set intersection on random sorted sets") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- Seq(4L, 17L, 83L)) {
      val rnd = new Random(seed)
      // draw from a small value domain so intersections are non-trivial;
      // include empty and disjoint sets
      val longRows = (0 until 60).map { i =>
        val a = Seq.fill(rnd.nextInt(25))(rnd.nextInt(40).toLong).distinct.sorted
        val b = Seq.fill(rnd.nextInt(25))(rnd.nextInt(40).toLong).distinct.sorted
        (i.toLong, a, b, (a.toSet & b.toSet).size.toLong)
      }
      val gotL = longRows.map(t => (t._1, t._2, t._3)).toDF("id", "a", "b")
        .select($"id", call_function("sorted_intersect_count", $"a", $"b").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      longRows.foreach { case (id, _, _, exp) => assert(gotL(id) == exp, s"seed=$seed id=$id (long)") }
      val strRows = (0 until 60).map { i =>
        val dom = Vector("aa", "ab", "b", "ba", "c", "cc", "d", "e", "f", "g0", "g1", "zz")
        val a = Seq.fill(rnd.nextInt(12))(dom(rnd.nextInt(dom.size))).distinct.sorted
        val b = Seq.fill(rnd.nextInt(12))(dom(rnd.nextInt(dom.size))).distinct.sorted
        (i.toLong, a, b, (a.toSet & b.toSet).size.toLong)
      }
      val gotS = strRows.map(t => (t._1, t._2, t._3)).toDF("id", "a", "b")
        .select($"id", call_function("sorted_intersect_count", $"a", $"b").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      strRows.foreach { case (id, _, _, exp) => assert(gotS(id) == exp, s"seed=$seed id=$id (string)") }
    }
  }

  test("simhash64 matches the sign-sum reference on random token multisets") {
    graft.functions.GraftFunctions.register(spark)
    def ref(tokens: Seq[String]): Long = {
      val cnt = new Array[Int](64)
      tokens.foreach { t =>
        val h = XXH64.hashUTF8String(UTF8String.fromString(t), 42L)
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1)
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (cnt(b) > 0) acc | (1L << b) else acc)
    }
    for (seed <- Seq(6L, 29L, 101L)) {
      val rnd = new Random(seed)
      // duplicates on purpose — simhash weighs the multiset, and an even
      // count of a token can tie a bit vote (cnt == 0 → bit clear)
      val rows = (0 until 50).map { i =>
        val vocab = Vector("x", "yy", "zzz", "w", "vv", "u")
        (i.toLong, Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))))
      }
      val got = rows.toDF("id", "w")
        .select($"id", call_function("simhash64", $"w").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (id, toks) => assert(got(id) == ref(toks), s"seed=$seed id=$id") }
    }
  }
}
