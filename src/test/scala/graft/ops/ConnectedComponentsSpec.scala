package graft.ops

import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def components(edges: Seq[(String, String)]): Map[String, String] =
    ConnectedComponents.run(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("path graph collapses to one component") {
    val comp = components(Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e"))
    assert(comp.values.toSet == Set("a"))
    assert(comp.keySet == Set("a", "b", "c", "d", "e"))
  }

  test("two stars stay separate") {
    val comp = components(Seq("hub1" -> "x1", "hub1" -> "x2", "hub2" -> "y1", "hub2" -> "y2"))
    assert(comp("x1") == comp("x2") && comp("x1") == comp("hub1"))
    assert(comp("y1") == comp("y2") && comp("y1") == comp("hub2"))
    assert(comp("x1") != comp("y1"))
  }

  test("long chain converges (logarithmic rounds, distributed path)") {
    import spark.implicits._
    val n = 64
    val edges = (0 until n - 1).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    // localThreshold = 0 forces the distributed small-star/large-star rounds
    val comp = ConnectedComponents.run(spark, edges.toDF("src", "dst"), localThreshold = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp.values.toSet == Set("n000"))
    assert(comp.size == n)
  }

  test("distributed rounds agree with local union-find") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val edges = (0 until 300).map(_ => (s"v${rnd.nextInt(120)}", s"v${rnd.nextInt(120)}"))
      .filter(e => e._1 != e._2).toDF("src", "dst").cache()
    val local = ConnectedComponents.run(spark, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = ConnectedComponents.run(spark, edges, localThreshold = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(local == dist)
  }

  test("driver fallback is byte-bounded, not only count-bounded") {
    // pure decision: 1000 edges of fat IRIs (100k chars avg) must NOT be
    // solved on the driver even though the count is far under the 1M gate
    assert(ConnectedComponents.solveLocally(1000L, 200L, 1000000L, 64L << 20))
    assert(!ConnectedComponents.solveLocally(1000L, 100L * 1000 * 1000, 1000000L, 64L << 20))
    // e2e: fat ids + a tiny byte cap route through the distributed rounds
    // and still produce the exact components
    val fat = "x" * 2000
    val edges = Seq((s"a$fat", s"b$fat"), (s"b$fat", s"c$fat"), (s"p$fat", s"q$fat"))
      .toDF("src", "dst")
    val comp = ConnectedComponents.run(spark, edges, localThresholdBytes = 1024)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp(s"c$fat") == s"a$fat" && comp(s"q$fat") == s"p$fat")
    assert(comp.size == 5)
  }

  test("self loops and duplicate edges are harmless") {
    val comp = components(Seq("a" -> "a", "a" -> "b", "b" -> "a", "c" -> "c"))
    assert(comp.get("a").contains("a") || comp.get("b").contains("a"))
    assert(comp("b") == "a")
  }
}
