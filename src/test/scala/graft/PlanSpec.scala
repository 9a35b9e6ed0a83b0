package graft

import graft.rdf.TripleStore
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the declarative operators must produce the
  * plans the scale design depends on — predicate-partition pruning on the
  * triple store, filter/column pushdown into parquet scans, broadcast joins
  * for dictionary-sized sides, and whole-stage codegen on hot paths.
  */
class PlanSpec extends SparkTestBase {
  import spark.implicits._

  test("predicate-partitioned triple store prunes partitions per constraint path") {
    val dir = java.nio.file.Files.createTempDirectory("plantriples").toString
    val triples = Seq(
      ("s1", "http://x/p0", "o1"), ("s2", "http://x/p1", "o2"),
      ("s3", "http://x/p2", "o3")).toDF("subj", "pred", "obj")
    TripleStore.writePartitioned(triples, s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    val plan = back.filter($"pred" === "http://x/p1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p1"),
      s"expected partition pruning on pred, got:\n$plan")
    // only the matching partition's rows are read
    assert(back.filter($"pred" === "http://x/p1").count() == 1)
  }

  test("column pruning: projection reaches the parquet scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey").distinct()
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"expected 2-column-free scan, got: $scanLine")
  }

  test("filter pushdown reaches the parquet scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"),
      s"expected pushed filter, got:\n$plan")
  }

  test("dictionary-sized join sides broadcast") {
    val big = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val small = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val joined = big.join(small, big("l_suppkey") % 25 === small("n_nationkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
  }

  test("extraction and text-analysis expressions stay inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(graft.ops.TextAnalysis.langId($"text").as("l"),
      graft.ops.TextAnalysis.tokenCount($"text").as("n"))
    // AQE hides the final stages in executedPlan.toString before execution —
    // the codegen explain mode resolves and reports the codegen subtrees
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"), s"expected codegen, got:\n${plan.take(800)}")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"),
      "hot path must not contain UDFs")
  }
}
