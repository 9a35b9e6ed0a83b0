package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CcReproSpec extends SparkTestBase {
  test("cc over md5-group edges from parquet-derived plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(format_string("%010d", col("doc_id")).as("node"), md5(col("text")).as("h"))
    val keeper = docs.groupBy(col("h"))
      .agg(min(col("node")).as("keeper"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val edges = docs.join(keeper, "h").filter(col("node") =!= col("keeper"))
      .select(col("keeper").as("src"), col("node").as("dst"))
    val cc = ConnectedComponents.run(spark, edges)
    assert(cc.count() >= 0)
  }
}
