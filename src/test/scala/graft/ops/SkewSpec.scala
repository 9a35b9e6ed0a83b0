package graft.ops

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val skewed = (
    Seq.fill(5000)(("hub", scala.util.Random.nextInt(100000).toString)) ++
      (0 until 200).map(i => (s"k$i", s"v$i"))
    ).toDF("key", "value").cache()

  test("salted count equals plain count") {
    val plain = skewed.groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted count distinct equals plain countDistinct") {
    val plain = skewed.groupBy($"key")
      .agg(org.apache.spark.sql.functions.countDistinct($"value").as("cd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(skewed, "key", "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted repartition spreads the hot key over multiple partitions") {
    val parts = Skew.saltedRepartition(skewed.filter($"key" === "hub"), "key", buckets = 8)
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(parts > 1)
  }

  test("key histogram surfaces the hub") {
    val top = Skew.keyHistogram(skewed, "key", 1).collect()(0)
    assert(top.getString(0) == "hub" && top.getLong(1) == 5000L)
  }
}
