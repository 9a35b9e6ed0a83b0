package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-handling primitives (north rule: "skew from
  * mega-conversations and hub entities is handled with salted repartitioning
  * and AQE skew-join splitting").
  *
  * AQE (`spark.sql.adaptive.enabled`, on in every session here) already
  * splits skewed SHUFFLE JOIN partitions at runtime; these helpers cover the
  * two cases AQE does not: hot-key AGGREGATIONS and deliberate repartitioning
  * before wide writes.
  */
object Skew {

  /** Two-phase (salted) count aggregation: phase 1 groups on
    * (key, salt = hash(row) % buckets) so a hot key spreads over `buckets`
    * reducers; phase 2 merges the partials. Equivalent to
    * `df.groupBy(key).count()` but immune to single-reducer hot keys.
    * (Spark's partial aggregation already handles plain counts map-side;
    * the salted form matters for high-cardinality aggregates downstream —
    * collect_set/countDistinct-style state that cannot combine map-side.) */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int = 32): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("count"))

  /** Salted distinct-count: dedup on (key, value) first — the dedup shuffle
    * keys on BOTH columns so hot keys spread — then a plain count per key. */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.select(col(keyCol), col(valueCol)).distinct()
      .groupBy(col(keyCol)).agg(count(lit(1)).as("count_distinct"))

  /** Repartition by (key, salt) — spreads a hot key over `buckets` output
    * partitions before a wide write or an iterator-heavy mapPartitions. */
  def saltedRepartition(df: DataFrame, keyCol: String, buckets: Int = 16): DataFrame =
    // explicit partition count: AQE would otherwise coalesce a
    // repartition-by-column right back into few partitions
    df.repartition(buckets, col(keyCol), pmod(xxhash64(df.columns.map(col): _*), lit(buckets)))

  /** Top-N heaviest keys — the skew diagnostic used to pick salt factors. */
  def keyHistogram(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n")).orderBy(desc("n")).limit(topN)
}
