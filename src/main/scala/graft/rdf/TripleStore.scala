package graft.rdf

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Loading/saving of the engine's fundamental table:
  * `triples(subj STRING, pred STRING, obj STRING)`.
  *
  * Scale layout (north rule): written partitioned by predicate (predicates
  * are low-cardinality — validation workloads filter on them, giving free
  * partition pruning per constraint path) and bucketed/sorted by `subj` so
  * the per-shape `groupBy(subj)` cardinality aggregations and subject-side
  * joins co-partition without a shuffle.
  */
object TripleStore {

  def fromTurtleFile(spark: SparkSession, path: String): DataFrame =
    fromTriples(spark, Rdf.toStringTriples(TurtleParser.parseFile(path)))

  def fromTriples(spark: SparkSession, ts: Seq[STriple]): DataFrame = {
    import spark.implicits._
    ts.toDF("subj", "pred", "obj")
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("subj"), col("pred"), col("obj"))

  /** Materialize a triple table for repeated validation queries. Predicate
    * partitioning → directory pruning on `filter(pred === …)`; bucketing by
    * subject → shuffle-free `groupBy(subj)` when read back as a table. */
  def writePartitioned(df: DataFrame, path: String, buckets: Int = 0): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).partitionBy("pred")
    w.parquet(path)
    // Note: bucketBy requires saveAsTable (a metastore); for pure-path
    // parquet we rely on predicate partitioning + AQE. Callers with a
    // catalog can use writeBucketedTable instead.
    val _ = buckets
  }

  def writeBucketedTable(df: DataFrame, table: String, buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy("pred")
      .bucketBy(buckets, "subj")
      .sortBy("subj")
      .saveAsTable(table)

  /** N-Triples serialization of a triple frame — the standard interop
    * format the reference's SPARQL world loads. The engine is string-typed
    * (SURVEY §1.2: the reference discards datatypes), so the IRI-vs-literal
    * decision for OBJECTS is a deterministic policy: values matching
    * `iriObjectPattern` (default: absolute http/https IRIs) serialize as
    * `<iri>`, everything else as an escaped quoted literal (backslash,
    * quote, newline, carriage return — the N-Triples mandatory escapes).
    * Subjects and predicates are always IRIs, per RDF.
    * @return single-column DataFrame (line STRING), distributed — write
    *         with `.write.text(dir)`; lines are valid Turtle, so
    *         [[fromTurtleFile]] parses them back (round-trip asserted in
    *         TurtleParserSpec). */
  def toNTriples(df: DataFrame, iriObjectPattern: String = "^https?://"): DataFrame = {
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
        "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r")
    val objTerm = when(col("obj").rlike(iriObjectPattern),
        concat(lit("<"), col("obj"), lit(">")))
      .otherwise(concat(lit("\""), esc(col("obj")), lit("\"")))
    df.select(concat(
      lit("<"), col("subj"), lit("> <"), col("pred"), lit("> "),
      objTerm, lit(" .")).as("line"))
  }
}
