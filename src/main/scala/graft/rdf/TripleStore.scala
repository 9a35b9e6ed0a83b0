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

  /** One explicit exchange on the bucket key before the bucketed write:
    * `repartition(buckets, subj)` uses the same Murmur3(subj) % buckets
    * mapping as the bucket spec, so every write task holds exactly ONE
    * bucket's rows and emits one file per (pred, bucket) — without it each
    * input task writes a file for every bucket it happens to touch (up to
    * tasks × buckets × preds files, all tiny), and a serial upstream (the
    * row-group-starved bench inputs) serializes the whole sort+encode+write
    * onto a handful of tasks. Also the write parallelism now equals the
    * bucket count at any scale (opt guide §6: sensible output file sizing). */
  def writeBucketedTable(df: DataFrame, table: String, buckets: Int = 32): Unit =
    df.repartition(buckets, col("subj"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pred")
      .bucketBy(buckets, "subj")
      .sortBy("subj")
      .saveAsTable(table)

  /** Pattern for an ABSOLUTE IRI (has a scheme) — the only IRIs the
    * N-Triples grammar allows inside `<…>` (IRIREF production; relative
    * IRIs are Turtle-only). */
  private[rdf] val absoluteIriPattern = "^[A-Za-z][A-Za-z0-9+.\\-]*:"

  /** N-Triples serialization of a triple frame — the standard interop
    * format the reference's SPARQL world loads. The engine is string-typed
    * (SURVEY §1.2: the reference discards datatypes), so the IRI-vs-literal
    * decision for OBJECTS is a deterministic policy: values matching
    * `iriObjectPattern` (default: absolute http/https IRIs) serialize as
    * `<iri>`, everything else as an escaped quoted literal (backslash,
    * quote, newline, carriage return — the N-Triples mandatory escapes).
    * Subjects and predicates are always IRIs, per RDF; bare engine ids
    * (`c1`, `hasOrder`) carry no scheme, so they are prefixed with
    * `baseIri` to make each line a grammar-valid ABSOLUTE IRIREF —
    * rdflib/Jena (the reference's own loaders, SPARQLEndpoint.py:36-52
    * re-serializes via rdflib) reject relative `<c1>` outright.
    * @return single-column DataFrame (line STRING), distributed — write
    *         with `.write.text(dir)`; lines are valid Turtle, so
    *         [[fromTurtleFile]] parses them back (round-trip asserted in
    *         TurtleParserSpec). */
  def toNTriples(df: DataFrame, iriObjectPattern: String = "^https?://",
                 baseIri: String = "urn:graft:"): DataFrame = {
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
        "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r")
    def iriTerm(c: org.apache.spark.sql.Column) =
      concat(lit("<"),
        when(c.rlike(absoluteIriPattern), c).otherwise(concat(lit(baseIri), c)),
        lit(">"))
    val objTerm = when(col("obj").rlike(iriObjectPattern),
        concat(lit("<"), col("obj"), lit(">")))
      .otherwise(concat(lit("\""), esc(col("obj")), lit("\"")))
    df.select(concat(
      iriTerm(col("subj")), lit(" "), iriTerm(col("pred")), lit(" "),
      objTerm, lit(" .")).as("line"))
  }
}
