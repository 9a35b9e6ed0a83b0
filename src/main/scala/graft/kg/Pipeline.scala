package graft.kg

import graft.rdf.Rdf
import graft.shacl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end knowledge-graph construction (north rule):
  * transcripts → mention/relation extraction → MinHash-LSH + TF-IDF entity
  * linking → connected-components canonicalization → (subj, pred, obj)
  * triple materialization → SHACL validation of the emitted graph.
  *
  * Every stage is checkpointed with per-partition lineage for exact resume.
  * Skew notes: the corpus-level `distinct()` on full triples spreads hub
  * subjects across partitions BEFORE any per-subject aggregation (a dedup
  * shuffle keyed by the whole row has no hot keys), and the linker operates
  * on distinct surface forms so mega-conversations never concentrate.
  */
object Pipeline {

  final case class Result(triples: DataFrame, counters: Map[String, Long],
                          validation: Option[ValidationResult])

  /** Shape schema for validating the constructed graph: persons must work at
    * ≥1 valid organization; projects must have ≥1 valid contributor. */
  def kgShapes: ShapeSchema = ShapeSchema(Seq(
    Shape(Universe.ns + "PersonShape", Some(Universe.clsPerson), None,
      Some(s"SELECT ?x WHERE { ?x a <${Universe.clsPerson}> }"),
      Seq(CardConstraint("person_c1", DirectPath(Universe.relWorksAt), min = 1,
        shapeRef = Some(Universe.ns + "OrganizationShape"))), Nil, Nil),
    Shape(Universe.ns + "OrganizationShape", Some(Universe.clsOrg), None,
      Some(s"SELECT ?x WHERE { ?x a <${Universe.clsOrg}> }"), Nil, Nil, Nil),
    Shape(Universe.ns + "ProjectShape", Some(Universe.clsProject), None,
      Some(s"SELECT ?x WHERE { ?x a <${Universe.clsProject}> }"),
      Seq(CardConstraint("project_c1", InversePath(Universe.relContrib), min = 1,
        shapeRef = Some(Universe.ns + "PersonShape"))), Nil, Nil)))

  private def surfaceToIri(c: org.apache.spark.sql.Column) =
    concat(lit(Universe.ns), regexp_replace(c, " ", "_"))

  def run(spark: SparkSession, turns: DataFrame, workDir: String,
          validate: Boolean = false,
          linker: EntityLinker.LinkerParams = EntityLinker.LinkerParams()): Result = {
    val ckpt = new StageCheckpoint(spark, workDir)

    // ONE pass over the corpus extracts relation AND type facts together —
    // the transcript scan dominates data volume and must not run twice.
    val facts = ckpt.stage("facts") { Extraction.facts(turns) }

    val surfaces = ckpt.stage("surfaces") {
      facts.select(col("subjSurface").as("surface"))
        .union(facts.filter(col("objSurface").isNotNull)
          .select(col("objSurface").as("surface")))
        .distinct()
    }

    val links = ckpt.stage("links") { EntityLinker.link(spark, surfaces, linker) }

    val triples = ckpt.stage("triples") {
      // Dictionary-encode entities and predicates BEFORE the corpus-wide
      // distinct: the dedup shuffle then moves (int, byte-sized pred id,
      // int) rows instead of ~150-byte IRI strings — an order of magnitude
      // less shuffle volume, and integer hashing instead of string hashing.
      import org.apache.spark.sql.expressions.Window
      val dict = links.select(col("canonical")).distinct()
        .withColumn("eid", row_number().over(Window.orderBy(col("canonical"))))
      val sLink = broadcast(links.join(dict, "canonical")
        .select(col("surface").as("subjSurface"), col("eid").as("sid")))
      val oLink = broadcast(links.join(dict, "canonical")
        .select(col("surface").as("objSurface"), col("eid").as("oid")))
      // objects of type facts are class IRIs, not surfaces: give the three
      // classes fixed negative ids so they share the integer dictionary
      val classes = Seq(Universe.clsPerson, Universe.clsOrg, Universe.clsProject)
      val clsId = map(classes.zipWithIndex.flatMap { case (c, i) => Seq(lit(c), lit(-(i + 1))) }: _*)
      val preds = Seq(Rdf.rdfType, Universe.relWorksAt, Universe.relCollab, Universe.relContrib)
      val predId = map(preds.zipWithIndex.flatMap { case (p, i) => Seq(lit(p), lit(i)) }: _*)
      val predOf = map(preds.zipWithIndex.flatMap { case (p, i) => Seq(lit(i), lit(p)) }: _*)

      val compact = facts
        .join(sLink, Seq("subjSurface"))
        .join(oLink, Seq("objSurface"), "left")
        .select(col("sid"),
          element_at(predId, col("pred")).as("pid"),
          coalesce(col("oid"), element_at(clsId, col("cls"))).as("oid"))
        .filter(col("oid").isNotNull) // defensive: drop malformed facts
        .distinct()

      // the compact distinct output is tiny (ints) — AQE would coalesce it
      // to one partition and run the expansion + write single-task
      val spread = compact.repartition(spark.sparkContext.defaultParallelism)

      val subjDict = broadcast(dict.select(col("eid").as("sid"), col("canonical").as("subjCanon")))
      val objDict = broadcast(dict.select(col("eid").as("oid"), col("canonical").as("objCanon")))
      val clsOf = map(classes.zipWithIndex.flatMap { case (c, i) => Seq(lit(-(i + 1)), lit(c)) }: _*)
      spread
        .join(subjDict, Seq("sid"))
        .join(objDict, Seq("oid"), "left")
        .select(
          surfaceToIri(col("subjCanon")).as("subj"),
          element_at(predOf, col("pid")).as("pred"),
          coalesce(surfaceToIri(col("objCanon")), element_at(clsOf, col("oid"))).as("obj"))
    }

    val validation =
      if (validate) Some(new Validator(spark, triples, kgShapes).run())
      else None

    Result(triples, ckpt.counters, validation)
  }

  /** Publish the emitted graph as the north-rule table layout: parquet
    * partitioned by predicate (directory pruning per constraint path); use
    * `TripleStore.writeBucketedTable` instead when a catalog is available
    * (adds subject-hash bucketing for shuffle-free groupBy(subj)). */
  def materialize(result: Result, path: String): Unit =
    graft.rdf.TripleStore.writePartitioned(result.triples, path)

  /** Precision/recall of emitted triples against an expected set. */
  def precisionRecall(out: DataFrame, expected: DataFrame): (Double, Double) = {
    val o = out.select("subj", "pred", "obj").distinct().cache()
    val e = expected.select("subj", "pred", "obj").distinct().cache()
    val inter = o.join(e, Seq("subj", "pred", "obj"), "left_semi").count().toDouble
    val (oc, ec) = (o.count(), e.count())
    (if (oc == 0) 0.0 else inter / oc, if (ec == 0) 0.0 else inter / ec)
  }
}
