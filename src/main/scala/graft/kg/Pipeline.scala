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

    val relations = ckpt.stage("relations") { Extraction.relations(turns) }
    val types = ckpt.stage("types") { Extraction.typeAssertions(turns) }

    val surfaces = ckpt.stage("surfaces") {
      relations.select(col("subjSurface").as("surface"))
        .union(relations.select(col("objSurface").as("surface")))
        .union(types.select(col("subjSurface").as("surface")))
        .distinct()
    }

    val links = ckpt.stage("links") { EntityLinker.link(spark, surfaces, linker) }

    val triples = ckpt.stage("triples") {
      val subjLink = links.select(col("surface").as("subjSurface"), col("canonical").as("subjCanon"))
      val objLink = links.select(col("surface").as("objSurface"), col("canonical").as("objCanon"))
      val relTriples = relations
        .join(subjLink, Seq("subjSurface"))
        .join(objLink, Seq("objSurface"))
        .select(surfaceToIri(col("subjCanon")).as("subj"), col("pred"),
          surfaceToIri(col("objCanon")).as("obj"))
      val typeTriples = types
        .join(subjLink, Seq("subjSurface"))
        .select(surfaceToIri(col("subjCanon")).as("subj"), lit(Rdf.rdfType).as("pred"),
          col("cls").as("obj"))
      relTriples.union(typeTriples).distinct()
    }

    val validation =
      if (validate) Some(new Validator(spark, triples, kgShapes).run())
      else None

    Result(triples, ckpt.counters, validation)
  }

  /** Precision/recall of emitted triples against an expected set. */
  def precisionRecall(out: DataFrame, expected: DataFrame): (Double, Double) = {
    val o = out.select("subj", "pred", "obj").distinct().cache()
    val e = expected.select("subj", "pred", "obj").distinct().cache()
    val inter = o.join(e, Seq("subj", "pred", "obj"), "left_semi").count().toDouble
    val (oc, ec) = (o.count(), e.count())
    (if (oc == 0) 0.0 else inter / oc, if (ec == 0) 0.0 else inter / ec)
  }
}
