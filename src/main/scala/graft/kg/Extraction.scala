package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batched per-turn mention + relation detection over transcripts — pure
  * codegen'd Spark SQL (regexp functions + explode), no UDFs (north rule:
  * "batched regex/gazetteer mention detection per turn").
  */
object Extraction {
  /** A mention: one or more capitalized tokens (optionally dotted initials). */
  val MentionRe = "[A-Z][A-Za-z0-9]*\\.?(?: [A-Z][A-Za-z0-9]*\\.?)*"

  private val relTriggerToPred = Map(
    "works at" -> Universe.relWorksAt,
    "collaborates with" -> Universe.relCollab,
    "contributes to" -> Universe.relContrib)
  private val kindWordToClass = Map(
    "person" -> Universe.clsPerson,
    "organization" -> Universe.clsOrg,
    "project" -> Universe.clsProject)

  private val relPattern =
    s"($MentionRe) (${relTriggerToPred.keys.toSeq.sorted.mkString("|")}) ($MentionRe) \\."
  private val typePattern =
    s"($MentionRe) is a (${kindWordToClass.keys.toSeq.sorted.mkString("|")}) \\."

  private def mapLit(m: Map[String, String]) =
    map(m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** All mention surfaces per turn: (conv_id, turn_idx, surface). */
  def mentions(turns: DataFrame): DataFrame =
    turns.select(col("conv_id"), col("turn_idx"),
      explode(regexp_extract_all(col("text"), lit(MentionRe), lit(0))).as("surface"))

  /** Binary relations: (conv_id, turn_idx, subjSurface, pred, objSurface).
    * One regexp pass; the trigger word maps to the predicate IRI through a
    * literal map — everything stays inside whole-stage codegen. */
  def relations(turns: DataFrame): DataFrame =
    turns.select(col("conv_id"), col("turn_idx"),
        regexp_extract(col("text"), relPattern, 1).as("subjSurface"),
        regexp_extract(col("text"), relPattern, 2).as("trigger"),
        regexp_extract(col("text"), relPattern, 3).as("objSurface"))
      .filter(col("subjSurface") =!= "")
      .withColumn("pred", element_at(mapLit(relTriggerToPred), col("trigger")))
      .drop("trigger")

  /** rdf:type assertions: (conv_id, turn_idx, subjSurface, cls). */
  def typeAssertions(turns: DataFrame): DataFrame =
    turns.select(col("conv_id"), col("turn_idx"),
        regexp_extract(col("text"), typePattern, 1).as("subjSurface"),
        regexp_extract(col("text"), typePattern, 2).as("kindWord"))
      .filter(col("subjSurface") =!= "")
      .withColumn("cls", element_at(mapLit(kindWordToClass), col("kindWord")))
      .drop("kindWord")
}
