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

  /** One combined pattern so relation and type facts come from a single
    * regex pass over the corpus — the transcript scan is the dominant
    * data-volume stage and must not run twice. */
  private val factPattern =
    s"($MentionRe) (${(relTriggerToPred.keys.toSeq :+ "is a").sorted.mkString("|")}) " +
      s"($MentionRe|${kindWordToClass.keys.toSeq.sorted.mkString("|")}) \\."

  private def mapLit(m: Map[String, String]) =
    map(m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** All mention surfaces per turn: (conv_id, turn_idx, surface). */
  def mentions(turns: DataFrame): DataFrame =
    turns.select(col("conv_id"), col("turn_idx"),
      explode(regexp_extract_all(col("text"), lit(MentionRe), lit(0))).as("surface"))

  /** Unified fact extraction in ONE corpus pass:
    * (conv_id, turn_idx, subjSurface, pred, objSurface, cls).
    * Relation rows carry (pred, objSurface); type rows carry pred=rdf:type
    * and the class IRI in `cls`. Trigger/kind words map to IRIs through
    * literal maps — everything stays inside whole-stage codegen.
    *
    * ALL matching fact sentences of a turn are kept: one
    * `regexp_extract_all` pass over the full text finds every
    * non-overlapping match, then the (short) matched sentences are exploded
    * and re-captured per group — the full-corpus regex scan runs exactly
    * once, the per-group extracts only touch ~60-char match strings. */
  def facts(turns: DataFrame): DataFrame = factsWith(turns, Nil)

  /** `facts` carrying extra pass-through columns (e.g. `ts` for streaming
    * windowed metrics). */
  def factsWith(turns: DataFrame, carry: Seq[String]): DataFrame = {
    val keyCols = Seq(col("conv_id"), col("turn_idx")) ++ carry.map(col)
    turns
      // cheap substring prefilter before the (expensive) regex: a turn with
      // no trigger phrase cannot contain a fact, and filler/padding-only
      // turns are a third of the corpus — `contains` is a vectorized
      // byte-scan, an order of magnitude cheaper than the alternation regex.
      // Purely an optimization: the regex still decides on survivors.
      .filter((relTriggerToPred.keys.toSeq.sorted :+ "is a")
        .map(t => col("text").contains(t)).reduce(_ || _))
      .select(keyCols :+
        explode(regexp_extract_all(col("text"), lit(factPattern), lit(0))).as("sent"): _*)
      .select(keyCols ++ Seq(
        regexp_extract(col("sent"), factPattern, 1).as("subjSurface"),
        regexp_extract(col("sent"), factPattern, 2).as("trigger"),
        regexp_extract(col("sent"), factPattern, 3).as("objRaw")): _*)
      .filter(col("subjSurface") =!= "")
      .select(keyCols ++ Seq(col("subjSurface"),
        when(col("trigger") === "is a", lit(graft.rdf.Rdf.rdfType))
          .otherwise(element_at(mapLit(relTriggerToPred), col("trigger"))).as("pred"),
        when(col("trigger") =!= "is a", col("objRaw")).as("objSurface"),
        when(col("trigger") === "is a", element_at(mapLit(kindWordToClass), col("objRaw"))).as("cls")): _*)
  }

  /** Binary relations view over `facts`. */
  def relations(turns: DataFrame): DataFrame =
    facts(turns).filter(col("pred") =!= graft.rdf.Rdf.rdfType)
      .select(col("conv_id"), col("turn_idx"), col("subjSurface"), col("pred"), col("objSurface"))

  /** rdf:type assertion view over `facts`. */
  def typeAssertions(turns: DataFrame): DataFrame =
    facts(turns).filter(col("pred") === graft.rdf.Rdf.rdfType)
      .select(col("conv_id"), col("turn_idx"), col("subjSurface"), col("cls"))
}
