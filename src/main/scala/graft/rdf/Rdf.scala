package graft.rdf

/** Minimal RDF term model for the driver-side Turtle subset parser.
  *
  * The engine itself is string-typed (subject/predicate/object columns of a
  * Spark DataFrame); these terms exist only while parsing shape files and
  * small data fixtures on the driver. Matches the reference's string
  * semantics, where only the lexical value of a binding is kept
  * (reference: TravSHACL/sparql/SPARQLEndpoint.py:37-38).
  */
sealed trait Node { def value: String }
final case class Iri(value: String) extends Node
final case class BNode(value: String) extends Node
final case class Lit(value: String, datatype: String = Rdf.xsdString,
                     lang: Option[String] = None) extends Node

final case class Triple(subj: Node, pred: Iri, obj: Node)

/** A plain string triple row — the engine's fundamental data unit. */
final case class STriple(subj: String, pred: String, obj: String)

object Rdf {
  val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val rdfFirst = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  val rdfRest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  val rdfNil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
  val xsdString = "http://www.w3.org/2001/XMLSchema#string"
  val xsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  val xsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  val xsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  val rdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
  val sh = "http://www.w3.org/ns/shacl#"

  /** Render a term to the plain string used by the engine (IRIs and literals
    * are both just their lexical value, blank nodes keep a `_:` prefix). */
  def str(n: Node): String = n match {
    case Iri(v)    => v
    case BNode(v)  => "_:" + v
    case Lit(v, _, _) => v
  }

  def toStringTriples(ts: Seq[Triple]): Seq[STriple] =
    ts.map(t => STriple(str(t.subj), t.pred.value, str(t.obj)))
}
