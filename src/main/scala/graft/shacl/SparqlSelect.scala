package graft.shacl

/** Compiled form of the restricted `sh:select` subset used by the reference
  * test suite. The reference runs ONE endpoint query PER target instance with
  * `$this` substituted (InstancesRetrieval.py:51-76); we compile the pattern
  * once into a set-oriented plan — a single filter + aggregate over the triple
  * table followed by a semi-join — instead of N queries for N instances.
  *
  * Supported grammar (everything in tests/cases/sparql_constraint/&#42;):
  *   SELECT ($this AS ?this) WHERE { $this <pred> ?o FILTER( ?o OP const ) }
  *   SELECT ($this AS ?this) WHERE { $this <pred> <iri> }
  * Anything else is rejected loudly (SURVEY.md §7.4 risk 6).
  */
sealed trait SparqlViolationPattern { def pred: String }
/** violation iff ∃ object o on `pred` with `o OP const` (numeric compare) */
final case class FilterCompare(pred: String, op: String, const: Double) extends SparqlViolationPattern
/** violation iff the triple ($this, pred, obj) exists */
final case class HasValue(pred: String, obj: String) extends SparqlViolationPattern

/** A3 — custom target queries (`sh:targetQuery` TTL extension /
  * JSON `targetDef.query`). The reference ships the user-supplied SELECT to
  * the endpoint verbatim (core/ShapeParser.py:20-23, used at :166-167); we
  * compile the restricted single-triple class pattern `?x a <C>` into the
  * same scan as A1 and reject anything else loudly — arbitrary SPARQL is a
  * documented non-goal (SURVEY.md §2.A A3). */
object TargetQuery {
  private val ClassRe =
    """(?s)\s*SELECT\s+(?:DISTINCT\s+)?\?x\s+WHERE\s*\{\s*\?x\s+(?:a|<http://www\.w3\.org/1999/02/22-rdf-syntax-ns#type>)\s+(\S+?)\s*(?:\.\s*)?\}\s*""".r

  /** The target-class term of a restricted class-pattern query (raw — may
    * be `<iri>` or a prefixed name the caller must expand). */
  def classTerm(query: String): Option[String] = query match {
    case ClassRe(term) => Some(term)
    case _ => None
  }

  /** Compile to a full class IRI; only `<iri>` terms are self-contained. */
  def compile(query: String): Option[String] =
    classTerm(query).filter(t => t.startsWith("<") && t.endsWith(">"))
      .map(t => t.substring(1, t.length - 1))

  /** Canonical restricted query for a class (what A1 synthesizes). */
  def forClass(cls: String): String = s"SELECT ?x WHERE { ?x a <$cls> }"
}

object SparqlSelect {
  private val BodyRe = """(?s).*WHERE\s*\{(.*)\}[^}]*""".r
  private val TripleFilterRe =
    """(?s)\s*\$this\s+<([^>]+)>\s+\?(\w+)\s*\.?\s*FILTER\s*\(\s*\?(\w+)\s*(>=|<=|!=|>|<|=)\s*([-+]?[0-9.]+)\s*\)\s*\.?\s*""".r
  private val TripleValueRe =
    """(?s)\s*\$this\s+<([^>]+)>\s+<([^>]+)>\s*\.?\s*""".r

  def compile(select: String): SparqlViolationPattern = {
    val body = select match {
      case BodyRe(b) => b.trim
      case _ => sys.error(s"unsupported sh:select (no WHERE clause): $select")
    }
    body match {
      case TripleFilterRe(pred, v1, v2, op, const) =>
        require(v1 == v2, s"FILTER variable ?$v2 does not match triple object ?$v1")
        FilterCompare(pred, op, const.toDouble)
      case TripleValueRe(pred, obj) => HasValue(pred, obj)
      case _ => sys.error(
        s"unsupported sh:select pattern (only '\\$$this <p> ?o FILTER(?o OP const)' " +
        s"and '\\$$this <p> <iri>' are supported): $select")
    }
  }
}
