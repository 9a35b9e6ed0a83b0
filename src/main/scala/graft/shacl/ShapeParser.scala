package graft.shacl

import graft.rdf._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parses SHACL shape definitions from a directory — one shape file per shape,
  * Turtle (`.ttl`) or legacy JSON (`.json`) format, mirroring the reference's
  * `ShapeParser.parse_shapes_from_dir` (TravSHACL/core/ShapeParser.py:38-78).
  *
  * Driver-side only: shape schemas are tiny metadata (tens of shapes), no
  * Spark involvement (SURVEY.md §2.B B1).
  */
object ShapeParser {

  /** @param lenient reference `-f/--force` (`ShapeParser.__init__
    *        ignore_errors`, core/ShapeParser.py:31-36): a shape file that
    *        fails to parse (unsupported construct, malformed syntax) is
    *        skipped with a warning instead of aborting the whole schema. */
  def parseDir(dir: String, format: String = "SHACL", lenient: Boolean = false): ShapeSchema = {
    val ext = if (format == "SHACL") ".ttl" else ".json"
    val files = walk(dir).filter(_.toLowerCase.endsWith(ext)).sorted
    if (files.isEmpty)
      throw new java.io.FileNotFoundException(s"$dir does not contain any shapes of the format $format")
    def guard(f: String, parse: => Seq[Shape]): Seq[Shape] =
      if (!lenient) parse
      else try parse catch {
        case e: Exception =>
          System.err.println(s"[shape-parser] WARN skipping $f: ${e.getMessage}")
          Nil
      }
    val shapes =
      if (format == "SHACL") files.flatMap(f => guard(f, parseTtlFile(f)))
      else files.flatMap(f => guard(f, Seq(parseJsonFile(f))))
    ShapeSchema(shapes)
  }

  private def walk(dir: String): Seq[String] = {
    val stream = Files.walk(Paths.get(dir))
    try stream.iterator().asScala.filter(Files.isRegularFile(_)).map(_.toString).toVector
    finally stream.close()
  }

  // ---------------------------------------------------------------- Turtle

  def parseTtlFile(path: String): Seq[Shape] =
    parseTtlGraph(TurtleParser.parseFile(path))

  /** Introspects a shapes graph — the Spark-free equivalent of the reference's
    * 9 rdflib SPARQL queries (ShapeParser.py:242-309). */
  def parseTtlGraph(g: Seq[Triple]): Seq[Shape] = {
    val sh = Rdf.sh
    def objsOf(s: Node, p: String): Seq[Node] =
      g.collect { case Triple(`s`, Iri(`p`), o) => o }
    def objOf(s: Node, p: String): Option[Node] = objsOf(s, p).headOption

    def collectList(head: Node): Seq[Node] = head match {
      case Iri(Rdf.rdfNil) => Nil
      case n =>
        val first = objOf(n, Rdf.rdfFirst)
        val rest = objOf(n, Rdf.rdfRest)
        first.toSeq ++ rest.map(collectList).getOrElse(Nil)
    }

    def parsePath(pathNode: Node): PathExpr = pathNode match {
      case Iri(v) if v != Rdf.rdfNil => DirectPath(v)
      case b: BNode =>
        objOf(b, sh + "inversePath") match {
          case Some(Iri(inv)) => InversePath(inv)
          case _ =>
            // sequence path as RDF collection
            val items = collectList(b).collect { case Iri(v) => v }
            SequencePath(items)
        }
      case other => sys.error(s"unsupported sh:path node: $other")
    }

    val shapeNodes = g.collect {
      case Triple(s, Iri(Rdf.rdfType), Iri(t)) if t == sh + "NodeShape" => s
    }.distinct

    shapeNodes.map { sn =>
      val name = Rdf.str(sn)
      val constraintsId = name + "_d1"
      val targetClass = objOf(sn, sh + "targetClass").map(Rdf.str)
      val targetNode = objOf(sn, sh + "targetNode").map(Rdf.str)
      // sh:targetQuery (non-standard reference extension) takes precedence
      // over the query synthesized from sh:targetClass
      // (reference core/ShapeParser.py:20-23, :164-169); only the restricted
      // class pattern is compilable — reject anything else at parse time
      // rather than silently scanning the wrong target set.
      val customQuery = objOf(sn, sh + "targetQuery").map(Rdf.str)
      customQuery.foreach { q =>
        if (TargetQuery.compile(q).isEmpty)
          sys.error(s"shape $name: unsupported sh:targetQuery (only " +
            s"'SELECT ?x WHERE { ?x a <C> }' is compilable): $q")
      }
      val targetQuery = customQuery.orElse(targetClass.map(TargetQuery.forClass))

      var ci = 0
      val cards = Seq.newBuilder[CardConstraint]
      for (prop <- objsOf(sn, sh + "property")) {
        ci += 1
        val id = s"${constraintsId}_c$ci"
        val path = objOf(prop, sh + "path").map(parsePath)
          .getOrElse(sys.error(s"shape $name: sh:property without sh:path"))
        def intOf(p: String): Option[Int] =
          objOf(prop, sh + p).map(n => Rdf.str(n).toInt)
        val min = intOf("minCount").orElse(intOf("qualifiedMinCount"))
        val max = intOf("maxCount").orElse(intOf("qualifiedMaxCount"))
        val shapeRef = objOf(prop, sh + "qualifiedValueShape")
          .flatMap(qvs => objOf(qvs, sh + "node").orElse(objOf(qvs, sh + "value")))
          .map(Rdf.str)
        val datatype = objOf(prop, sh + "datatype").map(Rdf.str)
        // A path with both bounds becomes TWO constraints (ShapeParser.py:537-544).
        min.foreach(m => cards += CardConstraint(id, path, min = m, shapeRef = shapeRef, datatype = datatype))
        max.foreach(m => cards += CardConstraint(id, path, max = m, shapeRef = shapeRef, datatype = datatype))
        if (min.isEmpty && max.isEmpty)
          sys.error(s"shape $name: unsupported constraint (no min/max) on ${path.render}")
      }

      var oi = 0
      val orGroups = objsOf(sn, sh + "or").map { head =>
        oi += 1
        val options = collectList(head).map { opt =>
          val path = objOf(opt, sh + "path").map(parsePath)
            .getOrElse(sys.error(s"shape $name: sh:or option without sh:path"))
          def intOf(p: String): Option[Int] = objOf(opt, sh + p).map(n => Rdf.str(n).toInt)
          CardConstraint(s"${constraintsId}_or$oi", path,
            min = intOf("minCount").getOrElse(-1),
            max = intOf("maxCount").getOrElse(-1))
        }
        OrGroup(s"${constraintsId}_or$oi", options)
      }

      var si = 0
      val sparqls = objsOf(sn, sh + "sparql").flatMap { c =>
        objOf(c, sh + "select").map { sel => si += 1
          SparqlConstraint(s"${constraintsId}_sparql$si", Rdf.str(sel))
        }
      }

      Shape(name, targetClass, targetNode, targetQuery, cards.result(), orGroups, sparqls)
    }
  }

  // ---------------------------------------------------------------- JSON

  private val mapper = new ObjectMapper()

  /** Legacy JSON shape format (ShapeParser.py:89-130). */
  def parseJsonFile(path: String): Shape = {
    val root = mapper.readTree(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
    val name = root.get("name").asText()
    val constraintsId = name + "_d1"
    val prefixes: Map[String, String] = Option(root.get("prefix")).map { p =>
      p.properties().asScala.map { e =>
        // prefix values are written like "<http://test.example.com/>"
        e.getKey -> e.getValue.asText().stripPrefix("<").stripSuffix(">")
      }.toMap
    }.getOrElse(Map.empty)

    def expand(term: String): String = {
      if (term.startsWith("<") && term.endsWith(">")) term.substring(1, term.length - 1)
      else {
        val idx = term.indexOf(':')
        if (idx > 0 && prefixes.contains(term.substring(0, idx)))
          prefixes(term.substring(0, idx)) + term.substring(idx + 1)
        else term
      }
    }

    val targetDef = Option(root.get("targetDef"))
    // normalize prefixed class terms in the target query to full-IRI form so
    // the validator's restricted compiler (TargetQuery) can consume it
    val targetQuery = targetDef.flatMap(t => Option(t.get("query")).map(_.asText())).map { q =>
      TargetQuery.classTerm(q) match {
        case Some(term) if !term.startsWith("<") => TargetQuery.forClass(expand(term))
        case _ => q
      }
    }
    val targetClass = targetDef.flatMap(t => Option(t.get("class")).map(n => expand(n.asText())))
    val targetNode = targetDef.flatMap(t => Option(t.get("node")).map(n => expand(n.asText())))

    val conj: JsonNode = root.get("constraintDef").get("conjunctions").get(0)
    val cards = Seq.newBuilder[CardConstraint]
    var ci = 0
    conj.elements().asScala.foreach { c =>
      ci += 1
      val id = s"${constraintsId}_c$ci"
      val rawPath = Option(c.get("path")).map(_.asText())
      val path: PathExpr = rawPath match {
        case Some(p) if p.startsWith("^") => InversePath(expand(p.substring(1)))
        case Some(p)                      => DirectPath(expand(p))
        case None                         => sys.error(s"shape $name: constraint without path")
      }
      val min = Option(c.get("min")).map(_.asInt())
      val max = Option(c.get("max")).map(_.asInt())
      val shapeRef = Option(c.get("shape")).map(_.asText())
      min.foreach(m => cards += CardConstraint(id, path, min = m, shapeRef = shapeRef))
      max.foreach(m => cards += CardConstraint(id, path, max = m, shapeRef = shapeRef))
    }

    Shape(name, targetClass, targetNode, targetQuery, cards.result(), Nil, Nil)
  }
}
