package graft.rdf

import scala.collection.mutable

/** Recursive-descent parser for the Turtle subset used by SHACL shape files
  * and the small RDF data fixtures of the reference test suite
  * (reference grammar coverage: the reference test-case shape files,
  * tests/data/test.ttl, example/shapes/LUBM, example/data/raw/LUBM.ttl).
  *
  * Supported: @prefix directives, prefixed names, IRIREFs, `a`,
  * `;`/`,` continuation lists, blank-node property lists `[ … ]`,
  * RDF collections `( … )` (for `sh:or`), single/triple-quoted string
  * literals with optional language tag or datatype, integer/decimal/boolean
  * literals, `#` comments.
  *
  * This is a from-scratch implementation (no rdflib); the reference delegates
  * all of this to rdflib (TravSHACL/core/ShapeParser.py:72-77).
  */
object TurtleParser {

  def parseFile(path: String): Vector[Triple] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def parse(input: String): Vector[Triple] = new Parser(input).parseDocument()

  private final class Parser(in: String) {
    private var pos = 0
    private val prefixes = mutable.Map[String, String]()
    private val out = Vector.newBuilder[Triple]
    private var bnodeCounter = 0

    def parseDocument(): Vector[Triple] = {
      skipWs()
      while (pos < in.length) {
        if (peekKeyword("@prefix")) parsePrefix()
        else if (peekKeyword("@base")) sys.error("@base not supported")
        else parseStatement()
        skipWs()
      }
      out.result()
    }

    private def parsePrefix(): Unit = {
      expectKeyword("@prefix")
      skipWs()
      val label = readUntil(':')
      expect(':')
      skipWs()
      val iri = parseIriRef()
      skipWs()
      expect('.')
      prefixes(label) = iri
    }

    private def parseStatement(): Unit = {
      val subj = parseSubject()
      skipWs()
      parsePredicateObjectList(subj)
      skipWs()
      expect('.')
    }

    private def parseSubject(): Node = {
      skipWs()
      in.charAt(pos) match {
        case '<' => Iri(parseIriRef())
        case '[' => parseBlankNodePropertyList()
        case _   => parsePrefixedNameOrA() match {
          case i: Iri => i
          case other  => other
        }
      }
    }

    private def parsePredicateObjectList(subj: Node): Unit = {
      var done = false
      while (!done) {
        skipWs()
        val pred = parsePredicate()
        var moreObjects = true
        while (moreObjects) {
          skipWs()
          val obj = parseObject()
          out += Triple(subj, pred, obj)
          skipWs()
          if (pos < in.length && in.charAt(pos) == ',') { pos += 1 } else moreObjects = false
        }
        skipWs()
        if (pos < in.length && in.charAt(pos) == ';') {
          pos += 1
          skipWs()
          // a ';' may be dangling before '.' or ']'
          if (pos < in.length && (in.charAt(pos) == '.' || in.charAt(pos) == ']')) done = true
        } else done = true
      }
    }

    private def parsePredicate(): Iri = {
      skipWs()
      if (in.charAt(pos) == '<') Iri(parseIriRef())
      else parsePrefixedNameOrA() match {
        case i: Iri => i
        case other  => sys.error(s"predicate must be an IRI, got $other at $pos")
      }
    }

    private def parseObject(): Node = {
      skipWs()
      in.charAt(pos) match {
        case '<'                          => Iri(parseIriRef())
        case '['                          => parseBlankNodePropertyList()
        case '('                          => parseCollection()
        case '"'                          => parseStringLiteral()
        case c if c.isDigit || c == '-' || c == '+' => parseNumericLiteral()
        case _ =>
          if (peekKeyword("true")) { pos += 4; Lit("true", Rdf.xsdBoolean) }
          else if (peekKeyword("false")) { pos += 5; Lit("false", Rdf.xsdBoolean) }
          else parsePrefixedNameOrA()
      }
    }

    private def parseBlankNodePropertyList(): BNode = {
      expect('[')
      bnodeCounter += 1
      val b = BNode(s"b$bnodeCounter")
      skipWs()
      if (in.charAt(pos) != ']') parsePredicateObjectList(b)
      skipWs()
      expect(']')
      b
    }

    private def parseCollection(): Node = {
      expect('(')
      skipWs()
      val items = mutable.ArrayBuffer[Node]()
      while (in.charAt(pos) != ')') {
        items += parseObject()
        skipWs()
      }
      expect(')')
      if (items.isEmpty) Iri(Rdf.rdfNil)
      else {
        // Build the rdf:first/rdf:rest chain.
        val cells = items.map { _ => bnodeCounter += 1; BNode(s"b$bnodeCounter") }
        for (i <- items.indices) {
          out += Triple(cells(i), Iri(Rdf.rdfFirst), items(i))
          val rest: Node = if (i == items.length - 1) Iri(Rdf.rdfNil) else cells(i + 1)
          out += Triple(cells(i), Iri(Rdf.rdfRest), rest)
        }
        cells.head
      }
    }

    private def parseStringLiteral(): Lit = {
      val lexical =
        if (in.startsWith("\"\"\"", pos)) {
          pos += 3
          val end = in.indexOf("\"\"\"", pos)
          if (end < 0) sys.error("unterminated long string")
          val s = in.substring(pos, end)
          pos = end + 3
          unescape(s)
        } else {
          expect('"')
          val sb = new StringBuilder
          while (in.charAt(pos) != '"') {
            if (in.charAt(pos) == '\\') { sb.append(in.charAt(pos)); pos += 1 }
            sb.append(in.charAt(pos)); pos += 1
          }
          expect('"')
          unescape(sb.toString)
        }
      // optional language tag or datatype — a language-tagged literal is
      // rdf:langString carrying its tag (conflating it with a plain string
      // would lose information round-tripping shapes graphs)
      if (pos < in.length && in.charAt(pos) == '@') {
        pos += 1
        val tag = readWhile(c => c.isLetterOrDigit || c == '-')
        Lit(lexical, Rdf.rdfLangString, Some(tag))
      } else if (pos + 1 < in.length && in.charAt(pos) == '^' && in.charAt(pos + 1) == '^') {
        pos += 2
        val dt = if (in.charAt(pos) == '<') parseIriRef() else parsePrefixedNameOrA().value
        Lit(lexical, dt)
      } else Lit(lexical, Rdf.xsdString)
    }

    /** Single left-to-right scan — sequential String.replace calls corrupt
      * inputs like backslash-backslash-n (an ESCAPED backslash followed by a
      * literal n), turning them into a newline. */
    private def unescape(s: String): String = {
      if (s.indexOf('\\') < 0) return s
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '"' => sb.append('"'); i += 2
            case '\'' => sb.append('\''); i += 2
            case '\\' => sb.append('\\'); i += 2
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case 'U' =>
              sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
            case other => sb.append(other); i += 2 // unknown escape: keep char
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private def parseNumericLiteral(): Lit = {
      val start = pos
      if (in.charAt(pos) == '-' || in.charAt(pos) == '+') pos += 1
      readWhile(_.isDigit)
      var isDecimal = false
      if (pos < in.length && in.charAt(pos) == '.' && pos + 1 < in.length && in.charAt(pos + 1).isDigit) {
        isDecimal = true
        pos += 1
        readWhile(_.isDigit)
      }
      val lex = in.substring(start, pos)
      Lit(lex, if (isDecimal) Rdf.xsdDecimal else Rdf.xsdInteger)
    }

    private def parsePrefixedNameOrA(): Iri = {
      val start = pos
      val tok = readWhile(c => !c.isWhitespace && c != ';' && c != ',' && c != ')' && c != ']' && !(c == '.' && isEndDot))
      if (tok == "a") Iri(Rdf.rdfType)
      else {
        val idx = tok.indexOf(':')
        if (idx < 0) sys.error(s"expected prefixed name at $start, got '$tok'")
        val (p, local) = (tok.substring(0, idx), tok.substring(idx + 1))
        val base = prefixes.getOrElse(p, sys.error(s"unknown prefix '$p:' at $start"))
        Iri(base + local)
      }
    }

    /** A '.' terminates a token only if followed by whitespace/EOF (so IRIs
      * local names with dots — rare — would need <> syntax; fixtures don't use them). */
    private def isEndDot: Boolean =
      pos + 1 >= in.length || in.charAt(pos + 1).isWhitespace || in.charAt(pos + 1) == '#'

    private def parseIriRef(): String = {
      expect('<')
      val s = readUntil('>')
      expect('>')
      s
    }

    private def skipWs(): Unit = {
      var go = true
      while (go && pos < in.length) {
        val c = in.charAt(pos)
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (pos < in.length && in.charAt(pos) != '\n') pos += 1 }
        else go = false
      }
    }

    private def peekKeyword(k: String): Boolean = in.startsWith(k, pos)
    private def expectKeyword(k: String): Unit =
      if (peekKeyword(k)) pos += k.length else sys.error(s"expected '$k' at $pos")
    private def expect(c: Char): Unit =
      if (pos < in.length && in.charAt(pos) == c) pos += 1
      else sys.error(s"expected '$c' at $pos (found '${if (pos < in.length) in.charAt(pos) else "EOF"}')")
    private def readUntil(c: Char): String = {
      val start = pos
      while (pos < in.length && in.charAt(pos) != c) pos += 1
      in.substring(start, pos)
    }
    private def readWhile(f: Char => Boolean): String = {
      val start = pos
      while (pos < in.length && f(in.charAt(pos))) pos += 1
      in.substring(start, pos)
    }
  }
}
