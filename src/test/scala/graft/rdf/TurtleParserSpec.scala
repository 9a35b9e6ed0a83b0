package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

class TurtleParserSpec extends AnyFunSuite {
  private val test = "http://test.example.com/"

  test("parses the reference data fixture") {
    val triples = Rdf.toStringTriples(TurtleParser.parseFile("src/test/resources/data/test.ttl"))
    // 22 typed instances: 7 ClassA + 11 ClassB + 4 ClassC
    val typed = triples.filter(_.pred == Rdf.rdfType)
    assert(typed.size == 22)
    assert(typed.count(_.obj == s"${test}ClassA") == 7)
    assert(typed.count(_.obj == s"${test}ClassB") == 11)
    assert(typed.count(_.obj == s"${test}ClassC") == 4)
    // ClassA_Instance3 has 4 distinct property0 values
    val p0 = triples.filter(t => t.subj == s"${test}ClassA_Instance3" && t.pred == s"${test}property0")
    assert(p0.map(_.obj).distinct.size == 4)
    // numeric literal kept as lexical string
    assert(triples.exists(t => t.subj == s"${test}ClassA_Instance0" &&
      t.pred == s"${test}property1" && t.obj == "1989"))
    // decimal
    assert(triples.exists(t => t.subj == s"${test}ClassA_Instance4" && t.obj == "0.8"))
  }

  test("escape sequences unescape in a single left-to-right scan") {
    // backslash-backslash-n in the source = escaped backslash + literal n,
    // NOT a newline (the sequential-replace trap)
    val ttl = "@prefix : <http://e.org/> .\n" +
      ":s :p \"a\\\\nb\" .\n" +      // source text: a\\nb  → value: a\nb (backslash + n)
      ":s :q \"c\\nd\" .\n" +        // source text: c\nd   → value: c<newline>d
      ":s :r \"u\\u0041x\" .\n"      // A → A
    val ts = TurtleParser.parse(ttl)
    def lit(pred: String): String =
      ts.collectFirst { case Triple(_, Iri(p), Lit(v, _, _)) if p == s"http://e.org/$pred" => v }.get
    assert(lit("p") == "a\\nb", s"got ${lit("p").toList}")
    assert(lit("q") == "c\nd")
    assert(lit("r") == "uAx")
  }

  test("language tags are kept, not silently dropped") {
    val ttl = "@prefix : <http://e.org/> .\n:s :p \"hello\"@en .\n:s :p \"salut\"@fr-BE .\n:s :p \"plain\" .\n"
    val lits = TurtleParser.parse(ttl).collect { case Triple(_, _, l: Lit) => l }
    assert(lits.exists(l => l.value == "hello" && l.lang.contains("en") && l.datatype == Rdf.rdfLangString))
    assert(lits.exists(l => l.value == "salut" && l.lang.contains("fr-BE")))
    assert(lits.exists(l => l.value == "plain" && l.lang.isEmpty && l.datatype == Rdf.xsdString))
  }

  test("parses blank node property lists and collections") {
    val ttl =
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix : <http://ex.org/> .
        |:S a sh:NodeShape ;
        |  sh:or ( [ sh:path :p ; sh:minCount 1 ] [ sh:path :q ; sh:maxCount 0 ] ) ;
        |  sh:property [ sh:path [ sh:inversePath :r ] ; sh:minCount 2 ] .
        |""".stripMargin
    val triples = TurtleParser.parse(ttl)
    assert(triples.exists(t => t.pred.value == Rdf.rdfFirst))
    assert(triples.count(t => t.pred.value == Rdf.sh + "path") == 3)
    assert(triples.exists(t => t.pred.value == Rdf.sh + "inversePath"))
  }

  test("parses triple-quoted sparql select strings") {
    val q3 = "\"\"\""
    val ttl =
      s"""@prefix sh: <http://www.w3.org/ns/shacl#> .
         |@prefix : <http://ex.org/> .
         |:S a sh:NodeShape ;
         |  sh:sparql [ a sh:SPARQLConstraint ; sh:select $q3
         |    SELECT ($$this AS ?this) WHERE { $$this <http://ex.org/p> ?o FILTER( ?o > 2022 ) }
         |  $q3 ; ] .
         |""".stripMargin
    val triples = TurtleParser.parse(ttl)
    val sel = triples.find(_.pred.value == Rdf.sh + "select").get
    assert(sel.obj.value.contains("FILTER( ?o > 2022 )"))
  }

  test("N-Triples export round-trips through the Turtle parser") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rows = Seq(
      ("http://ex.org/s1", Rdf.rdfType, "http://ex.org/Person"),
      ("http://ex.org/s1", "http://ex.org/name", "Ada \"the\" Analyst\\1\nline2"),
      ("http://ex.org/s2", "http://ex.org/knows", "http://ex.org/s1"),
      ("http://ex.org/s2", "http://ex.org/note", "plain literal"))
    val nt = TripleStore.toNTriples(rows.toDF("subj", "pred", "obj"))
      .collect().map(_.getString(0)).sorted.mkString("\n")
    // escapes are serialized
    assert(nt.contains("\\\"the\\\"") && nt.contains("\\n") && nt.contains("\\\\1"))
    val back = Rdf.toStringTriples(TurtleParser.parse(nt))
      .map(t => (t.subj, t.pred, t.obj)).toSet
    assert(back == rows.toSet, s"round-trip mismatch:\n$nt\nparsed=$back")
  }

  test("N-Triples export emits only ABSOLUTE IRIs (grammar-valid IRIREF)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // bare engine ids carry no scheme — the exporter must base-prefix them,
    // because the N-Triples grammar (unlike Turtle) forbids relative IRIs
    val rows = Seq(
      ("c1", Rdf.rdfType, "Customer"),
      ("c1", "hasOrder", "o7"),
      ("http://ex.org/s", "http://ex.org/p", "http://ex.org/o"))
    val lines = TripleStore.toNTriples(rows.toDF("subj", "pred", "obj"))
      .collect().map(_.getString(0))
    val iri = "<[A-Za-z][A-Za-z0-9+.-]*:[^>]*>"
    val lineRe = (s"^$iri $iri ($iri|\"[^\"]*\") \\.$$").r
    lines.foreach(l => assert(lineRe.findFirstIn(l).isDefined, s"not grammar-valid N-Triples: $l"))
    assert(lines.contains("<urn:graft:c1> <urn:graft:hasOrder> \"o7\" ."))
    // already-absolute IRIs pass through un-prefixed
    assert(lines.contains("<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> ."))
    assert(lines.exists(_.contains(s"<${Rdf.rdfType}>")))
  }

  test("parses the LUBM example fixture") {
    val triples = Rdf.toStringTriples(TurtleParser.parseFile("src/test/resources/lubm/LUBM.ttl"))
    assert(triples.nonEmpty)
    val ub = "http://swat.cse.lehigh.edu/onto/univ-bench.owl#"
    assert(triples.exists(t => t.pred == Rdf.rdfType && t.obj == s"${ub}FullProfessor"))
    assert(triples.exists(t => t.pred == s"${ub}emailAddress"))
  }
}
