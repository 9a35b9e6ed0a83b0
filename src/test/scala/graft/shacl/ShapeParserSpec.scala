package graft.shacl

import org.scalatest.funsuite.AnyFunSuite

class ShapeParserSpec extends AnyFunSuite {

  test("TTL parsing: min+max on one path splits into two constraints") {
    val shapes = ShapeParser.parseTtlFile("src/test/resources/lubm/shapes/Department.ttl")
    val s = shapes.head
    // ub:name minCount 1 + maxCount 1 → two constraints with the same path
    val nameCs = s.constraints.filter(_.path.render.contains("univ-bench.owl#name"))
    assert(nameCs.size == 2 && nameCs.exists(_.isMin) && nameCs.exists(_.isMax))
    // subOrganizationOf qualifiedMin 1 + qualifiedMax 1 → same-ref pair ⇒
    // the max query is skipped and enforced during min interleaving
    assert(s.maxValidRefs == Map("http://example.org/UniversityShape" -> 1))
    assert(s.activeMaxConstraints.forall(_.shapeRef.isEmpty))
  }

  test("TTL parsing: qualifiedValueShape references and dependency graph") {
    val schema = ShapeParser.parseDir("src/test/resources/lubm/shapes")
    assert(schema.shapes.size == 5)
    val prof = schema.byId("http://example.org/FullProfessorShape")
    assert(prof.shapeRefs.toSet == Set(
      "http://example.org/DepartmentShape", "http://example.org/GraduateCourseShape"))
    assert(schema.inDegree("http://example.org/DepartmentShape") == 2) // prof + gradstudent
    // SCC order resolves referenced shapes first
    val order = schema.sccsInEvaluationOrder.flatten
    assert(order.indexOf("http://example.org/UniversityShape") <
      order.indexOf("http://example.org/DepartmentShape"))
  }

  test("lenient parseDir skips unparseable shape files with a warning (--force)") {
    val dir = java.nio.file.Files.createTempDirectory("lenient_shapes")
    val good = java.nio.file.Files.copy(
      java.nio.file.Paths.get("src/test/resources/lubm/shapes/Department.ttl"),
      dir.resolve("Department.ttl"))
    java.nio.file.Files.writeString(dir.resolve("Broken.ttl"),
      "@prefix sh: <http://www.w3.org/ns/shacl#> .\n<urn:x> sh:path ( broken")
    // strict: the malformed file aborts the whole schema
    assertThrows[Exception](ShapeParser.parseDir(dir.toString))
    // lenient (reference -f/--force): warn + skip, keep the good shape
    val schema = ShapeParser.parseDir(dir.toString, lenient = true)
    assert(schema.shapes.map(_.id) == Seq("http://example.org/DepartmentShape"))
    assert(good != null)
  }

  test("TTL sh:targetQuery overrides the synthesized target query") {
    val ttl =
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix ex: <http://ex.org/> .
        |ex:Q a sh:NodeShape ;
        |  sh:targetClass ex:Ignored ;
        |  sh:targetQuery "SELECT ?x WHERE { ?x a <http://ex.org/Actual> }" ;
        |  sh:property [ sh:path ex:p ; sh:minCount 1 ] .
        |""".stripMargin
    val s = ShapeParser.parseTtlGraph(graft.rdf.TurtleParser.parse(ttl)).head
    assert(s.targetQuery.contains("SELECT ?x WHERE { ?x a <http://ex.org/Actual> }"))
    assert(TargetQuery.compile(s.targetQuery.get).contains("http://ex.org/Actual"))
  }

  test("TTL sh:targetQuery outside the restricted pattern is rejected loudly") {
    val ttl =
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix ex: <http://ex.org/> .
        |ex:Q a sh:NodeShape ;
        |  sh:targetQuery "SELECT ?x WHERE { ?x ex:p ?y . ?y a <http://ex.org/C> }" ;
        |  sh:property [ sh:path ex:p ; sh:minCount 1 ] .
        |""".stripMargin
    val e = intercept[RuntimeException] {
      ShapeParser.parseTtlGraph(graft.rdf.TurtleParser.parse(ttl))
    }
    assert(e.getMessage.contains("unsupported sh:targetQuery"))
  }

  test("JSON target queries with prefixed classes normalize to full-IRI form") {
    val s = ShapeParser.parseJsonFile(
      "src/test/resources/cases/single_shape/case1/shapes/ClassA.json")
    assert(s.targetQuery.exists(_.contains("<http://test.example.com/ClassA>")),
      s"expected normalized query, got ${s.targetQuery}")
    assert(TargetQuery.compile(s.targetQuery.get).contains("http://test.example.com/ClassA"))
  }

  test("target node shapes parse and are skipped for target retrieval") {
    val ttl =
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix ex: <http://ex.org/> .
        |ex:N a sh:NodeShape ;
        |  sh:targetNode ex:TheOne ;
        |  sh:property [ sh:path ex:p ; sh:minCount 1 ] .
        |""".stripMargin
    val shapes = ShapeParser.parseTtlGraph(graft.rdf.TurtleParser.parse(ttl))
    val s = shapes.head
    assert(s.targetNode.contains("http://ex.org/TheOne"))
    assert(s.targetClass.isEmpty && s.targetQuery.isEmpty) // reference parity: no target query synthesized
  }

  test("JSON parsing: prefixes expand, inverse paths parse") {
    val s = ShapeParser.parseJsonFile(
      "src/test/resources/cases/inverse_path/case1/shapes/ClassA.json")
    assert(s.id == "ClassA")
    assert(s.targetClass.contains("http://test.example.com/ClassA"))
    assert(s.constraints.head.path == InversePath("http://test.example.com/toA"))
    assert(s.constraints.head.min == 2)
  }

  test("unsupported constraint is rejected loudly") {
    val ttl =
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix ex: <http://ex.org/> .
        |ex:S a sh:NodeShape ;
        |  sh:targetClass ex:C ;
        |  sh:property [ sh:path ex:p ; sh:nodeKind sh:IRI ] .
        |""".stripMargin
    val e = intercept[RuntimeException](ShapeParser.parseTtlGraph(graft.rdf.TurtleParser.parse(ttl)))
    assert(e.getMessage.contains("unsupported"))
  }
}
