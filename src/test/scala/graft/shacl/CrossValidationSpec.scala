package graft.shacl

import graft.SparkTestBase
import graft.rdf.{Rdf, STriple, TripleStore}

import scala.util.Random

/** Cross-validates the Spark set-algebra validator against the literal
  * in-memory port of the reference algorithm (OracleValidator) on RANDOM
  * shape schemas — including cyclic reference networks — over random small
  * graphs. This guards the well-founded-model distillation (SURVEY.md §4.3)
  * on inputs far outside the fixed golden corpus.
  */
class CrossValidationSpec extends SparkTestBase {
  private val ns = "http://x.example.org/"

  private def randomSchema(rnd: Random): ShapeSchema = {
    val nShapes = 2 + rnd.nextInt(3)
    val shapes = (0 until nShapes).map { i =>
      val id = ns + s"S$i"
      val cls = ns + s"C$i"
      val nCons = rnd.nextInt(3)
      val cons = (0 until nCons).map { j =>
        val p = ns + s"p${rnd.nextInt(4)}"
        val path: PathExpr = if (rnd.nextInt(4) == 0) InversePath(p) else DirectPath(p)
        val ref = if (rnd.nextBoolean()) Some(ns + s"S${rnd.nextInt(nShapes)}") else None
        if (rnd.nextBoolean()) CardConstraint(s"c$i$j", path, min = 1 + rnd.nextInt(2), shapeRef = ref)
        else CardConstraint(s"c$i$j", path, max = rnd.nextInt(3), shapeRef = ref)
      }
      // occasionally add an sh:or group of local cardinality options
      val orGroups = if (rnd.nextInt(3) == 0) Seq(OrGroup(s"or$i", Seq(
        CardConstraint(s"or${i}a", DirectPath(ns + s"p${rnd.nextInt(4)}"), min = 1),
        CardConstraint(s"or${i}b", DirectPath(ns + s"p${rnd.nextInt(4)}"), max = rnd.nextInt(2))
      ))) else Nil
      // occasionally add a restricted sh:sparql constraint over numeric objects
      val sparqls = if (rnd.nextInt(3) == 0) Seq(SparqlConstraint(s"sp$i",
        s"SELECT ($$this AS ?this) WHERE { $$this <${ns}num> ?o FILTER( ?o > ${2000 + rnd.nextInt(20)} ) }"))
      else Nil
      Shape(id, Some(cls), None, Some(s"SELECT ?x WHERE { ?x a <$cls> }"), cons, orGroups, sparqls)
    }
    ShapeSchema(shapes)
  }

  private def randomGraph(rnd: Random, schema: ShapeSchema): Seq[STriple] = {
    val perClass = 4 + rnd.nextInt(5)
    val instances = schema.shapes.zipWithIndex.flatMap { case (s, i) =>
      (0 until perClass).map { k =>
        val inst = ns + s"i${i}_$k"
        (inst, s.targetClass.get)
      }
    }
    val typeTriples = instances.map { case (inst, cls) => STriple(inst, Rdf.rdfType, cls) }
    val all = instances.map(_._1)
    val edges = (0 until all.size * 3).map { _ =>
      STriple(all(rnd.nextInt(all.size)), ns + s"p${rnd.nextInt(4)}", all(rnd.nextInt(all.size)))
    } ++ (0 until all.size).map { _ => // literal-ish objects too
      STriple(all(rnd.nextInt(all.size)), ns + s"p${rnd.nextInt(4)}", s"lit${rnd.nextInt(6)}")
    } ++ (0 until all.size).map { _ => // numeric literals for sparql constraints
      STriple(all(rnd.nextInt(all.size)), ns + "num", (1990 + rnd.nextInt(40)).toString)
    }
    (typeTriples ++ edges).distinct
  }

  for (seed <- Seq(3L, 11L, 23L, 57L, 101L, 223L, 407L, 911L)) {
    test(s"random schema/graph: Spark validator matches the reference-algorithm oracle (seed=$seed)") {
      val rnd = new Random(seed)
      val schema = randomSchema(rnd)
      val data = randomGraph(rnd, schema)

      val orderA = Traversal.plan(schema, Traversal.DFS)
      val orderB = Traversal.plan(schema, Traversal.BFS)
      val (oValidA, oInvalidA) = OracleValidator.validate(schema, data, orderA)
      val (oValidB, oInvalidB) = OracleValidator.validate(schema, data, orderB)
      // the reference algorithm itself must be planner-invariant
      assert(oValidA == oValidB && oInvalidA == oInvalidB,
        s"oracle not order-invariant: DFS=$orderA BFS=$orderB")

      val triples = TripleStore.fromTriples(spark, data)
      val result = new Validator(spark, triples, schema).run()
      val sValid = result.verdicts.values.flatMap(_.validFinal.collect().map(_.getString(0))).toSet
      val sInvalid = result.verdicts.values.flatMap(_.invalid.collect().map(_.getString(0))).toSet

      assert(sValid == oValidA,
        s"valid mismatch: onlySpark=${sValid -- oValidA} onlyOracle=${oValidA -- sValid}")
      assert(sInvalid == oInvalidA,
        s"invalid mismatch: onlySpark=${sInvalid -- oInvalidA} onlyOracle=${oInvalidA -- sInvalid}")
    }
  }

  // Skipped-max bound inside a dependency cycle: S0 has min 1 AND max 1 over
  // the SAME referenced shape S1 (so the max query is skipped and the bound
  // enforced by counting valid refs — core/Shape.py:206-222), while S1
  // references S0 back, putting both in one cyclic SCC. The valid-ref count
  // a focus sees GROWS across fixpoint iterations — the case where an
  // unguarded isT would flip to F later (non-monotone). Cross-validated
  // against the literal reference-algorithm port.
  for (seed <- Seq(5L, 17L, 29L, 83L, 131L, 257L)) {
    test(s"skipped-max bound inside a cycle matches the oracle (seed=$seed)") {
      val rnd = new Random(seed)
      val s0 = ns + "S0"; val s1 = ns + "S1"
      val schema = ShapeSchema(Seq(
        Shape(s0, Some(ns + "C0"), None, Some(s"SELECT ?x WHERE { ?x a <${ns}C0> }"),
          Seq(CardConstraint("c00", DirectPath(ns + "p0"), min = 1, shapeRef = Some(s1)),
            CardConstraint("c01", DirectPath(ns + "p0"), max = 1, shapeRef = Some(s1))), Nil, Nil),
        Shape(s1, Some(ns + "C1"), None, Some(s"SELECT ?x WHERE { ?x a <${ns}C1> }"),
          Seq(CardConstraint("c10", DirectPath(ns + "p1"), min = 1, shapeRef = Some(s0))), Nil, Nil)))
      val data = randomGraph(rnd, schema)

      val order = Traversal.plan(schema, Traversal.DFS)
      val (oValid, oInvalid) = OracleValidator.validate(schema, data, order)
      val triples = TripleStore.fromTriples(spark, data)
      val result = new Validator(spark, triples, schema).run()
      val sValid = result.verdicts.values.flatMap(_.validFinal.collect().map(_.getString(0))).toSet
      val sInvalid = result.verdicts.values.flatMap(_.invalid.collect().map(_.getString(0))).toSet
      assert(sValid == oValid,
        s"valid mismatch: onlySpark=${sValid -- oValid} onlyOracle=${oValid -- sValid}")
      assert(sInvalid == oInvalid,
        s"invalid mismatch: onlySpark=${sInvalid -- oInvalid} onlyOracle=${oInvalid -- sInvalid}")
    }
  }

  test("golden-style: TTL sh:targetQuery shape validates like its targetClass twin") {
    // single_shape/case1 re-expressed with ONLY a custom target query (no
    // sh:targetClass) — the A3 extension path must reproduce the ground truth
    val test = "http://test.example.com/"
    val ttl =
      s"""@prefix sh: <http://www.w3.org/ns/shacl#> .
         |@prefix test: <$test> .
         |@prefix : <${test}shapes/> .
         |:ClassA a sh:NodeShape ;
         |  sh:targetQuery "SELECT ?x WHERE { ?x a <${test}ClassA> }" ;
         |  sh:property [ sh:path test:property0 ; sh:minCount 1 ] .
         |""".stripMargin
    val schema = ShapeSchema(ShapeParser.parseTtlGraph(graft.rdf.TurtleParser.parse(ttl)))
    val triples = TripleStore.fromTurtleFile(spark, resource("data/test.ttl"))
    val result = new Validator(spark, triples, schema).run()
    val valid = result.valid(test + "shapes/ClassA").collect().map(_.getString(0)).toSet
    val invalid = result.invalid(test + "shapes/ClassA").collect().map(_.getString(0)).toSet
    assert(valid == Set(0, 1, 2, 3).map(i => s"${test}ClassA_Instance$i"))
    assert(invalid == Set(4, 5, 6).map(i => s"${test}ClassA_Instance$i"))
  }

  test("oracle reproduces a golden recursion case (sanity anchor)") {
    // recursion/case1a: self-referential qualifiedMinCount 1 over test:toA
    val test = "http://test.example.com/"
    val schema = ShapeSchema(Seq(
      Shape(test + "shapes/ClassA", Some(test + "ClassA"), None,
        Some(s"SELECT ?x WHERE { ?x a <${test}ClassA> }"),
        Seq(CardConstraint("c1", DirectPath(test + "toA"), min = 1,
          shapeRef = Some(test + "shapes/ClassA"))), Nil, Nil)))
    val data = graft.rdf.Rdf.toStringTriples(
      graft.rdf.TurtleParser.parseFile(resource("data/test.ttl")))
    val (valid, invalid) = OracleValidator.validate(schema, data, Seq(test + "shapes/ClassA"))
    assert(valid == Set(0, 1, 2, 3, 6).map(i => s"${test}ClassA_Instance$i"))
    assert(invalid == Set(4, 5).map(i => s"${test}ClassA_Instance$i"))
  }
}
