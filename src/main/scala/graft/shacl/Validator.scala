package graft.shacl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf.Rdf

/** Configuration knobs with reference parity (main.py:20-53). `selective` and
  * the traversal/heuristic knobs do not change verdicts (the reference test
  * grid asserts exactly this invariance); they shape the execution plan.
  */
final case class ValidatorConfig(
    selective: Boolean = true,
    traversal: Traversal.Value = Traversal.DFS,
    heuristics: Traversal.Heuristics = Traversal.DefaultHeuristics,
    maxIterations: Int = 1000
)

/** Per-shape verdict state. `validFinal = targets ∖ invalid` (includes
  * fixpoint-undefined instances — the reference classifies targets that
  * remain unresolved at termination as valid, Validation.py:70-72,607).
  * `strictValid` is the subset PROVEN valid by saturation; downstream
  * max-cardinality constraints must count only these (a max-violation needs
  * max+1 proven-valid neighbors, Validation.py:473-527).
  */
final case class ShapeVerdict(targets: DataFrame, strictValid: DataFrame, invalid: DataFrame) {
  def validFinal: DataFrame = targets.join(invalid, Seq("focus"), "left_anti")
}

final case class ValidationResult(
    verdicts: Map[String, ShapeVerdict],
    nodeOrder: Seq[String],
    stats: ValidationStats
) {
  def valid(shapeId: String): DataFrame = verdicts(shapeId).validFinal
  def invalid(shapeId: String): DataFrame = verdicts(shapeId).invalid

  /** Release cached verdict/target frames once consumers have materialized
    * their outputs — long-lived sessions running many validations would
    * otherwise accumulate executor storage. */
  def unpersist(): Unit = verdicts.values.foreach { v =>
    v.targets.unpersist(); v.strictValid.unpersist(); v.invalid.unpersist()
  }
}

final class ValidationStats {
  var fixpointIterations: Int = 0
  var sccCount: Int = 0
  var cyclicSccCount: Int = 0
}

/** Spark-native SHACL validation over a string triple table
  * `(subj, pred, obj)`.
  *
  * This re-expresses the reference's SPARQL-query-generating validator
  * (TravSHACL/rule_based_validation/Validation.py) as declarative DataFrame
  * algebra: target scans are filters (A1), min/max cardinality queries are
  * `groupBy(subj).agg(countDistinct(obj))` aggregations (A4/A5), inter-shape
  * references are joins against neighbor verdict sets (A8/A9), and the
  * interleaving + 3-valued saturation (B8, B10-B12) collapses into a
  * per-strongly-connected-component fixpoint over monotonically growing
  * proven-valid (T) / proven-invalid (F) sets, with unresolved instances (U)
  * reported valid at termination — the well-founded-model semantics the
  * reference's per-binding grounding computes (derivation in SURVEY.md §4.3).
  *
  * Final per-shape verdict (equivalent to Shape rule
  * `S(x) ← Smin(x) ∧ ¬Smax₁(x) ∧ …`, core/Shape.py:187-191):
  *   - ref'd min m over R:  T needs countDistinct(obj ∈ strictValid(R)) ≥ m;
  *                          F iff countDistinct(obj ∈ targets(R)∖invalid(R)) < m
  *   - ref'd max m over R:  F iff countDistinct(obj ∈ strictValid(R)) ≥ m+1;
  *                          T needs countDistinct(obj ∈ targets(R)∖invalid(R)) ≤ m
  *   - skipped max queries (same shape referenced by min AND max,
  *     core/Shape.py:206-222): F iff valid refs on the min paths exceed the bound
  *   - local constraints, sh:or groups and sh:sparql constraints are 2-valued.
  */
final class Validator(
    spark: SparkSession,
    triples: DataFrame,
    schema: ShapeSchema,
    config: ValidatorConfig = ValidatorConfig()
) {
  import spark.implicits._

  private val stats = new ValidationStats

  /** Edges for a path: (focus, o). Inverse paths swap subject/object
    * (ShapeParser.py:507-511); sequence paths are opaque and match nothing
    * (parity with the reference generator, which never expands them). */
  private def pathEdges(path: PathExpr): DataFrame = path match {
    case DirectPath(p)  => triples.filter($"pred" === p).select($"subj".as("focus"), $"obj".as("o"))
    case InversePath(p) => triples.filter($"pred" === p).select($"obj".as("focus"), $"subj".as("o"))
    case SequencePath(_) => spark.emptyDataset[(String, String)].toDF("focus", "o")
  }

  /** A1 target scan: `SELECT ?x WHERE { ?x a <C> }`. */
  def targetsOf(shape: Shape): DataFrame = shape.targetClass match {
    case Some(cls) =>
      triples.filter($"pred" === Rdf.rdfType && $"obj" === cls)
        .select($"subj".as("focus")).distinct()
    case None => spark.emptyDataset[String].toDF("focus")
  }

  /** Local (non-referencing) cardinality failures within the target set:
    * min m fails iff countDistinct < m, max m fails iff countDistinct > m
    * (absence counts as 0 — the reference's max query would simply return no
    * binding and the min query excludes the focus node). */
  private def localCardInvalid(shape: Shape, targets: DataFrame): DataFrame = {
    val locals = shape.constraints.filter(_.shapeRef.isEmpty)
    if (locals.isEmpty) return emptyFocus()
    val counted = locals.zipWithIndex.map { case (c, i) =>
      val cnt = pathEdges(c.path)
        .join(targets, Seq("focus"), "left_semi")
        .groupBy($"focus").agg(countDistinct($"o").as(s"c$i"))
      (c, i, cnt)
    }
    var df = targets
    counted.foreach { case (_, i, cnt) => df = df.join(cnt, Seq("focus"), "left") }
    val fail = counted.map { case (c, i, _) =>
      val cc = coalesce(col(s"c$i"), lit(0L))
      if (c.isMin) cc < c.min else cc > c.max
    }.reduce(_ || _)
    df.filter(fail).select($"focus")
  }

  /** sh:or handling (A11 + Validation.py:114-126): targets not satisfying
    * EVERY or-group (each group = disjunction of local cardinality options)
    * are invalid — unless the or-query result is empty, in which case the
    * reference skips or-filtering entirely (`if pending_val:` guard). */
  private def orInvalid(shape: Shape, targets: DataFrame): DataFrame = {
    if (shape.orGroups.isEmpty) return emptyFocus()
    val groupSets = shape.orGroups.map { g =>
      val optionSets = g.options.map { opt =>
        val cnt = pathEdges(opt.path).join(targets, Seq("focus"), "left_semi")
          .groupBy($"focus").agg(countDistinct($"o").as("c"))
        if (opt.isMin) cnt.filter($"c" >= opt.min).select($"focus")
        else // max options wrap the pattern in OPTIONAL: zero-count focus nodes pass
          targets.join(cnt.filter($"c" > opt.max), Seq("focus"), "left_anti")
      }
      optionSets.reduce(_ union _).distinct()
    }
    val orSet = groupSets.reduce((a, b) => a.join(b, Seq("focus"), "left_semi"))
      .localCheckpoint(true)
    if (orSet.isEmpty) emptyFocus()
    else targets.join(orSet, Seq("focus"), "left_anti")
  }

  /** A12: sh:sparql violations — the reference's one-query-per-instance loop
    * becomes a single filter + semi-join. */
  private def sparqlInvalid(shape: Shape, targets: DataFrame): DataFrame = {
    if (shape.sparqlConstraints.isEmpty) return emptyFocus()
    val violators = shape.sparqlConstraints.map { sc =>
      SparqlSelect.compile(sc.select) match {
        case FilterCompare(pred, op, const) =>
          val o = $"obj".cast("double")
          val cmp = op match {
            case ">" => o > const; case "<" => o < const
            case ">=" => o >= const; case "<=" => o <= const
            case "=" => o === const; case "!=" => o =!= const
          }
          triples.filter($"pred" === pred && cmp).select($"subj".as("focus")).distinct()
        case HasValue(pred, obj) =>
          triples.filter($"pred" === pred && $"obj" === obj).select($"subj".as("focus")).distinct()
      }
    }.reduce(_ union _)
    targets.join(violators, Seq("focus"), "left_semi")
  }

  private def emptyFocus(): DataFrame = spark.emptyDataset[String].toDF("focus")

  /** Typed edges for a referencing constraint: objects restricted to instances
    * of the referenced shape's target class (A8 `$inter_shape_type_to_add$`,
    * InstancesRetrieval.py:207-217). */
  private def refEdges(c: CardConstraint, refTargets: DataFrame): DataFrame =
    pathEdges(c.path).join(refTargets.withColumnRenamed("focus", "o"), Seq("o"), "left_semi")

  // ------------------------------------------------------------------ run

  def run(): ValidationResult = {
    val nodeOrder = Traversal.plan(schema, config.traversal, config.heuristics)
    val cyclicIds: Set[String] =
      schema.sccsInEvaluationOrder.filter(schema.isCyclic).flatten.toSet

    /** Shapes inside a cyclic SCC get eager checkpoints (their artifacts are
      * re-joined every fixpoint round and the growing lineage must be cut);
      * acyclic shapes stay LAZY — one Catalyst plan per shape, materialized
      * only when a parent or the final report consumes it. */
    def pin(id: String, df: DataFrame): DataFrame =
      if (cyclicIds.contains(id)) df.localCheckpoint(true) else df.persist()

    // Static per-shape artifacts
    val targets: Map[String, DataFrame] = schema.shapes.map { s =>
      s.id -> pin(s.id, targetsOf(s))
    }.toMap

    val invalid0: Map[String, DataFrame] = schema.shapes.map { s =>
      val t = targets(s.id)
      val inv = localCardInvalid(s, t)
        .union(orInvalid(s, t))
        .union(sparqlInvalid(s, t))
        .distinct()
      s.id -> pin(s.id, inv)
    }.toMap

    // ref-constraint edge sets, computed once (joined against evolving verdicts)
    val refMinEdges: Map[String, Seq[(CardConstraint, DataFrame)]] = schema.shapes.map { s =>
      s.id -> s.minConstraints.filter(_.shapeRef.isDefined).map { c =>
        val r = c.shapeRef.get
        val e = refEdges(c, targets.getOrElse(r, emptyFocus()))
          .join(targets(s.id), Seq("focus"), "left_semi").distinct()
        (c, pin(s.id, e))
      }
    }.toMap
    val refMaxEdges: Map[String, Seq[(CardConstraint, DataFrame)]] = schema.shapes.map { s =>
      s.id -> s.activeMaxConstraints.filter(_.shapeRef.isDefined).map { c =>
        val r = c.shapeRef.get
        val e = refEdges(c, targets.getOrElse(r, emptyFocus()))
          .join(targets(s.id), Seq("focus"), "left_semi").distinct()
        (c, pin(s.id, e))
      }
    }.toMap
    // Skipped max queries: bound enforced over the min constraints' paths
    // referencing the same shape (Validation.py:317-325 counts atoms from min
    // query bindings, deduplicated per referenced instance).
    val skippedMaxEdges: Map[String, Seq[(String, Int, DataFrame)]] = schema.shapes.map { s =>
      s.id -> s.maxValidRefs.toSeq.map { case (refShape, bound) =>
        val minPaths = s.minConstraints.filter(_.shapeRef.contains(refShape))
        val e = minPaths.map(c => refEdges(c, targets.getOrElse(refShape, emptyFocus())))
          .reduceOption(_ union _).getOrElse(emptyFocus().withColumn("o", lit("")))
          .join(targets(s.id), Seq("focus"), "left_semi").distinct()
        (refShape, bound, pin(s.id, e))
      }
    }.toMap

    // Verdict state (T = strictValid, F = invalid), evolving per SCC.
    val state = scala.collection.mutable.Map[String, ShapeVerdict]()
    def curT(id: String): DataFrame = state.get(id).map(_.strictValid).getOrElse(emptyFocus())

    /** One evaluation pass of shape `s` against the current T/F state.
      * Returns (newStrictValid, newInvalid). */
    def evalShape(s: Shape): (DataFrame, DataFrame) = {
      val t = targets(s.id)
      val inv0 = invalid0(s.id)
      val base = t.join(inv0, Seq("focus"), "left_anti")

      var cur = base
      val fConds = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column]()
      val tConds = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column]()
      var idx = 0

      /** One shuffle per ref constraint: left-join the referenced shape's
        * T/F verdict sets onto the typed edges and aggregate cntT, cntF and
        * the total typed-object count together. nonF = tot - cntF. */
      def joinStats(edges: DataFrame, refId: String): (String, String, String) = {
        idx += 1
        val (tc, fc, tot) = (s"cntT$idx", s"cntF$idx", s"tot$idx")
        val tSet = curT(refId).withColumnRenamed("focus", "o").withColumn("__t", lit(true))
        val fSet = state.get(refId).map(_.invalid).getOrElse(emptyFocus())
          .withColumnRenamed("focus", "o").withColumn("__f", lit(true))
        val st = edges
          .join(tSet, Seq("o"), "left")
          .join(fSet, Seq("o"), "left")
          .groupBy($"focus").agg(
            // edges are distinct (focus, o) pairs, so plain conditional
            // counts suffice — avoids the multi-countDistinct expand plan
            count(when($"__t", $"o")).as(tc),
            count(when($"__f", $"o")).as(fc),
            count($"o").as(tot))
        cur = cur.join(st, Seq("focus"), "left")
        (tc, fc, tot)
      }

      refMinEdges(s.id).foreach { case (c, e) =>
        val (tc, fc, tot) = joinStats(e, c.shapeRef.get)
        val nonF = coalesce(col(tot), lit(0L)) - coalesce(col(fc), lit(0L))
        fConds += (nonF < c.min)
        tConds += (coalesce(col(tc), lit(0L)) >= c.min)
      }
      refMaxEdges(s.id).foreach { case (c, e) =>
        val (tc, fc, tot) = joinStats(e, c.shapeRef.get)
        val nonF = coalesce(col(tot), lit(0L)) - coalesce(col(fc), lit(0L))
        fConds += (coalesce(col(tc), lit(0L)) >= c.max + 1)
        tConds += (nonF <= c.max)
      }
      skippedMaxEdges(s.id).foreach { case (refShape, bound, e) =>
        val (tc, _, _) = joinStats(e, refShape)
        fConds += (coalesce(col(tc), lit(0L)) > bound)
      }

      val isF = fConds.reduceOption(_ || _).getOrElse(lit(false))
      val isT = !isF && tConds.reduceOption(_ && _).getOrElse(lit(true))

      var marked = cur.withColumn("__isF", isF).withColumn("__isT", isT)
        .select($"focus", $"__isF", $"__isT")
      if (cyclicIds.contains(s.id)) marked = marked.localCheckpoint(true)
      val newInvalid = inv0.union(marked.filter($"__isF").select($"focus")).distinct()
      val newStrict = marked.filter($"__isT").select($"focus")
      (newStrict, newInvalid)
    }

    val sccs = schema.sccsInEvaluationOrder
    stats.sccCount = sccs.size
    for (scc <- sccs) {
      if (!schema.isCyclic(scc)) {
        val s = schema.byId(scc.head)
        val (strict, inv) = evalShape(s)
        state(s.id) = ShapeVerdict(targets(s.id), pin(s.id, strict), pin(s.id, inv))
      } else {
        stats.cyclicSccCount += 1
        // 3-valued fixpoint: T and F grow monotonically from (∅, invalid0);
        // iteration mirrors saturate_remaining (Validation.py:417-432).
        scc.foreach { id =>
          state(id) = ShapeVerdict(targets(id), emptyFocus().localCheckpoint(true),
            invalid0(id).localCheckpoint(true))
        }
        var sizes = scc.map(id => (state(id).strictValid.count(), state(id).invalid.count()))
        var converged = false
        var iter = 0
        while (!converged && iter < config.maxIterations) {
          iter += 1
          stats.fixpointIterations += 1
          val updated = scc.map { id => id -> evalShape(schema.byId(id)) }
          updated.foreach { case (id, (strict, inv)) =>
            state(id) = ShapeVerdict(targets(id),
              strict.localCheckpoint(true), inv.localCheckpoint(true))
          }
          val newSizes = scc.map(id => (state(id).strictValid.count(), state(id).invalid.count()))
          converged = newSizes == sizes
          sizes = newSizes
        }
      }
    }

    ValidationResult(state.toMap, nodeOrder, stats)
  }
}
