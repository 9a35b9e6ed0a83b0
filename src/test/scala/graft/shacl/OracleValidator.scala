package graft.shacl

import graft.rdf.{Rdf, STriple}

import scala.collection.mutable

/** TEST ORACLE: a literal, in-memory port of the reference's rule-based
  * validation algorithm — target retrieval, per-binding rule grounding and
  * interleaving, negate-unmatchable, apply-rules, deferred saturation and
  * the remaining-targets-are-valid termination rule
  * (TravSHACL/rule_based_validation/Validation.py:45-527).
  *
  * The production engine (graft.shacl.Validator) implements the SAME
  * semantics as distilled set algebra; this oracle exists to cross-validate
  * that distillation on randomized schemas (including cyclic ones) beyond
  * the fixed golden corpus. Driver-side only, tiny graphs only.
  */
object OracleValidator {
  type Atom = (String, String, Boolean) // (predicate, instance, sign)

  final case class Grounding(shapes: ShapeSchema, triples: Seq[STriple]) {
    val typed: Map[String, Set[String]] =
      triples.filter(_.pred == Rdf.rdfType).groupBy(_.obj).map { case (c, ts) => c -> ts.map(_.subj).toSet }
    private val bySubjPred: Map[(String, String), Seq[String]] =
      triples.groupBy(t => (t.subj, t.pred)).map { case (k, ts) => k -> ts.map(_.obj).distinct }
    private val byObjPred: Map[(String, String), Seq[String]] =
      triples.groupBy(t => (t.obj, t.pred)).map { case (k, ts) => k -> ts.map(_.subj).distinct }

    def objectsOf(x: String, path: PathExpr): Seq[String] = path match {
      case DirectPath(p)   => bySubjPred.getOrElse((x, p), Nil)
      case InversePath(p)  => byObjPred.getOrElse((x, p), Nil)
      case SequencePath(_) => Nil
    }
    def classInstances(shape: Shape): Set[String] =
      shape.targetClass.map(c => typed.getOrElse(c, Set.empty)).getOrElse(Set.empty)
  }

  /** internal query ids, mirroring Shape.compute_constraint_queries */
  private def minId(s: Shape) = s.id + "_d1_pos"
  private def maxId(s: Shape, i: Int) = s.id + s"_d1_max_${i + 1}"

  def validate(schema: ShapeSchema, triples: Seq[STriple], nodeOrder: Seq[String]): (Set[String], Set[String]) = {
    val g = Grounding(schema, triples)

    // preds_to_shapes: every query id of a shape maps back to the shape
    val predsToShape = mutable.Map[String, String]()
    schema.shapes.foreach { s =>
      predsToShape(s.id) = s.id
      predsToShape(minId(s)) = s.id
      s.activeMaxConstraints.indices.foreach(i => predsToShape(maxId(s, i)) = s.id)
    }

    val inferred = mutable.Set[Atom]()
    val ruleMap = mutable.Map[Atom, mutable.Set[Set[Atom]]]()
    val remaining = mutable.Set[Atom]()
    val evaluated = mutable.Set[String]()
    val visited = mutable.Set[String]()
    val registeredValid = mutable.Set[String]()
    val registeredViolated = mutable.Set[String]()

    def registerValid(a: Atom): Unit = registeredValid += a._2
    def registerViolated(a: Atom): Unit = registeredViolated += a._2

    /** retrieve_next_targets (Validation.py:86-145), plain path (rdflib
      * endpoints skip A10 filtering) + or-guard + sparql constraints. */
    def retrieveTargets(shape: Shape): Set[Atom] = {
      if (shape.targetQuery.isEmpty) return Set.empty
      var pending: Set[Atom] = g.classInstances(shape).map(x => (shape.id, x, true))

      if (shape.orGroups.nonEmpty) {
        val orSet: Set[String] = {
          val groups = shape.orGroups.map { grp =>
            grp.options.filter(_.shapeRef.isEmpty).flatMap { opt =>
              g.classInstances(shape).filter { x =>
                val cnt = g.objectsOf(x, opt.path).size
                if (opt.isMin) cnt >= opt.min else cnt <= opt.max
              }
            }.toSet
          }
          if (groups.isEmpty) Set.empty else groups.reduce(_ intersect _)
        }
        if (orSet.nonEmpty) {
          val (ok, bad) = pending.partition(t => orSet.contains(t._2))
          bad.foreach { t => registerViolated(t); inferred += ((t._1, t._2, false)) }
          pending = ok
        }
      }

      shape.sparqlConstraints.foreach { sc =>
        val violators: Set[String] = SparqlSelect.compile(sc.select) match {
          case FilterCompare(pred, op, const) =>
            pending.map(_._2).filter { x =>
              g.objectsOf(x, DirectPath(pred)).exists { o =>
                val d = try Some(o.toDouble) catch { case _: Throwable => None }
                d.exists { v =>
                  op match {
                    case ">" => v > const; case "<" => v < const
                    case ">=" => v >= const; case "<=" => v <= const
                    case "=" => v == const; case "!=" => v != const
                  }
                }
              }
            }
          case HasValue(pred, obj) =>
            pending.map(_._2).filter(x => g.objectsOf(x, DirectPath(pred)).contains(obj))
        }
        pending.filter(t => violators.contains(t._2)).foreach { t =>
          registerViolated(t); inferred += ((t._1, t._2, false))
        }
        pending = pending.filterNot(t => violators.contains(t._2))
      }
      pending
    }

    /** combinations of k distinct typed objects per referencing constraint */
    def refTuples(x: String, c: CardConstraint, k: Int): Seq[Seq[String]] = {
      val refShape = schema.byId.get(c.shapeRef.get)
      val objs = g.objectsOf(x, c.path)
        .filter(o => refShape.exists(r => g.classInstances(r).contains(o)))
      objs.combinations(k).toSeq
    }

    /** min-query bindings: x from the target class satisfying all LOCAL min
      * constraints, crossed with per-ref-constraint object tuples
      * (QueryGenerator min query + local subquery semantics). */
    def minBindings(s: Shape): Seq[(String, Seq[(CardConstraint, Seq[String])])] = {
      val localMins = s.minConstraints.filter(_.shapeRef.isEmpty)
      val refMins = s.minConstraints.filter(_.shapeRef.isDefined)
      g.classInstances(s).toSeq.sorted
        .filter(x => localMins.forall(c => g.objectsOf(x, c.path).size >= c.min))
        .flatMap { x =>
          val perRef: Seq[Seq[(CardConstraint, Seq[String])]] =
            refMins.map(c => refTuples(x, c, c.min).map(t => (c, t)))
          if (perRef.exists(_.isEmpty)) Nil
          else {
            val crossed = perRef.foldLeft(Seq(Seq.empty[(CardConstraint, Seq[String])])) {
              (acc, next) => for (a <- acc; n <- next) yield a :+ n
            }
            crossed.map(tu => (x, tu))
          }
        }
    }

    /** max-query bindings for one active max constraint: x with ≥ max+1
      * distinct (typed, if referencing) objects; one binding per tuple. */
    def maxBindings(s: Shape, c: CardConstraint): Seq[(String, Seq[String])] =
      g.classInstances(s).toSeq.sorted.flatMap { x =>
        val objs =
          if (c.shapeRef.isDefined) {
            val refShape = schema.byId.get(c.shapeRef.get)
            g.objectsOf(x, c.path).filter(o => refShape.exists(r => g.classInstances(r).contains(o)))
          } else g.objectsOf(x, c.path)
        objs.combinations(c.max + 1).toSeq.map(t => (x, t))
      }

    def shapeRuleBody(s: Shape, x: String): Set[Atom] = {
      val minAtom: Seq[Atom] = if (s.minConstraints.nonEmpty) Seq((minId(s), x, true)) else Nil
      val maxAtoms: Seq[Atom] = s.activeMaxConstraints.indices.map(i => (maxId(s, i), x, false))
      (minAtom ++ maxAtoms).toSet
    }

    def addRule(head: Atom, body: Set[Atom]): Unit =
      ruleMap.getOrElseUpdate(head, mutable.Set.empty) += body

    /** interleave (Validation.py:256-415) for one query's bindings */
    def interleave(s: Shape, qHeadPred: String, qType: String,
                   bindings: Seq[(String, Set[Atom])]): Unit = {
      val maxRefs = s.maxValidRefs
      val interConstrCount = mutable.Map[Atom, mutable.Map[String, mutable.Set[Atom]]]()

      for ((x, qBody) <- bindings) {
        val qHead: Atom = (qHeadPred, x, true)
        val sHead: Atom = (s.id, x, true)

        // --- query rule pattern section ---
        var isBodyInferred = true
        var isBodyInferrable = true
        var negatedBody = false
        for (a <- qBody) {
          if (evaluated.contains(a._1)) {
            if (!ruleMap.contains((a._1, a._2, true))) {
              if (!inferred.contains(a)) {
                if (!inferred.contains((a._1, a._2, !a._3))) {
                  isBodyInferred = false
                } else { isBodyInferred = false; isBodyInferrable = false }
              }
            } else isBodyInferred = false
            // inline inter-shape max enforcement (B9)
            val aShape = predsToShape.getOrElse(a._1, a._1)
            if (inferred.contains(a) && qType == "min" && maxRefs.contains(aShape)) {
              val cnts = interConstrCount.getOrElseUpdate(sHead,
                mutable.Map(maxRefs.keys.map(k => k -> mutable.Set.empty[Atom]).toSeq: _*))
              cnts(aShape) += a
              if (cnts(aShape).size > maxRefs(aShape)) negatedBody = true
            }
          } else isBodyInferred = false
        }

        if (negatedBody) {
          inferred += ((qHead._1, qHead._2, false))
          if (sHead._3 && remaining.contains(sHead)) {
            registerViolated(sHead); remaining -= sHead
          }
        } else {
          if (!isBodyInferred) {
            if (isBodyInferrable) addRule(qHead, qBody)
          } else inferred += qHead

          // --- shape rule pattern section ---
          val sBody = shapeRuleBody(s, x)
          var sInferred = true
          var sNegated = false
          for (a <- sBody if !sNegated) {
            if (!inferred.contains(a)) {
              if (inferred.contains((a._1, a._2, !a._3))) sNegated = true
              else sInferred = false
            }
          }
          if (sNegated) {
            inferred += ((sHead._1, sHead._2, false))
            if (sHead._3 && remaining.contains(sHead)) {
              registerViolated(sHead); remaining -= sHead
            }
          } else if (!sInferred) {
            addRule(sHead, sBody)
          } else {
            inferred += sHead
            if (remaining.contains(sHead)) {
              registerValid(sHead); remaining -= sHead
            }
          }
        }
      }
      evaluated += qHeadPred
    }

    /** negate_unmatchable_heads (Validation.py:434-471) */
    def negateUnmatchable(): Boolean = {
      var changed = false
      val allBodyAtoms = ruleMap.values.flatten.flatten.toSet
      for (a <- allBodyAtoms) {
        if (evaluated.contains(a._1) && !ruleMap.contains((a._1, a._2, true)) && !inferred.contains(a)) {
          val neg = (a._1, a._2, false)
          if (!inferred.contains(neg)) { changed = true; inferred += neg }
        }
      }
      val keep = mutable.Set[Atom]()
      for (a <- remaining) {
        if (evaluated.contains(a._1) && !ruleMap.contains((a._1, a._2, true)) && !inferred.contains(a)) {
          registerViolated(a); inferred += ((a._1, a._2, !a._3))
        } else keep += a
      }
      remaining.clear(); remaining ++= keep
      changed
    }

    /** apply_rules (Validation.py:473-527) */
    def applyRules(): Boolean = {
      var fresh = false
      for ((head, bodies) <- ruleMap.toSeq) {
        val bodyStates = bodies.map { body =>
          val atomStates = body.map { a =>
            if (inferred.contains((a._1, a._2, !a._3))) "F"
            else if (inferred.contains(a)) "T"
            else "P"
          }
          if (atomStates == Set("T")) "T"
          else if (atomStates.contains("F")) "F"
          else "P"
        }
        if (bodyStates.contains("T")) {
          fresh = true
          if (remaining.contains(head)) { registerValid(head); remaining -= head }
          inferred += head
          ruleMap -= head
        } else if (bodyStates.contains("F") && !bodyStates.contains("P")) {
          fresh = true
          if (remaining.contains(head)) { registerViolated(head); remaining -= head }
          inferred += ((head._1, head._2, !head._3))
          ruleMap -= head
        }
      }
      fresh
    }

    def saturate(): Unit = {
      var go = true
      while (go) {
        val n = negateUnmatchable()
        val a = applyRules()
        go = n || a
      }
    }

    def evalShape(s: Shape): Unit = {
      if (s.minConstraints.isEmpty && s.activeMaxConstraints.isEmpty) {
        val toRemove = remaining.filter(_._1 == s.id)
        toRemove.foreach { h => registerValid(h); inferred += h }
        remaining --= toRemove
      }
      if (s.minConstraints.nonEmpty) {
        val bindings = minBindings(s).map { case (x, tu) =>
          (x, tu.flatMap { case (c, objs) => objs.map(o => (c.shapeRef.get, o, true): Atom) }.toSet)
        }
        interleave(s, minId(s), "min", bindings)
      }
      s.activeMaxConstraints.zipWithIndex.foreach { case (c, i) =>
        val bindings = maxBindings(s, c).map { case (x, objs) =>
          (x, c.shapeRef.map(r => objs.map(o => (r, o, true): Atom).toSet).getOrElse(Set.empty[Atom]))
        }
        interleave(s, maxId(s, i), "max", bindings)
        // rules for targets absent from the max query result (Validation.py:235-255)
        remaining.filter(_._1 == s.id).foreach { h => addRule((s.id, h._2, true), shapeRuleBody(s, h._2)) }
      }
      saturate()
      visited += s.id
    }

    // exec / validate driver loop (Validation.py:45-84)
    val order = mutable.Queue(nodeOrder: _*)
    var focus: Option[Shape] = Some(schema.byId(order.dequeue()))
    remaining ++= retrieveTargets(focus.get)
    while (focus.isDefined && visited.size != schema.shapes.size) {
      evaluated += focus.get.id
      evalShape(focus.get)
      focus = if (order.nonEmpty) Some(schema.byId(order.dequeue())) else None
      focus.foreach(f => remaining ++= retrieveTargets(f))
    }
    val validAfterTermination = remaining.map(_._2).toSet

    (registeredValid.toSet ++ validAfterTermination, registeredViolated.toSet)
  }
}
