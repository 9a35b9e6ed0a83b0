package graft.shacl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A10 — filtered target extraction (`template_FILTER`): during a shape's
  * target retrieval, classify targets as pending vs immediately-invalid by
  * counting their links into an already-evaluated neighbor's valid (or
  * invalid) instance list and comparing to the constraint bound
  * (QueryGenerator.py:105-131, InstancesRetrieval.py:121-185).
  *
  * In the fixpoint engine this is a pure optimization (verdicts are
  * identical either way — the planner-knob grid asserts it); it exists as a
  * first-class operator with the reference's exact decision rule so callers
  * can prune target sets eagerly during traversal.
  */
object TargetFilter {

  final case class Classified(pending: DataFrame, invalid: DataFrame)

  /** The reference's neighbor eligibility rule
    * (Validation.get_evaluated_out_neighbor, Validation.py:147-175): the
    * neighbor must be fully evaluated with a non-empty invalid list, a valid
    * or invalid list under 256 entries, a target query, and must not be
    * referenced through a max constraint (Validation.py:103-104). */
  def eligibleNeighbor(shape: Shape, evaluated: Map[String, ShapeVerdict],
                       schema: ShapeSchema, threshold: Long = 256): Option[String] = {
    shape.shapeRefs.distinct.find { ref =>
      evaluated.get(ref).exists { v =>
        val nValid = v.strictValid.count()
        val nInvalid = v.invalid.count()
        val refShape = schema.byId.get(ref)
        ((nValid > 0 && nValid < threshold) || (nInvalid > 0 && nInvalid < threshold)) &&
          nInvalid > 0 &&
          refShape.exists(_.targetQuery.isDefined) &&
          !shape.isMaxRef(ref)
      }
    }
  }

  /** Classify the shape's targets using the verdicts of the referenced
    * neighbor: per target, count distinct linked instances that are valid
    * (`cnt`); a min constraint with `cnt < min` (or max with `cnt > max`) is
    * immediately invalid, everything else stays pending — exactly
    * InstancesRetrieval.py:164-178 as one left-outer join + conditional
    * aggregate instead of a VALUES-chunked query series. */
  def extractTargetsWithFilter(spark: SparkSession, triples: DataFrame, shape: Shape,
                               constraint: CardConstraint, refValid: DataFrame): Classified = {
    import spark.implicits._
    val targets = new Validator(spark, triples, ShapeSchema(Seq(shape))).targetsOf(shape)
    val path = constraint.path match {
      case DirectPath(p)  => triples.filter($"pred" === p).select($"subj".as("focus"), $"obj".as("o"))
      case InversePath(p) => triples.filter($"pred" === p).select($"obj".as("focus"), $"subj".as("o"))
      case SequencePath(_) => spark.emptyDataset[(String, String)].toDF("focus", "o")
    }
    val linked = path.join(broadcast(refValid.withColumnRenamed("focus", "o")), Seq("o"), "left_semi")
    val counted = targets
      .join(linked, Seq("focus"), "left")
      .groupBy($"focus").agg(countDistinct($"o").as("cnt"))
    val isInvalid =
      if (constraint.isMin) $"cnt" < constraint.min
      else $"cnt" > constraint.max
    Classified(
      pending = counted.filter(!isInvalid).select($"focus"),
      invalid = counted.filter(isInvalid).select($"focus"))
  }
}
