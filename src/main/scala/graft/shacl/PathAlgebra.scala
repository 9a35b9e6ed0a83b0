package graft.shacl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared compilation of SHACL property paths to edge frames
  * `(focus, o)` — used by both the validator's constraint evaluation and
  * A10 target pre-filtering so the two always agree on path semantics.
  *
  * Inverse paths swap subject/object (reference ShapeParser.py:507-511);
  * sequence paths are opaque and match nothing (parity with the reference
  * generator, which parses `sh:path (p1 p2 …)` at ShapeParser.py:275-283 but
  * never expands it) unless `expandSequencePaths` compiles them to multi-hop
  * equi-joins — each hop filters one predicate, so over the pred-partitioned
  * triple layout every hop is a pruned scan, and the hop joins shuffle on
  * the intermediate node id (no driver-side state, no cartesians).
  */
object PathAlgebra {

  def edges(triples: DataFrame, path: PathExpr, expandSequencePaths: Boolean): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    path match {
      case DirectPath(p) =>
        triples.filter(col("pred") === p).select(col("subj").as("focus"), col("obj").as("o"))
      case InversePath(p) =>
        triples.filter(col("pred") === p).select(col("obj").as("focus"), col("subj").as("o"))
      case SequencePath(iris) if expandSequencePaths && iris.nonEmpty =>
        val first = triples.filter(col("pred") === iris.head)
          .select(col("subj").as("focus"), col("obj").as("o"))
        iris.tail.foldLeft(first) { (acc, p) =>
          val hop = triples.filter(col("pred") === p)
            .select(col("subj").as("o"), col("obj").as("o2"))
          acc.join(hop, Seq("o")).select(col("focus"), col("o2").as("o"))
        }
      case SequencePath(_) => spark.emptyDataset[(String, String)].toDF("focus", "o")
    }
  }
}
