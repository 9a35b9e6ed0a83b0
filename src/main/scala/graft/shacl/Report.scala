package graft.shacl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Validation-result sinks with reference parity (B13,
  * Validation.py:545-627): per-shape verdict tables, target logs, a SHACL
  * `sh:ValidationReport` Turtle document, and run statistics.
  * Verdict tables go to parquet (the scale path); the TTL report and stats
  * are small driver-side artifacts.
  */
object Report {

  /** All verdicts as one DataFrame(shape, focus, verdict). */
  def verdictFrame(spark: SparkSession, result: ValidationResult): DataFrame = {
    val parts = result.verdicts.toSeq.flatMap { case (shapeId, v) =>
      Seq(
        v.validFinal.select(lit(shapeId).as("shape"), col("focus"), lit("valid").as("verdict")),
        v.invalid.select(lit(shapeId).as("shape"), col("focus"), lit("violated").as("verdict"))
      )
    }
    parts.reduceOption(_ union _)
      .getOrElse(spark.emptyDataFrame.select(lit("").as("shape"), lit("").as("focus"), lit("").as("verdict")).limit(0))
  }

  def writeVerdicts(spark: SparkSession, result: ValidationResult, outDir: String): Unit =
    verdictFrame(spark, result).write.mode(SaveMode.Overwrite).parquet(s"$outDir/verdicts.parquet")

  /** `targets_valid.log` / `targets_violated.log` parity
    * (Validation.write_targets_to_file): `Shape(<instance>)` lines. */
  def writeTargetLogs(result: ValidationResult, outDir: String): Unit = {
    def lines(get: ShapeVerdict => DataFrame): Seq[String] =
      result.verdicts.toSeq.sortBy(_._1).flatMap { case (shapeId, v) =>
        get(v).collect().map(r => s"$shapeId(${r.getString(0)}),").sorted
      }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/targets_valid.log"),
      lines(_.validFinal).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/targets_violated.log"),
      lines(_.invalid).mkString("\n").getBytes("UTF-8"))
  }

  /** SHACL validation report TTL (Validation.py:609-627). The violation list
    * is collected to the driver — reports are meant for human consumption;
    * at scale use the parquet verdict table instead. */
  def validationReportTtl(result: ValidationResult, maxResults: Int = 10000): String = {
    val violations = result.verdicts.toSeq.sortBy(_._1).flatMap { case (shapeId, v) =>
      v.invalid.limit(maxResults).collect().map(r => (shapeId, r.getString(0)))
    }
    val sb = new StringBuilder("@prefix sh: <http://www.w3.org/ns/shacl#> . \n\n")
    if (violations.isEmpty) sb.append(":report a sh:ValidationReport ;\n  sh:conforms true ")
    else {
      sb.append(":report a sh:ValidationReport ;\n  sh:conforms false ;\n  sh:result")
      violations.zipWithIndex.foreach { case ((shapeId, focus), i) =>
        if (i != 0) sb.append(" ,")
        sb.append("\n    [ a  sh:ValidationResult ;\n")
          .append("      sh:resultSeverity  sh:Violation ;\n")
          .append(s"      sh:focusNode  <$focus> ;\n")
          .append(s"      sh:sourceShape  <$shapeId> ]")
      }
    }
    sb.append(" .").toString
  }

  def statsText(result: ValidationResult): String = {
    val counts = result.verdicts.toSeq.sortBy(_._1).map { case (id, v) =>
      val valid = v.validFinal.count()
      val violated = v.invalid.count()
      s"$id: targets=${valid + violated} valid=$valid violated=$violated"
    }
    (counts :+
      s"sccs: ${result.stats.sccCount} (cyclic: ${result.stats.cyclicSccCount})" :+
      s"fixpoint iterations: ${result.stats.fixpointIterations}" :+
      s"node order: ${result.nodeOrder.mkString(" -> ")}").mkString("\n")
  }
}
