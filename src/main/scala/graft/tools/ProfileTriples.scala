package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rdf.Rdf

/** Scratch profiler for the KG triples stage. */
object ProfileTriples {
  def main(args: Array[String]): Unit = {
    val base = args(0) // existing kg work dir with relations/types/links checkpoints
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-prof")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1fs (rows=$n)")
    }
    val relations = spark.read.parquet(s"$base/relations.parquet")
    val types = spark.read.parquet(s"$base/types.parquet")
    val links = spark.read.parquet(s"$base/links.parquet")
    def iri(c: org.apache.spark.sql.Column) = concat(lit("ns:"), regexp_replace(c, " ", "_"))

    time("scan relations")(relations.write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => relations.count() })
    val subjLink = links.select(col("surface").as("subjSurface"), col("canonical").as("subjCanon"))
    val objLink = links.select(col("surface").as("objSurface"), col("canonical").as("objCanon"))
    val joined = relations.join(subjLink, Seq("subjSurface")).join(objLink, Seq("objSurface"))
      .select(iri(col("subjCanon")).as("subj"), col("pred"), iri(col("objCanon")).as("obj"))
    time("join only")(joined.count())
    time("join+distinct")(joined.distinct().count())
    val typeTriples = types.join(subjLink, Seq("subjSurface"))
      .select(iri(col("subjCanon")).as("subj"), lit(Rdf.rdfType).as("pred"), col("cls").as("obj"))
    time("full union distinct")(joined.union(typeTriples).distinct().count())
    println(joined.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
