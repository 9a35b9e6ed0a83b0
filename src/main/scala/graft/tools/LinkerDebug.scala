package graft.tools

import graft.kg.Universe

import graft.ops.TextSim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for linker tuning (not part of the public API). */
object LinkerDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = 120
    val surfaces = (0 until e).flatMap(Universe.aliases).distinct.toDF("surface")
    println(s"surfaces=${surfaces.count()}")

    val tok = TextSim.tokens(surfaces.select($"surface".as("id"), $"surface".as("text")), "id", "text", 2)
    val sig = TextSim.minHashSignatures(tok, 12)
    val cand = TextSim.candidatePairs(TextSim.lshBands(sig, 12, 1), 1000)
    println(s"candidates=${cand.count()}")
    val w = TextSim.tfidf(tok, surfaces.count())
    val cos = TextSim.cosineOnPairs(cand, w).cache()
    println("=== top cross-entity (wrong) links above 0.3:")
    val truePairs = (0 until e).flatMap { k =>
      val a = Universe.aliases(k); for (x <- a; y <- a if x < y) yield (x, y)
    }.toDF("a", "b")
    val sym = truePairs.union(truePairs.select($"b".as("a"), $"a".as("b")))
    cos.filter($"cos" >= 0.4).join(sym, Seq("a", "b"), "left_anti")
      .orderBy(desc("cos")).show(20, false)
    println("=== weakest true links:")
    cos.join(sym, Seq("a", "b"), "left_semi").orderBy(asc("cos")).show(10, false)
    println("=== true pairs missing from candidates:")
    truePairs.select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .join(cand, Seq("a", "b"), "left_anti").show(10, false)
    spark.stop()
  }
}
