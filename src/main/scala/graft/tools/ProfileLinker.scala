package graft.tools

import graft.kg.{EntityLinker, Universe}
import graft.ops.{ConnectedComponents, TextSim}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the entity-linking stage's fixed cost. */
object ProfileLinker {
  def main(args: Array[String]): Unit = {
    val e = if (args.nonEmpty) args(0).toInt else 3000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val surfaces = (0 until e).flatMap(Universe.aliases).distinct.toDF("surface").cache()
    surfaces.count()

    time("full link")(EntityLinker.link(spark, surfaces).count())
    // second run (warm JIT) with sub-step breakdown
    val tok = time("tokens+cache") {
      val t = TextSim.tokens(surfaces.select($"surface".as("id"), $"surface".as("text")), "id", "text", 2).cache()
      t.count(); t
    }
    val cand = time("minhash+bands+pairs") {
      val c = TextSim.candidatePairs(TextSim.lshBands(TextSim.minHashSignatures(tok, 12), 12, 1), 1000)
        .localCheckpoint(true)
      c.count(); c
    }
    val links = time("tfidf+cosine") {
      val l = TextSim.cosineOnPairs(cand, TextSim.tfidf(tok, surfaces.count()))
        .filter($"cos" >= 0.5).select($"a", $"b").localCheckpoint(true)
      l.count(); l
    }
    time("cc")(ConnectedComponents.run(spark, links).count())
    time("full link (warm)")(EntityLinker.link(spark, surfaces).count())
    spark.stop()
  }
}
