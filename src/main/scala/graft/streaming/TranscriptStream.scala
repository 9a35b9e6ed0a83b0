package graft.streaming

import graft.kg.Extraction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental knowledge-graph construction over a transcript STREAM
  * (`conv_id, turn_idx, role, text, tool, ts`) — the continuous-ingestion
  * form of the batch pipeline. Beyond the reference (which has no streaming
  * surface); the extraction stage is stateless Spark SQL, so the SAME
  * operator (graft.kg.Extraction.facts) runs unchanged under Structured
  * Streaming — one definition, two execution modes.
  *
  * Architecture for 10^12-turn continuous ingestion:
  *  - `factsStream`: stateless per-microbatch extraction (regex + explode;
  *    no state store, scales with input rate).
  *  - `factCounts`: watermarked per-window fact-throughput metrics (bounded
  *    state, the stream-health signal).
  *  - `incrementalTriples`: foreachBatch sink appending dictionary-encodable
  *    raw facts to a staging table; entity linking/canonicalization stay
  *    periodic BATCH jobs over the staging table (linking needs global
  *    context — corpus-level TF-IDF and connected components are not
  *    incremental-friendly; the staging handoff is the standard
  *    lambda-style split).
  */
object TranscriptStream {

  /** Stateless streaming fact extraction — Extraction.facts verbatim. */
  def factsStream(turns: DataFrame): DataFrame = Extraction.facts(turns)

  /** Facts-per-window health metrics with bounded state. */
  def factCounts(turns: DataFrame, windowLen: String = "1 hour",
                 watermark: String = "2 hours"): DataFrame =
    Extraction.factsWith(turns.withWatermark("ts", watermark), carry = Seq("ts"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("pred"), col("n"))

  /** Append extracted facts to a parquet staging directory, micro-batch by
    * micro-batch; batch linking/canonicalization consume it periodically. */
  def incrementalTriples(spark: SparkSession, turns: DataFrame, stagingDir: String,
                         checkpointDir: String): StreamingQuery =
    factsStream(turns).writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(stagingDir)
      }
      .start()
}
