package graft.streaming

import graft.SparkTestBase
import graft.kg.{Extraction, TranscriptGen, TranscriptTurn, Universe}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TranscriptStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def sampleTurns: Seq[TranscriptTurn] =
    TranscriptGen.generate(spark, 30, 30).collect().toSeq

  test("streaming fact extraction equals the batch operator") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[TranscriptTurn]
    val turns = sampleTurns
    input.addData(turns)
    val q = EventStream.runToMemory(spark,
      TranscriptStream.factsStream(input.toDF()), "stream_facts",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.stop()
    val streamed = spark.table("stream_facts")
      .select("conv_id", "turn_idx", "subjSurface", "pred")
      .collect().map(_.toSeq).toSet
    val batch = Extraction.facts(turns.toDF())
      .select("conv_id", "turn_idx", "subjSurface", "pred")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("watermarked fact-throughput metrics produce per-window counts") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[TranscriptTurn]
    input.addData(sampleTurns)
    // complete mode: every window's current count is visible without
    // waiting for the watermark to close it
    val q2 = EventStream.runToMemory(spark,
      TranscriptStream.factCounts(input.toDF()), "stream_fact_counts_c",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    q2.stop()
    val rows = spark.table("stream_fact_counts_c").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val batchTotal = Extraction.facts(sampleTurns.toDF()).count()
    assert(total == batchTotal, s"windowed counts $total != batch facts $batchTotal")
    assert(rows.forall(_.getString(1).nonEmpty)) // pred column carried
  }

  test("incremental staging sink appends per micro-batch and resumes") {
    implicit val sc = spark.sqlContext
    val staging = java.nio.file.Files.createTempDirectory("kgstream").toString + "/facts"
    val ckpt = java.nio.file.Files.createTempDirectory("kgstreamckpt").toString
    val input = MemoryStream[TranscriptTurn]
    val all = sampleTurns
    val (first, second) = all.splitAt(all.size / 2)

    input.addData(first)
    val q1 = TranscriptStream.incrementalTriples(spark, input.toDF(), staging, ckpt)
    q1.awaitTermination()

    input.addData(second)
    val q2 = TranscriptStream.incrementalTriples(spark, input.toDF(), staging, ckpt)
    q2.awaitTermination()

    val staged = spark.read.parquet(staging)
    val batch = Extraction.facts(all.toDF())
    assert(staged.count() == batch.count())
    // exactly-once across restarts: no duplicated micro-batches
    val dup = staged.groupBy("conv_id", "turn_idx", "subjSurface", "pred", "objSurface")
      .count().filter(col("count") > Extraction.facts(all.toDF())
        .groupBy("conv_id", "turn_idx", "subjSurface", "pred", "objSurface")
        .count().agg(max("count")).head().getLong(0))
    assert(dup.isEmpty)
    // facts for entities extracted in BOTH halves exist (stream covered all input)
    assert(staged.select("subjSurface").distinct().count() ==
      batch.select("subjSurface").distinct().count())
  }
}
