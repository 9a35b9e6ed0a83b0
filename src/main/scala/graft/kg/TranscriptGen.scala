package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** One transcript turn — the pipeline's input row shape
  * (BASELINE.json input_hint):
  * `(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)`. */
final case class TranscriptTurn(
    conv_id: String, turn_idx: Int, role: String, text: String, tool: String, ts: Timestamp)

object TranscriptGen {
  /** 2020-01-01T00:00:00Z */
  private val baseEpochSec = 1577836800L

  /** Deterministic distributed transcript synthesis: `numConvs` conversations
    * with a skewed turn distribution; each row a pure function of
    * (conv index, turn index). Generated via flatMap over a range — scales to
    * any size without driver involvement. */
  def generate(spark: SparkSession, numConvs: Long, numEntities: Int,
               megaEvery: Int = 997, megaTurns: Int = 2000): Dataset[TranscriptTurn] = {
    import spark.implicits._
    require(numEntities % 3 == 0 && numEntities > 0, "numEntities must be a positive multiple of 3")
    spark.range(numConvs).flatMap { c =>
      val n = Universe.turnsPerConv(c, megaEvery, megaTurns)
      (0 until n).iterator.map { t =>
        val turn = Universe.turn(c, t, numEntities)
        TranscriptTurn(
          conv_id = f"conv$c%08d",
          turn_idx = t,
          role = turn.role,
          text = turn.text,
          tool = turn.tool,
          ts = new Timestamp((baseEpochSec + c * 3600 + t) * 1000L))
      }
    }
  }

  /** The exact triple set the construction pipeline is expected to emit —
    * the P/R oracle, computed from the same pure functions. */
  def expectedTriples(spark: SparkSession, numConvs: Long, numEntities: Int,
                      megaEvery: Int = 997, megaTurns: Int = 2000): DataFrame = {
    import spark.implicits._
    spark.range(numConvs).flatMap { c =>
      val n = Universe.turnsPerConv(c, megaEvery, megaTurns)
      (0 until n).iterator.flatMap { t => Universe.turn(c, t, numEntities).facts }
    }.toDF("subj", "pred", "obj").distinct()
  }
}
