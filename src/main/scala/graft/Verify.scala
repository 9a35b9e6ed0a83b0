package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Robustness (round-3 lesson — CORRECTNESS_r03.json came back EMPTY):
  * the round-3 Verify put Spark shuffle scratch, the KG-pipeline temp dirs
  * and 41 `coalesce(1)` parquet writes on this sandbox's burst-throttled
  * virtual disk; a judge-side timed run took 797 s at sf0.001, which is
  * timeout territory. This version routes all scratch to tmpfs exactly as
  * Bench does, writes results in parallel (the checker reads directories,
  * single-file output buys nothing), and prints a per-query elapsed line
  * so a future empty artifact is diagnosable from the driver log. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shm = new java.io.File("/dev/shm")
    val scratch: Option[String] =
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-verify") else None
    scratch.foreach(s => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s)))
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    scratch.foreach { s =>
      builder.config("spark.local.dir", s"$s/spark-local")
      // q_shacl_validate_bucketed materializes a catalog table — that layout
      // build must not ride the throttled disk either
      builder.config("spark.sql.warehouse.dir", s"$s/warehouse")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t00 = System.nanoTime()
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(f"[verify] $name failed after ${(System.nanoTime() - t0) / 1e9}%.1fs: ${e.getMessage}")
      }
    }
    System.err.println(f"[verify] total ${(System.nanoTime() - t00) / 1e9}%.1fs")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
