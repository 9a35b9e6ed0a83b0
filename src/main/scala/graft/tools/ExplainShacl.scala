package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainShacl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_shacl_validate")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    val scans = "FileScan|Scan parquet".r.findAllIn(plan).length
    println(s"SCAN_COUNT=$scans")
    println(plan.linesIterator.filter(l => l.contains("Scan parquet") || l.contains("Exchange") || l.contains("InMemory")).take(60).mkString("\n"))
    spark.stop()
  }
}
