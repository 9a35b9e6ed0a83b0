package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for the `ivf_cells` centroid-kernel shipping claim
  * (graft.functions.VectorExpressions): at k=10⁴ cells × 768 dims the
  * centroid matrix rides the per-stage taskBinary broadcast — this probe
  * turns the claimed cost into numbers: exact serialized bytes (the matrix
  * appears TWICE in a task binary — once as the foldable Literal child of
  * the expression tree, once as the codegen-reference CentroidKernel, which
  * also carries its norms array), per-task executorDeserializeTime, and
  * first-task latency, each at k=8 (baseline) and k=10⁴, plus a SECOND job
  * over the same plan to show the per-job/per-stage re-serialization cost a
  * long-lived explicit Broadcast variable would amortize.
  *
  * Local mode fetches broadcast blocks from the local BlockManager, so the
  * deserialize times here EXCLUDE network transfer — the serialized byte
  * counts are the bytes a real cluster moves per executor per stage.
  *
  * Recorded result: BENCH/BASELINE.md ("taskBinary cost at k=10⁴").
  *
  *   runMain graft.tools.TaskBinaryProbe [nVecs] [dim] [k]
  */
object TaskBinaryProbe {

  private def serializedBytes(o: AnyRef): Long = {
    val counter = new java.io.OutputStream {
      var n = 0L
      override def write(b: Int): Unit = n += 1
      override def write(b: Array[Byte], off: Int, len: Int): Unit = n += len
    }
    val oos = new java.io.ObjectOutputStream(counter)
    oos.writeObject(o); oos.close()
    counter.n
  }

  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toInt else 20000
    val dim = if (args.length > 1) args(1).toInt else 768
    val bigK = if (args.length > 2) args(2).toInt else 10000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-tbprobe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    // deterministic synthetic corpus/centroids — no Random, reproducible
    def cell(i: Long, j: Int): Double =
      ((i * 2654435761L + j * 40503L) % 1000) / 500.0 - 1.0
    val centroids = (k: Int) => Array.tabulate(k)(i => Seq.tabulate(dim)(j => cell(i, j)))
    val corpus = spark.range(nVecs).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(col("id") * 2654435761L + j * 40503L, lit(1000)) / 500.0 - 1.0)
          .cast("float")).as("v"))
      .localCheckpoint(true) // isolate the probe job from generation cost

    // per-job task metrics via listener
    val deser = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var jobStartMs = 0L
    @volatile var firstTaskDoneMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStartMs = js.time; firstTaskDoneMs = 0L
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) {
          deser.add(te.taskMetrics.executorDeserializeTime)
          if (firstTaskDoneMs == 0L) firstTaskDoneMs = System.currentTimeMillis()
        }
      }
    })

    def measure(label: String, k: Int, shipNote: String, q: org.apache.spark.sql.DataFrame,
                serBytes: Long): Unit =
      (1 to 2).foreach { jobIdx =>
        deser.clear()
        val t0 = System.nanoTime()
        q.collect()
        Thread.sleep(300) // listener bus drain (public API has no waitUntilEmpty)
        val wall = (System.nanoTime() - t0) / 1e9 - 0.3
        val ds = {
          val it = deser.iterator(); var b = List.empty[Long]
          while (it.hasNext) b = it.next() :: b
          b.sorted
        }
        val firstLat = if (firstTaskDoneMs > 0) (firstTaskDoneMs - jobStartMs) / 1e3 else -1.0
        System.err.println(f"[taskbinary] $label k=$k dim=$dim job#$jobIdx: " +
          f"ser=${serBytes / 1e6}%.2f MB ($shipNote) " +
          f"wall=$wall%.2f s first_task_latency=$firstLat%.2f s " +
          f"deser_ms max=${if (ds.nonEmpty) ds.max else -1} " +
          f"median=${if (ds.nonEmpty) ds(ds.size / 2) else -1} tasks=${ds.size}")
      }

    def probeLiteral(label: String, k: Int): Unit = {
      val mat = centroids(k)
      measure(label, k, "x2 in the binary: literal + kernel",
        corpus.select(
          element_at(call_function("ivf_cells", col("v"), typedLit(mat.toSeq), lit(1)), 1).as("c"))
          .groupBy(col("c")).count(),
        serializedBytes(mat.map(_.toArray)))
    }

    def probeBcast(k: Int): Unit = {
      val cm = new graft.functions.CentroidMatrix(centroids(k).map(_.toArray))
      val bc = spark.sparkContext.broadcast(cm)
      val fn = graft.functions.GraftFunctions.registerCentroidBcast(spark, bc, 1)
      measure("bcast", k, "broadcast HANDLE in the binary; matrix once per executor",
        corpus.select(element_at(call_function(fn, col("v")), 1).as("c"))
          .groupBy(col("c")).count(),
        serializedBytes(bc))
    }

    probeLiteral("baseline", 8)
    probeLiteral("large", bigK)
    probeBcast(bigK)
    spark.stop()
  }
}
