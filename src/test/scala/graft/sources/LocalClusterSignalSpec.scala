package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Executor-JVM ballast for [[LocalClusterSignalSpec]]: a static holder
  * the executor pins until the process exits. Idempotent — a second
  * task landing on an already-inflated executor is a no-op, so the
  * spec never double-allocates one JVM into an OOM. */
object ClusterBallast {
  @volatile var held: Array[Array[Byte]] = _
  def inflate(fraction: Double): Unit = synchronized {
    if (held != null) return
    val max = Runtime.getRuntime.maxMemory()
    val chunk = 8 << 20
    val n = ((max * fraction).toLong / chunk).toInt
    held = Array.tabulate(n)(_ => new Array[Byte](chunk))
  }
}

/** The ST7 cluster path END-TO-END on `local-cluster` (separate
  * executor JVMs — the real multi-process shape, not `local[n]` where
  * executor == driver): executor registrations carry each JVM's REAL
  * heap into [[ExecutorMemorySignal]]'s denominators, executor-side
  * memory pressure (not driver pressure) raises the admission signal,
  * and the CDC source's memory-aware admission visibly shrinks
  * micro-batches under it (round-13 verdict #3).
  *
  * Runs in its own forked JVM (build.sbt test grouping: suites named
  * *LocalCluster* fork separately) because the shared `SparkSpec`
  * session and a `local-cluster` session cannot coexist in one JVM. */
final class LocalClusterSignalSpec extends AnyFunSuite {

  private def waitUntil(timeoutMs: Long = 90000, msg: => String = "")(
      cond: => Boolean): Unit = {
    val t0 = System.currentTimeMillis()
    while (!cond) {
      if (System.currentTimeMillis() - t0 > timeoutMs)
        fail(s"timed out: $msg")
      Thread.sleep(100)
    }
  }

  test("local-cluster e2e: real executor heaps registered; " +
      "executor-side ballast raises the signal; memory-aware " +
      "admission shrinks micro-batches under executor pressure") {
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1400]")
      .appName("graft-local-cluster")
      .config("spark.executor.memory", "1g")
      // executors are fresh JVMs launched from the worker: they need
      // this test JVM's classpath to run our closures and source
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.heartbeatInterval", "500ms")
      .config("spark.executor.metrics.pollingInterval", "250ms")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val saved = CdcLogSource.memoryUsage
    try {
      val sc = spark.sparkContext
      val signal = ExecutorMemorySignal.install(spark)
      // warm-up job: force both executors up and registered
      assert(sc.parallelize(1 to 64, 8).map(_ * 2).sum() == 64 * 65)
      waitUntil(msg = s"registered=${signal.registeredHeaps}")(
        signal.registeredHeaps.size >= 2)

      // denominators are INVERTED real heaps: -Xmx1g executors report
      // a ~434 MiB on-heap unified region ((1g−300m)×0.6); a failed
      // inversion (or a config echo of a differently-sized setting)
      // lands outside [600 MiB, 1.4 GiB]
      signal.registeredHeaps.foreach { case (id, h) =>
        assert(h > (600L << 20) && h < (1400L << 20),
          s"executor $id registered heap $h — expected ~1 GiB real heap")
      }

      // CDC log the admission will read (enough rows to split)
      val dir = Files.createTempDirectory("lc-cdc").toString
      val log = s"$dir/wal.log"
      val lines = (1L to 40L).map { i =>
        CdcLogSource.renderLine("I", 1L, i, i, 0L, 0L, None,
          Some(s"""{"id":$i,"name":"user-$i","age":${20 + i}}"""))
      }
      Files.write(Paths.get(log),
        (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      val logBytes = Files.size(Paths.get(log))

      def runQuery(name: String): Int = {
        val q = spark.readStream.format("graft-cdc")
          .option("path", log)
          .option("maxBytesPerTrigger", (logBytes + 1024).toString)
          .option("memoryAwareAdmission", "true")
          .load()
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", s"$dir/ckpt-$name").start()
        q.processAllAvailable()
        val batches = q.recentProgress.count(_.numInputRows > 0)
        q.stop()
        assert(spark.table(name).count() == 40L, s"$name lost rows")
        batches
      }

      // baseline: no pressure anywhere → the whole log fits one trigger
      val baseline = runQuery("lc_baseline")
      assert(baseline <= 2, s"unpressured run split into $baseline batches")

      // ballast ~80% of each executor's heap, executor-side only (the
      // driver JVM stays quiet — a driver-probe signal would see
      // nothing). Idempotent per JVM, so task placement cannot OOM one.
      sc.parallelize(0 until 8, 8).foreach(_ => ClusterBallast.inflate(0.80))
      waitUntil(msg = s"worst=${signal.worstExecutorFraction}")(
        signal.worstExecutorFraction >= CdcLogSource.MemoryLowWatermark)
      val worst = signal.worstExecutorFraction
      assert(worst >= CdcLogSource.MemoryLowWatermark,
        s"executor ballast must cross the low watermark, got $worst")
      // and the installed source signal sees it (driver floor excluded:
      // the driver itself is NOT under pressure)
      assert(CdcLogSource.memoryUsage() >= CdcLogSource.MemoryLowWatermark)

      // pressured: the byte budget at least halves → visibly more
      // micro-batches for the same 40 rows
      val pressured = runQuery("lc_pressured")
      assert(pressured >= 2 * baseline,
        s"admission did not shrink under executor pressure: " +
          s"baseline=$baseline pressured=$pressured usage=$worst")
    } finally {
      CdcLogSource.memoryUsage = saved
      spark.stop()
    }
  }
}
