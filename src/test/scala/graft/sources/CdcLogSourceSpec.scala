package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Unit coverage for the WAL source's incremental-read machinery: byte
  * windows handed to partition readers, O(delta) driver indexing, and the
  * full-scan fallbacks that keep the (lsn, ordinal) key window the source
  * of truth (reference: single-reader decode loop, apply.rs:2026-2127 —
  * a socket transport only ever sees new bytes; the file transport gets
  * the same property via the index). */
class CdcLogSourceSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("cdclog").toString

  private def line(lsn: Long, ord: Long, id: Long): String =
    CdcLogSource.renderLine("I", 1L, lsn, lsn, ord, 0L, None,
      Some(s"""{"id":$id}"""))

  private def append(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def readAll(p: CdcLogPartition): Seq[(Long, Long)] = {
    val r = new CdcLogReaderFactory().createReader(p)
    val out = Seq.newBuilder[(Long, Long)]
    while (r.next()) { val row = r.get(); out += ((row.getLong(2), row.getLong(4))) }
    r.close()
    out.result()
  }

  test("offset json round-trips pos; absent pos parses as -1 (pre-upgrade)") {
    val o = LsnOffset(7L, 2L, boundary = true, pos = 1234L)
    assert(LsnOffset.fromJson(o.json()) == o)
    val legacy = LsnOffset.fromJson("""{"commitLsn":7,"txOrdinal":2}""")
    assert(legacy == LsnOffset(7L, 2L, boundary = false, pos = -1L))
  }

  test("batch read returns every log line") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 5L).map(i => line(i, 0, i)))
    assert(spark.read.format("graft-cdc").option("path", log)
      .load().count() == 5)
  }

  test("planned partitions carry exact byte windows; readers seek, not scan") {
    val log = s"${tmp()}/wal.log"
    val first = (1L to 3L).map(i => line(i, 0, i))
    append(log, first)
    val firstBytes = Files.size(Paths.get(log))

    val s = new CdcLogMicroBatchStream(log, None)
    val end1 = s.latestOffset(LsnOffset.zero, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    assert(end1 == LsnOffset(3L, 0L, boundary = true, pos = firstBytes))
    val p1 = s.planInputPartitions(LsnOffset.zero, end1)(0)
      .asInstanceOf[CdcLogPartition]
    assert(p1.fromPos == 0L && p1.toPos == firstBytes)
    assert(readAll(p1) == Seq((1L, 0L), (2L, 0L), (3L, 0L)))

    // second trigger: only the appended suffix is parsed AND read
    append(log, Seq(line(4L, 0L, 4L), line(5L, 0L, 5L)))
    val end2 = s.latestOffset(end1, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    val p2 = s.planInputPartitions(end1, end2)(0)
      .asInstanceOf[CdcLogPartition]
    assert(p2.fromPos == firstBytes &&
      p2.toPos == Files.size(Paths.get(log)))
    assert(readAll(p2) == Seq((4L, 0L), (5L, 0L)))
  }

  test("byte window splits mid-commit under admission cap") {
    val log = s"${tmp()}/wal.log"
    append(log, Seq(line(1L, 0L, 1L), line(1L, 1L, 2L), line(1L, 2L, 3L),
      line(2L, 0L, 4L)))
    val s = new CdcLogMicroBatchStream(log, None)
    val end = s.latestOffset(LsnOffset.zero, ReadLimit.maxRows(2))
      .asInstanceOf[LsnOffset]
    // next pending entry shares commit_lsn 1 → cap landed mid-commit
    assert(end.commitLsn == 1L && end.txOrdinal == 1L && !end.boundary)
    val p = s.planInputPartitions(LsnOffset.zero, end)(0)
      .asInstanceOf[CdcLogPartition]
    assert(readAll(p) == Seq((1L, 0L), (1L, 1L)))
    // the remainder resumes exactly at the cap's byte position
    val end2 = s.latestOffset(end, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    val p2 = s.planInputPartitions(end, end2)(0)
      .asInstanceOf[CdcLogPartition]
    assert(p2.fromPos == p.toPos)
    assert(readAll(p2) == Seq((1L, 2L), (2L, 0L)))
  }

  test("out-of-order log disables byte windows; key filter stays correct") {
    val log = s"${tmp()}/wal.log"
    append(log, Seq(line(2L, 0L, 2L), line(1L, 0L, 1L), line(3L, 0L, 3L)))
    val s = new CdcLogMicroBatchStream(log, None)
    val end = s.latestOffset(LsnOffset.zero, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    assert(end.commitLsn == 3L && end.pos == -1L)
    val p = s.planInputPartitions(LsnOffset.zero, end)(0)
      .asInstanceOf[CdcLogPartition]
    assert(p.fromPos == -1L && p.toPos == -1L)
    assert(readAll(p).sorted == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("retention trim rebuilds the index; windows follow the NEW layout") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 6L).map(i => line(i, 0, i)))
    val s = new CdcLogMicroBatchStream(log, None, "earliest")
    val end1 = s.latestOffset(LsnOffset.zero, ReadLimit.maxRows(4))
      .asInstanceOf[LsnOffset] // consumed through lsn 4
    assert(end1.commitLsn == 4L)
    // retention drops 1..4: file shrinks, every byte position shifts
    Files.write(Paths.get(log),
      (Seq(line(5L, 0L, 5L), line(6L, 0L, 6L)).mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    val end2 = s.latestOffset(end1, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    val p = s.planInputPartitions(end1, end2)(0)
      .asInstanceOf[CdcLogPartition]
    // start sits before the trimmed file's first line → window from byte 0
    assert(p.fromPos == 0L && p.toPos == Files.size(Paths.get(log)))
    assert(readAll(p) == Seq((5L, 0L), (6L, 0L)))
  }

  test("rewrite between plan and read: shifted window detected, full-scan fallback") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 6L).map(i => line(i, 0, i)))
    val s = new CdcLogMicroBatchStream(log, None)
    val mid = s.latestOffset(LsnOffset.zero, ReadLimit.maxRows(2))
      .asInstanceOf[LsnOffset]
    val end = s.latestOffset(mid, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    val p = s.planInputPartitions(mid, end)(0).asInstanceOf[CdcLogPartition]
    assert(p.fromPos > 0 && p.toPos > p.fromPos) // windowed plan

    // retention rewrite lands AFTER planning, BEFORE the executor reads:
    // drop lines 1-2, append filler so the file still covers toPos — the
    // exact scenario where the old validity check passed but every byte
    // had shifted (silent in-window row loss)
    val survivors = (3L to 6L).map(i => line(i, 0, i)) ++
      (7L to 12L).map(i => line(i, 0, i))
    Files.write(Paths.get(log),
      (survivors.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    assert(Files.size(Paths.get(log)) >= p.toPos)

    // reader must notice (stamp/content mismatch) and fall back to the
    // full scan — the key window (2,0)..(6,0] still returns exactly 3..6
    assert(readAll(p) == Seq((3L, 0L), (4L, 0L), (5L, 0L), (6L, 0L)))
  }

  test("chunked suffix indexing: tiny chunks produce the same index and windows") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 40L).map(i => line(i, 0, i)))
    val s = new CdcLogMicroBatchStream(log, None)
    s.indexChunkBytes = 7L // far smaller than any line → exercises widening
    val end = s.latestOffset(LsnOffset.zero, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    assert(end.commitLsn == 40L && end.pos == Files.size(Paths.get(log)))
    val p = s.planInputPartitions(LsnOffset.zero, end)(0)
      .asInstanceOf[CdcLogPartition]
    assert(p.fromPos == 0L && p.toPos == end.pos)
    assert(readAll(p) == (1L to 40L).map(i => (i, 0L)))

    // incremental append with chunking still joins cleanly
    append(log, (41L to 45L).map(i => line(i, 0, i)))
    val end2 = s.latestOffset(end, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    val p2 = s.planInputPartitions(end, end2)(0)
      .asInstanceOf[CdcLogPartition]
    assert(p2.fromPos == end.pos)
    assert(readAll(p2) == (41L to 45L).map(i => (i, 0L)))
  }

  test("byte-budget admission: batches end at the budget, oversized events still flush") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 6L).map(i => line(i, 0, i)))
    val lineBytes = line(1L, 0, 1L).getBytes(StandardCharsets.UTF_8).length + 1
    // budget of ~2.5 lines → batches of 2, 2, 2
    val s = new CdcLogMicroBatchStream(log, None,
      maxBytes = Some(lineBytes * 5L / 2))
    var start = LsnOffset.zero
    val batchSizes = Seq.newBuilder[Int]
    var n = 0
    while (n < 10) {
      val end = s.latestOffset(start, ReadLimit.allAvailable())
        .asInstanceOf[LsnOffset]
      if (end == start) n = 10
      else {
        val p = s.planInputPartitions(start, end)(0)
          .asInstanceOf[CdcLogPartition]
        batchSizes += readAll(p).size
        start = end
        n += 1
      }
    }
    assert(batchSizes.result() == Seq(2, 2, 2))

    // a single event larger than the budget is still admitted (alone)
    val s2 = new CdcLogMicroBatchStream(log, None, maxBytes = Some(1L))
    val end2 = s2.latestOffset(LsnOffset.zero, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    assert(end2.commitLsn == 1L && end2.txOrdinal == 0L)
  }

  test("windowed reads stream in chunks: lines spanning chunk boundaries survive") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 40L).map(i => line(i, 0, i)))
    val s = new CdcLogMicroBatchStream(log, None)
    val end = s.latestOffset(LsnOffset.zero, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    val p = s.planInputPartitions(LsnOffset.zero, end)(0)
      .asInstanceOf[CdcLogPartition]
    assert(p.fromPos >= 0 && p.toPos > p.fromPos, p.toString)
    // tiny chunks force every line to span a chunk boundary (the carry
    // path); results must be identical to the single-chunk read
    val one = readAll(p)
    System.setProperty("graft.cdc.windowChunkBytes", "7")
    try assert(readAll(p) == one && one.size == 40)
    finally System.clearProperty("graft.cdc.windowChunkBytes")
  }

  test("memory-aware admission modulates the byte budget (ST7 analog)") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 6L).map(i => line(i, 0, i)))
    val lineBytes = line(1L, 0, 1L).getBytes(StandardCharsets.UTF_8).length + 1
    val budget = lineBytes * 4L + 2 // 4 lines when unconstrained
    def sizes(usage: Double): Seq[Int] = {
      val saved = CdcLogSource.memoryUsage
      CdcLogSource.memoryUsage = () => usage
      try {
        val s = new CdcLogMicroBatchStream(log, None,
          maxBytes = Some(budget), memoryAware = true)
        var start = LsnOffset.zero
        val out = Seq.newBuilder[Int]
        var n = 0
        while (n < 10) {
          val end = s.latestOffset(start, ReadLimit.allAvailable())
            .asInstanceOf[LsnOffset]
          if (end == start) n = 10
          else {
            val p = s.planInputPartitions(start, end)(0)
              .asInstanceOf[CdcLogPartition]
            out += readAll(p).size
            start = end; n += 1
          }
        }
        out.result()
      } finally CdcLogSource.memoryUsage = saved
    }
    // relaxed (< low watermark): the configured budget applies — 4+2
    assert(sizes(0.30) == Seq(4, 2))
    // between watermarks: budget halves — 2,2,2
    assert(sizes(0.80) == Seq(2, 2, 2))
    // above the high watermark: minimum admission, one entry per trigger
    // (the reference BLOCKS polls here; a trigger-driven source admits
    // the minimum instead so memory stays flat without stalling)
    assert(sizes(0.95) == Seq(1, 1, 1, 1, 1, 1))
  }

  test("blocking memory backpressure: sticky block at high watermark, " +
      "resume only below the low watermark (reference hysteresis)") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 4L).map(i => line(i, 0, i)))
    val saved = CdcLogSource.memoryUsage
    @volatile var usage = 0.30
    CdcLogSource.memoryUsage = () => usage
    try {
      val s = new CdcLogMicroBatchStream(log, None,
        memoryBlocking = true)
      def admit(start: LsnOffset): LsnOffset =
        s.latestOffset(start, ReadLimit.allAvailable())
          .asInstanceOf[LsnOffset]
      // relaxed: everything admits
      val end = admit(LsnOffset.zero)
      assert(end.commitLsn == 4L && !s.memBlocked)
      append(log, Seq(line(5L, 0, 5L)))
      // pressure spike → block: empty micro-batch, state sticky
      usage = 0.90
      assert(admit(end) == end && s.memBlocked)
      // hysteresis: dropping below HIGH but above LOW stays blocked
      // (the modulating mode would admit here — this is the difference)
      usage = 0.80
      assert(admit(end) == end && s.memBlocked)
      // below LOW → unblock and admit the pending tail
      usage = 0.70
      val resumed = admit(end)
      assert(resumed.commitLsn == 5L && !s.memBlocked)
      // a fresh stream between the watermarks does NOT start blocked
      usage = 0.80
      val s2 = new CdcLogMicroBatchStream(log, None, memoryBlocking = true)
      assert(s2.latestOffset(LsnOffset.zero, ReadLimit.allAvailable())
        .asInstanceOf[LsnOffset].commitLsn == 5L && !s2.memBlocked)
    } finally CdcLogSource.memoryUsage = saved
  }

  test("stale pos hints in offsets are ignored (planner re-derives from index)") {
    val log = s"${tmp()}/wal.log"
    append(log, (1L to 4L).map(i => line(i, 0, i)))
    val s = new CdcLogMicroBatchStream(log, None)
    // fabricate a checkpointed start with a wildly wrong pos hint
    val start = LsnOffset(2L, 0L, boundary = true, pos = 999999L)
    val end = s.latestOffset(start, ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    val p = s.planInputPartitions(start, end)(0)
      .asInstanceOf[CdcLogPartition]
    assert(readAll(p) == Seq((3L, 0L), (4L, 0L)))
  }
}
