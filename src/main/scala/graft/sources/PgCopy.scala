package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.PgText

/** Live execution of the planned snapshot copy over the wire — the
  * missing half of S1 beside [[SnapshotScan]]'s planner: each CTID-range
  * scan unit runs its own `COPY (SELECT …) TO STDOUT` on its own
  * protocol-v3 connection (the reference's per-worker copy connections,
  * copy.rs:344-370; COPY SQL shape transaction.rs:28-61), and the rows
  * flow through the COPY TEXT codec ([[PgText.parseCopyRow]]).
  *
  * Scale design: [[copyTable]] parallelizes the unit list so EVERY
  * EXECUTOR TASK opens its own connection and streams its range —
  * driver never touches row data; largest-first unit order gives
  * LPT-ish scheduling under Spark's task scheduler. Output columns are
  * COPY TEXT strings (NULL = SQL NULL) for downstream typed decoding
  * against the declared schema — the same text-codec seam the CDC
  * envelope uses.
  */
object PgCopy {
  /** Run one `COPY … TO STDOUT` on an OPEN connection; returns raw COPY
    * TEXT lines. Protocol: CopyOutResponse 'H', CopyData 'd' per row,
    * CopyDone 'c', CommandComplete, ReadyForQuery. */
  def copyText(conn: PgWireConnection, copySql: String): Vector[String] = {
    conn.simpleQuery(copySql)
    val out = Vector.newBuilder[String]
    var pending = new StringBuilder
    var done = false
    while (!done) {
      val (t, payload) = conn.readMessage()
      t match {
        case 'H' => () // CopyOutResponse — rows follow
        case 'd' =>
          // row data: split on newlines; a row MAY span CopyData frames
          pending.append(new String(payload, StandardCharsets.UTF_8))
          var idx = pending.indexOf("\n")
          while (idx >= 0) {
            out += pending.substring(0, idx)
            pending.delete(0, idx + 1)
            idx = pending.indexOf("\n")
          }
        case 'c' => // CopyDone
          require(pending.isEmpty || pending.toString.forall(_ == '\r'),
            s"COPY stream ended mid-row: '${pending.toString.take(80)}'")
        case 'Z' => done = true
        case 'E' => throw new java.io.IOException(
          s"COPY failed: ${ReplicationSocketClient.errorMessage(payload)}")
        case _ => () // CommandComplete / NoticeResponse
      }
    }
    out.result()
  }

  /** Distributed snapshot copy: one Spark task per scan unit, each on
    * its own connection. Returns a DataFrame of `columns` as COPY TEXT
    * strings (nulls preserved), ready for typed decoding. */
  def copyTable(spark: SparkSession, host: String, port: Int, user: String,
      database: String, password: String,
      units: Seq[SnapshotScan.ScanUnit], columns: Seq[String],
      rowFilter: Option[String] = None): DataFrame = {
    val sqls = units.map(u =>
      s"COPY (${SnapshotScan.selectSql(u, columns, rowFilter)}) TO STDOUT")
    val nCols = columns.length
    val rows = spark.sparkContext
      .parallelize(sqls, math.max(1, sqls.size))
      .mapPartitions { it =>
        it.flatMap { sql =>
          val conn = new PgWireConnection(host, port, user, database,
            password)
          conn.connect()
          try copyText(conn, sql).map { line =>
            val vals = PgText.parseCopyRow(line)
            require(vals.length == nCols,
              s"COPY row has ${vals.length} columns, expected $nCols")
            Row.fromSeq(vals.map(_.orNull))
          }
          finally conn.close()
        }
      }
    spark.createDataFrame(rows,
      StructType(columns.map(c => StructField(c, StringType))))
  }
}
