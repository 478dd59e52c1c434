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
    * its own connection. When `snapshotId` is set every worker joins the
    * exporting transaction's snapshot (`SET TRANSACTION SNAPSHOT`) so
    * all ranges read ONE consistent point in time — the reference's
    * consistent-multi-connection-snapshot requirement (copy.rs:344-370);
    * the exporting connection must stay open until the copy finishes.
    * Returns a DataFrame of `columns` as COPY TEXT strings (nulls
    * preserved), ready for [[decodeTyped]]. */
  def copyTable(spark: SparkSession, host: String, port: Int, user: String,
      database: String, password: String,
      units: Seq[SnapshotScan.ScanUnit], columns: Seq[String],
      rowFilter: Option[String] = None,
      snapshotId: Option[String] = None): DataFrame = {
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
          try {
            snapshotId.foreach { id =>
              conn.simpleQuery("BEGIN ISOLATION LEVEL REPEATABLE READ")
              conn.drainUntilReady()
              conn.simpleQuery(s"SET TRANSACTION SNAPSHOT '$id'")
              conn.drainUntilReady()
            }
            copyText(conn, sql).map { line =>
              val vals = PgText.parseCopyRow(line)
              require(vals.length == nCols,
                s"COPY row has ${vals.length} columns, expected $nCols")
              Row.fromSeq(vals.map(_.orNull))
            }
          } finally conn.close()
        }
      }
    spark.createDataFrame(rows,
      StructType(columns.map(c => StructField(c, StringType))))
  }

  /** Decode COPY TEXT columns to their declared Spark types with
    * POSTGRES text semantics (not bare casts): bool `t`/`f`, bytea
    * `\x…` hex, floats with `NaN`/`±Infinity`, `time` as micros-of-day,
    * and 1-D arrays (`{…}` literals, `NULL` elements, quoted strings).
    * Numeric NaN cannot live in DecimalType → null (the precision-less
    * numeric stays text upstream, PgTypeMap). Mirrors [[graft.core.PgText]]
    * as codegen-friendly Column expressions — no UDFs in the backfill
    * path. */
  def decodeTyped(df: DataFrame,
      schema: graft.core.TableSchemaV): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    def scalar(c: Column, pgType: String, modifier: Int): Column = {
      val t = pgType.toLowerCase.stripPrefix("pg_catalog.")
      t match {
        case "bool" | "boolean" =>
          when(c === "t", lit(true)).when(c === "f", lit(false))
            .otherwise(lit(null).cast("boolean"))
        case "bytea" => unhex(substring(c, 3, Int.MaxValue))
        case "time" => // micros of day
          unix_micros(to_timestamp(concat(lit("1970-01-01 "), c)))
        case _ => c.cast(graft.core.PgTypeMap.toSpark(t, modifier))
      }
    }
    val cols = schema.replicatedColumns.map { spec =>
      val c = col(spec.name)
      val t = spec.pgType.toLowerCase.stripPrefix("pg_catalog.")
      val decoded =
        if (t.startsWith("_")) {
          // 1-D array literal {a,"b c",NULL}: strip braces, split on
          // commas OUTSIDE quotes, unquote/unescape, NULL sentinel
          val inner = regexp_replace(c, "^\\{|\\}$", "")
          val parts = split(inner, ",(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)")
          when(c.isNull, lit(null)).otherwise(
            when(inner === "", array().cast("array<string>")).otherwise(parts)
              .pipe { arr =>
                transform(arr, x => {
                  val unq = when(x.startsWith("\""),
                    regexp_replace(regexp_replace(
                      x.substr(lit(2), length(x) - 2),
                      "\\\\\"", "\""), "\\\\\\\\", "\\\\"))
                    .otherwise(x)
                  when(x === "NULL", lit(null).cast("string"))
                    .otherwise(unq)
                }).pipe(a => transform(a, e =>
                  scalar(e, t.substring(1), spec.modifier)))
              })
        } else scalar(c, t, spec.modifier)
      decoded.as(spec.name)
    }
    df.select(cols: _*)
  }

  private implicit final class Piped[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
