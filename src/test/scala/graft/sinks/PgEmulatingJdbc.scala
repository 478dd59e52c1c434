package graft.sinks

import java.lang.reflect.{InvocationHandler, InvocationTargetException,
  Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverManager,
  PreparedStatement, SQLException, Statement}

/** Test-scope JDBC shim emulating the PostgreSQL driver's dialect
  * surface over embedded Derby — the in-sandbox "second engine" for
  * [[JdbcLeaseStore]]'s dialect selection (no live PG server or pgjdbc
  * jar is reachable offline, so the PG-specific seams are emulated and
  * everything else runs for real against Derby):
  *
  *  - `DatabaseMetaData.getDatabaseProductName` reports `PostgreSQL`,
  *    driving the store's dialect detection;
  *  - any statement carrying the `{fn TIMESTAMPADD(SQL_TSI_FRAC_SECOND,
  *    …)}` escape throws at prepare — pgjdbc never implemented the
  *    FRAC_SECOND interval — so the pre-dialect (Derby-only) expiry
  *    code is verifiably RED under this engine;
  *  - the PG-native `CURRENT_TIMESTAMP + make_interval(secs => ?)`
  *    expression is executed with PG semantics by rewriting it to
  *    Derby's chained TIMESTAMPADD and splitting the bound double
  *    seconds into (nanos remainder, whole seconds), so the CAS
  *    statements run end-to-end against a real engine clock.
  *
  * URL shape: `jdbc:fakepg:<suffix>` → `jdbc:derby:<suffix>`.
  */
object PgEmulatingJdbc {
  val Prefix = "jdbc:fakepg:"

  /** Same shim reporting PostgreSQL MAJOR VERSION 14 — selects the
    * sink's pre-MERGE arm (`INSERT … ON CONFLICT` + `DELETE … USING`),
    * which the shim transpiles to Derby so the arm executes end-to-end
    * against a real engine. The default [[Prefix]] reports 16
    * (standard MERGE passes through). */
  val Prefix14 = "jdbc:fakepg14:"

  private val PgInterval = "CURRENT_TIMESTAMP + make_interval(secs => ?)"
  private val DerbyInterval =
    "{fn TIMESTAMPADD(SQL_TSI_FRAC_SECOND, CAST(? AS INTEGER), " +
      "{fn TIMESTAMPADD(SQL_TSI_SECOND, CAST(? AS INTEGER), " +
      "CURRENT_TIMESTAMP)})}"

  /** Parameter setters whose FIRST argument is the 1-based parameter
    * index (NOT setFetchSize/setMaxRows-style statement properties). */
  private val ParamSetters = Set("setString", "setInt", "setLong",
    "setDouble", "setFloat", "setShort", "setByte", "setBoolean",
    "setBigDecimal", "setTimestamp", "setDate", "setTime", "setObject",
    "setNull", "setBytes")

  /** Idempotent driver registration. */
  def register(): Unit = Registered
  private lazy val Registered: Unit = {
    DriverManager.registerDriver(new PgEmulatingShimDriver); ()
  }

  private def proxy[T](iface: Class[T], h: InvocationHandler): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array[Class[_]](iface), h)
      .asInstanceOf[T]

  private def delegate(target: AnyRef, m: Method,
      args: Array[AnyRef]): AnyRef =
    try m.invoke(target,
      (if (args == null) Array.empty[AnyRef] else args): _*)
    catch { case e: InvocationTargetException => throw e.getCause }

  private[sinks] def wrapConnection(real: Connection, major: Int): Connection =
    proxy(classOf[Connection], (_, m: Method, args: Array[AnyRef]) =>
      m.getName match {
        case "getMetaData" =>
          val md = real.getMetaData
          proxy(classOf[DatabaseMetaData],
            (_, mm: Method, margs: Array[AnyRef]) =>
              mm.getName match {
                case "getDatabaseProductName" => "PostgreSQL"
                case "getDatabaseMajorVersion" => Integer.valueOf(major)
                case _ => delegate(md, mm, margs)
              })
        case "createStatement" =>
          val st = delegate(real, m, args).asInstanceOf[Statement]
          // statement-level SQL goes through the PG→Derby transpiler:
          // PG-only forms execute for real, Derby-only forms are
          // REFUSED the way a real PG server would refuse them
          proxy(classOf[Statement], (_, sm: Method, sargs: Array[AnyRef]) =>
            if (Set("execute", "executeUpdate", "executeQuery",
                  "addBatch", "executeLargeUpdate").contains(sm.getName) &&
                sargs != null && sargs.nonEmpty &&
                sargs(0).isInstanceOf[String]) {
              val newArgs = sargs.clone()
              newArgs(0) = pgToDerby(sargs(0).asInstanceOf[String])
              delegate(st, sm, newArgs)
            } else delegate(st, sm, sargs))
        case "prepareStatement" if args != null && args.nonEmpty &&
            args(0).isInstanceOf[String] =>
          val sql = args(0).asInstanceOf[String]
          // pgjdbc: FRAC_SECOND is not an implemented interval type
          if (sql.contains("SQL_TSI_FRAC_SECOND"))
            throw new SQLException(
              "Interval type FRAC_SECOND not yet implemented", "0A000")
          val at = sql.indexOf(PgInterval)
          if (at < 0) delegate(real, m, args)
          else {
            require(sql.indexOf(PgInterval, at + 1) < 0,
              "shim supports one interval expression per statement")
            // 1-based index of the make_interval parameter
            val k = sql.substring(0, at).count(_ == '?') + 1
            val newArgs = args.clone()
            newArgs(0) = sql.replace(PgInterval, DerbyInterval)
            wrapStatement(
              delegate(real, m, newArgs).asInstanceOf[PreparedStatement], k)
          }
        case _ => delegate(real, m, args)
      })

  private def refuse(sql: String): Nothing =
    throw new SQLException(
      s"""syntax error at or near "${sql.trim.takeWhile(!_.isWhitespace)}"""",
      "42601")

  /** Quoted-identifier regex fragment. */
  private val Id = """("(?:[^"]|"")+")"""
  private val RenamePg =
    s"""(?s)^\\s*ALTER TABLE $Id RENAME COLUMN $Id TO $Id\\s*$$""".r
  private val DropNotNullPg =
    s"""(?s)^\\s*ALTER TABLE $Id ALTER COLUMN $Id DROP NOT NULL\\s*$$""".r
  private val SetDefaultPg =
    s"""(?s)^\\s*ALTER TABLE $Id ALTER COLUMN $Id SET DEFAULT (.+)$$""".r
  private val DropDefaultPg =
    s"""(?s)^\\s*ALTER TABLE $Id ALTER COLUMN $Id DROP DEFAULT\\s*$$""".r
  private val DerbyRelax =
    s"""(?s)^\\s*ALTER TABLE $Id ALTER COLUMN $Id NULL\\s*$$""".r
  private val DeleteUsing =
    s"""(?s)^\\s*DELETE FROM $Id\\s+USING $Id\\s+WHERE (.+)$$""".r
  private val InsertOnConflict =
    (s"""(?s)^\\s*INSERT INTO $Id \\((.*?)\\)\\s+SELECT (.*?) FROM $Id""" +
      s"""\\s+WHERE (.*?)\\s+ON CONFLICT \\((.*?)\\) DO UPDATE SET """ +
      """(.*?)\s+WHERE (EXCLUDED\..*)$""").r

  /** PG SQL → Derby SQL for the statement shapes graft emits: PG-only
    * column DDL and the pre-15 upsert pair run FOR REAL on Derby, while
    * Derby-only forms (Derby's RENAME COLUMN verb, its bare
    * `ALTER COLUMN … NULL` relax, BLOB / bare-DOUBLE type names) are
    * refused with PostgreSQL's 42601 — proving the sink actually
    * SWITCHED dialect rather than emitting Derby SQL that PG would
    * reject. Portable statements pass through untouched. */
  private[sinks] def pgToDerby(sql: String): String = sql match {
    // ---- Derby-isms a real PG server would refuse
    case s if s.trim.startsWith("RENAME COLUMN") => refuse(s)
    case DerbyRelax(_, _) => refuse(sql)
    case s if isDdl(s) && hasBareWord(s, "BLOB") => refuse(s)
    case s if isDdl(s) && hasBareWord(s, "DOUBLE") &&
        !s.contains("DOUBLE PRECISION") => refuse(s)
    // ---- PG-only column DDL → Derby equivalents
    case RenamePg(t, from, to) => s"RENAME COLUMN $t.$from TO $to"
    case DropNotNullPg(t, c) => s"ALTER TABLE $t ALTER COLUMN $c NULL"
    case SetDefaultPg(t, c, expr) =>
      s"ALTER TABLE $t ALTER COLUMN $c DEFAULT ${expr.trim}"
    case DropDefaultPg(t, c) =>
      s"ALTER TABLE $t ALTER COLUMN $c DEFAULT NULL"
    // ---- pre-15 upsert pair → Derby executable forms
    case DeleteUsing(t, s, cond) =>
      s"DELETE FROM $t WHERE EXISTS (SELECT 1 FROM $s WHERE $cond)"
    case InsertOnConflict(t, insCols, _, src, srcWhere, keys, sets,
        guard) =>
      val on = keys.split(",").map(_.trim)
        .map(k => s"$t.$k = $src.$k").mkString(" AND ")
      val cols = insCols.split(",").map(_.trim)
      val derbySets = sets.replace("EXCLUDED.", s"$src.")
      val derbyGuard = guard.replace("EXCLUDED.", s"$src.")
      s"""MERGE INTO $t USING $src ON $on
         WHEN MATCHED AND $srcWhere AND $derbyGuard
           THEN UPDATE SET $derbySets
         WHEN NOT MATCHED AND $srcWhere THEN INSERT
           (${cols.mkString(", ")})
           VALUES (${cols.map(c => s"$src.$c").mkString(", ")})"""
    // ---- PG type spellings in DDL → Derby's
    case s if isDdl(s) =>
      replaceOutsideQuotes(
        replaceOutsideQuotes(
          replaceOutsideQuotes(s, "BYTEA", "BLOB"),
          "DOUBLE PRECISION", "DOUBLE"),
        "TEXT", "VARCHAR(32672)")
    case s => s
  }

  private def isDdl(sql: String): Boolean = {
    val t = sql.trim
    t.startsWith("CREATE TABLE") ||
      (t.startsWith("ALTER TABLE") && t.contains("ADD COLUMN"))
  }

  /** Whole-word occurrence outside double-quoted identifiers. */
  private def hasBareWord(sql: String, word: String): Boolean =
    sql.split("\"", -1).zipWithIndex.exists { case (seg, i) =>
      i % 2 == 0 && s"\\b$word\\b".r.findFirstIn(seg).nonEmpty
    }

  private def replaceOutsideQuotes(sql: String, from: String,
      to: String): String =
    sql.split("\"", -1).zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 0) seg.replaceAll(s"\\b$from\\b", to) else seg
    }.mkString("\"")

  /** Remap parameter indices around the interval parameter `k`: the
    * single PG double-seconds bind becomes Derby's (nanos, seconds)
    * pair; parameters after it shift by one. */
  private def wrapStatement(real: PreparedStatement,
      k: Int): PreparedStatement =
    proxy(classOf[PreparedStatement],
      (_, m: Method, args: Array[AnyRef]) => {
        if (ParamSetters.contains(m.getName) && args != null &&
            args.nonEmpty && args(0).isInstanceOf[Integer]) {
          val idx = args(0).asInstanceOf[Integer].intValue
          if (idx == k) {
            require(m.getName == "setDouble",
              s"interval parameter bound via ${m.getName}, want setDouble")
            val secs = args(1).asInstanceOf[java.lang.Double].doubleValue
            val whole = math.floor(secs).toLong
            val nanos = math.round((secs - whole) * 1e9)
            real.setInt(k, math.min(nanos, Int.MaxValue.toLong).toInt)
            real.setInt(k + 1, math.min(whole, Int.MaxValue.toLong).toInt)
            null
          } else if (idx > k) {
            val newArgs = args.clone()
            newArgs(0) = Integer.valueOf(idx + 1)
            delegate(real, m, newArgs)
          } else delegate(real, m, args)
        } else delegate(real, m, args)
      })
}

/** TOP-LEVEL driver class: Spark's `DriverRegistry` round-trips the
  * driver by `getClass.getCanonicalName` → `Class.forName`, which only
  * agree for a top-level class (a nested Scala object's canonical name
  * uses dots where its binary name uses `$`). */
final class PgEmulatingShimDriver extends Driver {
  import PgEmulatingJdbc.{Prefix, Prefix14, wrapConnection}
  def acceptsURL(url: String): Boolean =
    url != null && (url.startsWith(Prefix) || url.startsWith(Prefix14))
  def connect(url: String, info: java.util.Properties): Connection = {
    if (!acceptsURL(url)) return null
    val (suffix, major) =
      if (url.startsWith(Prefix14)) (url.substring(Prefix14.length), 14)
      else (url.substring(Prefix.length), 16)
    wrapConnection(
      DriverManager.getConnection("jdbc:derby:" + suffix, info), major)
  }
  def getMajorVersion: Int = 42
  def getMinorVersion: Int = 0
  def jdbcCompliant(): Boolean = true
  def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
