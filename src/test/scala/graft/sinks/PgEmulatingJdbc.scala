package graft.sinks

import java.lang.reflect.{InvocationHandler, InvocationTargetException,
  Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverManager,
  PreparedStatement, SQLException}

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
    DriverManager.registerDriver(ShimDriver); ()
  }

  private def proxy[T](iface: Class[T], h: InvocationHandler): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array[Class[_]](iface), h)
      .asInstanceOf[T]

  private def delegate(target: AnyRef, m: Method,
      args: Array[AnyRef]): AnyRef =
    try m.invoke(target,
      (if (args == null) Array.empty[AnyRef] else args): _*)
    catch { case e: InvocationTargetException => throw e.getCause }

  private object ShimDriver extends Driver {
    def acceptsURL(url: String): Boolean =
      url != null && url.startsWith(Prefix)
    def connect(url: String, info: java.util.Properties): Connection = {
      if (!acceptsURL(url)) return null
      wrapConnection(DriverManager.getConnection(
        "jdbc:derby:" + url.substring(Prefix.length), info))
    }
    def getMajorVersion: Int = 42
    def getMinorVersion: Int = 0
    def jdbcCompliant(): Boolean = true
    def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    def getParentLogger: java.util.logging.Logger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }

  private def wrapConnection(real: Connection): Connection =
    proxy(classOf[Connection], (_, m: Method, args: Array[AnyRef]) =>
      m.getName match {
        case "getMetaData" =>
          val md = real.getMetaData
          proxy(classOf[DatabaseMetaData],
            (_, mm: Method, margs: Array[AnyRef]) =>
              if (mm.getName == "getDatabaseProductName") "PostgreSQL"
              else delegate(md, mm, margs))
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
