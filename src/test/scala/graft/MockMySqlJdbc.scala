package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{SQLException, SQLIntegrityConstraintViolationException}
import scala.collection.mutable

/** Scripted in-memory JDBC double for the MySQL dialect — there is no
  * embeddable MySQL-mode database in this sandbox (only Derby, which has
  * no `ON DUPLICATE KEY UPDATE`), so this executes the engine's actual
  * JDBC write path (DriverManager resolution, prepared-statement
  * parameter binding, addBatch/executeBatch chunking, watermark
  * transaction shape) against an in-memory table store that implements
  * MySQL's upsert semantics for exactly the statement shapes the engine
  * generates ([[graft.streaming.JdbcUpsertSink]]): CREATE TABLE, SELECT,
  * keyed UPDATE, INSERT, and `INSERT … ON DUPLICATE KEY UPDATE` in both
  * the overwrite (`c=VALUES(c)`) and additive (`c=c+VALUES(c)`) forms.
  *
  * What this tests is OUR sink logic (SQL generation + batching +
  * recovery paths), not MySQL's parser — the double parses only the
  * grammar our generators emit and throws loudly on anything else.
  * `forceNoInfoBatchCounts` simulates the MySQL Connector/J
  * `rewriteBatchedStatements` behavior of answering executeBatch with
  * SUCCESS_NO_INFO (-2) while having applied the statements — the case
  * that made count-based additive recovery unsound.
  *
  * Thread-safe per database (executor threads in local mode share the
  * JVM); transactions are not simulated (commit/rollback are no-ops) —
  * the Derby arm of JdbcSpec covers transactional behavior live.
  */
object MockMySqlJdbc {

  private val IdentR = "[`\"]([^`\"]+)[`\"]".r

  class Table(val cols: Seq[String], val keys: Seq[String]) {
    val rows = mutable.LinkedHashMap.empty[Seq[Any], mutable.LinkedHashMap[String, Any]]
  }

  class Database {
    val tables = mutable.LinkedHashMap.empty[String, Table]
    var forceNoInfoBatchCounts: Boolean = false
  }

  private val dbs = mutable.HashMap.empty[String, Database]

  def database(name: String): Database = synchronized {
    dbs.getOrElseUpdate(name, new Database)
  }

  def drop(name: String): Unit = synchronized { dbs.remove(name) }

  def url(name: String): String = s"jdbc:graftmock:$name"

  // ------------------------------------------------------------------
  // SQL execution over the database (grammar = our generators only)
  // ------------------------------------------------------------------

  private def idents(s: String): Seq[String] = IdentR.findAllMatchIn(s).map(_.group(1)).toSeq

  /** Split on top-level commas (DECIMAL(p,s) etc. nest parens). */
  private def splitTop(body: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) parts += last
    parts.result()
  }

  private def createTable(db: Database, sql: String): Unit = {
    val open = sql.indexOf('(')
    val name = idents(sql.substring(0, open)).head
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    val parts = splitTop(body)
    val cols = Seq.newBuilder[String]
    val keys = Seq.newBuilder[String]
    parts.foreach { p =>
      val up = p.toUpperCase
      if (up.startsWith("PRIMARY KEY")) keys ++= idents(p)
      else {
        val c = idents(p).head
        cols += c
        if (up.contains("PRIMARY KEY")) keys += c
      }
    }
    db.synchronized {
      if (db.tables.contains(name)) throw new SQLException(s"table exists: $name")
      db.tables(name) = new Table(cols.result(), keys.result())
    }
  }

  private def keyOf(t: Table, row: collection.Map[String, Any]): Seq[Any] =
    t.keys.map(row(_))

  private def addNumeric(a: Any, b: Any): Any = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number)
        if a.isInstanceOf[java.lang.Double] || a.isInstanceOf[java.lang.Float] ||
          b.isInstanceOf[java.lang.Double] || b.isInstanceOf[java.lang.Float] =>
      java.lang.Double.valueOf(x.doubleValue() + y.doubleValue())
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Long.valueOf(x.longValue() + y.longValue())
    case _ => throw new SQLException(s"cannot add $a + $b")
  }

  /** One INSERT [ON DUPLICATE KEY UPDATE] with bound params; returns the
    * MySQL-style count (1 insert, 2 update). */
  private def insert(db: Database, sql: String, params: Seq[Any]): Int = {
    val valuesIdx = sql.toUpperCase.indexOf(" VALUES")
    val head = sql.substring(0, valuesIdx)
    val table = idents(head).head
    val cols = idents(head).drop(1)
    val odkuIdx = sql.toUpperCase.indexOf("ON DUPLICATE KEY UPDATE")
    db.synchronized {
      val t = db.tables.getOrElse(table, throw new SQLException(s"no table $table"))
      require(params.length == cols.length, s"bound ${params.length} of ${cols.length}")
      val incoming = mutable.LinkedHashMap(cols.zip(params): _*)
      val key = keyOf(t, incoming)
      t.rows.get(key) match {
        case None =>
          t.rows(key) = mutable.LinkedHashMap(t.cols.map(c => c -> incoming(c)): _*)
          1
        case Some(_) if odkuIdx < 0 =>
          throw new SQLIntegrityConstraintViolationException(s"duplicate key $key in $table")
        case Some(existing) =>
          splitTop(sql.substring(odkuIdx + "ON DUPLICATE KEY UPDATE".length)).foreach { a =>
            val c = idents(a).head
            // `c`=`c`+VALUES(`c`) is additive; `c`=VALUES(`c`) overwrites
            if (a.replaceAll("\\s", "").contains("+VALUES("))
              existing(c) = addNumeric(existing(c), incoming(c))
            else existing(c) = incoming(c)
          }
          2
      }
    }
  }

  private def update(db: Database, sql: String, params: Seq[Any]): Int = {
    val up = sql.toUpperCase
    val setIdx = up.indexOf(" SET ")
    val whereIdx = up.indexOf(" WHERE ")
    val table = idents(sql.substring(0, setIdx)).head
    val setCols = splitTop(sql.substring(setIdx + 5, whereIdx)).map { a =>
      (idents(a).head, a.replaceAll("\\s", "").contains("+?"))
    }
    val whereCols = idents(sql.substring(whereIdx))
    db.synchronized {
      val t = db.tables.getOrElse(table, throw new SQLException(s"no table $table"))
      val setVals = params.take(setCols.length)
      val whereVals = params.drop(setCols.length)
      var n = 0
      t.rows.valuesIterator.foreach { row =>
        if (whereCols.zip(whereVals).forall { case (c, v) => row(c) == v }) {
          setCols.zip(setVals).foreach { case ((c, additive), v) =>
            row(c) = if (additive) addNumeric(row(c), v) else v
          }
          n += 1
        }
      }
      n
    }
  }

  private def select(db: Database, sql: String, params: Seq[Any]): Seq[Seq[Any]] = {
    val up = sql.toUpperCase
    val fromIdx = up.indexOf(" FROM ")
    val whereIdx = up.indexOf(" WHERE ")
    val cols = idents(sql.substring(0, fromIdx))
    val tailEnd = if (whereIdx < 0) sql.length else whereIdx
    val table = idents(sql.substring(fromIdx, tailEnd)).head
    val whereCols = if (whereIdx < 0) Seq.empty else idents(sql.substring(whereIdx))
    db.synchronized {
      val t = db.tables.getOrElse(table, throw new SQLException(s"no table $table"))
      t.rows.valuesIterator
        .filter(row => whereCols.zip(params).forall { case (c, v) => row(c) == v })
        .map(row => cols.map(row(_)))
        .toSeq
    }
  }

  // ------------------------------------------------------------------
  // java.sql plumbing via dynamic proxies
  // ------------------------------------------------------------------

  private def proxy[A](iface: Class[A])(handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): A =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface), new InvocationHandler {
      def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
        val a = if (args == null) Array.empty[AnyRef] else args
        handle.applyOrElse((m.getName, a), { _: (String, Array[AnyRef]) =>
          m.getReturnType match {
            case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
            case java.lang.Integer.TYPE => java.lang.Integer.valueOf(0)
            case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
            case java.lang.Void.TYPE => null
            case _ => null
          }
        })
      }
    }).asInstanceOf[A]

  private def resultSet(rows: Seq[Seq[Any]]): java.sql.ResultSet = {
    var i = -1
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        i += 1; java.lang.Boolean.valueOf(i < rows.length)
      case ("getObject", Array(idx: java.lang.Integer)) => rows(i)(idx - 1).asInstanceOf[AnyRef]
      case ("getLong", Array(idx: java.lang.Integer)) =>
        java.lang.Long.valueOf(rows(i)(idx - 1).asInstanceOf[java.lang.Number].longValue())
      case ("getString", Array(idx: java.lang.Integer)) => String.valueOf(rows(i)(idx - 1))
      case ("close", _) => null
    }
  }

  private def preparedStatement(db: Database, sql: String): java.sql.PreparedStatement = {
    val params = mutable.HashMap.empty[Int, Any]
    val batches = mutable.ListBuffer.empty[Seq[Any]]
    def boundParams: Seq[Any] =
      (1 to (if (params.isEmpty) 0 else params.keys.max)).map(params(_))
    def runOne(p: Seq[Any]): Int = {
      val up = sql.trim.toUpperCase
      if (up.startsWith("INSERT")) insert(db, sql, p)
      else if (up.startsWith("UPDATE")) update(db, sql, p)
      else throw new SQLException(s"unsupported batched statement: $sql")
    }
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("setObject", Array(i: java.lang.Integer, v)) => params(i.intValue()) = v; null
      case ("setString", Array(i: java.lang.Integer, v)) => params(i.intValue()) = v; null
      case ("setLong", Array(i: java.lang.Integer, v)) => params(i.intValue()) = v; null
      case ("addBatch", Array()) => batches += boundParams; null
      case ("executeBatch", _) =>
        val counts = batches.map(runOne).toArray
        batches.clear()
        if (db.forceNoInfoBatchCounts && sql.trim.toUpperCase.startsWith("UPDATE"))
          Array.fill(counts.length)(java.sql.Statement.SUCCESS_NO_INFO)
        else counts
      case ("executeUpdate", _) => java.lang.Integer.valueOf(runOne(boundParams))
      case ("executeQuery", _) => resultSet(select(db, sql, boundParams))
      case ("close", _) => null
    }
  }

  private def statement(db: Database): java.sql.Statement =
    proxy(classOf[java.sql.Statement]) {
      case ("execute", Array(sql: String)) =>
        if (sql.trim.toUpperCase.startsWith("CREATE TABLE")) createTable(db, sql)
        else throw new SQLException(s"unsupported statement: $sql")
        java.lang.Boolean.FALSE
      case ("executeQuery", Array(sql: String)) => resultSet(select(db, sql, Seq.empty))
      case ("close", _) => null
    }

  private def metaData(db: Database): java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("getTables", Array(_, _, name: String, _)) =>
        db.synchronized {
          resultSet(if (db.tables.contains(name)) Seq(Seq(name)) else Seq.empty)
        }
    }

  private def connection(db: Database): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", Array(sql: String)) => preparedStatement(db, sql)
      case ("createStatement", _) => statement(db)
      case ("getMetaData", _) => metaData(db)
      case ("setAutoCommit", _) | ("commit", _) | ("rollback", _) | ("close", _) => null
    }

  /** JVM-global driver registration (idempotent via object init). */
  private lazy val registered: Unit = {
    val driver = proxy(classOf[java.sql.Driver]) {
      case ("acceptsURL", Array(u: String)) =>
        java.lang.Boolean.valueOf(u.startsWith("jdbc:graftmock:"))
      case ("connect", Array(u: String, _)) =>
        if (!u.startsWith("jdbc:graftmock:")) null
        else connection(database(u.stripPrefix("jdbc:graftmock:")))
    }
    java.sql.DriverManager.registerDriver(driver)
  }

  def ensureRegistered(): Unit = registered
}
