package graft

import graft.streaming.JdbcUpsertSink
import java.sql.DriverManager

/** Live keyed-upsert round trip against embedded Derby (the only DBMS on
  * the classpath) — executes the actual partition-level write path the
  * reference's MySQL sinks correspond to (reference Consumer.scala:
  * 152-181): connection per partition, prepared-statement batching, one
  * transaction per partition. The MySQL single-statement dialect is
  * SQL-generation-tested (no MySQL server here); the portable ANSI path
  * runs for real.
  */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def withDb[A](db: String)(f: String => A): A =
    try f(url(db))
    finally {
      try DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLException => () } // drop always "fails"
    }

  private def readAll(u: String, sql: String): Seq[Seq[Any]] = {
    val conn = DriverManager.getConnection(u)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val buf = Seq.newBuilder[Seq[Any]]
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.result()
    } finally conn.close()
  }

  test("upsert round trip: insert, merge-update, idempotent replay (K3 shape)") {
    withDb("k3") { u =>
      val conn = DriverManager.getConnection(u)
      conn.createStatement().execute(
        """CREATE TABLE "gender_counts" ("gender" VARCHAR(32) PRIMARY KEY, "cnt" BIGINT)""")
      conn.close()

      val batch1 = Seq(("Male", 10L), ("Female", 12L)).toDF("gender", "cnt")
      JdbcUpsertSink.writePortable(batch1, u, "gender_counts", Seq("gender"))
      assert(readAll(u, """SELECT "gender", "cnt" FROM "gender_counts" ORDER BY "gender"""")
        == Seq(Seq("Female", 12L), Seq("Male", 10L)))

      // batch 2: update an existing key, insert a new one
      val batch2 = Seq(("Male", 25L), ("Other", 3L)).toDF("gender", "cnt")
      JdbcUpsertSink.writePortable(batch2, u, "gender_counts", Seq("gender"))
      val want = Seq(Seq("Female", 12L), Seq("Male", 25L), Seq("Other", 3L))
      assert(readAll(u, """SELECT "gender", "cnt" FROM "gender_counts" ORDER BY "gender"""") == want)

      // at-least-once replay of the same batch must be a no-op
      JdbcUpsertSink.writePortable(batch2, u, "gender_counts", Seq("gender"))
      assert(readAll(u, """SELECT "gender", "cnt" FROM "gender_counts" ORDER BY "gender"""") == want)
    }
  }

  test("composite key + space-bearing identifier (K4/K8 shape), multi-partition, small batchSize") {
    withDb("k4") { u =>
      val conn = DriverManager.getConnection(u)
      conn.createStatement().execute(
        """CREATE TABLE "satisfaction_by_class" (
             "class" VARCHAR(32) NOT NULL, "satisfaction" VARCHAR(32) NOT NULL,
             "flight distance" BIGINT,
             PRIMARY KEY ("class", "satisfaction"))""")
      conn.close()

      // 40 keyed rows over 4 partitions with batchSize 7: exercises the
      // chunked executeBatch + miss-insert path across partitions
      val rows = (0 until 40).map(i => (s"c${i % 8}", s"s${i % 5}", i.toLong))
      val df = rows.toDF("class", "satisfaction", "flight distance").repartition(4)
      JdbcUpsertSink.writePortable(df, u, "satisfaction_by_class",
        Seq("class", "satisfaction"), batchSize = 7)
      val got = readAll(u,
        """SELECT "class", "satisfaction", "flight distance" FROM "satisfaction_by_class"""")
      // every distinct (class, satisfaction) present exactly once
      assert(got.size == rows.map(r => (r._1, r._2)).distinct.size)

      // second pass overwrites values deterministically
      val df2 = rows.map { case (c, s, _) => (c, s, 999L) }
        .toDF("class", "satisfaction", "flight distance").repartition(3)
      JdbcUpsertSink.writePortable(df2, u, "satisfaction_by_class",
        Seq("class", "satisfaction"), batchSize = 7)
      val after = readAll(u,
        """SELECT DISTINCT "flight distance" FROM "satisfaction_by_class"""")
      assert(after == Seq(Seq(999L)))
    }
  }

  test("streaming KPI fan-out delivers exactly-once to a live JDBC database") {
    withDb("kpistream") { u =>
      val base = tmpDir("graft-jdbc-stream")
      graft.airline.AirlineFixture.writeSegments(s"$base/in", 4, 250)
      val store = new graft.streaming.JdbcKpiStore(u)
      graft.streaming.KpiStream.startJdbc(
        spark, s"$base/in/*", s"$base/cp", store).awaitTermination()

      // DB state must equal the batch-computed KPIs over the full input
      val all = graft.sources.Tables.airlineCsv(spark, s"$base/in/*").persist()
      graft.airline.AirlineKpis.all.foreach { case (table, transform, keys) =>
        val expect = transform(all)
        val cols = expect.columns.toSeq
        val got = store.readAll(table, cols)
          .map(_.map {
            case d: java.lang.Double => math.round(d * 1e6) / 1e6
            case x => x
          }).toSet
        val want = expect.collect().toSeq
          .map(r => cols.indices.map(i => r.get(i) match {
            case d: Double => math.round(d * 1e6) / 1e6
            case x => x
          })).toSet
        assert(got == want, s"$table: DB state != batch KPIs")
      }
      all.unpersist()

      // replay of an already-applied batch is a transactional no-op
      val before = store.readAll("gender_counts", Seq("Gender", "Count"))
      val batch0 = graft.airline.AirlineKpis.genderCounts(all)
      store.merge("gender_counts", Seq("Gender"), batch0, batchId = 0L)
      assert(store.readAll("gender_counts", Seq("Gender", "Count")) == before)
    }
  }

  test("JDBC stream restart from checkpoint: only new segments merge, no double counting") {
    withDb("kpirestart") { u =>
      val base = tmpDir("graft-jdbc-restart")
      graft.airline.AirlineFixture.writeSegments(s"$base/in", 2, 200)
      val store = new graft.streaming.JdbcKpiStore(u)
      graft.streaming.KpiStream.startJdbc(
        spark, s"$base/in/*", s"$base/cp", store).awaitTermination()
      val wmAfterFirst = store.appliedBatch("gender_counts")

      // new segments arrive; restarting against the SAME checkpoint must
      // process only them (watermark advances, counts stay exact)
      graft.airline.AirlineFixture.writeSegments(s"$base/late", 2, 200)
      val fs = new java.io.File(s"$base/late")
      fs.listFiles().foreach { d =>
        val tgt = new java.io.File(s"$base/in/late_${d.getName}")
        tgt.mkdirs()
        d.listFiles().foreach(f =>
          java.nio.file.Files.copy(f.toPath, new java.io.File(tgt, f.getName).toPath))
      }
      graft.streaming.KpiStream.startJdbc(
        spark, s"$base/in/*", s"$base/cp", store).awaitTermination()
      assert(store.appliedBatch("gender_counts") > wmAfterFirst)

      val all = graft.sources.Tables.airlineCsv(spark, s"$base/in/*")
      val want = graft.airline.AirlineKpis.genderCounts(all)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = store.readAll("gender_counts", Seq("Gender", "Count"))
        .map(r => r.head.asInstanceOf[String] -> r(1).asInstanceOf[Long]).toMap
      assert(got == want, s"restart double-counted or dropped: $got vs $want")
    }
  }

  test("JdbcKpiStore.merge batches updates; misses fall through to a batched insert") {
    withDb("mergebatch") { u =>
      val store = new graft.streaming.JdbcKpiStore(u)
      val b0 = (0 until 10).map(i => (s"k$i", 1L)).toDF("k", "cnt")
      store.merge("counts", Seq("k"), b0, 0L, batchSize = 3)
      // batch 1 chunks (size 3) mix existing keys (additive UPDATE arm)
      // and new keys (miss -> INSERT arm) inside the same executeBatch
      val b1 = (5 until 15).map(i => (s"k$i", 2L)).toDF("k", "cnt")
      store.merge("counts", Seq("k"), b1, 1L, batchSize = 3)
      val got = store.readAll("counts", Seq("k", "cnt"))
        .map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
      val want = ((0 until 5).map(i => s"k$i" -> 1L) ++
        (5 until 10).map(i => s"k$i" -> 3L) ++
        (10 until 15).map(i => s"k$i" -> 2L)).toMap
      assert(got == want)
    }
  }

  test("dialect SQL generation: MySQL upsert and ANSI update/insert quote identifiers") {
    val up = JdbcUpsertSink.upsertSql("t", Seq("k"), Seq("flight distance"))
    assert(up.contains("`flight distance`=VALUES(`flight distance`)"))
    val u2 = JdbcUpsertSink.updateSql("t", Seq("k a"), Seq("v b"), JdbcUpsertSink.AnsiDialect)
    assert(u2 == """UPDATE "t" SET "v b"=? WHERE "k a"=?""")
    val i2 = JdbcUpsertSink.insertSql("t", Seq("k a"), Seq("v b"), JdbcUpsertSink.AnsiDialect)
    assert(i2 == """INSERT INTO "t" ("k a", "v b") VALUES (?, ?)""")
    val a2 = JdbcUpsertSink.additiveUpsertSql("t", Seq("k"), Seq("cnt"))
    assert(a2 ==
      "INSERT INTO `t` (`k`, `cnt`) VALUES (?, ?) ON DUPLICATE KEY UPDATE `cnt`=`cnt`+VALUES(`cnt`)")
  }

  test("MySQL dialect live (mock driver): additive single-statement merge, idempotent replay") {
    MockMySqlJdbc.ensureRegistered()
    val u = MockMySqlJdbc.url("kpimysql")
    try {
      val store = new graft.streaming.JdbcKpiStore(u, JdbcUpsertSink.MySqlDialect)
      val b0 = Seq(("Male", 10L), ("Female", 12L)).toDF("gender", "cnt")
      store.merge("gender_counts", Seq("gender"), b0, 0L)
      // batch 1: additive hit + new key, chunked to exercise executeBatch
      val b1 = Seq(("Male", 5L), ("Other", 3L), ("Female", 1L)).toDF("gender", "cnt")
      store.merge("gender_counts", Seq("gender"), b1, 1L, batchSize = 2)
      def state = store.readAll("gender_counts", Seq("gender", "cnt"))
        .map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
      assert(state == Map("Male" -> 15L, "Female" -> 13L, "Other" -> 3L))
      // at-least-once replay: watermark makes the re-merge a no-op
      store.merge("gender_counts", Seq("gender"), b1, 1L)
      assert(state == Map("Male" -> 15L, "Female" -> 13L, "Other" -> 3L))
      // the additive arm is count-independent by construction: a driver
      // answering executeBatch with SUCCESS_NO_INFO changes nothing
      MockMySqlJdbc.database("kpimysql").forceNoInfoBatchCounts = true
      store.merge("gender_counts", Seq("gender"),
        Seq(("Male", 1L)).toDF("gender", "cnt"), 2L)
      assert(state("Male") == 16L)
    } finally MockMySqlJdbc.drop("kpimysql")
  }

  test("MySQL dialect live (mock driver): ON DUPLICATE KEY overwrite arm from executors") {
    MockMySqlJdbc.ensureRegistered()
    val u = MockMySqlJdbc.url("wmysql")
    try {
      val c = DriverManager.getConnection(u)
      c.createStatement().execute(
        "CREATE TABLE `t` (`k` VARCHAR(32) PRIMARY KEY, `v` BIGINT)")
      c.close()
      JdbcUpsertSink.write(
        Seq(("a", 10L), ("b", 12L)).toDF("k", "v").repartition(3), u, "t", Seq("k"))
      // VALUES() overwrite semantics: a becomes 25, not 35
      JdbcUpsertSink.write(
        Seq(("a", 25L), ("c", 3L)).toDF("k", "v").repartition(3), u, "t", Seq("k"))
      val got = MockMySqlJdbc.database("wmysql").tables("t").rows.values
        .map(r => r("k").toString -> r("v").asInstanceOf[Long]).toMap
      assert(got == Map("a" -> 25L, "b" -> 12L, "c" -> 3L))
    } finally MockMySqlJdbc.drop("wmysql")
  }

  test("SUCCESS_NO_INFO driver: writePortable recovers (absolute values); additive ANSI merge aborts") {
    MockMySqlJdbc.ensureRegistered()
    val u = MockMySqlJdbc.url("noinfo")
    try {
      val db = MockMySqlJdbc.database("noinfo")
      val c = DriverManager.getConnection(u)
      c.createStatement().execute(
        "CREATE TABLE `pt` (`k` VARCHAR(32) PRIMARY KEY, `v` BIGINT)")
      c.close()
      JdbcUpsertSink.write(Seq(("a", 1L)).toDF("k", "v"), u, "pt", Seq("k"))
      db.forceNoInfoBatchCounts = true
      // hit (a) + miss (b): -2 counts force the row-by-row re-run, which
      // is safe for absolute `v=?` updates, and b still reaches INSERT
      JdbcUpsertSink.writePortable(
        Seq(("a", 7L), ("b", 2L)).toDF("k", "v"), u, "pt", Seq("k"),
        dialect = JdbcUpsertSink.MySqlDialect)
      val got = db.tables("pt").rows.values
        .map(r => r("k").toString -> r("v").asInstanceOf[Long]).toMap
      assert(got == Map("a" -> 7L, "b" -> 2L))

      // additive `v = v + ?` cannot recover from unknown counts: the
      // ANSI-arm merge must abort instead of double-applying deltas
      val store = new graft.streaming.JdbcKpiStore(u)
      db.forceNoInfoBatchCounts = false
      store.merge("counts", Seq("k"), Seq(("x", 1L)).toDF("k", "cnt"), 0L)
      db.forceNoInfoBatchCounts = true
      intercept[IllegalStateException] {
        store.merge("counts", Seq("k"), Seq(("x", 1L)).toDF("k", "cnt"), 1L)
      }
    } finally MockMySqlJdbc.drop("noinfo")
  }
}
