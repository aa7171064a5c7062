package graft

import graft.sources.JdbcUpsert

/** OPT-IN live-PostgreSQL/TimescaleDB parity for the J5 warehouse sink
  * (r12 verdict next-round #7 — the A6 live-Mongo treatment applied to
  * the JDBC side).
  *
  * The container this repo builds in has no database and no Postgres
  * JDBC driver jar, so [[JdbcUpsertSpec]] proves the generated
  * `INSERT ... ON CONFLICT` statement text and the executor loop
  * (per-partition connection, batch cadence, commit, replay
  * idempotence) against an in-memory JDBC fake. This spec closes the
  * remaining environmental gap in an environment that HAS both: set
  *
  * {{{ GRAFT_PG_URL='jdbc:postgresql://host:5432/db?user=u&password=p' \
  *     sbt "testOnly graft.JdbcLiveIntegrationSpec" }}}
  *
  * with the PostgreSQL JDBC driver on the classpath, and it creates a
  * uniquely-named table over the wire, replays the SAME
  * replay/out-of-order/batch-cadence matrix [[JdbcUpsertSpec]] runs
  * against the fake through the REAL `DriverManager` connection, and
  * asserts row-level parity between the live table and the in-memory
  * fake applied to the same frames — the sink's latest-wins contract
  * proven against a real `ON CONFLICT` executor, not a reimplementation
  * of it. Without the env var every test here is CANCELED (reported by
  * ScalaTest as canceled, not failed or silently passed) — the same
  * documented opt-in contract as `GRAFT_MONGO_URI`.
  *
  * Reference: docker-compose.yaml `timescaledb` service + dbt
  * incremental-with-unique_key models — the landing contract this sink
  * re-expresses. */
class JdbcLiveIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val urlOpt = sys.env.get("GRAFT_PG_URL")

  /** Executor-side connector: captures ONLY the url string (the
    * documented serializable-connect contract of [[JdbcUpsert.write]]). */
  private def connector(url: String): () => java.sql.Connection =
    () => java.sql.DriverManager.getConnection(url)

  /** Read the live table back into a comparable canonical map —
    * driver-side plain JDBC (test tables are tiny). */
  private def readBack(url: String, table: String,
                       cols: Seq[String]): Map[Seq[Any], Map[String, Any]] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT ${cols.map("\"" + _ + "\"").mkString(", ")} FROM "$table"""")
        val out = scala.collection.mutable.Map[Seq[Any], Map[String, Any]]()
        while (rs.next()) {
          val row = cols.map(c => c -> rs.getObject(c)).toMap
          out(Seq(row("k"))) = row
        }
        out.toMap
      } finally st.close()
    } finally conn.close()
  }

  /** Normalize both sides to (k -> (v, version)) on Long/String — JDBC
    * returns boxed java.lang types; the fake stores Scala primitives. */
  private def canon(m: Map[Seq[Any], Map[String, Any]]): Map[Long, (String, Long)] =
    m.map { case (k, row) =>
      k.head.asInstanceOf[Number].longValue() ->
        ((row("v").toString, row("version").asInstanceOf[Number].longValue()))
    }

  private def withTable(url: String)(body: String => Unit): Unit = {
    val table = s"graft_it_${java.util.UUID.randomUUID().toString.take(8)}"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(
        s"""CREATE TABLE "$table" (
           |  "k" BIGINT PRIMARY KEY, "v" TEXT, "version" BIGINT)""".stripMargin)
      finally st.close()
    } finally conn.close()
    try body(table)
    finally {
      val c2 = java.sql.DriverManager.getConnection(url)
      try {
        val st = c2.createStatement()
        try st.execute(s"""DROP TABLE IF EXISTS "$table"""")
        finally st.close()
      } finally c2.close()
    }
  }

  test("live upsert == in-memory fake: replay, stale, newer-wins matrix") {
    assume(urlOpt.isDefined,
      "GRAFT_PG_URL not set — live-JDBC parity is opt-in; skipping")
    val url = urlOpt.get
    def batch(ver: Long) =
      (0L until 5L).map(i => (i, s"b$ver-$i", ver)).toDF("k", "v", "version")
    withTable(url) { table =>
      // the exact matrix JdbcUpsertSpec proves against the fake —
      // applied to BOTH targets, then compared state-for-state
      FakeDb.reset(Seq("k", "v", "version"), Seq("k"), Some("version"))
      for (ver <- Seq(2L, 2L /* replay */, 1L /* stale */, 3L /* newer */)) {
        JdbcUpsert.write(batch(ver), table, Seq("k"), Some("version"))(
          connector(url))
        JdbcUpsert.write(batch(ver), "t", Seq("k"), Some("version"))(
          () => FakeDb.connection())
        assert(canon(readBack(url, table, Seq("k", "v", "version")))
          == canon(FakeDb.state.toMap),
          s"live/fake divergence after version-$ver batch")
      }
      // final state is the newest batch, exactly 5 rows
      val live = canon(readBack(url, table, Seq("k", "v", "version")))
      assert(live.size == 5 && live(0L) == (("b3-0", 3L)))
    }
  }

  test("live batched multi-partition write lands every row once") {
    assume(urlOpt.isDefined,
      "GRAFT_PG_URL not set — live-JDBC parity is opt-in; skipping")
    val url = urlOpt.get
    withTable(url) { table =>
      val df = (0L until 10L).map(i => (i, s"v$i", 1L))
        .toDF("k", "v", "version").repartition(3)
      JdbcUpsert.write(df, table, Seq("k"), Some("version"), batchSize = 3)(
        connector(url))
      val live = canon(readBack(url, table, Seq("k", "v", "version")))
      assert(live == (0L until 10L).map(i => i -> ((s"v$i", 1L))).toMap)
      // idempotent under full replay through the REAL ON CONFLICT path
      JdbcUpsert.write(df, table, Seq("k"), Some("version"), batchSize = 3)(
        connector(url))
      assert(canon(readBack(url, table, Seq("k", "v", "version"))) == live)
    }
  }
}
