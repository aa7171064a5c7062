package graft

import graft.sources.JdbcUpsert
import org.apache.spark.sql.functions._
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}

/** In-memory JDBC fake: dynamic proxies over java.sql interfaces that
  * APPLY the upsert semantics the generated statement promises
  * (insert-or-latest-wins by version) into a shared table map — so the
  * executor loop (per-partition connection, addBatch/executeBatch
  * cadence, commit) is exercised end-to-end and replay idempotence is
  * proven, without a database in the container. The fake lives in a
  * singleton so executor threads (local mode, one JVM) and the test
  * share state. */
object FakeDb {
  // key values -> row (col -> value); TrieMap: executor threads write
  val state = new scala.collection.concurrent.TrieMap[Seq[Any], Map[String, Any]]()
  @volatile var cols: Seq[String] = Seq.empty
  @volatile var keys: Seq[String] = Seq.empty
  @volatile var version: Option[String] = None
  @volatile var lastSql: String = ""
  val opened = new java.util.concurrent.atomic.AtomicInteger
  val committed = new java.util.concurrent.atomic.AtomicInteger
  val batchExecs = new java.util.concurrent.atomic.AtomicInteger

  def reset(cols: Seq[String], keys: Seq[String], version: Option[String]): Unit = {
    state.clear(); this.cols = cols; this.keys = keys; this.version = version
    lastSql = ""; opened.set(0); committed.set(0); batchExecs.set(0)
  }

  @annotation.nowarn("cat=other-match-analysis")
  private def cmp(a: Any, b: Any): Int =
    a.asInstanceOf[Comparable[Any]].compareTo(b)

  private def applyBatch(batch: Seq[Array[Any]]): Unit = synchronized {
    batch.foreach { arr =>
      val row = cols.zip(arr.toSeq).toMap
      val k = keys.map(row)
      state.get(k) match {
        case None => state.update(k, row)
        case Some(old) => version match {
          case Some(v) => if (cmp(row(v), old(v)) > 0) state.update(k, row)
          case None => state.update(k, row)
        }
      }
    }
  }

  private def statement(): PreparedStatement = {
    val current = new Array[Any](cols.size)
    val batch = scala.collection.mutable.ArrayBuffer[Array[Any]]()
    val h = new InvocationHandler {
      def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
        case "setObject" =>
          current(args(0).asInstanceOf[java.lang.Integer] - 1) = args(1); null
        case "addBatch" => batch += current.clone(); null
        case "executeBatch" =>
          batchExecs.incrementAndGet()
          applyBatch(batch.toSeq); batch.clear(); Array.empty[Int]
        case "close" => null
        case "hashCode" => Int.box(System.identityHashCode(p))
        case "toString" => "FakePreparedStatement"
        case _ => null
      }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]), h).asInstanceOf[PreparedStatement]
  }

  def connection(): Connection = {
    opened.incrementAndGet()
    val h = new InvocationHandler {
      def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
        case "prepareStatement" =>
          lastSql = args(0).asInstanceOf[String]; statement()
        case "commit" => committed.incrementAndGet(); null
        case "isClosed" => java.lang.Boolean.FALSE
        case "hashCode" => Int.box(System.identityHashCode(p))
        case "toString" => "FakeConnection"
        case _ => null // setAutoCommit, close, rollback, ...
      }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), h).asInstanceOf[Connection]
  }
}

class JdbcUpsertSpec extends SparkSpec {

  test("upsertSql builds the Postgres ON CONFLICT statement") {
    assert(JdbcUpsert.upsertSql("agg_daily",
      Seq("user_id", "day", "value_sum", "version"),
      Seq("user_id", "day"), Some("version")) ==
      """INSERT INTO "agg_daily" ("user_id", "day", "value_sum", "version") """ +
        """VALUES (?, ?, ?, ?) ON CONFLICT ("user_id", "day") """ +
        """DO UPDATE SET "value_sum" = EXCLUDED."value_sum", """ +
        """"version" = EXCLUDED."version" """ +
        """WHERE EXCLUDED."version" > "agg_daily"."version"""")
    assert(JdbcUpsert.upsertSql("t", Seq("k", "v"), Seq("k")) ==
      """INSERT INTO "t" ("k", "v") VALUES (?, ?) ON CONFLICT ("k") """ +
        """DO UPDATE SET "v" = EXCLUDED."v"""")
    assert(JdbcUpsert.upsertSql("t", Seq("k"), Seq("k")) ==
      """INSERT INTO "t" ("k") VALUES (?) ON CONFLICT ("k") DO NOTHING""")
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsertSql("t", Seq("a"), Seq("missing"))
    }
  }

  test("write lands every row through batched per-partition connections") {
    import spark.implicits._
    FakeDb.reset(Seq("k", "v", "version"), Seq("k"), Some("version"))
    val df = (0L until 10L).map(i => (i, s"v$i", 1L)).toDF("k", "v", "version")
      .repartition(3)
    JdbcUpsert.write(df, "t", Seq("k"), Some("version"), batchSize = 3)(
      () => FakeDb.connection())
    assert(FakeDb.state.size == 10)
    assert(FakeDb.state(Seq(7L))("v") == "v7")
    // one connection + one commit per non-empty partition; batch cadence
    // honoured (10 rows / batchSize 3 over 3 partitions -> >= 3 flushes)
    assert(FakeDb.opened.get == 3 && FakeDb.committed.get == 3)
    assert(FakeDb.batchExecs.get >= 3)
    assert(FakeDb.lastSql == JdbcUpsert.upsertSql("t",
      Seq("k", "v", "version"), Seq("k"), Some("version")))
  }

  test("replay and out-of-order batches converge to latest-wins state") {
    import spark.implicits._
    FakeDb.reset(Seq("k", "v", "version"), Seq("k"), Some("version"))
    def batch(ver: Long) =
      (0L until 5L).map(i => (i, s"b$ver-$i", ver)).toDF("k", "v", "version")
    JdbcUpsert.write(batch(2), "t", Seq("k"), Some("version"))(
      () => FakeDb.connection())
    val after2 = FakeDb.state.toMap
    // exact replay of the same micro-batch: no change (idempotent)
    JdbcUpsert.write(batch(2), "t", Seq("k"), Some("version"))(
      () => FakeDb.connection())
    assert(FakeDb.state.toMap == after2)
    // stale batch arriving late: version guard rejects it
    JdbcUpsert.write(batch(1), "t", Seq("k"), Some("version"))(
      () => FakeDb.connection())
    assert(FakeDb.state.toMap == after2)
    // genuinely newer batch wins
    JdbcUpsert.write(batch(3), "t", Seq("k"), Some("version"))(
      () => FakeDb.connection())
    assert(FakeDb.state(Seq(0L))("v") == "b3-0" && FakeDb.state.size == 5)
  }

  test("streaming sinkToJdbc upserts each micro-batch idempotently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jdbc-stream")
    val src = dir.resolve("src").toString
    val chk = dir.resolve("chk").toString
    FakeDb.reset(Seq("user_id", "n_events", "version"), Seq("user_id"),
      Some("version"))
    Seq((1L, 10L, 1L), (2L, 20L, 1L)).toDF("user_id", "n_events", "version")
      .write.parquet(src)
    val stream = spark.readStream
      .schema("user_id LONG, n_events LONG, version LONG").parquet(src)
    val query = graft.streaming.IotStreamPipeline.sinkToJdbc(
      stream, "agg", Seq("user_id"), Some("version"), chk)(
      () => FakeDb.connection()).start()
    try query.processAllAvailable() finally query.stop()
    assert(FakeDb.state.size == 2 && FakeDb.state(Seq(2L))("n_events") == 20L)
  }
}
