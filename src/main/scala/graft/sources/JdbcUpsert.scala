package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import java.sql.Connection

/** JDBC upsert sink — the TimescaleDB landing role of the reference
  * (reference: docker-compose.yaml `timescaledb` service; dags/config.py
  * + dags/dlt_sources/.dlt/config.toml destination wiring; dbt
  * incremental models served from Postgres).
  *
  * Shape: a Postgres `INSERT ... ON CONFLICT (keys) DO UPDATE`
  * statement built once per write, executed per partition over one
  * connection with JDBC batching — the standard Spark JDBC write
  * topology (one connection per partition, `addBatch`/`executeBatch`
  * every `batchSize` rows, one commit per partition). With a
  * `versionCol` the update is guarded by `EXCLUDED.v > t.v`, which
  * makes the sink IDEMPOTENT UNDER REPLAY: re-delivering a micro-batch
  * (foreachBatch at-least-once semantics) or applying batches out of
  * order converges to latest-wins state — exactly the dbt
  * incremental-with-unique_key contract the reference relies on.
  *
  * Scale: no driver involvement beyond statement text; each of 1000
  * executors streams its partition through its own connection, so sink
  * throughput is bounded by the database, never by Spark. Partition
  * the DataFrame to the connection count the target DB tolerates.
  *
  * The container has no database, so the executor loop is exercised in
  * tests against an in-memory JDBC fake (dynamic proxies) that applies
  * real upsert semantics; the statement builder is unit-tested as text.
  */
object JdbcUpsert {

  private def q(ident: String): String = "\"" + ident + "\""

  /** Postgres/TimescaleDB upsert statement for `cols`, conflicting on
    * `keyCols`. Non-key columns update from EXCLUDED; with `versionCol`
    * the update applies only when the incoming version is strictly
    * newer (replay/out-of-order safety). Key-only tables degrade to
    * DO NOTHING. */
  def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String],
                versionCol: Option[String] = None): String = {
    require(cols.nonEmpty, "no columns")
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"key columns $keyCols must be a subset of $cols")
    require(versionCol.forall(cols.contains), s"version column not in $cols")
    val updatable = cols.filterNot(keyCols.contains)
    val insert = s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.map(q).mkString(", ")})"
    if (updatable.isEmpty) s"$insert DO NOTHING"
    else {
      val sets = updatable.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
      versionCol match {
        case Some(v) =>
          s"$insert DO UPDATE SET $sets WHERE EXCLUDED.${q(v)} > ${q(table)}.${q(v)}"
        case None => s"$insert DO UPDATE SET $sets"
      }
    }
  }

  /** Batched distributed upsert of `df` into `table`. `connect` runs ON
    * THE EXECUTORS (it must be serializable — e.g. a function building
    * a connection from captured url/properties via DriverManager), one
    * connection per partition, transactional per partition. */
  def write(df: DataFrame, table: String, keyCols: Seq[String],
            versionCol: Option[String] = None, batchSize: Int = 500)
           (connect: () => Connection): Unit = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val cols = df.columns.toSeq
    val sql = upsertSql(table, cols, keyCols, versionCol)
    val width = cols.size
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) { // empty partitions open no connection
      val conn = connect()
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(sql)
        try {
          var n = 0
          rows.foreach { r =>
            var i = 0
            while (i < width) { st.setObject(i + 1, r.get(i)); i += 1 }
            st.addBatch()
            n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          if (n % batchSize != 0) st.executeBatch()
          conn.commit()
        } finally st.close()
      } finally conn.close()
      }
    }
  }

  /** `foreachBatch` body for a streaming warehouse sink: micro-batch
    * replay is harmless because the statement itself is idempotent
    * (latest-wins under `versionCol`). Wire into
    * [[graft.streaming.IotStreamPipeline.sinkToJdbc]]. */
  def foreachBatchSink(table: String, keyCols: Seq[String],
                       versionCol: Option[String] = None,
                       batchSize: Int = 500)
                      (connect: () => Connection): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      write(batch, table, keyCols, versionCol, batchSize)(connect)
}
