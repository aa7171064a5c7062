package graft

import graft.sources.JdbcUpsert

/** Emits the EXACT upsert statement text [[graft.sources.JdbcUpsert]]
  * generates, as one JSON line, for the live-PostgreSQL wire harness
  * (`tools/livedb_local_pg.py`).
  *
  * The build container is zero-egress (no PostgreSQL JDBC driver jar
  * can be fetched) but carries a REAL local PostgreSQL server — so the
  * wire seam the opt-in [[JdbcLiveIntegrationSpec]] covers on a dev box
  * is closed here by the next-strongest evidence: the genuinely
  * generated `INSERT ... ON CONFLICT` text (this main — never a
  * re-spelling inside the harness, which could drift) executed by a
  * real server over psql with the SAME replay/stale/newer matrix the
  * spec runs. The only layer left unproven is the JDBC driver's
  * parameter marshalling (`?` placeholders — the harness rewrites them
  * to `$1..$n`, the same positional binding the pg driver sends on the
  * wire). Reference: docker-compose.yaml `timescaledb` service — the
  * landing contract this sink re-expresses. */
object LivePgProbe {
  def main(args: Array[String]): Unit = {
    val cols = Seq("k", "v", "version")
    def j(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val table = if (args.nonEmpty) args(0) else "graft_it_live"
    val versioned = JdbcUpsert.upsertSql(table, cols, Seq("k"), Some("version"))
    val unversioned = JdbcUpsert.upsertSql(table, cols, Seq("k"), None)
    val keyOnly = JdbcUpsert.upsertSql(table, Seq("k"), Seq("k"), None)
    println(s"""{"table":${j(table)},"cols":["k","v","version"],""" +
      s""""versioned":${j(versioned)},"unversioned":${j(unversioned)},""" +
      s""""key_only":${j(keyOnly)}}""")
  }
}
