#!/usr/bin/env python3
"""Live-PostgreSQL wire evidence for the J5 upsert sink, WITHOUT docker.

The build container is zero-egress (no PostgreSQL JDBC driver jar, no
dockerd, no mongod) but ships a real PostgreSQL server (`initdb` /
`pg_ctl` / `postgres` / `psql`). This harness closes the
spec'd-but-never-evidenced JDBC wire seam to the extent this box
allows:

  1. `sbt "runMain graft.LivePgProbe"` emits the EXACT statement text
     `JdbcUpsert.upsertSql` generates (never re-spelled here).
  2. A throwaway cluster is initdb'd under /tmp and started on a
     local socket.
  3. The statement's JDBC `?` placeholders are rewritten to `$1..$n`
     (the same positional binding the pg JDBC driver sends on the
     wire) and PREPAREd by the real server.
  4. The same replay / stale / newer-wins matrix
     `JdbcLiveIntegrationSpec` runs over JDBC on a dev box is executed
     through EXECUTE, asserting latest-wins state after every batch,
     plus the multi-batch replay-idempotence check.
  5. Results land in LIVEDB_r{N}.json; the cluster is destroyed.

What this does NOT cover (documented, not hidden): the JDBC driver's
own marshalling layer, and the Mongo wire side (no mongod binary, no
docker daemon in this container — the opt-in
MongoLiveIntegrationSpec/JdbcLiveIntegrationSpec pair stays the dev-box
recipe in docker/live-db-compose.yaml).

Usage: python3 tools/livedb_local_pg.py [out.json]
"""
import json
import os
import re
import subprocess
import sys
import tempfile
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "LIVEDB_r16.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, text=True, **kw)


def run_pg(cmd, **kw):
    """Server-side postgres binaries refuse root; the container has a
    `postgres` OS user — run them under it (the data/socket dirs are
    chowned to it first)."""
    if os.geteuid() == 0:
        cmd = ["runuser", "-u", "postgres", "--"] + cmd
    return run(cmd, **kw)


def jdbc_to_prepare(sql):
    """Rewrite JDBC `?` placeholders to PostgreSQL `$1..$n` — the same
    positional binding the pg JDBC driver uses on the wire."""
    n = [0]

    def sub(_):
        n[0] += 1
        return f"${n[0]}"

    return re.sub(r"\?", sub, sql), n[0]


def main():
    # 1. the REAL generated statement text
    probe = run(["sbt", "-batch", "runMain graft.LivePgProbe graft_it_live"],
                cwd=REPO)
    stmt_line = [ln for ln in probe.stdout.splitlines()
                 if ln.strip().startswith("{")][-1]
    stmts = json.loads(stmt_line)
    versioned_sql, nparams = jdbc_to_prepare(stmts["versioned"])
    assert nparams == 3, stmts["versioned"]

    pgdir = tempfile.mkdtemp(prefix="graft-livepg-")
    data = os.path.join(pgdir, "data")
    sock = pgdir  # unix socket dir; no TCP needed
    checks = []
    server_version = None
    try:
        if os.geteuid() == 0:
            run(["chown", "-R", "postgres:postgres", pgdir])
        run_pg(["initdb", "-D", data, "-U", "graft", "-A", "trust"])
        run_pg(["pg_ctl", "-D", data, "-w", "-l", os.path.join(pgdir, "pg.log"),
                "-o", f"-c listen_addresses='' -c unix_socket_directories={sock}",
                "start"])

        def psql(sql):
            return run(["psql", "-h", sock, "-U", "graft", "-d", "postgres",
                        "-v", "ON_ERROR_STOP=1", "-qAt", "-c", sql]).stdout.strip()

        server_version = psql("SHOW server_version")
        psql('CREATE TABLE "graft_it_live" '
             '("k" BIGINT PRIMARY KEY, "v" TEXT, "version" BIGINT)')
        # PREPARE is session-scoped and each psql -c is a fresh session:
        # prepend it to every EXECUTE batch (server-side plan + positional
        # binding per batch — the same wire shape the JDBC driver sends)
        prep = f"PREPARE up(BIGINT, TEXT, BIGINT) AS {versioned_sql}"

        def batch(ver):
            stmts = "; ".join(
                f"EXECUTE up({i}, 'b{ver}-{i}', {ver})" for i in range(5))
            psql(f"{prep}; {stmts}")

        def state():
            out = psql('SELECT "k", "v", "version" FROM "graft_it_live" '
                       'ORDER BY "k"')
            return [tuple(ln.split("|")) for ln in out.splitlines() if ln]

        def expect(ver):
            return [(str(i), f"b{ver}-{i}", str(ver)) for i in range(5)]

        # the exact JdbcLiveIntegrationSpec matrix: apply version batches
        # 2, 2 (replay), 1 (stale), 3 (newer); latest-wins after each
        for ver, want in [(2, 2), (2, 2), (1, 2), (3, 3)]:
            batch(ver)
            got = state()
            ok = got == expect(want)
            checks.append({
                "check": f"versioned batch v={ver} -> state v={want} "
                         f"(latest-wins{' replay' if ver == 2 and want == 2 else ''})",
                "pass": ok, "got": got if not ok else None})
            assert ok, (ver, got)

        # multi-row replay idempotence (the second spec test): land 10
        # rows, replay the full batch, state must be unchanged
        psql('CREATE TABLE "graft_it_live2" '
             '("k" BIGINT PRIMARY KEY, "v" TEXT, "version" BIGINT)')
        v2sql, _ = jdbc_to_prepare(
            stmts_replace_table(stmts["versioned"], "graft_it_live2"))
        prep2 = f"PREPARE up2(BIGINT, TEXT, BIGINT) AS {v2sql}"
        land = prep2 + "; " + \
            "; ".join(f"EXECUTE up2({i}, 'v{i}', 1)" for i in range(10))
        psql(land)
        first = psql('SELECT count(*), min("v"), max("v") FROM "graft_it_live2"')
        psql(land)  # full replay through the real ON CONFLICT path
        second = psql('SELECT count(*), min("v"), max("v") FROM "graft_it_live2"')
        ok = first == second == "10|v0|v9"
        checks.append({"check": "10-row land + full replay idempotent",
                       "pass": ok, "got": [first, second] if not ok else None})
        assert ok, (first, second)

        # the other two generated statement shapes: unversioned
        # DO UPDATE (last-write-wins, no guard) and key-only DO NOTHING
        psql('CREATE TABLE "graft_it_live3" '
             '("k" BIGINT PRIMARY KEY, "v" TEXT, "version" BIGINT)')
        unv, _ = jdbc_to_prepare(
            stmts_replace_table(stmts["unversioned"], "graft_it_live3"))
        prep3 = f"PREPARE up3(BIGINT, TEXT, BIGINT) AS {unv}"
        psql(f"{prep3}; EXECUTE up3(1, 'first', 9); EXECUTE up3(1, 'second', 1)")
        got = psql('SELECT "v", "version" FROM "graft_it_live3" WHERE "k" = 1')
        ok = got == "second|1"
        checks.append({"check": "unversioned DO UPDATE is last-write-wins "
                                "(no version guard)",
                       "pass": ok, "got": got if not ok else None})
        assert ok, got

        psql('CREATE TABLE "graft_it_live4" ("k" BIGINT PRIMARY KEY)')
        keyonly, n1 = jdbc_to_prepare(
            stmts_replace_table(stmts["key_only"], "graft_it_live4"))
        assert n1 == 1, stmts["key_only"]
        prep4 = f"PREPARE up4(BIGINT) AS {keyonly}"
        psql(f"{prep4}; EXECUTE up4(7); EXECUTE up4(7); EXECUTE up4(8)")
        got = psql('SELECT count(*) FROM "graft_it_live4"')
        ok = got == "2"
        checks.append({"check": "key-only degrades to DO NOTHING "
                                "(replay leaves 2 rows)",
                       "pass": ok, "got": got if not ok else None})
        assert ok, got
    finally:
        stop = ["pg_ctl", "-D", data, "-m", "immediate", "stop"]
        if os.geteuid() == 0:
            stop = ["runuser", "-u", "postgres", "--"] + stop
        subprocess.run(stop, capture_output=True)
        subprocess.run(["rm", "-rf", pgdir], capture_output=True)

    artifact = {
        "metric": "livedb",
        "engine": f"PostgreSQL {server_version} (local server, psql wire)",
        "statement_source": "graft.LivePgProbe -> JdbcUpsert.upsertSql "
                            "(generated text, ? -> $n positional rewrite)",
        "statement": stmts["versioned"],
        "checks": checks,
        "all_green": all(c["pass"] for c in checks),
        "not_covered": [
            "JDBC driver marshalling layer (no postgresql JDBC jar on the "
            "zero-egress box; JdbcLiveIntegrationSpec covers it on a dev "
            "box via docker/live-db-compose.yaml)",
            "Mongo wire semantics (no mongod binary, no docker daemon; "
            "MongoLiveIntegrationSpec stays the dev-box recipe)"],
    }
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": "livedb", "all_green": artifact["all_green"],
                      "n_checks": len(checks), "out": OUT}))


def stmts_replace_table(sql, new_table):
    return sql.replace('"graft_it_live"', f'"{new_table}"')


if __name__ == "__main__":
    main()
