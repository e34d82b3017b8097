"""Real-PostgreSQL integration for the JDBC merge sink (VERDICT r4 #8).

The image ships a Postgres 15 server (initdb/pg_ctl/psql) but no Python
driver and no JDBC jar, and package installs are disallowed — so the
DBAPI seam is satisfied by a minimal psql-subprocess shim: SQL text and
parameter batches are rendered to literals and executed through psql in
one transaction per commit(). That keeps the code under test the REAL
`JdbcMergeTarget.merge_batch` (statement text, batching, delete-before-
insert ordering) speaking to a REAL Postgres — the behaviors DuckDB
could not witness in test_jdbc_sink.py: `text[]` binding,
`ON CONFLICT ... DO UPDATE SET c = EXCLUDED.c`, the
`IS DISTINCT FROM` geocode-reset rule (reference
internal/repository/task.go:81-123), and `now()`.

The server must run as a non-root user; tests run as root in this
image, so the cluster is launched via `su nobody`. Everything is
skipped cleanly when initdb/psql/su are unavailable.
"""

from __future__ import annotations

import shutil
import subprocess
import uuid
from pathlib import Path

import pytest

from hephaestus_spark.streaming.sinks import (
    GEOCODE_RESET_RULE,
    JdbcMergeTarget,
    upsert_sql,
)

PG_BIN = "/usr/local/bin"
_HAVE_PG = all(
    shutil.which(b) or Path(f"{PG_BIN}/{b}").exists()
    for b in ("initdb", "pg_ctl", "postgres")
) and shutil.which("psql") and shutil.which("su")

pytestmark = pytest.mark.skipif(
    not _HAVE_PG, reason="postgres server binaries / psql / su not available"
)


def _su(cmd: str, **kw):
    return subprocess.run(
        ["su", "-s", "/bin/sh", "nobody", "-c", cmd],
        cwd="/tmp", capture_output=True, text=True, **kw
    )


@pytest.fixture(scope="module")
def pg_sock(tmp_path_factory):
    """A throwaway real-Postgres cluster on a unix socket; yields the
    socket directory. No TCP port (-h '') so parallel runs can't clash."""
    d = Path("/tmp") / f"pg-it-{uuid.uuid4().hex[:8]}"
    d.mkdir()
    subprocess.run(["chown", "nobody", str(d)], check=True)
    r = _su(f"{PG_BIN}/initdb -D {d}/data -A trust")
    if r.returncode != 0:
        shutil.rmtree(d, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _su(f"{PG_BIN}/pg_ctl -D {d}/data -o '-k {d} -h \"\"' -l {d}/log start")
    if r.returncode != 0:
        shutil.rmtree(d, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
    try:
        yield str(d)
    finally:
        _su(f"{PG_BIN}/pg_ctl -D {d}/data -m immediate stop")
        shutil.rmtree(d, ignore_errors=True)


def _psql(sock: str, sql: str) -> str:
    r = subprocess.run(
        ["psql", "-h", sock, "-U", "nobody", "-d", "postgres",
         "-v", "ON_ERROR_STOP=1", "-tA", "-c", sql],
        capture_output=True, text=True, cwd="/tmp",
    )
    assert r.returncode == 0, f"psql failed: {r.stderr}\nSQL: {sql[:500]}"
    return r.stdout.strip()


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "ARRAY[" + ", ".join(_lit(x) for x in v) + "]::text[]"
    return "'" + str(v).replace("'", "''") + "'"


class _PsqlCursor:
    """Enough DBAPI for JdbcMergeTarget: executemany renders %s
    placeholders to literals; statements buffer until commit() runs
    them through psql in ONE transaction (preserving cross-statement
    order — the delete-before-insert contract under test)."""

    def __init__(self, buf):
        self._buf = buf

    def executemany(self, sql, argsets):
        parts = sql.split("%s")
        for args in argsets:
            assert len(parts) == len(args) + 1, (sql, args)
            rendered = parts[0]
            for a, p in zip(args, parts[1:]):
                rendered += _lit(a) + p
            self._buf.append(rendered)


class _PsqlConnection:
    def __init__(self, sock):
        self._sock = sock
        self._buf = []

    def cursor(self):
        return _PsqlCursor(self._buf)

    def commit(self):
        if self._buf:
            _psql(self._sock, "BEGIN; " + "; ".join(self._buf) + "; COMMIT;")
            self._buf = []

    def close(self):
        pass


TASKS_DDL = """
CREATE TABLE IF NOT EXISTS tasks (
  task_id int PRIMARY KEY,
  description text,
  address text,
  comments text[],
  is_closed boolean,
  latitude double precision,
  longitude double precision,
  geocoding_attempts int,
  geocoding_error text,
  updated_at timestamp DEFAULT now()
);
CREATE TABLE IF NOT EXISTS task_executors (
  task_id int, executor_id int
);
TRUNCATE tasks; TRUNCATE task_executors;
"""

TASK_COLS = ["description", "address", "comments", "is_closed"]
GEO_COLS = ["latitude", "longitude", "geocoding_attempts", "geocoding_error"]


def _target(sock, mode="upsert", table="tasks"):
    if mode == "upsert":
        return JdbcMergeTarget(
            table=table, key="task_id", cols=TASK_COLS,
            connection_factory=lambda: _PsqlConnection(sock),
            reset_rule=GEOCODE_RESET_RULE.format(t=table),
            placeholder="%s", insert_only_cols=GEO_COLS,
        )
    return JdbcMergeTarget(
        table=table, key="task_id", cols=["executor_id"],
        connection_factory=lambda: _PsqlConnection(sock),
        placeholder="%s", mode="delete_insert",
    )


def _stage(spark, rows):
    return spark.createDataFrame(
        rows,
        "task_id int, description string, address string,"
        " comments array<string>, is_closed boolean",
    )


def test_upsert_text_array_and_excluded_update(spark, pg_sock):
    _psql(pg_sock, TASKS_DDL)
    t = _target(pg_sock)
    t.merge_batch(spark, _stage(spark, [
        (1, "fix pipe", "12 Main St", ["call first", "it's urgent"], False),
        (2, "install", "9 Side Rd", [], True),
    ]))
    # text[] round-trips through real Postgres array binding
    assert _psql(pg_sock, "SELECT comments[2] FROM tasks WHERE task_id = 1") == "it's urgent"
    assert _psql(pg_sock, "SELECT cardinality(comments) FROM tasks WHERE task_id = 2") == "0"
    # EXCLUDED.* update path (A12): same key, new values
    t.merge_batch(spark, _stage(spark, [
        (1, "fix pipe NOW", "12 Main St", ["done"], True),
    ]))
    assert _psql(
        pg_sock,
        "SELECT description || '|' || comments[1] || '|' || is_closed FROM tasks WHERE task_id = 1",
    ) == "fix pipe NOW|done|true"
    assert _psql(pg_sock, "SELECT count(*) FROM tasks") == "2"


def test_geocode_reset_is_distinct_from(spark, pg_sock):
    """A14's reset rule against real Postgres: geocode columns reset
    ONLY when the address actually changes, with NULL-safe semantics
    (task.go:97-112)."""
    _psql(pg_sock, TASKS_DDL)
    t = _target(pg_sock)
    t.merge_batch(spark, _stage(spark, [
        (10, "a", "Old Addr", [], False),
        (11, "b", None, [], False),
    ]))
    # simulate the external geocoder filling in coordinates
    _psql(pg_sock, "UPDATE tasks SET latitude = 1.5, longitude = 2.5,"
                   " geocoding_attempts = 3, geocoding_error = 'x'")
    # same address (incl. NULL = NULL) -> geocode state preserved
    t.merge_batch(spark, _stage(spark, [
        (10, "a2", "Old Addr", [], False),
        (11, "b2", None, [], False),
    ]))
    assert _psql(
        pg_sock,
        "SELECT count(*) FROM tasks WHERE latitude = 1.5 AND geocoding_attempts = 3",
    ) == "2"
    # changed address (value change AND null->value) -> reset fires
    t.merge_batch(spark, _stage(spark, [
        (10, "a3", "New Addr", [], False),
        (11, "b3", "Was Null", [], False),
    ]))
    assert _psql(
        pg_sock,
        "SELECT count(*) FROM tasks WHERE latitude IS NULL AND longitude IS NULL"
        " AND geocoding_attempts = 0 AND geocoding_error IS NULL",
    ) == "2"


def test_bridge_delete_insert_ordering(spark, pg_sock):
    """A15 bridge rewrite: all deletes land before all inserts inside
    one transaction, so a key staged with several bridge rows keeps
    every row."""
    _psql(pg_sock, TASKS_DDL)
    _psql(pg_sock, "INSERT INTO task_executors VALUES (5, 100), (5, 101), (6, 200)")
    t = _target(pg_sock, mode="delete_insert", table="task_executors")
    staged = spark.createDataFrame(
        [(5, 300), (5, 301), (5, 302)], "task_id int, executor_id int"
    )
    t.merge_batch(spark, staged)
    assert _psql(
        pg_sock,
        "SELECT string_agg(executor_id::text, ',' ORDER BY executor_id)"
        " FROM task_executors WHERE task_id = 5",
    ) == "300,301,302"
    # untouched keys survive the rewrite
    assert _psql(pg_sock, "SELECT executor_id FROM task_executors WHERE task_id = 6") == "200"
    # batch_size=1 forces a key to SPAN executemany chunks: the delete
    # must fire once per key per connection, not once per chunk
    t2 = _target(pg_sock, mode="delete_insert", table="task_executors")
    t2.batch_size = 1
    t2.merge_batch(spark, spark.createDataFrame(
        [(5, 400), (5, 401)], "task_id int, executor_id int"
    ))
    assert _psql(
        pg_sock,
        "SELECT string_agg(executor_id::text, ',' ORDER BY executor_id)"
        " FROM task_executors WHERE task_id = 5",
    ) == "400,401"


def test_upsert_sql_is_postgres_dialect(pg_sock):
    """The exact statement text the sink generates parses on real
    Postgres (PREPARE type-checks without executing)."""
    _psql(pg_sock, TASKS_DDL)
    sql = upsert_sql(
        "tasks", "task_id", TASK_COLS,
        reset_rule=GEOCODE_RESET_RULE.format(t="tasks"),
        placeholder="%s", insert_only_cols=GEO_COLS,
    )
    n = sql.count("%s")
    for i in range(n):
        sql = sql.replace("%s", f"${i + 1}", 1)
    types = "int, text, text, text[], boolean, double precision, double precision, int, text"
    _psql(pg_sock, f"PREPARE chk ({types}) AS {sql}; DEALLOCATE chk;")
