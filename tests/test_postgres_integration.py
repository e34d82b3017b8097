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
    """Enough DBAPI for JdbcMergeTarget + JdbcTaskSyncPipeline:
    executemany renders %s placeholders to literals; statements buffer
    until commit() runs them through psql in ONE transaction (preserving
    cross-statement order — the delete-before-insert contract under
    test). execute()/fetchall() serve the pipeline's driver-side
    dimension read-backs (tiny SELECTs) immediately."""

    def __init__(self, buf, sock):
        self._buf = buf
        self._sock = sock
        self._rows: list = []

    def executemany(self, sql, argsets):
        parts = sql.split("%s")
        for args in argsets:
            assert len(parts) == len(args) + 1, (sql, args)
            rendered = parts[0]
            for a, p in zip(args, parts[1:]):
                rendered += _lit(a) + p
            self._buf.append(rendered)

    def execute(self, sql, args=None):
        if args:
            parts = sql.split("%s")
            sql = parts[0]
            for a, p in zip(args, parts[1:]):
                sql += _lit(a) + p
        out = _psql(self._sock, sql)
        self._rows = [line.split("|") for line in out.splitlines()]

    def fetchall(self):
        return self._rows


class _PsqlConnection:
    def __init__(self, sock):
        self._sock = sock
        self._buf = []

    def cursor(self):
        return _PsqlCursor(self._buf, self._sock)

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


FULL_DDL = """
DROP TABLE IF EXISTS task_types, employees, tasks, task_executors, scraper_status CASCADE;
CREATE TABLE task_types (type_id serial PRIMARY KEY, type_name text UNIQUE);
CREATE TABLE employees (id int PRIMARY KEY, shortname text UNIQUE);
CREATE TABLE tasks (
  task_id bigint PRIMARY KEY, task_type_id bigint,
  creation_date timestamp, closing_date timestamp,
  description text, address text, customer_name text, customer_login text,
  comments text[], is_closed boolean,
  latitude double precision, longitude double precision,
  geocoding_attempts int, geocoding_error text,
  updated_at timestamp DEFAULT now());
CREATE TABLE task_executors (task_id bigint, executor_id bigint);
CREATE TABLE scraper_status (id int PRIMARY KEY, last_processed_date date,
                             updated_at timestamp DEFAULT now());
INSERT INTO employees VALUES (1, 'ab'), (2, 'cd'), (3, 'ef');
"""

import datetime as _dt

_D1 = _dt.date(2024, 3, 1)
_D2 = _dt.date(2024, 3, 2)
_T1 = _dt.datetime(2024, 3, 1, 8, 0, 0)
_T2 = _dt.datetime(2024, 3, 2, 9, 30, 0)
# day-2 re-scrapes report a DIFFERENT created_at for existing tasks
# (source jitter): the reference's UpsertTask keeps the FIRST insert's
# creation_date (task.go:84-96 omits it from the DO UPDATE SET), so the
# final state must still show _T1 — ADVICE r6 item 1's regression bait.
_T1_JITTER = _dt.datetime(2024, 3, 1, 8, 0, 59)

_DAY1 = [
    (1, "repair", _T1, None, "d1", "Addr A", "cust1", "log1",
     ["c1", "c2"], ["ab", "cd"], False, _D1),
    (2, "install", _T1, None, "d2", "Addr B", "cust2", "log2",
     [], ["ef"], False, _D1),
    (3, "repair", _T1, None, "d3", None, "cust3", "log3",
     ["x"], ["ab"], False, _D1),
]
_DAY2 = [
    # same address -> geocode preserved; executors replaced; closes
    (1, "repair", _T1_JITTER, _T2, "d1-upd", "Addr A", "cust1", "log1",
     ["c3"], ["cd"], True, _D2),
    # address change -> geocode reset; EMPTY executors -> bridge cleared
    (2, "audit", _T1_JITTER, None, "d2-upd", "Addr B2", "cust2", "log2",
     [], [], False, _D2),
    # NULL -> value address transition -> reset fires
    (3, "repair", _T1_JITTER, None, "d3-upd", "Addr C", "cust3", "log3",
     ["x"], ["ab", "ef"], False, _D2),
    # brand-new task; 'zz' is an unknown executor -> NULL bridge row (A16)
    (4, "survey", _T1, None, "d4", "Addr D", "cust4", "log4",
     ["n"], ["zz", "ab"], False, _D2),
]


def test_full_task_sync_pipeline_against_postgres(spark, pg_sock, tmp_path):
    """VERDICT r6 item 2: the ENTIRE reference chain A13 (type
    get-or-create) -> A14 (upsert + geocode reset) -> A15/A16 (bridge
    rewrite incl. NULL-resolving executor) -> A18/A20 (two-batch
    watermark advance) through ``JdbcTaskSyncPipeline.run_available_now``
    into a REAL Postgres, across TWO streaming runs with a checkpoint
    resume and an out-of-band geocoder write between them. Final
    tasks/task_executors/scraper_status state is asserted against a
    DuckDB mirror computed independently from the same feed files."""
    import duckdb

    from hephaestus_spark.streaming.pipeline import (
        TASK_FEED_SCHEMA,
        JdbcTaskSyncPipeline,
    )

    _psql(pg_sock, FULL_DDL)
    feed = str(tmp_path / "feed")
    pipe = JdbcTaskSyncPipeline(
        feed_dir=feed,
        checkpoint_dir=str(tmp_path / "ckpt"),
        connection_factory=(lambda sock: lambda: _PsqlConnection(sock))(pg_sock),
    )

    # ---- run 1: day-1 feed ----
    spark.createDataFrame(_DAY1, TASK_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    h1 = pipe.run_available_now(spark)
    assert sum(h["rows"] for h in h1) == 3
    assert pipe.last_processed_date() == _D1 + _dt.timedelta(days=1)
    assert _psql(pg_sock, "SELECT count(*) FROM tasks") == "3"

    # the external geocoder fills in coordinates between syncs
    _psql(pg_sock, "UPDATE tasks SET latitude = 1.5, longitude = 2.5,"
                   " geocoding_attempts = 3, geocoding_error = 'geo-x'")

    # ---- run 2: day-2 feed; the checkpoint must skip day 1 ----
    spark.createDataFrame(_DAY2, TASK_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    h2 = pipe.run_available_now(spark)
    assert sum(h["rows"] for h in h2) == 4  # day-1 rows NOT reprocessed
    assert pipe.last_processed_date() == _D2 + _dt.timedelta(days=1)

    # ---- DuckDB mirror: expected end state from the raw feed files ----
    con = duckdb.connect()
    mirror_tasks = con.execute(f"""
        WITH feed AS (SELECT * FROM read_parquet('{feed}/*.parquet')),
        latest AS (
          SELECT * FROM feed
          QUALIFY row_number() OVER (PARTITION BY id ORDER BY feed_date DESC) = 1
        ),
        types AS (
          SELECT type AS type_name,
                 row_number() OVER (ORDER BY min_fd, type) AS type_id
          FROM (SELECT type, min(feed_date) AS min_fd FROM feed GROUP BY 1)
        ),
        -- creation_date is insert-only (task.go:84-96): the mirror takes
        -- it from each task's FIRST feed appearance, not the latest
        first AS (
          SELECT id, created_at FROM feed
          QUALIFY row_number() OVER (PARTITION BY id ORDER BY feed_date ASC) = 1
        ),
        d1 AS (SELECT id, address AS a1 FROM feed WHERE feed_date = DATE '2024-03-01')
        SELECT l.id AS task_id, t.type_id AS task_type_id,
               coalesce(CAST(first.created_at AS VARCHAR), 'NULL') AS creation_date,
               coalesce(CAST(l.closed_at AS VARCHAR), 'NULL') AS closing_date,
               l.description,
               coalesce(l.address, 'NULL') AS address,
               l.customer_name, l.customer_login,
               coalesce(array_to_string(l.comments, ','), '') AS comments,
               CAST(l.is_closed AS INT) AS is_closed,
               CASE WHEN d1.id IS NULL THEN 'NULL'             -- day-2 insert
                    WHEN d1.a1 IS DISTINCT FROM l.address THEN 'NULL'
                    ELSE '1.5' END AS latitude,
               CASE WHEN d1.id IS NULL THEN 'NULL'
                    WHEN d1.a1 IS DISTINCT FROM l.address THEN 'NULL'
                    ELSE '2.5' END AS longitude,
               CASE WHEN d1.id IS NULL THEN 'NULL'
                    WHEN d1.a1 IS DISTINCT FROM l.address THEN '0'
                    ELSE '3' END AS geocoding_attempts,
               CASE WHEN d1.id IS NULL THEN 'NULL'
                    WHEN d1.a1 IS DISTINCT FROM l.address THEN 'NULL'
                    ELSE 'geo-x' END AS geocoding_error
        FROM latest l
        JOIN types t ON t.type_name = l.type
        JOIN first ON first.id = l.id
        LEFT JOIN d1 ON d1.id = l.id
        ORDER BY l.id
    """).fetchall()
    expected = ["|".join(str(c) for c in row) for row in mirror_tasks]
    got = _psql(pg_sock, """
        SELECT task_id, task_type_id,
               coalesce(creation_date::text, 'NULL'),
               coalesce(closing_date::text, 'NULL'),
               description, coalesce(address, 'NULL'),
               customer_name, customer_login,
               array_to_string(comments, ','), is_closed::int,
               coalesce(latitude::text, 'NULL'),
               coalesce(longitude::text, 'NULL'),
               coalesce(geocoding_attempts::text, 'NULL'),
               coalesce(geocoding_error, 'NULL')
        FROM tasks ORDER BY task_id
    """).splitlines()
    assert got == expected, f"tasks diverge:\nPG:     {got}\nmirror: {expected}"

    mirror_bridge = con.execute(f"""
        WITH feed AS (SELECT * FROM read_parquet('{feed}/*.parquet')),
        latest AS (
          SELECT * FROM feed
          QUALIFY row_number() OVER (PARTITION BY id ORDER BY feed_date DESC) = 1
        ),
        emp(id, shortname) AS (VALUES (1, 'ab'), (2, 'cd'), (3, 'ef'))
        SELECT l.id AS task_id,
               coalesce(CAST(e.id AS VARCHAR), 'NULL') AS executor_id
        FROM latest l, unnest(l.executors) AS u(shortname)
        LEFT JOIN emp e ON e.shortname = u.shortname
        ORDER BY 1, 2
    """).fetchall()
    expected_b = ["|".join(str(c) for c in row) for row in mirror_bridge]
    got_b = _psql(pg_sock, """
        SELECT task_id, coalesce(executor_id::text, 'NULL')
        FROM task_executors ORDER BY 1, 2
    """).splitlines()
    assert got_b == expected_b, f"bridge diverges:\nPG:     {got_b}\nmirror: {expected_b}"
    # task 2's day-2 executor set is empty: its old rows must be GONE
    assert _psql(pg_sock, "SELECT count(*) FROM task_executors WHERE task_id = 2") == "0"
    # the dimension minted exactly the four types, batch-ordered
    assert _psql(
        pg_sock, "SELECT string_agg(type_name, ',' ORDER BY type_id) FROM task_types"
    ) == "install,repair,audit,survey"
    # re-synced tasks kept their FIRST insert's creation_date even
    # though day 2 reported _T1_JITTER (ADVICE r6 item 1)
    assert _psql(
        pg_sock,
        "SELECT count(*) FROM tasks WHERE task_id <= 3"
        f" AND creation_date = '{_T1.isoformat(sep=' ')}'",
    ) == "3"
    # watermark monotonicity (ADVICE r6 item 3): replaying an OLD day
    # must not move last_processed_date backwards
    pipe.advance_watermark(_D1)
    assert pipe.last_processed_date() == _D2 + _dt.timedelta(days=1)


_EMP_DDL = """
DROP TABLE IF EXISTS employees CASCADE;
CREATE TABLE employees (
  id bigint PRIMARY KEY, fullname text, shortname text, position text,
  email text, phone text, updated_at timestamp DEFAULT now());
"""


def test_employee_sync_pipeline_against_postgres(spark, pg_sock, tmp_path):
    """A11/A12/P1 against real Postgres: insert-if-absent, UPDATE only
    for genuinely changed rows (unchanged rows keep their updated_at —
    the blanket-upsert semantic difference), and the feed-fingerprint
    skip. Final state asserted against a pure-Python replay of the
    cleaned batches."""
    import datetime as dt

    from hephaestus_spark.streaming.pipeline import (
        EMPLOYEE_FEED_SCHEMA,
        JdbcEmployeeSyncPipeline,
        clean_employees,
    )

    _psql(pg_sock, _EMP_DDL)
    feed = str(tmp_path / "emp-feed")
    pipe = JdbcEmployeeSyncPipeline(
        feed_dir=feed,
        checkpoint_dir=str(tmp_path / "emp-ckpt"),
        connection_factory=(lambda sock: lambda: _PsqlConnection(sock))(pg_sock),
    )
    d1 = dt.date(2024, 4, 1)
    day1 = [
        (1, "Ann A", "ann", "eng", "ann@ex.com", "+1 555 0100", d1),
        (2, "Bob B", "bob", "ops", "broken-email", "(555) 0101", d1),
        (3, "Cid C", "cid", "eng", "cid@ex.com", None, d1),
    ]
    spark.createDataFrame(day1, EMPLOYEE_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    h1 = pipe.run_available_now(spark)
    assert h1 == [{"batch_id": 0, "skipped": False, "inserted": 3, "updated": 0}]
    snap1 = _psql(pg_sock, "SELECT id, updated_at FROM employees ORDER BY id")

    # identical feed content again (new file, same rows) -> P1 skip
    spark.createDataFrame(day1, EMPLOYEE_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    h2 = pipe.run_available_now(spark)
    assert h2 == [{"batch_id": 1, "skipped": True}]
    assert _psql(pg_sock, "SELECT id, updated_at FROM employees ORDER BY id") == snap1

    # day 2: one changed row, one new row, one byte-identical row
    d2 = dt.date(2024, 4, 2)
    day2 = [
        (1, "Ann A", "ann", "staff eng", "ann@ex.com", "+1 555 0100", d2),  # changed
        (2, "Bob B", "bob", "ops", "broken-email", "(555) 0101", d2),       # same
        (4, "Dee D", "dee", "data", "dee@ex.com", "+1 555 0102", d2),       # new
    ]
    spark.createDataFrame(day2, EMPLOYEE_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    h3 = pipe.run_available_now(spark)
    assert h3 == [{"batch_id": 2, "skipped": False, "inserted": 1, "updated": 1}]
    # unchanged rows (2, 3) keep their original updated_at; row 1 bumped
    snap2 = dict(
        line.split("|") for line in _psql(
            pg_sock, "SELECT id, updated_at FROM employees ORDER BY id"
        ).splitlines()
    )
    old = dict(line.split("|") for line in snap1.splitlines())
    assert snap2["2"] == old["2"] and snap2["3"] == old["3"]
    assert snap2["1"] != old["1"]

    # final state == pure-Python replay of the CLEANED batches
    expected: dict = {}
    for rows in (day1, day2):
        cleaned = clean_employees(
            spark.createDataFrame(rows, EMPLOYEE_FEED_SCHEMA)
        ).collect()
        for r in cleaned:
            expected[r["id"]] = (
                r["fullname"], r["shortname"], r["position"],
                r["email"] or "NULL", r["phone"] or "NULL",
            )
    got = {
        int(line.split("|")[0]): tuple(line.split("|")[1:])
        for line in _psql(
            pg_sock,
            "SELECT id, fullname, shortname, position,"
            " coalesce(email, 'NULL'), coalesce(phone, 'NULL')"
            " FROM employees ORDER BY id",
        ).splitlines()
    }
    assert got == expected, (got, expected)


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
