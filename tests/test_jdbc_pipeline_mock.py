"""pgxmock-analogue statement-text tests for the JDBC sync pipelines
(SURVEY §5 carry-over (i)): the reference asserts the EXACT SQL text
and bound args of every repository method; these tests do the same for
JdbcEmployeeSyncPipeline through a recording DBAPI mock — no database
needed, so the assertions run in the fast suite on any machine (the
real-Postgres integration covers execution).

r9: the employee write path moved executor-side
(JdbcMergeTarget.foreachPartition, VERDICT r8 #2), so the mock records
to a FILE instead of a driver-closure list — executemany calls now
happen in Spark worker processes and an in-memory log would silently
stay empty. The factory object is pickled to the workers; everything
it captures is a plain string path + tuples.
"""

from __future__ import annotations

import datetime as dt
import json

from hephaestus_spark.streaming.pipeline import (
    EMPLOYEE_FEED_SCHEMA,
    JdbcEmployeeSyncPipeline,
)

INSERT_SQL = (
    "INSERT INTO employees (id, fullname, shortname, position, email, phone)"
    " VALUES (%s, %s, %s, %s, %s, %s) ON CONFLICT (id) DO NOTHING"
)
UPDATE_SQL = (
    "UPDATE employees SET fullname = %s, shortname = %s, position = %s,"
    " email = %s, phone = %s, updated_at = CURRENT_TIMESTAMP WHERE id = %s"
)


class _Cursor:
    def __init__(self, path, canned):
        self._path = path
        self._canned = canned
        self._rows = []

    def _log(self, kind, sql, args):
        with open(self._path, "a") as f:
            f.write(json.dumps([kind, " ".join(sql.split()), args]) + "\n")

    def execute(self, sql, args=None):
        self._log("execute", sql, args)
        for prefix, rows in self._canned.items():
            if " ".join(sql.split()).startswith(prefix):
                self._rows = [list(r) for r in rows]
                return
        self._rows = []

    def fetchall(self):
        return self._rows

    def executemany(self, sql, argsets):
        self._log("executemany", sql, [list(a) for a in argsets])


class _Conn:
    def __init__(self, path, canned):
        self._path = path
        self._canned = canned

    def cursor(self):
        return _Cursor(self._path, self._canned)

    def commit(self):
        pass

    def close(self):
        pass


class _FileRecordingFactory:
    """Picklable connection factory: survives the foreachPartition
    pickle boundary; worker- and driver-side statements interleave
    into one append-only JSONL file."""

    def __init__(self, path, canned=()):
        self.path = str(path)
        self.canned = dict(canned)

    def __call__(self):
        return _Conn(self.path, self.canned)


def _statements(path):
    with open(path) as f:
        entries = [json.loads(line) for line in f]
    return [(sql, args) for kind, sql, args in entries if kind == "executemany"]


def test_employee_pipeline_statement_text_and_args(spark, tmp_path):
    log_path = tmp_path / "stmt.log"
    log_path.touch()
    canned = {
        "SELECT id, fullname, shortname, position, email, phone FROM employees": (
            (7, "Old O", "old", "ops", "old@ex.com", "+10000000"),
        )
    }
    pipe = JdbcEmployeeSyncPipeline(
        feed_dir=str(tmp_path / "feed"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        connection_factory=_FileRecordingFactory(log_path, canned),
        partitions=1,  # one sink connection ⇒ deterministic stmt order
    )
    d = dt.date(2024, 5, 1)
    rows = [
        (7, "Old O", "old", "staff ops", "old@ex.com", "+10000000", d),  # changed
        (8, "New N", "new", "eng", "new@ex.com", "+1 555 0100", d),      # insert
    ]
    spark.createDataFrame(rows, EMPLOYEE_FEED_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "feed")
    )
    h = pipe.run_available_now(spark)
    assert h == [{"batch_id": 0, "skipped": False, "inserted": 1, "updated": 1}]

    many = _statements(log_path)
    assert [sql for sql, _ in many] == [INSERT_SQL, UPDATE_SQL]
    # insert binds (id, cols...) for the genuinely-new employee, with the
    # phone normalized by the cleaning stage (A7 strip + E.164)
    assert many[0][1] == [[8, "New N", "new", "eng", "new@ex.com", "+15550100"]]
    # update binds (cols..., id) — id LAST, matching the WHERE position
    assert many[1][1] == [["Old O", "old", "staff ops", "old@ex.com", "+10000000", 7]]


def test_employee_pipeline_hash_skip_issues_no_statements(spark, tmp_path):
    log_path = tmp_path / "stmt.log"
    log_path.touch()
    pipe = JdbcEmployeeSyncPipeline(
        feed_dir=str(tmp_path / "feed"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        connection_factory=_FileRecordingFactory(log_path),
        partitions=1,
    )
    d = dt.date(2024, 5, 1)
    rows = [(1, "A", "a", "eng", "a@ex.com", "+15550100", d)]
    spark.createDataFrame(rows, EMPLOYEE_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(tmp_path / "feed"))
    pipe.run_available_now(spark)
    n_before = sum(1 for _ in open(log_path))
    # identical content, new file: P1 fingerprint short-circuits the DB
    spark.createDataFrame(rows, EMPLOYEE_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(tmp_path / "feed"))
    h = pipe.run_available_now(spark)
    assert h == [{"batch_id": 1, "skipped": True}]
    # not a single statement reached the mock
    assert sum(1 for _ in open(log_path)) == n_before
