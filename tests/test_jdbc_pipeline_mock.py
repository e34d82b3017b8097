"""pgxmock-analogue statement-text tests for the JDBC sync pipelines
(SURVEY §5 carry-over (i)): the reference asserts the EXACT SQL text
and bound args of every repository method; these tests do the same for
JdbcEmployeeSyncPipeline's driver-side statements through a recording
DBAPI mock — no database needed, so the assertions run in the fast
suite on any machine (the real-Postgres integration covers execution).
"""

from __future__ import annotations

import datetime as dt

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
    def __init__(self, log, canned):
        self._log = log
        self._canned = canned
        self._rows = []

    def execute(self, sql, args=None):
        self._log.append(("execute", " ".join(sql.split()), args))
        for prefix, rows in self._canned.items():
            if " ".join(sql.split()).startswith(prefix):
                self._rows = rows
                return
        self._rows = []

    def fetchall(self):
        return self._rows

    def executemany(self, sql, argsets):
        self._log.append(("executemany", " ".join(sql.split()), [list(a) for a in argsets]))


class _Conn:
    def __init__(self, log, canned):
        self._log = log
        self._canned = canned

    def cursor(self):
        return _Cursor(self._log, self._canned)

    def commit(self):
        self._log.append(("commit", None, None))

    def close(self):
        pass


def test_employee_pipeline_statement_text_and_args(spark, tmp_path):
    log: list = []
    canned = {
        "SELECT id, fullname, shortname, position, email, phone FROM employees": [
            (7, "Old O", "old", "ops", "old@ex.com", "+10000000"),
        ]
    }
    pipe = JdbcEmployeeSyncPipeline(
        feed_dir=str(tmp_path / "feed"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        connection_factory=lambda: _Conn(log, canned),
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

    many = [(sql, args) for kind, sql, args in log if kind == "executemany"]
    assert [sql for sql, _ in many] == [INSERT_SQL, UPDATE_SQL]
    # insert binds (id, cols...) for the genuinely-new employee, with the
    # phone normalized by the cleaning stage (A7 strip + E.164)
    assert many[0][1] == [[8, "New N", "new", "eng", "new@ex.com", "+15550100"]]
    # update binds (cols..., id) — id LAST, matching the WHERE position
    assert many[1][1] == [["Old O", "old", "staff ops", "old@ex.com", "+10000000", 7]]


def test_employee_pipeline_hash_skip_issues_no_statements(spark, tmp_path):
    log: list = []
    pipe = JdbcEmployeeSyncPipeline(
        feed_dir=str(tmp_path / "feed"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        connection_factory=lambda: _Conn(log, {}),
    )
    d = dt.date(2024, 5, 1)
    rows = [(1, "A", "a", "eng", "a@ex.com", "+15550100", d)]
    spark.createDataFrame(rows, EMPLOYEE_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(tmp_path / "feed"))
    pipe.run_available_now(spark)
    n_before = len(log)
    # identical content, new file: P1 fingerprint short-circuits the DB
    spark.createDataFrame(rows, EMPLOYEE_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(tmp_path / "feed"))
    h = pipe.run_available_now(spark)
    assert h == [{"batch_id": 1, "skipped": True}]
    assert len(log) == n_before  # not a single statement reached the mock
