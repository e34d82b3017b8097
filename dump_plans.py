"""Dump .explain('formatted') for queries into plans/r16/<q>_<tag>.txt."""
import os
import sys

os.environ.setdefault("SPARK_GRAFT_UI", "false")
from hephaestus_spark.session import get_session  # noqa: E402
from hephaestus_spark.registry import QUERIES  # noqa: E402
import hephaestus_spark.queries  # noqa: F401,E402

tag = sys.argv[1]
names = sys.argv[2:]
d = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("plans")
os.makedirs("plans/r16", exist_ok=True)
for n in names:
    df = QUERIES[n](spark, d)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(f"plans/r16/{n}_{tag}.txt", "w") as f:
        f.write(p)
    print(n, tag, "ok")
spark.stop()
