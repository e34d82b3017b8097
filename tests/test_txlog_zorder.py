"""OPTIMIZE ZORDER BY on arbitrary-typed keys (r14, VERDICT r13 #4).

The raw Morton interleave (operators/layout.py zorder_key) needs
non-negative in-mask integers; real tables z-order on floats, strings,
dates, negatives. ``TxTable.optimize`` now plans between the two forms
from COMMITTED METADATA alone (_zorder_raw_ok — zone maps prove the
int case), falling back to order-preserving range bucketization
(layout.zorder_bucketize, Delta's range_partition_id shape: one
distributed-sample shuffle per key, never a driver collect).

Pinned here: 2-D predicates on float+string keys touch a small file
subset after zorder_by where a single-column sort keeps everything on
the second dimension; row content is bit-identical; time travel and
CDF see the rewrite as a pure optimize; the zorder_by alias validates
its arguments."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hephaestus_spark.sources.txlog import TxTable


def _grid(spark):
    # 32x32 grid on (price float in [0,31], name string 'k00'..'k31');
    # ingest row-major = clustered on price only
    rows = [
        (i, float(i % 32), f"k{i // 32:02d}", i) for i in range(1024)
    ]
    return spark.createDataFrame(rows, "id long, price double, name string, payload long")


def test_zorder_by_arbitrary_types_prunes_both_dims(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_grid(spark).coalesce(4))
    before = sorted(
        (r["id"], r["price"], r["name"], r["payload"])
        for r in t.read(spark).collect()
    )

    v = t.optimize(spark, target_files=16, zorder_by=["price", "name"])
    assert v >= 1

    kept_p, total = t.pruned_files("price", 0.0, 3.0)
    kept_n, _ = t.pruned_files("name", "k00", "k03")
    assert total >= 8
    # both dimensions skip files — the property a single-column sort
    # cannot give on the second dimension
    assert len(kept_p) <= total // 2, (len(kept_p), total)
    assert len(kept_n) <= total // 2, (len(kept_n), total)
    # skipping loses nothing
    assert t.read_pruned(spark, "price", 0.0, 3.0).count() == 4 * 32
    assert t.read_pruned(spark, "name", "k00", "k03").count() == 4 * 32
    # the rewrite is pure bookkeeping: bit-identical rows
    after = sorted(
        (r["id"], r["price"], r["name"], r["payload"])
        for r in t.read(spark).collect()
    )
    assert after == before
    # time travel still serves the pre-optimize layout
    assert t.read(spark, version=0).count() == 1024


def test_single_column_sort_keeps_all_on_second_dim(spark, tmp_path):
    """The contrast case: clustering on price alone leaves every file
    covering the full name range, so a name predicate prunes nothing —
    the motivating gap zorder_by closes."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_grid(spark).coalesce(4))
    t.optimize(spark, target_files=16, cluster_by="price")
    kept_n, total = t.pruned_files("name", "k00", "k03")
    assert total >= 8
    assert len(kept_n) == total, "single-column sort should not prune names"


def test_zorder_negative_ints_route_to_bucketize(spark, tmp_path):
    """Negative values would corrupt the raw masked interleave — the
    metadata planner must route them to bucketize, and pruning on both
    dimensions must still work."""
    t = TxTable(str(tmp_path / "t"))
    rows = [(i, (i % 32) - 16, (i // 32) - 16) for i in range(1024)]
    t.append(spark.createDataFrame(rows, "id long, x long, y long").coalesce(4))
    assert not t._zorder_raw_ok(["x", "y"], t.latest_version())
    t.optimize(spark, target_files=16, zorder_by=["x", "y"])
    kept_x, total = t.pruned_files("x", -16, -13)
    kept_y, _ = t.pruned_files("y", -16, -13)
    assert len(kept_x) <= total // 2 and len(kept_y) <= total // 2
    assert t.read_pruned(spark, "x", -16, -13).count() == 4 * 32
    assert t.read_pruned(spark, "y", -16, -13).count() == 4 * 32


def test_zorder_raw_ok_metadata_planner(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    rows = [(i, i % 32, float(i)) for i in range(64)]
    t.append(spark.createDataFrame(rows, "id long, x long, v double"))
    v = t.latest_version()
    assert t._zorder_raw_ok(["id", "x"], v)  # small non-negative ints
    assert not t._zorder_raw_ok(["x", "v"], v)  # float key
    assert not t._zorder_raw_ok(["x", "missing"], v)  # no stats


def test_zorder_by_alias_validation(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 2)], "a long, b long"))
    with pytest.raises(ValueError, match="not both"):
        t.optimize(spark, cluster_by="a", zorder_by=["a", "b"])
    with pytest.raises(ValueError, match=">= 2 columns"):
        t.optimize(spark, zorder_by=["a"])
