"""Table maintenance: small-file compaction and schema-evolution reads."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_compact_parquet_reduces_files(ray_session, tmp_path):
    from ocr_agent_ray.sources.maintenance import compact_parquet

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(32):
        df = pd.DataFrame({"k": rng.integers(0, 1000, 50),
                           "v": rng.standard_normal(50)})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(src / f"shard-{i:03d}.parquet"))

    out = tmp_path / "out"
    stats = compact_parquet(str(src), str(out), target_files=4)
    assert stats["files_before"] == 32 and stats["rows"] == 1600
    assert stats["files_after"] <= 8    # far fewer, larger files
    a = pd.read_parquet(str(src)).sort_values(["k", "v"]).reset_index(drop=True)
    b = pd.read_parquet(str(out)).sort_values(["k", "v"]).reset_index(drop=True)
    assert a.equals(b)                  # byte-level content preserved


def test_compact_parquet_sorted_output(ray_session, tmp_path):
    from ocr_agent_ray.sources.maintenance import compact_parquet

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(1)
    for i in range(16):
        df = pd.DataFrame({"k": rng.integers(0, 10_000, 100)})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(src / f"s{i}.parquet"))
    out = tmp_path / "out"
    compact_parquet(str(src), str(out), target_files=4, sort_by="k")
    # range clustering: per-file [min,max] intervals do not interleave
    spans = []
    for f in sorted(os.listdir(out)):
        if f.endswith(".parquet"):
            ks = pd.read_parquet(str(out / f))["k"]
            if len(ks):
                spans.append((ks.min(), ks.max()))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_read_with_schema_evolution(ray_session, tmp_path):
    from ocr_agent_ray.sources.maintenance import read_with_schema_evolution

    old = tmp_path / "old"
    new = tmp_path / "new"
    old.mkdir()
    new.mkdir()
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]}),
        preserve_index=False), str(old / "p.parquet"))
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame({"doc_id": [3], "text": ["c"], "lang": ["en"]}),
        preserve_index=False), str(new / "p.parquet"))

    got = (read_with_schema_evolution([str(old), str(new)])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(got.columns) == ["doc_id", "text", "lang"]
    assert got["lang"].tolist()[:2] == [None, None]
    assert got.loc[2, "lang"] == "en"

    # genuine type conflicts fail loudly
    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame({"doc_id": ["x"], "text": ["d"]}),
        preserve_index=False), str(bad / "p.parquet"))
    import pytest

    with pytest.raises(ValueError, match="type conflict"):
        read_with_schema_evolution([str(old), str(bad)])


def test_zorder_write_prunes_both_dimensions(ray_session, tmp_path):
    """Z-order clustering: per-file zone maps prune range queries on
    BOTH columns, where a single-column sort only prunes its own."""
    import ray.data as rd

    from ocr_agent_ray.sources.maintenance import zorder_write

    rng = np.random.default_rng(3)
    n = 20_000
    df = pd.DataFrame({"x": rng.integers(0, 10_000, n),
                       "y": rng.integers(0, 10_000, n)})

    def files_touched(out_dir, col, lo, hi):
        touched, total = 0, 0
        for f in sorted(os.listdir(out_dir)):
            if not f.endswith(".parquet"):
                continue
            total += 1
            c = pd.read_parquet(os.path.join(out_dir, f))[col]
            if len(c) and not (c.max() < lo or c.min() > hi):
                touched += 1
        return touched, total

    zdir = str(tmp_path / "z")
    stats = zorder_write(rd.from_pandas(df), zdir, x_col="x", y_col="y",
                         num_files=16)
    assert stats["files"] >= 8

    xdir = str(tmp_path / "xsort")
    os.makedirs(xdir)
    rd.from_pandas(df).sort("x").repartition(16).write_parquet(xdir)

    # a narrow band on each dimension (10% of the range, inside one
    # top-level Morton quadrant — a band straddling the midpoint
    # legitimately touches both halves of the curve)
    for col in ("x", "y"):
        zt, zn = files_touched(zdir, col, 1000, 2000)
        assert zt <= zn // 2, (col, zt, zn)   # z-order prunes both dims
    xt_x, xn = files_touched(xdir, "x", 1000, 2000)
    xt_y, _ = files_touched(xdir, "y", 1000, 2000)
    assert xt_x <= xn // 4          # x-sort prunes x...
    assert xt_y >= xn - 1           # ...but touches ~every file for y
