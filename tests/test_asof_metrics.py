"""As-of join vs pandas oracle; metrics spool + ETA estimator."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_agent_ray.pipelines.joins import asof_join
from ocr_agent_ray.state.checkpoint import (
    CheckpointStore,
    MetricsSpool,
    compute_eta_seconds,
)


def test_asof_join_matches_merge_asof(ray_session):
    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "k": rng.integers(0, 10, 200),
        "t": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 10_000, 200), unit="m"),
        "lv": np.arange(200),
    }).astype({"k": "int64"})
    right = pd.DataFrame({
        "k": rng.integers(0, 10, 50),
        "rt": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 10_000, 50), unit="m"),
        "rv": np.arange(50),
    }).astype({"k": "int64"})
    right = right.drop_duplicates(["k", "rt"])

    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", left_ts="t", right_ts="rt",
        left_schema=pa.schema([("k", pa.int64()), ("t", pa.timestamp("us")), ("lv", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("rt", pa.timestamp("us")), ("rv", pa.int64())]),
    ).to_pandas()

    want = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("rt", kind="mergesort"),
        left_on="t", right_on="rt", by="k", direction="backward",
    )
    key = ["k", "t", "lv"]
    for c in ("t", "rt"):  # normalize us/ns timestamp resolution
        got[c] = got[c].astype("datetime64[ns]")
        want[c] = want[c].astype("datetime64[ns]")
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_metrics_spool_and_eta(tmp_path):
    out = str(tmp_path / "ckpt")
    store = CheckpointStore(out).initialize()
    spool = MetricsSpool(out)
    spool.append("ocr", spool.rows_for("ocr", [0, 0, 1], wall_ms=30))
    spool.append("ocr", spool.rows_for("ocr", [1], wall_ms=10))
    # per-partition commit metrics
    tbl = pa.table({"doc_id": ["d1"], "spans": [[{"kind": "text", "text": "x",
                    "media_ref": "", "offset": 0}]]})
    store.write_partition(0, tbl, [{
        "partition_id": 0, "stage": "assemble", "status": "completed",
        "rows_in": 1, "rows_out": 1, "wall_ms": 500, "error_message": None,
    }])

    metrics = store.load_metrics()
    stages = {r["stage"] for r in metrics.to_pylist()}
    assert stages == {"ocr", "assemble"}
    ocr_rows = [r for r in metrics.to_pylist() if r["stage"] == "ocr"]
    assert sum(r["rows_in"] for r in ocr_rows) == 4
    # groupby(status).count() reproduces the reference's status query (G1)
    assert all(r["status"] == "completed" for r in metrics.to_pylist())

    # ETA: 1 of 4 partitions done at 500 ms -> 3 × 0.5 s
    assert compute_eta_seconds(metrics, 4) == 1.5
    assert compute_eta_seconds(metrics, 1) == 0.0
    assert compute_eta_seconds(pa.Table.from_pylist([]), 4) is None


def test_metrics_spool_bounded_files_exact_totals(tmp_path):
    """Rotating spool: every row durable after every append, file count
    ~rows/rows_per_file instead of one per batch."""
    import os

    out = str(tmp_path / "spool")
    CheckpointStore(out).initialize()
    spool = MetricsSpool(out, rows_per_file=64)
    total = 0
    for batch in range(100):
        rows = spool.rows_for("ocr", [batch % 7] * 10, wall_ms=5)
        total += sum(r["rows_in"] for r in rows)
        spool.append("ocr", rows)
        # durability invariant: everything appended so far is on disk
        if batch in (0, 13, 57):
            m = CheckpointStore(out).load_metrics()
            assert sum(r["rows_in"] for r in m.to_pylist()) == total

    m = CheckpointStore(out).load_metrics().to_pylist()
    assert sum(r["rows_in"] for r in m) == total == 1000
    n_files = len([f for f in os.listdir(os.path.join(out, "metrics"))
                   if f.startswith("spool-")])
    n_rows = len(m)
    assert n_files <= n_rows // 64 + 1   # bounded, NOT one per batch (100)


def test_extract_run_spools_stage_metrics(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.extract import run_extract_checkpointed
    from ocr_agent_ray.sources.corpus import generate_documents

    out = str(tmp_path / "ckpt2")
    run_extract_checkpointed(rd.from_arrow(generate_documents(40, seed=42)), out)
    metrics = CheckpointStore(out).load_metrics()
    stages = {r["stage"] for r in metrics.to_pylist()}
    assert {"ocr", "postprocess", "assemble"} <= stages
