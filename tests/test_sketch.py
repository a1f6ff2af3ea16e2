"""HyperLogLog sketch: accuracy, mergeability, determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ocr_agent_ray.functions.sketch import HyperLogLog, hll_distinct


def test_hll_accuracy_ints():
    for true_n in (100, 5_000, 50_000):
        hll = HyperLogLog(p=12)
        hll.add_ints(np.arange(true_n))
        est = hll.estimate()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single():
    a, b = HyperLogLog(), HyperLogLog()
    a.add_ints(np.arange(0, 10_000))
    b.add_ints(np.arange(5_000, 15_000))
    merged = a.merge(b)
    single = HyperLogLog()
    single.add_ints(np.arange(15_000))
    assert merged.estimate() == single.estimate()  # identical registers
    # round-trip
    back = HyperLogLog.deserialize(merged.serialize())
    assert back.estimate() == merged.estimate()


def test_hll_strings_and_duplicates():
    h = HyperLogLog()
    h.add_strings([f"user-{i % 500}" for i in range(20_000)])
    assert abs(h.estimate() - 500) / 500 < 0.06


def test_hll_distinct_over_dataset(ray_session):
    df = pd.DataFrame({"user_id": np.arange(30_000) % 2_000})
    est = hll_distinct(rd.from_pandas(df), "user_id")
    assert abs(est - 2_000) / 2_000 < 0.05
    # deterministic across runs / batchings
    est2 = hll_distinct(rd.from_pandas(df).repartition(7), "user_id")
    assert est == est2


def test_centroid_digest_quantiles_within_rank_error(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd

    from ocr_agent_ray.functions.sketch import quantile_sketch

    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet", columns=["value"])
    got = quantile_sketch(ev, "value", quantiles=(0.5, 0.9), capacity=256)
    exact = np.sort(
        pq.read_table(f"{sf}/events.parquet", columns=["value"])
        .to_pandas()["value"].to_numpy())
    n = len(exact)
    for q, v in zip(got["quantile"], got["value"]):
        # the approx value's RANK must be within ~2·n/capacity of q·n
        rank = np.searchsorted(exact, v)
        assert abs(rank - q * n) <= 2 * n / 256 + 2, (q, v, rank)


def test_centroid_digest_merge_associative():
    import numpy as np

    from ocr_agent_ray.functions.sketch import CentroidDigest

    rng = np.random.default_rng(3)
    a, b, c = (rng.normal(size=5000) for _ in range(3))
    d1 = CentroidDigest.from_values(a).merge(
        CentroidDigest.from_values(b)).merge(CentroidDigest.from_values(c))
    d2 = CentroidDigest.from_values(np.concatenate([a, b, c]))
    for q in (0.1, 0.5, 0.9):
        assert abs(d1.quantile(q) - d2.quantile(q)) < 0.05


def test_bloom_decontaminate_no_false_negatives(ray_session):
    from ocr_agent_ray.pipelines.text import decontaminate, decontaminate_bloom

    sf = "/root/testdata/sf0.001"
    exact = decontaminate(sf).to_pandas().set_index("doc_id")["contaminated"]
    bloom = decontaminate_bloom(sf).to_pandas().set_index("doc_id")["contaminated"]
    exact, bloom = exact.sort_index(), bloom.sort_index()
    # one-sided error: everything exact flags, bloom flags too
    assert bool((bloom[exact] == True).all())  # noqa: E712
    # false-positive rate on the clean docs stays small
    clean = ~exact
    fpr = float((bloom[clean]).mean()) if clean.any() else 0.0
    assert fpr <= 0.02, fpr


def test_hll_per_key_within_tolerance(ray_session):
    import pyarrow.parquet as pq

    import ray.data as rd

    from ocr_agent_ray.functions.sketch import hll_distinct_by_key

    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "user_id"])
    got = hll_distinct_by_key(ev, "event_type", "user_id")
    exact = (pq.read_table(f"{sf}/events.parquet",
                           columns=["event_type", "user_id"]).to_pandas()
             .groupby("event_type")["user_id"].nunique())
    assert set(got["event_type"]) == set(exact.index)
    for _, row in got.iterrows():
        true = exact[row["event_type"]]
        assert abs(row["approx_distinct"] - true) <= max(2, 0.05 * true)


def test_quantile_sketch_by_key_accuracy(ray_session):
    """Per-key digest quantiles within 2% relative error of exact
    per-key quantiles on the events table."""
    import duckdb

    import ray.data as rd

    from ocr_agent_ray.functions.sketch import quantile_sketch_by_key

    sf = "/root/testdata/sf0.01"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    got = quantile_sketch_by_key(ev, "event_type", "value",
                                 quantiles=(0.5, 0.9, 0.99))
    exact = duckdb.sql(
        "WITH g AS (SELECT event_type, "
        "percentile_cont(0.5)  WITHIN GROUP (ORDER BY value) AS q50, "
        "percentile_cont(0.9)  WITHIN GROUP (ORDER BY value) AS q90, "
        "percentile_cont(0.99) WITHIN GROUP (ORDER BY value) AS q99 "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY 1) "
        "SELECT event_type, 0.5 AS quantile, q50 AS exact_v FROM g "
        "UNION ALL SELECT event_type, 0.9, q90 FROM g "
        "UNION ALL SELECT event_type, 0.99, q99 FROM g").df()
    m = got.merge(exact, on=["event_type", "quantile"])
    assert len(m) == len(got) > 0
    rel = ((m["value"] - m["exact_v"]).abs()
           / m["exact_v"].abs().clip(lower=1e-9))
    # the equal-weight digest has no tail-bias correction, so allow more
    # slack at p99 (rank error ~ n/capacity concentrates in the tails)
    tol = np.where(m["quantile"] >= 0.99, 0.05, 0.02)
    assert (rel < tol).all(), m[rel >= tol]


def test_cms_one_sided_and_exact_on_sparse(ray_session):
    """CMS estimates are >= truth always; with w >> distinct words on
    this corpus, collisions are absent and estimates are EXACT."""
    import duckdb
    import ray.data as rd

    from ocr_agent_ray.functions.sketch import cms_word_counts

    sf = "/root/testdata/sf0.001"
    probes = ["table", "query", "value", "zzz_absent"]
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    got = cms_word_counts(docs, probes, w=1 << 16).set_index("word")

    exact = duckdb.sql(
        "SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "SELECT unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) "
        f"AS word FROM read_parquet('{sf}/documents.parquet')) "
        "WHERE word <> '' GROUP BY word").df().set_index("word")["n"]

    n_total = int(exact.sum())
    for p in probes:
        true = int(exact.get(p, 0))
        est = int(got.loc[p, "approx_n"])
        assert est >= true
        assert est <= true + int(np.e / (1 << 16) * n_total) + 1
    # vocabulary ~100 distinct << 65536 -> exact w.h.p.
    assert int(got.loc["zzz_absent", "approx_n"]) == 0
    assert int(got.loc["table", "approx_n"]) == int(exact["table"])


def test_cms_merge_equals_single_pass():
    from ocr_agent_ray.functions.sketch import CountMinSketch, _word_hashes

    rng = np.random.default_rng(9)
    words = np.array([f"w{i}" for i in rng.integers(0, 50, 2000)],
                     dtype=object)
    h = _word_hashes(words)
    whole = CountMinSketch(4, 256)
    whole.add_hashes(h)
    a, b = CountMinSketch(4, 256), CountMinSketch(4, 256)
    a.add_hashes(h[:777])
    b.add_hashes(h[777:])
    merged = a.merge(b)
    assert (merged.counts == whole.counts).all()
    probe = _word_hashes(np.array(["w0", "w17", "nope"], dtype=object))
    assert (merged.estimate_hashes(probe)
            == whole.estimate_hashes(probe)).all()
    # one-sided error vs truth
    import collections

    truth = collections.Counter(words)
    est = whole.estimate_hashes(_word_hashes(
        np.array(list(truth), dtype=object)))
    for w_, e in zip(list(truth), est):
        assert e >= truth[w_]
