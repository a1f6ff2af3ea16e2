"""Planted-fixture tests for the round-4 curation extras: Pareto
skyline, per-source Gini, blocklist screening, CCNet boilerplate strip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name: str, df: pd.DataFrame) -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _brute_skyline(df: pd.DataFrame) -> set[int]:
    pts = df[["p_retailprice", "p_size"]].to_numpy()
    keys = df["p_partkey"].to_numpy()
    out = set()
    for i in range(len(pts)):
        pi, si = pts[i]
        dominated = False
        for j in range(len(pts)):
            pj, sj = pts[j]
            if pj <= pi and sj >= si and (pj < pi or sj > si):
                dominated = True
                break
        if not dominated:
            out.add(int(keys[i]))
    return out


def test_local_skyline_fuzz_vs_brute():
    from ocr_agent_ray.pipelines.relational import _local_skyline

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 120))
        df = pd.DataFrame({
            "p_partkey": np.arange(n),
            # small value domains force duplicate points and price ties
            "p_retailprice": rng.integers(0, 8, n).astype(float),
            "p_size": rng.integers(0, 8, n),
        })
        got = set(_local_skyline(df, "p_retailprice", "p_size")
                  ["p_partkey"].tolist())
        assert got == _brute_skyline(df), f"trial {trial}"


def test_local_skyline_split_union_equals_whole():
    """Local prune per split + final pass over the union == brute force
    on the whole set (the distributed plan's correctness argument)."""
    from ocr_agent_ray.pipelines.relational import _local_skyline

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "p_partkey": np.arange(300),
        "p_retailprice": rng.integers(0, 20, 300).astype(float),
        "p_size": rng.integers(0, 20, 300),
    })
    parts = [_local_skyline(g, "p_retailprice", "p_size")
             for _, g in df.groupby(df.index % 5)]
    final = _local_skyline(pd.concat(parts), "p_retailprice", "p_size")
    assert set(final["p_partkey"].tolist()) == _brute_skyline(df)


def test_pareto_skyline_pipeline(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.relational import pareto_skyline

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "p_partkey": np.arange(500, dtype=np.int64),
        "p_retailprice": rng.integers(0, 50, 500).astype(float),
        "p_size": rng.integers(0, 50, 500).astype(np.int64),
    })
    sf = _write(tmp_path, "part", df)
    got = pareto_skyline(sf).to_pandas()
    assert set(got["p_partkey"].tolist()) == _brute_skyline(df)
    # duplicates of a frontier point all survive
    assert got["p_partkey"].is_unique


def test_gini_known_values(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.text import gini_doc_lengths

    rng = np.random.default_rng(5)
    # src_eq: all equal lengths -> gini 0; src_rand: compare vs numpy
    lens_eq = np.full(40, 100, dtype=np.int64)
    lens_rand = rng.integers(10, 1000, 200).astype(np.int64)
    df = pd.DataFrame({
        "doc_id": np.arange(240, dtype=np.int64),
        "source": ["src_eq"] * 40 + ["src_rand"] * 200,
        "n_chars": np.r_[lens_eq, lens_rand],
        "text": "x",
    })
    sf = _write(tmp_path, "documents", df)
    got = gini_doc_lengths(sf).set_index("source")["gini"]
    assert got["src_eq"] == 0.0

    x = np.sort(lens_rand)
    i = np.arange(1, len(x) + 1)
    n = float(len(x))
    expect = (2.0 * float((i * x).sum())) / (n * float(x.sum())) \
        - (n + 1.0) / n
    assert abs(got["src_rand"] - expect) < 1e-6
    assert 0.0 < got["src_rand"] < 1.0


def test_blocklist_hits_planted(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.text import blocklist_hits

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "source": ["a", "a", "b", "b"],
        "text": [
            "spark spark slow",       # 3 hits -> flagged
            "clean doc",              # 0 hits
            "bigbig slow",            # 3 hits (big twice overlap-free)
            "spark",                  # 1 hit
        ],
        "n_chars": np.int64(1),
    })
    sf = _write(tmp_path, "documents", df)
    got = blocklist_hits(sf).set_index("source")
    assert got.loc["a", "docs"] == 2
    assert got.loc["a", "flagged_docs"] == 1
    assert got.loc["a", "total_hits"] == 3
    assert got.loc["b", "flagged_docs"] == 1
    assert got.loc["b", "total_hits"] == 4


def test_boilerplate_strip_planted(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.text import boilerplate_strip

    # source A: FOOTER repeats in 3 docs (boilerplate); source B carries
    # the same line in only ONE doc (must survive there). A duplicated
    # line WITHIN one doc counts that doc once (nunique), so it is NOT
    # boilerplate at min_docs=2.
    docs = [
        (0, "A", "unique a0\nFOOTER\nbody a0"),
        (1, "A", "FOOTER\nunique a1"),
        (2, "A", "body a2\nFOOTER"),
        (3, "A", "twice\ntwice\nkeep me"),
        (4, "B", "FOOTER\nunique b0"),
        (5, "B", "other b1"),
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "source", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    sf = _write(tmp_path, "documents", df)

    got = (boilerplate_strip(sf, min_docs=2).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[0, "clean_text"] == "unique a0\nbody a0"
    assert got.loc[0, "n_boiler_lines"] == 1
    assert got.loc[1, "clean_text"] == "unique a1"
    assert got.loc[2, "clean_text"] == "body a2"
    # within-doc duplicate is not boilerplate
    assert got.loc[3, "clean_text"] == "twice\ntwice\nkeep me"
    assert got.loc[3, "n_boiler_lines"] == 0
    # same line in another source survives
    assert got.loc[4, "clean_text"] == "FOOTER\nunique b0"
    assert got.loc[5, "clean_text"] == "other b1"
    assert (got["n_lines"] ==
            df.set_index("doc_id")["text"].str.split("\n").str.len()
            .sort_index()).all()


def test_docs_for_80pct_known(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.text import docs_for_80pct

    # src_one: top doc alone covers exactly 80% -> 1
    # src_flat: 10 equal docs -> need 8
    df = pd.DataFrame({
        "doc_id": np.arange(14, dtype=np.int64),
        "source": ["src_one"] * 4 + ["src_flat"] * 10,
        "n_chars": np.array([80, 10, 5, 5] + [7] * 10, dtype=np.int64),
        "text": "x",
    })
    sf = _write(tmp_path, "documents", df)
    got = docs_for_80pct(sf).set_index("source")
    assert got.loc["src_one", "docs_80pct"] == 1
    assert got.loc["src_one", "n_docs"] == 4
    assert got.loc["src_flat", "docs_80pct"] == 8


def test_bm25_matches_brute_force(ray_session, tmp_path):
    """Pipeline BM25 == a dense pandas reference on a planted corpus."""
    from ocr_agent_ray.pipelines.text import _SEARCH_QUERIES, bm25_search

    rng = np.random.default_rng(13)
    vocab = ["join", "hash", "vector", "stream", "window", "filter",
             "merge", "alpha", "beta", "gamma", "delta"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(5, 60))))
             for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    got = bm25_search(str(tmp_path), k=10).to_pandas()

    # dense reference
    k1, b = 1.2, 0.75
    toks = [t.split() for t in texts]
    dl = np.array([len(t) for t in toks], dtype=float)
    avgdl = float(dl.sum()) / len(dl)
    n = float(len(toks))
    for qid, qterms in _SEARCH_QUERIES.items():
        dfreq = {t: sum(1 for d in toks if t in d) for t in qterms}
        rows = []
        for i, d in enumerate(toks):
            tfs = {t: d.count(t) for t in qterms}
            if all(v > 0 for v in tfs.values()):
                s = 0.0
                for t in qterms:
                    idf = np.log((n - dfreq[t] + 0.5)
                                 / (dfreq[t] + 0.5) + 1.0)
                    s += idf * (tfs[t] * (k1 + 1.0)) / (
                        tfs[t] + k1 * (1.0 - b + b * dl[i] / avgdl))
                rows.append((i, s))
        rows.sort(key=lambda r: (-r[1], r[0]))
        expect = rows[:10]
        sub = got[got["query_id"] == qid].reset_index(drop=True)
        assert list(sub["doc_id"]) == [r[0] for r in expect]
        for (_, s), gs in zip(expect, sub["score"]):
            assert abs(s - gs) < 1e-5


def test_mixture_weights_properties(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.text import mixture_weights

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "source": ["big", "small", "tiny"],
        "text": ["w " * 1600, "w " * 100, "w " * 25],  # tokens 1600/100/25
        "n_chars": np.int64(1),
    })
    sf = _write(tmp_path, "documents", df)
    got = mixture_weights(sf, alpha=0.5).set_index("source")
    # sqrt weights: 40/10/5 -> 8/11, 2/11, 1/11
    assert abs(got.loc["big", "mix_weight"] - 8 / 11) < 1e-6
    assert abs(got.loc["tiny", "mix_weight"] - 1 / 11) < 1e-6
    # temperature flattens: small sources upsampled, big downsampled
    tot = 1725.0
    assert got.loc["tiny", "sample_rate"] > 1.0
    assert got.loc["big", "sample_rate"] < 1.0
    assert abs(got.loc["small", "sample_rate"]
               - (2 / 11) * tot / 100) < 1e-6
    # alpha=1 reduces to proportional (rate 1 everywhere)
    got1 = mixture_weights(sf, alpha=1.0).set_index("source")
    assert np.allclose(got1["sample_rate"], 1.0)


def test_dup_source_matrix_planted(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.dedup import dup_pair_source_matrix

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen")
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "source": ["A", "A", "B", "B", "B"],
        "text": [base, base + " end",          # A-A near-dup
                 base + " tail", other,        # A-B near-dups via base
                 "unrelated totally different words entirely here now"],
        "n_chars": np.int64(1),
    })
    sf = _write(tmp_path, "documents", df)
    got = dup_pair_source_matrix(sf).set_index(["src_lo", "src_hi"])
    assert got.loc[("A", "A"), "n_pairs"] == 1     # docs 0-1
    assert got.loc[("A", "B"), "n_pairs"] == 2     # 0-2 and 1-2
    assert ("B", "B") not in got.index


def test_scd2_intervals_planted(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.streaming import scd2_intervals

    ts = pd.to_datetime([
        "2024-01-01", "2024-01-02", "2024-01-03",   # u1: A A B
        "2024-01-05",                                # u1: A again
        "2024-01-01", "2024-01-01",                  # u2: same-ts tie
    ])
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
        "event_type": ["A", "A", "B", "A", "X", "Y"],
        "value": 0.0,
        "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = (scd2_intervals(str(tmp_path)).to_pandas()
           .sort_values(["user_id", "valid_from"])
           .reset_index(drop=True))
    u1 = got[got["user_id"] == 1].reset_index(drop=True)
    assert list(u1["event_type"]) == ["A", "B", "A"]
    assert u1.loc[0, "valid_to"] == ts[2]      # A run ends when B starts
    assert u1.loc[1, "valid_to"] == ts[3]
    assert pd.isna(u1.loc[2, "valid_to"])      # current
    u2 = got[got["user_id"] == 2].reset_index(drop=True)
    # same-ts tie breaks by event_id: X then Y
    assert list(u2["event_type"]) == ["X", "Y"]
    assert u2.loc[0, "valid_to"] == ts[5]
    assert pd.isna(u2.loc[1, "valid_to"])


def test_time_decay_attribution_brute(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.relational import time_decay_attribution

    rng = np.random.default_rng(31)
    n = 600
    base = pd.Timestamp("2024-01-01").value // 1000
    ts_us = np.sort(base + rng.integers(0, 30 * 86400_000_000, n))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "purchase", "other"],
                                 n, p=[0.4, 0.3, 0.2, 0.1]),
        "value": 0.0,
        "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = (time_decay_attribution(str(tmp_path)).set_index("touch_type")
           ["credit"])

    # brute force over explicit pairs
    lam = 0.1
    credit = {"view": 0.0, "click": 0.0}
    for uid, sub in df.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        t_us2 = sub["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        types = sub["event_type"].to_numpy()
        for i in np.flatnonzero(types == "purchase"):
            w = {"view": 0.0, "click": 0.0}
            for j in range(len(sub)):
                if t_us2[j] < t_us2[i] and types[j] in w:
                    age = (t_us2[i] - t_us2[j]) / 86400e6
                    w[types[j]] += np.exp(-lam * age)
            tot = w["view"] + w["click"]
            if tot > 0:
                credit["view"] += w["view"] / tot
                credit["click"] += w["click"] / tot
    assert abs(got["view"] - credit["view"]) < 1e-4
    assert abs(got["click"] - credit["click"]) < 1e-4


def test_attribution_same_ts_purchases_match_oracle(ray_session, tmp_path):
    """Two purchases at the SAME (user, ts) are two credit units on both
    sides (the oracle keys purchases on event_id, not (user, ts))."""
    import duckdb

    import __ray_entry__ as entrymod
    from ocr_agent_ray.pipelines.relational import (linear_attribution,
                                                    time_decay_attribution)

    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-02 00:00",       # u1 view, click
        "2024-01-03 00:00", "2024-01-03 00:00",       # u1 purchase x2 same ts
        "2024-01-01 12:00", "2024-01-04 00:00",       # u2 view, purchase
    ])
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
        "event_type": ["view", "click", "purchase", "purchase",
                       "view", "purchase"],
        "value": 0.0,
        "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    for name, fn in [("q_linear_attribution", linear_attribution),
                     ("q_time_decay_attribution",
                      time_decay_attribution)]:
        got = fn(str(tmp_path)).sort_values("touch_type").reset_index(
            drop=True)
        want = (con.execute(entrymod.oracle_sql()[name]).df()
                .sort_values("touch_type").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
        # 3 purchases with touches -> 3.0 total credit
        assert abs(got["credit"].sum() - 3.0) < 1e-9


def test_minhash_store_short_docs_bypass(ray_session, tmp_path):
    """Docs with no shingles (< shingle_k chars) are always admitted —
    they never near-dup-match each other — but re-admission of the same
    doc_id is still rejected via the stored sentinel."""
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import MinHashStore

    store = MinHashStore(str(tmp_path / "s"), num_buckets=4)
    wave = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["a", "zzzz", ""]})
    got = set(store.admit(rd.from_pandas(wave)).to_pandas()["doc_id"])
    assert got == {1, 2, 3}
    again = store.admit(rd.from_pandas(wave)).to_pandas()
    assert len(again) == 0


def test_dhash64_known_bits():
    from ocr_agent_ray.functions.hashing import dhash64_batch

    # gradient rows: every adjacent-column comparison is True -> all ones
    inc = np.tile(np.arange(9, dtype=np.uint8), (8, 1))
    dec = inc[:, ::-1].copy()
    h = dhash64_batch(np.stack([inc, dec]))
    assert h[0] == np.uint64(0xFFFFFFFFFFFFFFFF)
    assert h[1] == np.uint64(0)
    # one flipped cell flips few bits (locality)
    near = inc.copy()
    near[3, 4] = 0
    h2 = dhash64_batch(np.stack([inc, near]))
    assert 0 < bin(int(h2[0] ^ h2[1])).count("1") <= 2


def test_media_phash_pairs_controlled_codec(ray_session):
    """Near-identical grids pair at small Hamming; distinct grids don't.
    The codec is injected — the real decode stays stubbed, the Ray-side
    plumbing (actor pool, banding, verification) is what's under test."""
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import media_phash_pairs

    class GridCodec:
        """payload byte 0 selects a base grid; byte 1 perturbs one cell."""

        def luma_grid(self, payload, gw=9, gh=8):
            rng = np.random.default_rng(payload[0])
            g = rng.integers(0, 255, (gh, gw)).astype(np.uint8)
            if payload[1]:
                g[0, 0] = 255 - g[0, 0]
            return g

    units = pd.DataFrame({
        "unit_id": np.arange(5, dtype=np.int64),
        "media_bytes": [bytes([1, 0]), bytes([1, 1]),   # near-dup pair
                        bytes([2, 0]), bytes([3, 0]),   # distinct
                        None],   # null payload: must not corrupt the
                                 # batch's hashes (int64+null -> float64)
    })
    got = (media_phash_pairs(rd.from_pandas(units),
                             codec_factory=GridCodec, max_hamming=3)
           .to_pandas())
    assert len(got) == 1
    assert (int(got["doc_id_a"].iloc[0]), int(got["doc_id_b"].iloc[0])) \
        == (0, 1)
    assert int(got["hamming"].iloc[0]) <= 2


def test_image_phash_dup_pairs_planted(ray_session):
    from ocr_agent_ray.pipelines.dedup import image_phash_dup_pairs

    got = image_phash_dup_pairs("/root/testdata/sf0.001").to_pandas()
    got = got.sort_values("unit_a").reset_index(drop=True)
    # docs 0..499: planted pairs are (10k, 10k+1) for 10k+1 < 500
    expect = [(k * 10, k * 10 + 1) for k in range(50)]
    assert list(zip(got["unit_a"], got["unit_b"])) == expect
    assert (got["hamming"] == 0).all()


def test_snapshot_diff_planted(ray_session):
    import ray.data as rd

    from ocr_agent_ray.sources.maintenance import snapshot_diff

    base = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                         "text": ["a", "b", "c", "d"]})
    new = pd.DataFrame({"doc_id": np.array([0, 1, 3, 9], dtype=np.int64),
                        "text": ["a", "B!", "d", "new"]})
    got = (snapshot_diff(rd.from_pandas(base), rd.from_pandas(new),
                         key="doc_id").to_pandas()
           .set_index("doc_id")["change_type"])
    assert got[0] == "unchanged"
    assert got[1] == "changed"
    assert got[2] == "removed"
    assert got[3] == "unchanged"
    assert got[9] == "added"


def test_chi_square_independent_is_zero(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.relational import chi_square_type_band

    # perfectly independent 2x2: chi2 == 0; bands split at 25/75
    rows = []
    eid = 0
    for t, tn in [("A", 10), ("B", 20)]:
        for v, vn in [(10.0, 3), (50.0, 7)]:
            for _ in range(tn * vn // 10):
                rows.append((eid, pd.Timestamp("2024-01-01"), 1, t, v,
                             "{}"))
                eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = chi_square_type_band(str(tmp_path))
    assert got["chi2"].iloc[0] == 0.0
    assert got["dof"].iloc[0] == 1
    assert got["n"].iloc[0] == len(df)


def test_survival_curve_textbook(ray_session, tmp_path):
    """Hand-computed Kaplan-Meier: 5 users, lifetimes 1,1,2(censored),
    3,4 days -> S(1)=3/5, S(3)=3/5*1/2, S(4)=0."""
    from ocr_agent_ray.pipelines.streaming import user_survival_curve

    base = pd.Timestamp("2024-01-01")
    rows = []
    # user lifetimes via (first, last) event pairs; corpus max is day 10
    # so nobody is within the 3-day censor window except user 2, whose
    # last event is day 8 (within 3 days of day 10 -> censored)
    spans = {1: (0, 1), 2: (0, 1), 3: (6, 8), 4: (0, 3), 5: (0, 4),
             9: (10, 10)}   # user 9 anchors corpus max at day 10
    eid = 0
    for u, (a, b) in spans.items():
        for day in (a, b):
            rows.append((eid, base + pd.Timedelta(days=day), u,
                         "view", 0.0, "{}"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = (user_survival_curve(str(tmp_path)).set_index("t_day"))
    # lifetimes: u1=1, u2=1, u3=2(censored), u4=3, u5=4, u9=0(censored)
    assert got.loc[0, "deaths"] == 0 and got.loc[0, "n_risk"] == 6
    assert got.loc[1, "deaths"] == 2 and got.loc[1, "n_risk"] == 5
    assert abs(got.loc[1, "survival"] - 3 / 5) < 1e-9
    assert got.loc[2, "deaths"] == 0          # censored, not a death
    assert got.loc[3, "deaths"] == 1 and got.loc[3, "n_risk"] == 2
    assert abs(got.loc[3, "survival"] - (3 / 5) * (1 / 2)) < 1e-9
    assert got.loc[4, "survival"] == 0.0


def test_top_event_paths_planted(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.streaming import top_event_paths

    base = pd.Timestamp("2024-01-01")
    seqs = {1: ["a", "b", "c", "d"], 2: ["a", "b", "c"],
            3: ["x", "a", "b", "c"]}
    rows = []
    eid = 0
    for u, seq in seqs.items():
        for j, e in enumerate(seq):
            rows.append((eid, base + pd.Timedelta(minutes=j), u, e,
                         0.0, "{}"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = top_event_paths(str(tmp_path))
    assert (got.iloc[0][["e1", "e2", "e3"]].tolist(), got.iloc[0]["n"]) \
        == (["a", "b", "c"], 3)
    # no cross-user triples: total = 2 + 1 + 2 + 1(bcd)... count check
    assert got["n"].sum() == 5


def test_cohort_matrix_planted(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.relational import cohort_retention_matrix

    mon = pd.Timestamp("2024-01-01")   # a Monday
    rows = []
    eid = 0
    # cohort wk0: users 1,2; user 1 returns wk1 and wk3; user 2 never.
    # cohort wk1: user 3, returns wk2.
    for u, weeks in {1: [0, 1, 3], 2: [0], 3: [1, 2]}.items():
        for w in weeks:
            rows.append((eid, mon + pd.Timedelta(weeks=w, days=2), u,
                         "view", 0.0, "{}"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = cohort_retention_matrix(str(tmp_path)).set_index(
        ["cohort_week", "week_offset"])["n_users"]
    wk0, wk1 = mon, mon + pd.Timedelta(weeks=1)
    assert got[(wk0, 0)] == 2
    assert got[(wk0, 1)] == 1
    assert got[(wk0, 3)] == 1
    assert (wk0, 2) not in got.index
    assert got[(wk1, 0)] == 1 and got[(wk1, 1)] == 1


def test_benford_digits_sane(ray_session):
    from ocr_agent_ray.pipelines.relational import benford_first_digit

    got = benford_first_digit("/root/testdata/sf0.001")
    assert set(got["digit"]).issubset(set(range(1, 10)))
    assert abs(got["observed_p"].sum() - 1.0) < 1e-5
    # expected follows Benford exactly
    import numpy as _np

    for _, r in got.iterrows():
        assert abs(r["expected_p"]
                   - round(_np.log10(1 + 1 / r["digit"]), 6)) < 1e-9


def test_weighted_median_planted(ray_session, tmp_path):
    from ocr_agent_ray.pipelines.relational import weighted_median_price

    # flag A: prices 10(w1), 20(w1), 30(w8) -> half of 10 is 5 ->
    # cum at 30 first reaches 5 -> weighted median 30 (plain median 20)
    li = pd.DataFrame({
        "l_returnflag": ["A"] * 3 + ["B"] * 2,
        "l_extendedprice": [10.0, 20.0, 30.0, 5.0, 7.0],
        "l_quantity": [1.0, 1.0, 8.0, 3.0, 1.0],
    })
    for c in ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]:
        li[c] = np.arange(len(li), dtype=np.int64)
    for c in ["l_discount", "l_tax"]:
        li[c] = 0.0
    li["l_linestatus"] = "O"
    li["l_shipdate"] = pd.Timestamp("2024-01-01")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   str(tmp_path / "lineitem.parquet"))
    got = weighted_median_price(str(tmp_path)).set_index("l_returnflag")
    assert got.loc["A", "weighted_median"] == 30.0
    # B: w 3@5, 1@7 -> half=2 -> cum at 5 is 3 >= 2 -> median 5
    assert got.loc["B", "weighted_median"] == 5.0


def test_ql_search_matches_brute_force(ray_session, tmp_path):
    """Pipeline Dirichlet query likelihood == a dense pandas reference
    on a planted corpus, and longer docs with equal tf score lower
    (the length normalization BM25's b-term approximates)."""
    from ocr_agent_ray.pipelines.text import _SEARCH_QUERIES, ql_search

    rng = np.random.default_rng(29)
    vocab = ["join", "hash", "vector", "stream", "window", "filter",
             "merge", "alpha", "beta", "gamma", "delta"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(5, 60))))
             for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    mu = 2000.0
    got = ql_search(str(tmp_path), k=10, mu=mu).to_pandas()

    toks = [t.split() for t in texts]
    dl = np.array([len(t) for t in toks], dtype=float)
    ctot = float(dl.sum())
    for qid, qterms in _SEARCH_QUERIES.items():
        cf = {t: sum(d.count(t) for d in toks) for t in qterms}
        rows = []
        for i, d in enumerate(toks):
            tfs = {t: d.count(t) for t in qterms}
            if all(v > 0 for v in tfs.values()):
                s = sum(np.log((tfs[t] + mu * (cf[t] / ctot))
                               / (dl[i] + mu)) for t in qterms)
                rows.append((i, s))
        rows.sort(key=lambda r: (-r[1], r[0]))
        expect = rows[:10]
        sub = got[got["query_id"] == qid].reset_index(drop=True)
        assert list(sub["doc_id"]) == [r[0] for r in expect]
        for (_, s), gs in zip(expect, sub["score"]):
            assert abs(s - gs) < 1e-5
    # length normalization: same tf, longer doc -> strictly lower score
    df2 = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["join hash short", "join hash " + "pad " * 200]})
    pq.write_table(pa.Table.from_pandas(df2, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got2 = ql_search(str(tmp_path), k=10, mu=mu).to_pandas()
    sub = got2[got2["query_id"] == 0].set_index("doc_id")
    assert sub.loc[0, "score"] > sub.loc[1, "score"]
