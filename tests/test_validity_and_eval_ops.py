"""Cluster-validity (Calinski-Harabasz, Davies-Bouldin), variance-
homogeneity (Brown-Forsythe), daily-series outlier/drift (Grubbs,
Page-Hinkley), vocabulary richness (Yule's K) and retrieval evaluation
(NDCG) — planted hand-computed cases plus dense references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))


def _write_embeddings(tmp_path, vecs, labels):
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))


def test_levene_brown_forsythe_planted(ray_session, tmp_path):
    """a=[1..4] (z sums 4, 5 -> ssw 1), b=[10,20,30,40] (ssw 100);
    grand z-mean 5.5 -> ssb 162, W = 162/(101/6) = 9.623762."""
    from ocr_agent_ray.pipelines.relational import levene_test_value_by_type

    _write_events(tmp_path, pd.DataFrame({
        "event_type": ["a"] * 4 + ["b"] * 4,
        "value": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0]}))
    got = levene_test_value_by_type(str(tmp_path))
    assert got["n_groups"].tolist() == [2]
    assert got["n_total"].tolist() == [8]
    assert got["ssb_z"].tolist() == [162.0]
    assert got["ssw_z"].tolist() == [101.0]
    assert got["w_stat"].tolist() == [round(162.0 / (101.0 / 6.0), 6)]


def test_levene_equal_spread_is_zero(ray_session, tmp_path):
    """Identical spreads around different centers -> z distributions
    identical -> SSB 0 -> W = 0 (location shift alone never fires)."""
    from ocr_agent_ray.pipelines.relational import levene_test_value_by_type

    _write_events(tmp_path, pd.DataFrame({
        "event_type": ["a"] * 3 + ["b"] * 3,
        "value": [1.0, 2.0, 3.0, 101.0, 102.0, 103.0]}))
    got = levene_test_value_by_type(str(tmp_path))
    assert got["w_stat"].tolist() == [0.0]


def test_grubbs_planted_spike_day(ray_session, tmp_path):
    """Daily counts [10, 10, 40]: mean 20, sd sqrt(300); the spike day
    wins with G = 20/sqrt(300) = 1.154701."""
    from ocr_agent_ray.pipelines.streaming import grubbs_daily_outlier

    days = (["2024-01-01"] * 10 + ["2024-01-02"] * 10
            + ["2024-01-03"] * 40)
    _write_events(tmp_path, pd.DataFrame({
        "event_id": range(60),
        "ts": pd.to_datetime(days),
        "user_id": np.zeros(60, np.int64),
        "event_type": ["view"] * 60,
        "value": np.zeros(60)}))
    got = grubbs_daily_outlier(str(tmp_path))
    assert got["n_days"].tolist() == [3]
    assert got["outlier_day"].astype(str).tolist() == ["2024-01-03"]
    assert got["cnt"].tolist() == [40]
    assert got["g_stat"].tolist() == [round(20.0 / np.sqrt(300.0), 6)]
    assert got["mean_daily"].tolist() == [20.0]


def test_page_hinkley_planted_shift(ray_session, tmp_path):
    """Series [10,10,10,30]: PH stays 0 through the flat prefix (each
    term x_t - mean_t = 0), then jumps by 30-15=15; excursion = 15."""
    from ocr_agent_ray.pipelines.streaming import page_hinkley_daily

    days = (["2024-01-01"] * 10 + ["2024-01-02"] * 10
            + ["2024-01-03"] * 10 + ["2024-01-04"] * 30)
    _write_events(tmp_path, pd.DataFrame({
        "event_id": range(60),
        "ts": pd.to_datetime(days),
        "user_id": np.zeros(60, np.int64),
        "event_type": ["view"] * 60,
        "value": np.zeros(60)}))
    got = page_hinkley_daily(str(tmp_path))
    assert got["cnt"].tolist() == [10, 10, 10, 30]
    assert got["ph"].tolist() == [0.0, 0.0, 0.0, 15.0]
    assert got["excursion"].tolist() == [0.0, 0.0, 0.0, 15.0]


def test_calinski_harabasz_planted(ray_session, tmp_path):
    """Two tight 1-D pairs at 0/2 and 10/12: WSS = 4, BSS = 100,
    CH = (100/1)/(4/2) = 50."""
    from ocr_agent_ray.pipelines.similarity import calinski_harabasz

    _write_embeddings(tmp_path,
                      [[0.0, 0.0], [2.0, 0.0], [10.0, 0.0], [12.0, 0.0]],
                      [0, 0, 1, 1])
    got = calinski_harabasz(str(tmp_path))
    assert got["n"].tolist() == [4]
    assert got["n_labels"].tolist() == [2]
    assert got["wss"].tolist() == [4.0]
    assert got["bss"].tolist() == [100.0]
    assert got["ch_index"].tolist() == [50.0]


def test_davies_bouldin_planted(ray_session, tmp_path):
    """Same clusters: spreads 1 and 1, centroid gap 10 ->
    r_max = 0.2 for both labels."""
    from ocr_agent_ray.pipelines.similarity import davies_bouldin

    _write_embeddings(tmp_path,
                      [[0.0, 0.0], [2.0, 0.0], [10.0, 0.0], [12.0, 0.0]],
                      [0, 0, 1, 1])
    got = davies_bouldin(str(tmp_path))
    assert got["label"].tolist() == [0, 1]
    assert got["n"].tolist() == [2, 2]
    assert got["spread"].tolist() == [1.0, 1.0]
    assert got["r_max"].tolist() == [0.2, 0.2]


def test_davies_bouldin_matches_sklearn_shape(ray_session, tmp_path):
    """mean(r_max) on a random-but-fixed frame equals the
    Davies-Bouldin index computed densely in numpy."""
    from ocr_agent_ray.pipelines.similarity import davies_bouldin

    rng = np.random.RandomState(7)
    vecs = np.vstack([rng.randn(20, 4) + c for c in (0.0, 5.0, 9.0)])
    vecs = vecs.astype(np.float32)
    labels = np.repeat([0, 1, 2], 20)
    _write_embeddings(tmp_path, vecs.tolist(), labels.tolist())
    got = davies_bouldin(str(tmp_path))

    v64 = vecs.astype(np.float64)
    cents = np.stack([v64[labels == l].mean(axis=0) for l in range(3)])
    spreads = np.array([
        np.linalg.norm(v64[labels == l] - cents[l], axis=1).mean()
        for l in range(3)])
    want = []
    for i in range(3):
        want.append(max(
            (spreads[i] + spreads[j]) / np.linalg.norm(cents[i] - cents[j])
            for j in range(3) if j != i))
    np.testing.assert_allclose(got["r_max"], want, atol=5e-6)
    np.testing.assert_allclose(got["spread"], spreads, atol=5e-6)


def test_yule_k_planted(ray_session, tmp_path):
    """'a a a b b c': N=6, sum c^2 = 14 -> K = 1e4*8/36 = 2222.222222;
    an all-distinct doc has K = 0."""
    from ocr_agent_ray.pipelines.text import yule_k_by_source

    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a a a b b c", "x y z"],
        "lang": ["en", "en"],
        "source": ["rep", "rich"],
        "n_chars": [11, 5]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = yule_k_by_source(str(tmp_path)).set_index("source")
    assert got.loc["rep", "n_tokens"] == 6
    assert got.loc["rep", "n_types"] == 3
    assert got.loc["rep", "yule_k"] == round(10000.0 * 8.0 / 36.0, 6)
    assert got.loc["rich", "yule_k"] == 0.0


def test_ndcg_perfect_when_relevance_ties(ray_session, tmp_path):
    """All candidates share one relevance grade -> any order is ideal
    -> NDCG = 1 exactly."""
    from ocr_agent_ray.pipelines.text import ndcg_search

    docs = pd.DataFrame({
        "doc_id": range(5),
        "text": ["join hash pad%d" % i for i in range(5)],
        "lang": ["en"] * 5,
        "source": ["s"] * 5,
        "n_chars": [12] * 5})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = ndcg_search(str(tmp_path)).to_pandas().set_index("query_id")
    assert got.loc[0, "ndcg"] == 1.0


def test_ndcg_matches_dense_reference(ray_session, tmp_path):
    """Dense pandas replay of the BM25 + linear-gain NDCG definition on
    a frame where length normalization makes the BM25 order diverge
    from the relevance order (so NDCG < 1 is actually exercised)."""
    from ocr_agent_ray.pipelines.text import ndcg_search

    rng = np.random.RandomState(3)
    texts = []
    for i in range(40):
        n_join = rng.randint(1, 6)
        n_hash = rng.randint(1, 6)
        pad = rng.randint(0, 60)
        texts.append(" ".join(["join"] * n_join + ["hash"] * n_hash
                              + ["pad"] * pad))
    docs = pd.DataFrame({
        "doc_id": range(40), "text": texts, "lang": ["en"] * 40,
        "source": ["s"] * 40,
        "n_chars": [len(t) for t in texts]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = ndcg_search(str(tmp_path)).to_pandas().set_index("query_id")

    # dense reference for query 0 = ("join", "hash")
    toks = [t.split() for t in texts]
    dl = np.array([len(t) for t in toks], np.float64)
    tf_j = np.array([t.count("join") for t in toks], np.float64)
    tf_h = np.array([t.count("hash") for t in toks], np.float64)
    n = 40.0
    avgdl = dl.mean()
    k1, b = 1.2, 0.75
    score = np.zeros(40)
    for tfv, df in ((tf_j, (tf_j > 0).sum()), (tf_h, (tf_h > 0).sum())):
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        score += idf * (tfv * (k1 + 1.0)) / (
            tfv + k1 * (1.0 - b + b * dl / avgdl))
    rel = (tf_j + tf_h).astype(np.int64)
    cand = pd.DataFrame({"doc_id": range(40), "score": score, "rel": rel})
    ranked = cand.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(20)
    ideal = cand.sort_values(["rel", "doc_id"],
                             ascending=[False, True]).head(20)
    disc = np.log2(np.arange(2, 22, dtype=np.float64))
    dcg = float((ranked["rel"].to_numpy() / disc).sum())
    idcg = float((ideal["rel"].to_numpy() / disc).sum())
    assert got.loc[0, "dcg"] == round(dcg, 6)
    assert got.loc[0, "idcg"] == round(idcg, 6)
    assert got.loc[0, "ndcg"] == round(dcg / idcg, 6)
    assert got.loc[0, "ndcg"] < 1.0


def test_tukey_hsd_planted(ray_session, tmp_path):
    """Three groups [1,2,3],[4,5,6],[7,8,9]: MSW = 1, every pair's
    se2 = 1/3; adjacent pairs q = 3*sqrt(3), outer pair q = 6*sqrt(3)."""
    from ocr_agent_ray.pipelines.relational import tukey_hsd_value_by_type

    _write_events(tmp_path, pd.DataFrame({
        "event_type": ["a"] * 3 + ["b"] * 3 + ["c"] * 3,
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]}))
    got = tukey_hsd_value_by_type(str(tmp_path))
    assert got[["type_a", "type_b"]].values.tolist() == [
        ["a", "b"], ["a", "c"], ["b", "c"]]
    assert got["mean_diff"].tolist() == [-3.0, -6.0, -3.0]
    q1 = round(3.0 / np.sqrt(1.0 / 3.0), 6)
    q2 = round(6.0 / np.sqrt(1.0 / 3.0), 6)
    assert got["q_stat"].tolist() == [q1, q2, q1]


def test_mcnemar_planted_discordant(ray_session, tmp_path):
    """Users: two first-half-only converters, one second-half-only,
    one concordant, one never: b=2, c=1 -> stat 1/3, corrected 0."""
    from ocr_agent_ray.pipelines.streaming import mcnemar_conversion

    rows = []
    # stream spans day 0 .. day 10; midpoint = day 5
    def ev(uid, day, etype):
        rows.append((len(rows), pd.Timestamp("2024-01-01")
                     + pd.Timedelta(days=day), uid, etype, 0.0))
    ev(1, 0, "view"); ev(1, 1, "purchase")            # b (first only)
    ev(2, 1, "purchase")                              # b (first only)
    ev(3, 8, "purchase")                              # c (second only)
    ev(4, 1, "purchase"); ev(4, 8, "purchase")        # concordant 1/1
    ev(5, 2, "view"); ev(5, 10, "view")               # never converts
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = mcnemar_conversion(str(tmp_path))
    assert got["n_users"].tolist() == [5]
    assert got["b_first_only"].tolist() == [2]
    assert got["c_second_only"].tolist() == [1]
    assert got["mcnemar_stat"].tolist() == [round(1.0 / 3.0, 6)]
    assert got["mcnemar_cc"].tolist() == [0.0]


def test_hurst_matches_dense_reference(ray_session, tmp_path):
    """Replay the R/S definition densely in numpy on a fixed 45-day
    series and pin all columns; a pure trend scores higher than a
    noisy series (persistence ordering)."""
    from ocr_agent_ray.pipelines.streaming import hurst_exponent_daily

    rng = np.random.RandomState(11)
    counts = rng.randint(1, 30, size=45)
    rows = []
    for d, c in enumerate(counts):
        for i in range(int(c)):
            rows.append((len(rows), pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=d), 0, "view", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = hurst_exponent_daily(str(tmp_path))
    assert got["n_days"].tolist() == [45]

    rs_means = []
    for m in (5, 10, 15):
        vals = []
        for s in range(45 // m):
            seg = counts[s * m:(s + 1) * m].astype(np.float64)
            mean = seg.sum() / m
            var = (seg * seg).sum() / m - mean * mean
            if var <= 0:
                continue
            dev = np.cumsum(seg) - np.arange(1, m + 1) * mean
            vals.append((dev.max() - dev.min()) / np.sqrt(var))
        rs_means.append(np.mean(vals))
    lx, ly = np.log([5.0, 10.0, 15.0]), np.log(rs_means)
    slope = ((3 * (lx * ly).sum() - lx.sum() * ly.sum())
             / (3 * (lx * lx).sum() - lx.sum() ** 2))
    np.testing.assert_allclose(
        got[["rs_5", "rs_10", "rs_15"]].iloc[0], rs_means, atol=5e-6)
    assert abs(got["hurst"].iloc[0] - slope) < 5e-6

    # pure trend: counts 1..45 -> strongly persistent, H near 1
    rows = []
    for d in range(45):
        for i in range(d + 1):
            rows.append((len(rows), pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=d), 0, "view", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    trend = hurst_exponent_daily(str(tmp_path))
    assert trend["hurst"].iloc[0] > got["hurst"].iloc[0]
    assert trend["hurst"].iloc[0] > 0.9


def test_avg_precision_all_relevant_is_one(ray_session, tmp_path):
    """Every candidate passes the relevance bar -> every P@i is 1 ->
    AP = 1 exactly."""
    from ocr_agent_ray.pipelines.text import avg_precision_search

    docs = pd.DataFrame({
        "doc_id": range(4),
        "text": ["join join hash hash x%d" % i for i in range(4)],
        "lang": ["en"] * 4, "source": ["s"] * 4, "n_chars": [20] * 4})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = avg_precision_search(str(tmp_path)).to_pandas() \
        .set_index("query_id")
    assert got.loc[0, "n_relevant"] == 4
    assert got.loc[0, "ap"] == 1.0


def test_avg_precision_matches_dense_reference(ray_session, tmp_path):
    """Dense replay of BM25 + AP@20 on a mixed-relevance frame; the
    relevant docs below the score cutoff still dilute the denominator."""
    from ocr_agent_ray.pipelines.text import avg_precision_search

    rng = np.random.RandomState(5)
    texts = []
    for i in range(60):
        n_join = rng.randint(1, 4)
        n_hash = rng.randint(1, 4)
        pad = rng.randint(0, 50)
        texts.append(" ".join(["join"] * n_join + ["hash"] * n_hash
                              + ["pad"] * pad))
    docs = pd.DataFrame({
        "doc_id": range(60), "text": texts, "lang": ["en"] * 60,
        "source": ["s"] * 60, "n_chars": [len(t) for t in texts]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = avg_precision_search(str(tmp_path)).to_pandas() \
        .set_index("query_id")

    toks = [t.split() for t in texts]
    dl = np.array([len(t) for t in toks], np.float64)
    tf_j = np.array([t.count("join") for t in toks], np.float64)
    tf_h = np.array([t.count("hash") for t in toks], np.float64)
    n, avgdl, k1, b = 60.0, dl.mean(), 1.2, 0.75
    score = np.zeros(60)
    for tfv, df in ((tf_j, (tf_j > 0).sum()), (tf_h, (tf_h > 0).sum())):
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        score += idf * (tfv * (k1 + 1.0)) / (
            tfv + k1 * (1.0 - b + b * dl / avgdl))
    rel = ((tf_j + tf_h) >= 3).astype(np.int64)
    order = pd.DataFrame({"doc_id": range(60), "score": score,
                          "rel": rel}).sort_values(
        ["score", "doc_id"], ascending=[False, True])
    flags = order["rel"].to_numpy()[:20]
    prec = np.cumsum(flags) / np.arange(1, 21)
    ap = prec[flags == 1].sum() / min(int(rel.sum()), 20)
    assert got.loc[0, "n_relevant"] == int(rel.sum())
    assert got.loc[0, "ap"] == round(float(ap), 6)


def test_adamic_adar_path_graph(ray_session):
    """Path 1-2-3-4: the two distance-2 pairs (1,3) and (2,4) are
    predicted, each through one degree-2 center -> score 1/ln 2;
    adjacent pairs never appear."""
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import dup_graph_adamic_adar

    pairs = rd.from_pandas(pd.DataFrame({
        "doc_id_a": [1, 2, 3], "doc_id_b": [2, 3, 4]}))
    got = dup_graph_adamic_adar(None, pairs=pairs)
    assert got[["doc_id_a", "doc_id_b"]].values.tolist() == [
        [1, 3], [2, 4]]
    assert got["n_common"].tolist() == [1, 1]
    w = round(1.0 / np.log(2.0), 6)
    assert got["aa_score"].tolist() == [w, w]


def test_adamic_adar_triangle_no_predictions(ray_session):
    """A triangle is transitively closed -> no non-adjacent 2-hop
    pairs -> empty output WITH the pinned schema."""
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import dup_graph_adamic_adar

    pairs = rd.from_pandas(pd.DataFrame({
        "doc_id_a": [1, 1, 2], "doc_id_b": [2, 3, 3]}))
    got = dup_graph_adamic_adar(None, pairs=pairs)
    assert len(got) == 0
    assert list(got.columns) == ["doc_id_a", "doc_id_b", "n_common",
                                 "aa_score"]


def _write_docs(tmp_path, texts, sources):
    docs = pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": ["en"] * len(texts), "source": sources,
        "n_chars": [len(t) for t in texts]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))


def test_chao1_planted(ray_session, tmp_path):
    """Counts {a:1, b:1, c:2, d:5}: V=4, f1=2, f2=1 ->
    Chao1 = 4 + 2*1/(2*2) = 4.5."""
    from ocr_agent_ray.pipelines.text import chao1_richness

    _write_docs(tmp_path, ["a b c c d d d d d"], ["s"])
    got = chao1_richness(str(tmp_path)).set_index("source")
    assert got.loc["s", "n_tokens"] == 9
    assert got.loc["s", "n_types"] == 4
    assert got.loc["s", "f1"] == 2
    assert got.loc["s", "f2"] == 1
    assert got.loc["s", "chao1"] == 4.5


def test_log_odds_matches_dense_reference(ray_session, tmp_path):
    """'x'-heavy src0 vs 'y'-heavy src1: x scores positive, y negative,
    values equal to the dense Dirichlet log-odds formula."""
    from ocr_agent_ray.pipelines.text import log_odds_terms

    _write_docs(tmp_path, ["x x x y", "y y y x"], ["src0", "src1"])
    got = log_odds_terms(str(tmp_path)).set_index("word")
    a = {"x": 3.0, "y": 1.0}
    b = {"x": 1.0, "y": 3.0}
    na, nb, v, al = 4.0, 4.0, 2.0, 0.01
    for w in ("x", "y"):
        delta = (np.log((a[w] + al) / (na + v * al - a[w] - al))
                 - np.log((b[w] + al) / (nb + v * al - b[w] - al)))
        z = delta / np.sqrt(1.0 / (a[w] + al) + 1.0 / (b[w] + al))
        assert got.loc[w, "z_score"] == round(float(z), 6)
    assert got.loc["x", "z_score"] > 0 > got.loc["y", "z_score"]


def test_granger_planted_lead(ray_session, tmp_path):
    """y_t tracks x_{t-1} (with a small parity wiggle so the fit is
    not exact): the lag coefficient lands near 1 and matches a dense
    lstsq fit; F is large and positive."""
    from ocr_agent_ray.pipelines.streaming import granger_daily

    rng = np.random.RandomState(2)
    x = rng.randint(5, 40, size=24)
    y = np.empty(24, np.int64)
    y[0] = 10
    y[1:] = x[:-1] + (np.arange(23) % 2)
    rows = []
    for d in range(24):
        for _ in range(int(x[d])):
            rows.append((len(rows), pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=d), 0, "view", 0.0))
        for _ in range(int(y[d])):
            rows.append((len(rows), pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=d), 0, "purchase", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = granger_daily(str(tmp_path))
    assert got["n_obs"].tolist() == [23]

    X = np.column_stack([np.ones(23), y[:-1], x[:-1]]).astype(float)
    coef, _, _, _ = np.linalg.lstsq(X, y[1:].astype(float), rcond=None)
    assert abs(got["b_ylag"].iloc[0] - coef[1]) < 5e-6
    assert abs(got["b_xlag"].iloc[0] - coef[2]) < 5e-6
    sse_u = float(((X @ coef - y[1:]) ** 2).sum())
    assert abs(got["sse_u"].iloc[0] - sse_u) < 1e-3
    assert got["f_stat"].iloc[0] > 10.0


def test_gmm_em_matches_dense_reference(ray_session, tmp_path):
    """Dense numpy EM with the same deterministic init reproduces the
    distributed weights/variances/log-likelihood on a planted
    two-cluster frame."""
    from ocr_agent_ray.pipelines.similarity import gmm_em_embeddings

    rng = np.random.RandomState(9)
    vecs = np.vstack([rng.randn(30, 3) * 0.5,
                      rng.randn(30, 3) * 0.5 + 6.0]).astype(np.float32)
    _write_embeddings(tmp_path, vecs.tolist(), [0] * 60)
    k, iters = 2, 4
    got = gmm_em_embeddings(str(tmp_path), k=k, iters=iters)
    assert abs(got["weight"].sum() - 1.0) < 1e-5

    mat = vecs.astype(np.float64)
    mu = mat[:k].copy()
    var = np.ones((k, 3))
    w = np.full(k, 0.5)
    for _ in range(iters):
        const = -0.5 * np.log(2.0 * np.pi * var).sum(axis=1)
        quad = (-0.5 * (((mat[:, None, :] - mu[None, :, :]) ** 2)
                        / var[None, :, :]).sum(axis=2))
        logp = np.log(w)[None, :] + const[None, :] + quad
        mx = logp.max(axis=1, keepdims=True)
        lse = mx[:, 0] + np.log(np.exp(logp - mx).sum(axis=1))
        r = np.exp(logp - lse[:, None])
        rs = r.sum(axis=0)
        mu = (r.T @ mat) / rs[:, None]
        var = np.maximum((r.T @ (mat * mat)) / rs[:, None] - mu * mu,
                         1e-3)
        w = rs / rs.sum()
        ll = lse.sum()
    np.testing.assert_allclose(got["weight"], w, atol=5e-6)
    np.testing.assert_allclose(got["n_soft"], rs, atol=5e-2)
    np.testing.assert_allclose(got["avg_var"], var.mean(axis=1),
                               atol=5e-5)
    assert abs(got["loglik"].iloc[0] - ll) < 5e-3
    # planted separation: one cluster centered near 0, one near 6
    assert got["weight"].tolist() == [0.5, 0.5]


def test_isotonic_pava_pooling(ray_session, tmp_path):
    """Raw rates [0, 1, 0, 1] over increasing values pool the middle
    violator pair to 0.5: iso = [0, 0.5, 0.5, 1]."""
    from ocr_agent_ray.pipelines.relational import (
        isotonic_conversion_curve)

    rows = []
    for v, types in ((1.0, ["view", "view"]),
                     (2.0, ["purchase", "purchase"]),
                     (3.0, ["view", "view"]),
                     (4.0, ["purchase", "purchase"])):
        for t in types:
            rows.append((t, v))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_type", "value"]))
    got = isotonic_conversion_curve(str(tmp_path))
    assert got["value"].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert got["rate_raw"].tolist() == [0.0, 1.0, 0.0, 1.0]
    assert got["rate_iso"].tolist() == [0.0, 0.5, 0.5, 1.0]
    # monotone by construction
    assert (np.diff(got["rate_iso"]) >= 0).all()


def test_isotonic_monotone_on_sf(ray_session):
    from ocr_agent_ray.pipelines.relational import (
        isotonic_conversion_curve)

    got = isotonic_conversion_curve("/root/testdata/sf0.001")
    assert len(got) > 0
    assert (np.diff(got["rate_iso"]) >= -1e-12).all()
    # pooled means preserve the overall conversion mass
    assert abs((got["rate_iso"] * got["n"]).sum()
               - (got["rate_raw"] * got["n"]).sum()) < 1e-3


def test_markov_entropy_rate_deterministic_chain(ray_session, tmp_path):
    """A strict A-B-A-B routine has H(next|cur) = 0; mixing in a
    second successor makes it positive."""
    from ocr_agent_ray.pipelines.streaming import markov_entropy_rate

    rows = []
    for i, et in enumerate(["a", "b", "a", "b", "a"]):
        rows.append((i, pd.Timestamp("2024-01-01")
                     + pd.Timedelta(minutes=i), 1, et, 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = markov_entropy_rate(str(tmp_path))
    assert got["n_transitions"].tolist() == [4]
    assert got["entropy_rate"].tolist() == [0.0]

    rows = []
    for i, et in enumerate(["a", "b", "a", "c", "a", "b", "a", "c"]):
        rows.append((i, pd.Timestamp("2024-01-01")
                     + pd.Timedelta(minutes=i), 1, et, 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = markov_entropy_rate(str(tmp_path))
    assert got["entropy_rate"].iloc[0] > 0.0
    assert got["h_joint"].iloc[0] >= got["h_current"].iloc[0]


def test_absorbing_time_planted_chain(ray_session, tmp_path):
    """A flips a fair coin between staying and purchasing -> expected
    2 steps; U is a trap (reachable 0); T can purchase but can also
    fall into U -> infinite expected time (NULL)."""
    from ocr_agent_ray.pipelines.streaming import absorbing_time_to_event

    rows = []
    def seq(uid, *types):
        for i, t in enumerate(types):
            rows.append((len(rows), pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=i), uid, t, 0.0))
    seq(1, "a", "a", "purchase")
    seq(2, "u", "u", "u")
    seq(3, "t", "u")
    seq(4, "t", "purchase")
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = absorbing_time_to_event(str(tmp_path)).set_index("event_type")
    assert got.loc["a", "reachable"] == 1
    assert got.loc["a", "expected_steps"] == 2.0
    assert got.loc["u", "reachable"] == 0
    assert np.isnan(got.loc["u", "expected_steps"])
    assert got.loc["t", "reachable"] == 1
    assert np.isnan(got.loc["t", "expected_steps"])


def test_burrows_delta_identical_sources_zero(ray_session, tmp_path):
    """Two stylistically identical sources have delta 0 to each other
    and equal positive delta to a divergent third."""
    from ocr_agent_ray.pipelines.text import burrows_delta

    s_text = "the cat sat on the mat and the dog ran"
    t_text = "quantum flux harmonics resonate beyond the veil tonight"
    _write_docs(tmp_path, [s_text, s_text, t_text],
                ["s1", "s2", "s3"])
    got = burrows_delta(str(tmp_path))
    d = {(r.source_a, r.source_b): r.delta
         for r in got.itertuples(index=False)}
    assert d[("s1", "s2")] == 0.0
    assert d[("s1", "s3")] > 0.0
    assert d[("s1", "s3")] == d[("s2", "s3")]


def test_rbo_matches_reference_loop(ray_session, tmp_path):
    """RBO fusion equals a direct reference loop over the two arms'
    output lists; a corpus where both arms agree perfectly on a
    single candidate scores the closed-form prefix sum."""
    from ocr_agent_ray.pipelines.text import (bm25_search, ql_search,
                                              rbo_arms)

    rng = np.random.RandomState(13)
    texts = []
    for i in range(30):
        texts.append(" ".join(
            ["join"] * rng.randint(1, 4) + ["hash"] * rng.randint(1, 4)
            + ["pad"] * rng.randint(0, 40)))
    _write_docs(tmp_path, texts, ["s"] * 30)
    got = rbo_arms(str(tmp_path)).set_index("query_id")

    a = bm25_search(str(tmp_path)).to_pandas()
    b = ql_search(str(tmp_path)).to_pandas()
    la = (a[a["query_id"] == 0]
          .sort_values(["score", "doc_id"], ascending=[False, True])
          ["doc_id"].tolist())
    lb = (b[b["query_id"] == 0]
          .sort_values(["score", "doc_id"], ascending=[False, True])
          ["doc_id"].tolist())
    acc = 0.0
    for dep in range(1, 21):
        acc += 0.9 ** (dep - 1) * len(set(la[:dep]) & set(lb[:dep])) / dep
    assert got.loc[0, "rbo"] == round(0.1 * acc, 6)
    assert 0.0 <= got.loc[0, "rbo"] <= 1.0


def test_bottomk_sample_merge_invariance(ray_session, tmp_path):
    """Bottom-k equals the dense bottom-k of the whole table, is
    k-sized, and the priority formula matches the Knuth hash."""
    from ocr_agent_ray.pipelines.relational import bottomk_sample_documents

    docs = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64) * 7 + 3,
        "text": ["t"] * 500, "lang": ["en"] * 500,
        "source": ["s"] * 500, "n_chars": [1] * 500})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = bottomk_sample_documents(str(tmp_path), k=16)
    d = docs["doc_id"].to_numpy(np.int64)
    pr = (d * np.int64(2654435761)) % np.int64(4294967296)
    want = pd.DataFrame({"doc_id": d, "priority": pr}) \
        .sort_values(["priority", "doc_id"]).head(16)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["priority"].tolist() == want["priority"].tolist()


def test_degree_powerlaw_planted_star(ray_session):
    """A 5-star: hub degree 5, leaves degree 1 ->
    alpha = 1 + 6/ln(10) exactly (leaf terms ln(1/0.5)=ln 2 each,
    hub ln(5/0.5)=ln 10; total 5 ln 2 + ln 10)."""
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import dup_graph_degree_powerlaw

    pairs = rd.from_pandas(pd.DataFrame({
        "doc_id_a": [0, 0, 0, 0, 0], "doc_id_b": [1, 2, 3, 4, 5]}))
    got = dup_graph_degree_powerlaw(None, pairs=pairs)
    assert got["n_nodes"].tolist() == [6]
    assert got["d_max"].tolist() == [5]
    s = 5 * np.log(2.0) + np.log(10.0)
    assert got["alpha"].tolist() == [round(1.0 + 6.0 / s, 6)]


def test_wasserstein_planted_shift(ray_session, tmp_path):
    """Point masses at length 10 vs length 30: W1 = 20 exactly; a
    half-overlapping pair gives the hand value 10."""
    from ocr_agent_ray.pipelines.text import wasserstein_lengths

    def write(lengths_a, lengths_b):
        n = len(lengths_a) + len(lengths_b)
        docs = pd.DataFrame({
            "doc_id": range(n),
            "text": ["x"] * n, "lang": ["en"] * n,
            "source": ["src0"] * len(lengths_a)
            + ["src1"] * len(lengths_b),
            "n_chars": list(lengths_a) + list(lengths_b)})
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       str(tmp_path / "documents.parquet"))

    write([10, 10], [30, 30])
    got = wasserstein_lengths(str(tmp_path))
    assert got["w1_distance"].tolist() == [20.0]

    # src0 = {10, 20}, src1 = {20, 30}: gaps 10 * |dF| (0.5, 0.5) = 10
    write([10, 20], [20, 30])
    got = wasserstein_lengths(str(tmp_path))
    assert got["w1_distance"].tolist() == [10.0]


def test_k_anonymity_planted(ray_session, tmp_path):
    """Six docs in one quasi-identifier group are safe; a lone doc in
    its own (lang, source, band) cell is at risk."""
    from ocr_agent_ray.pipelines.text import k_anonymity_audit

    docs = pd.DataFrame({
        "doc_id": range(7),
        "text": ["x"] * 7,
        "lang": ["en"] * 6 + ["de"],
        "source": ["s"] * 7,
        "n_chars": [150] * 6 + [950]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = k_anonymity_audit(str(tmp_path))
    assert got["n_groups"].tolist() == [2]
    assert got["n_small_groups"].tolist() == [1]
    assert got["n_docs_at_risk"].tolist() == [1]
    assert got["risk_fraction"].tolist() == [round(1.0 / 7.0, 6)]


def test_knn_label_purity_separated_clusters(ray_session, tmp_path):
    """Two well-separated clusters with clean labels -> purity 1 for
    both; flipping one label drags its neighbors' purity down."""
    from ocr_agent_ray.pipelines.similarity import knn_label_purity

    rng = np.random.RandomState(4)
    a = rng.randn(20, 8) * 0.05 + np.array([1.0] + [0.0] * 7)
    b = rng.randn(20, 8) * 0.05 + np.array([0.0] * 7 + [1.0])
    vecs = np.vstack([a, b]).astype(np.float32)
    _write_embeddings(tmp_path, vecs.tolist(), [0] * 20 + [1] * 20)
    got = knn_label_purity(str(tmp_path), k=3).set_index("label")
    assert got.loc[0, "mean_purity"] == 1.0
    assert got.loc[1, "mean_purity"] == 1.0
    assert got["n_vectors"].sum() == 40

    _write_embeddings(tmp_path, vecs.tolist(),
                      [0] * 19 + [1] + [1] * 20)
    got = knn_label_purity(str(tmp_path), k=3).set_index("label")
    assert got.loc[0, "mean_purity"] < 1.0


def test_lof_flags_isolated_point(ray_session, tmp_path):
    """A lone point far from one tight cluster gets the top LOF and
    LOF >> 1; in-cluster points sit near 1. Values match a dense LOF
    replay over the SAME graph edges."""
    from ocr_agent_ray.pipelines.similarity import (knn_graph_ivf,
                                                    lof_outliers)

    rng = np.random.RandomState(6)
    cluster = rng.randn(30, 6) * 0.02 + np.array([1.0, 0, 0, 0, 0, 0])
    lone = np.array([[0.0, 0.0, 0.3, 0.5, 0.6, 0.2]])
    vecs = np.vstack([cluster, lone]).astype(np.float32)
    _write_embeddings(tmp_path, vecs.tolist(), [0] * 31)
    got = lof_outliers(str(tmp_path), k=4)
    assert got["vec_id"].iloc[0] == 30
    assert got["lof"].iloc[0] > 2.0

    g = knn_graph_ivf(str(tmp_path), k=4).to_pandas()
    g["d"] = 1.0 - g["cosine"]
    kd = g.groupby("vec_id")["d"].max()
    reach = np.maximum(kd.loc[g["nbr_id"]].to_numpy(), g["d"].to_numpy())
    lrd = 1.0 / pd.Series(reach).groupby(g["vec_id"].to_numpy()).mean()
    lofv = (lrd.loc[g["nbr_id"]].to_numpy()
            / lrd.loc[g["vec_id"]].to_numpy())
    lof = pd.Series(lofv).groupby(g["vec_id"].to_numpy()).mean()
    want = round(float(lof.loc[30]), 6)
    assert abs(got["lof"].iloc[0] - want) < 5e-6


def test_label_propagation_separated_clusters(ray_session, tmp_path):
    """Two separated clusters with 20% seeds: propagation labels all
    held-out vectors with their cluster's label (coverage 1,
    accuracy 1)."""
    from ocr_agent_ray.pipelines.similarity import label_propagation_knn

    rng = np.random.RandomState(8)
    a = rng.randn(25, 8) * 0.05 + np.array([1.0] + [0.0] * 7)
    b = rng.randn(25, 8) * 0.05 + np.array([0.0] * 7 + [1.0])
    vecs = np.vstack([a, b]).astype(np.float32)
    _write_embeddings(tmp_path, vecs.tolist(), [0] * 25 + [1] * 25)
    got = label_propagation_knn(str(tmp_path), k=4, iters=3) \
        .set_index("label")
    assert got.loc[0, "coverage"] == 1.0
    assert got.loc[1, "coverage"] == 1.0
    assert got.loc[0, "accuracy"] == 1.0
    assert got.loc[1, "accuracy"] == 1.0
    assert int(got["n_heldout"].sum()) == 40


def test_source_modularity_planted(ray_session, tmp_path):
    """Two communities, all edges intra: with equal degree sums
    Q = 1 - 2*(1/2)^2 = 0.5; fully mixed edges score 0 or below."""
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import source_modularity

    docs = pd.DataFrame({
        "doc_id": range(4),
        "text": ["x"] * 4, "lang": ["en"] * 4,
        "source": ["A", "A", "B", "B"], "n_chars": [1] * 4})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    intra = rd.from_pandas(pd.DataFrame({
        "doc_id_a": [0, 2], "doc_id_b": [1, 3]}))
    got = source_modularity(str(tmp_path), pairs=intra)
    assert got["n_edges"].tolist() == [2]
    assert got["modularity"].tolist() == [0.5]

    cross = rd.from_pandas(pd.DataFrame({
        "doc_id_a": [0, 1], "doc_id_b": [2, 3]}))
    got = source_modularity(str(tmp_path), pairs=cross)
    assert got["modularity"].iloc[0] <= 0.0


def test_gram_novelty_planted(ray_session, tmp_path):
    """doc0 introduces all its grams (novelty 1); doc1 repeats doc0
    verbatim (novelty 0); doc2 is half-new."""
    from ocr_agent_ray.pipelines.text import gram_novelty

    base = "alpha beta gamma delta"            # one 4-gram
    half = "alpha beta gamma delta epsilon"    # grams: old + 1 new
    _write_docs(tmp_path, [base, base, half], ["s", "s", "s"])
    got = gram_novelty(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[0, "novelty"] == 1.0
    assert got.loc[1, "novelty"] == 0.0
    assert got.loc[2, "n_grams"] == 2
    assert got.loc[2, "n_novel"] == 1
    assert got.loc[2, "novelty"] == 0.5


def test_langid_confusion_diagonal_mass(ray_session):
    """Counts sum to the classified-doc total and the crosstab keys
    are within the observed language sets."""
    from ocr_agent_ray.pipelines.text import (langid_confusion,
                                              naive_bayes_langid)

    got = langid_confusion("/root/testdata/sf0.001")
    preds = naive_bayes_langid("/root/testdata/sf0.001")
    preds = preds.to_pandas() if hasattr(preds, "to_pandas") else preds
    assert int(got["n"].sum()) == len(preds)
    want = (preds.groupby(["lang", "pred_lang"]).size()
            .reset_index(name="n"))
    m = got.merge(want, on=["lang", "pred_lang"], suffixes=("", "_w"))
    assert (m["n"] == m["n_w"]).all() and len(m) == len(got)


def test_fisher_exact_matches_scipy_style_reference(ray_session,
                                                    tmp_path):
    """Hand hypergeometric: arms of 4 users each, 3 vs 1 converters ->
    upper tail P(X >= 3) = (C(4,3)C(4,1) + C(4,4)C(4,0)) / C(8,4)
    = 17/70; odds ratio (3*3)/(1*1) = 9."""
    from ocr_agent_ray.pipelines.streaming import fisher_exact_conversion

    rows = []
    # arm = user_id % 2: even users arm A, odd users arm B
    for uid in range(8):
        arm_a = uid % 2 == 0
        converts = (uid in (0, 2, 4)) if arm_a else (uid == 1)
        rows.append((len(rows), pd.Timestamp("2024-01-01"), uid,
                     "purchase" if converts else "view", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = fisher_exact_conversion(str(tmp_path))
    assert got["conv_a"].tolist() == [3]
    assert got["conv_b"].tolist() == [1]
    assert got["odds_ratio"].tolist() == [9.0]
    assert got["p_one_sided"].tolist() == [round(17.0 / 70.0, 6)]


def test_bayes_ab_symmetry_and_known_value(ray_session, tmp_path):
    """Symmetric arms -> P(B > A) = 0.5 by symmetry minus the tie
    mass... actually for continuous Beta posteriors P = 0.5 exactly
    when the arms are identical; a dominant B pushes P toward 1.
    Known small case verified against numeric integration."""
    from ocr_agent_ray.pipelines.streaming import bayes_ab_conversion

    rows = []
    def users(n, conv_even, conv_odd):
        for uid in range(n):
            conv = conv_even if uid % 2 == 0 else conv_odd
            c = conv(uid) if callable(conv) else (uid // 2 < conv)
            rows.append((len(rows), pd.Timestamp("2024-01-01"), uid,
                         "purchase" if c else "view", 0.0))
    # identical arms: 2 of 4 convert on each side
    users(8, 2, 2)
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = bayes_ab_conversion(str(tmp_path))
    assert got["p_b_beats_a"].tolist() == [0.5]

    # dominant B: 1/4 vs 4/4
    rows.clear()
    users(8, 1, 4)
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = bayes_ab_conversion(str(tmp_path))
    assert got["conv_a"].tolist() == [1]
    assert got["conv_b"].tolist() == [4]
    # numeric double-check via a dense posterior grid (no scipy):
    # p ~ Beta(2,4) vs Beta(5,1); P(B>A) by 2-D Riemann sum
    import math
    g = np.linspace(1e-6, 1 - 1e-6, 2000)
    def beta_pdf(x, a, b):
        lb = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
        return np.exp((a - 1) * np.log(x) + (b - 1) * np.log(1 - x) - lb)
    fa = beta_pdf(g, 2, 4)
    fb = beta_pdf(g, 5, 1)
    fa /= fa.sum()
    cb = np.cumsum(fb / fb.sum())
    want = float((fa * (1.0 - cb)).sum())
    assert abs(got["p_b_beats_a"].iloc[0] - want) < 2e-3


def test_twonn_dimension_planted_manifold(ray_session, tmp_path):
    """Vectors on a smooth low-dimensional manifold embedded in a
    higher ambient space: the TwoNN estimate lands far below the
    ambient dim and is positive/finite."""
    from ocr_agent_ray.pipelines.similarity import (
        twonn_intrinsic_dimension)

    rng = np.random.RandomState(12)
    # 2-D latent coordinates lifted into 16-D by a fixed linear map
    z = rng.randn(200, 2)
    lift = rng.randn(2, 16)
    vecs = (z @ lift + 5.0).astype(np.float32)
    _write_embeddings(tmp_path, vecs.tolist(), [0] * 200)
    got = twonn_intrinsic_dimension(str(tmp_path))
    assert got["ambient_dim"].tolist() == [16]
    assert got["n_used"].iloc[0] > 100
    assert 0.5 < got["intrinsic_dim"].iloc[0] < 8.0


def test_fisher_exact_matches_rational_arithmetic(ray_session,
                                                  tmp_path):
    """The lgamma tail sum agrees with the EXACT rational
    hypergeometric sum (math.comb + Fraction) to 1e-12 on several
    planted tables."""
    from fractions import Fraction
    from math import comb

    from ocr_agent_ray.pipelines.streaming import fisher_exact_conversion

    cases = [(5, 2, 6, 1), (4, 3, 4, 1), (7, 5, 6, 2), (3, 0, 3, 2)]
    for n_a, ca, n_b, cb in cases:
        rows = []
        eid = 0
        for uid_half in range(max(n_a, n_b)):
            for arm, (nn, cc) in enumerate(((n_a, ca), (n_b, cb))):
                if uid_half >= nn:
                    continue
                uid = uid_half * 2 + arm
                conv = uid_half < cc
                rows.append((eid, pd.Timestamp("2024-01-01"), uid,
                             "purchase" if conv else "view", 0.0))
                eid += 1
        _write_events(tmp_path, pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value"]))
        got = fisher_exact_conversion(str(tmp_path))
        n = n_a + n_b
        r1, c1 = n_a, ca + cb
        want = Fraction(0)
        for k in range(ca, min(r1, c1) + 1):
            if c1 - k > n - r1:
                continue
            want += Fraction(comb(r1, k) * comb(n - r1, c1 - k),
                             comb(n, c1))
        assert abs(got["p_one_sided"].iloc[0] - float(want)) < 1e-6, \
            (n_a, ca, n_b, cb, got["p_one_sided"].iloc[0], float(want))


def test_isotonic_is_optimal_against_perturbation(ray_session,
                                                  tmp_path):
    """PAVA output minimizes weighted squared error among monotone
    fits: any small monotone perturbation scores no better."""
    from ocr_agent_ray.pipelines.relational import (
        isotonic_conversion_curve)

    rng = np.random.RandomState(17)
    rows = []
    for v in range(1, 13):
        n = int(rng.randint(2, 6))
        k = int(rng.randint(0, n + 1))
        for i in range(n):
            rows.append(("purchase" if i < k else "view", float(v)))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_type", "value"]))
    got = isotonic_conversion_curve(str(tmp_path))
    w = got["n"].to_numpy(np.float64)
    y = got["rate_raw"].to_numpy(np.float64)
    f = got["rate_iso"].to_numpy(np.float64)
    assert (np.diff(f) >= -1e-12).all()
    base = float((w * (y - f) ** 2).sum())
    for _ in range(200):
        g = f + rng.randn(len(f)) * 0.01
        g = np.maximum.accumulate(g)          # force monotone
        g = np.clip(g, 0.0, 1.0)
        assert float((w * (y - g) ** 2).sum()) >= base - 1e-9


def test_cvar_planted_tail(ray_session, tmp_path):
    """20 values 1..20: VaR95 interpolates at position 18.05 ->
    19.05; the tail {19.05 <= v} = {20}? No — v >= 19.05 keeps 20
    only... values 19 < 19.05 so tail = {20}, CVaR = 20."""
    from ocr_agent_ray.pipelines.relational import cvar_by_type

    _write_events(tmp_path, pd.DataFrame({
        "event_type": ["a"] * 20,
        "value": [float(i) for i in range(1, 21)]}))
    got = cvar_by_type(str(tmp_path)).set_index("event_type")
    pos = 19 * 0.95
    var = 19.0 + (20.0 - 19.0) * (pos - int(pos))
    assert got.loc["a", "var_q"] == round(var, 6)
    assert got.loc["a", "n_tail"] == 1
    assert got.loc["a", "cvar_q"] == 20.0


def test_segmented_trend_planted_kink(ray_session, tmp_path):
    """Counts rise by 1/day for 10 days then by 5/day: the breakpoint
    lands at the kink and the slopes recover 1 and 5."""
    from ocr_agent_ray.pipelines.streaming import segmented_trend_daily

    rows = []
    level = 5
    for d in range(20):
        level += 1 if d < 10 else 5
        for _ in range(level):
            rows.append((len(rows), pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=d), 0, "view", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = segmented_trend_daily(str(tmp_path))
    assert got["n_days"].tolist() == [20]
    # the kink point lies on BOTH lines (15 -> 20 is already +5), so
    # b=9 and b=10 both reach SSE 0 and the tie breaks to the EARLIER
    # day — the pinned argmin order
    assert str(got["break_day"].iloc[0])[:10] == "2024-01-09"
    assert got["slope_left"].iloc[0] == 1.0
    assert got["slope_right"].iloc[0] == 5.0
    assert got["sse_total"].iloc[0] == 0.0


def test_trimmed_mean_planted(ray_session, tmp_path):
    """Values 1..10 with trim 0.1 -> drop 1 from each end ->
    mean(2..9) = 5.5; outliers at the ends don't move it."""
    from ocr_agent_ray.pipelines.relational import trimmed_mean_by_type

    _write_events(tmp_path, pd.DataFrame({
        "event_type": ["a"] * 10,
        "value": [float(i) for i in range(1, 11)]}))
    got = trimmed_mean_by_type(str(tmp_path)).set_index("event_type")
    assert got.loc["a", "n_trimmed_each"] == 1
    assert got.loc["a", "trimmed_mean"] == 5.5

    _write_events(tmp_path, pd.DataFrame({
        "event_type": ["a"] * 10,
        "value": [-1000.0] + [float(i) for i in range(2, 10)]
        + [1000.0]}))
    got = trimmed_mean_by_type(str(tmp_path)).set_index("event_type")
    assert got.loc["a", "trimmed_mean"] == 5.5


def test_power_analysis_known_rates(ray_session, tmp_path):
    """30% vs 60% conversion with 10 users/arm: closed form
    n = 2.801585^2 * (0.21 + 0.24) / 0.09."""
    from ocr_agent_ray.pipelines.streaming import (
        power_analysis_conversion)

    rows = []
    for uid in range(20):
        half = uid // 2
        conv = half < 3 if uid % 2 == 0 else half < 6
        rows.append((len(rows), pd.Timestamp("2024-01-01"), uid,
                     "purchase" if conv else "view", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = power_analysis_conversion(str(tmp_path))
    assert got["p_a"].tolist() == [0.3]
    assert got["p_b"].tolist() == [0.6]
    z = 1.959964 + 0.841621
    want = z * z * (0.3 * 0.7 + 0.6 * 0.4) / (0.3 * 0.3)
    assert got["n_required_per_arm"].tolist() == [round(want, 6)]


def test_threshold_sweep_monotone_and_planted(ray_session):
    """Edge/node counts are non-increasing in the threshold, and a
    planted pair table sweeps exactly."""
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import dedup_threshold_sweep

    pairs = rd.from_pandas(pd.DataFrame({
        "doc_id_a": [1, 2, 3, 4],
        "doc_id_b": [10, 20, 30, 40],
        "jaccard": [0.55, 0.65, 0.85, 0.95]}))
    got = dedup_threshold_sweep("unused", pairs=pairs)
    assert got["threshold"].tolist() == [0.5, 0.6, 0.7, 0.8, 0.9]
    assert got["n_pairs"].tolist() == [4, 3, 2, 2, 1]
    assert got["n_docs_touched"].tolist() == [8, 6, 4, 4, 2]
    assert (np.diff(got["n_pairs"]) <= 0).all()


def test_hill_tail_index_planted_pareto(ray_session, tmp_path):
    """Exact Pareto(alpha=2) order statistics x_(i) = (n/i)^(1/2):
    the Hill estimate over the top k recovers alpha to ~15%."""
    from ocr_agent_ray.pipelines.relational import hill_tail_index

    n = 2000
    i = np.arange(1, n + 1, dtype=np.float64)
    x = (n / i) ** 0.5                       # deterministic quantiles
    _write_events(tmp_path, pd.DataFrame({
        "event_type": ["a"] * n, "value": x}))
    got = hill_tail_index(str(tmp_path), k=100)
    assert got["k"].tolist() == [100]
    assert abs(got["hill_alpha"].iloc[0] - 2.0) < 0.3


def test_runs_test_alternating_vs_blocked(ray_session, tmp_path):
    """A perfectly alternating high/low series maximizes runs
    (z > 0); two solid blocks minimize them (z < 0)."""
    from ocr_agent_ray.pipelines.streaming import runs_test_daily

    def write(counts):
        rows = []
        for d, c in enumerate(counts):
            for _ in range(int(c)):
                rows.append((len(rows), pd.Timestamp("2024-01-01")
                             + pd.Timedelta(days=d), 0, "view", 0.0))
        _write_events(tmp_path, pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value"]))

    write([10, 30] * 10)
    alt = runs_test_daily(str(tmp_path))
    assert alt["n_runs"].tolist() == [20]
    assert alt["z_runs"].iloc[0] > 2.0

    write([10] * 10 + [30] * 10)
    blk = runs_test_daily(str(tmp_path))
    assert blk["n_runs"].tolist() == [2]
    assert blk["z_runs"].iloc[0] < -2.0


def test_forecast_backtest_linear_series_holt_wins(ray_session,
                                                   tmp_path):
    """On a pure linear trend Holt converges to near-zero error while
    naive pays the slope every step -> skill_ratio >> 1."""
    from ocr_agent_ray.pipelines.streaming import forecast_backtest_daily

    rows = []
    for d in range(30):
        for _ in range(10 + 5 * d):
            rows.append((len(rows), pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=d), 0, "view", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = forecast_backtest_daily(str(tmp_path))
    assert got["n_forecasts"].tolist() == [28]
    assert got["mae_naive"].tolist() == [5.0]
    # Holt's state tracks a pure line EXACTLY (s stays on the line,
    # b equals the slope) -> zero error, skill pinned to NULL
    assert got["mae_holt"].tolist() == [0.0]
    assert np.isnan(got["skill_ratio"].iloc[0])

    # a trending series with alternating wiggle: Holt still beats
    # naive (which pays slope + wiggle every step)
    rows = []
    for d in range(30):
        for _ in range(10 + 5 * d + (3 if d % 2 else 0)):
            rows.append((len(rows), pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=d), 0, "view", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = forecast_backtest_daily(str(tmp_path))
    assert got["mae_holt"].iloc[0] > 0.0
    assert got["skill_ratio"].iloc[0] > 1.0


def test_ipf_raking_converges_to_uniform_marginals(ray_session,
                                                   tmp_path):
    """A skewed lang x source grid rakes to uniform weighted marginals
    on both axes within 1e-6 relative."""
    from ocr_agent_ray.pipelines.relational import ipf_raking_weights

    rows = []
    counts = {("en", "a"): 40, ("en", "b"): 10,
              ("de", "a"): 5, ("de", "b"): 25}
    for (lg, src), c in counts.items():
        for _ in range(c):
            rows.append((len(rows), "x", lg, src, 1))
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                       "source", "n_chars"])
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = ipf_raking_weights(str(tmp_path), iters=30)
    total = float((got["weight"] * got["n_docs"]).sum())
    by_lang = (got["weight"] * got["n_docs"]).groupby(
        got["lang"]).sum()
    by_src = (got["weight"] * got["n_docs"]).groupby(
        got["source"]).sum()
    np.testing.assert_allclose(by_lang, total / 2, rtol=1e-6)
    np.testing.assert_allclose(by_src, total / 2, rtol=1e-6)
    # the rare (de, a) cell is upweighted hardest
    w = got.set_index(["lang", "source"])["weight"]
    assert w.loc[("de", "a")] == got["weight"].max()


def test_kleinberg_bursts_metronome_vs_cluster(ray_session, tmp_path):
    """A metronome user has zero bursts; a user with a tight cluster
    amid sparse gaps gets exactly one burst covering the cluster."""
    from ocr_agent_ray.pipelines.streaming import kleinberg_bursts

    rows = []
    t0 = pd.Timestamp("2024-01-01")
    # user 1: 20 events exactly one hour apart
    for i in range(20):
        rows.append((len(rows), t0 + pd.Timedelta(hours=i), 1))
    # user 2: hourly, but 8 events packed one minute apart mid-stream
    t = t0
    for i in range(8):
        t += pd.Timedelta(hours=1)
        rows.append((len(rows), t, 2))
    for i in range(8):
        t += pd.Timedelta(minutes=1)
        rows.append((len(rows), t, 2))
    for i in range(8):
        t += pd.Timedelta(hours=1)
        rows.append((len(rows), t, 2))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    df["event_type"] = "view"
    df["value"] = 0.0
    _write_events(tmp_path, df)
    got = kleinberg_bursts(str(tmp_path)).to_pandas() \
        .set_index("user_id")
    assert got.loc[1, "n_bursts"] == 0
    assert got.loc[2, "n_bursts"] == 1
    assert got.loc[2, "max_burst_len"] >= 7


def test_bh_terms_planted_extreme_term(ray_session, tmp_path):
    """One massively skewed term among balanced filler: the skewed
    term survives FDR control; the A&S polynomial stays within its
    documented 1.5e-7 of math.erfc."""
    import math

    from ocr_agent_ray.pipelines.text import (_norm_two_sided_p,
                                              bh_significant_terms)

    for z in (0.0, 0.5, 1.0, 2.0, 3.5, 6.0):
        want = math.erfc(abs(z) / math.sqrt(2.0))
        got = float(_norm_two_sided_p(np.array([z]))[0])
        assert abs(got - want) < 1.5e-7

    # NB: the term must appear on BOTH sides — a zero count keeps the
    # Dirichlet variance term 1/alpha = 100 in the denominator and the
    # z stays small no matter how lopsided the other side is
    filler_a = " ".join(f"w{i}" for i in range(30))
    filler_b = " ".join(f"w{i}" for i in range(30))
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": [filler_a + " spam" * 400, filler_b + " spam" * 5],
        "lang": ["en", "en"],
        "source": ["src0", "src1"],
        "n_chars": [10, 10]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = bh_significant_terms(str(tmp_path))
    assert got["n_tested"].iloc[0] == 31
    assert got["n_significant"].iloc[0] >= 1
    assert 0.0 < got["bh_threshold"].iloc[0] <= 0.05


def test_gumbel_maxima_planted_moments(ray_session, tmp_path):
    """Three ISO weeks with max daily counts {10, 20, 30}: mean 20,
    sd 10 -> beta = 10*sqrt(6)/pi, mu = 20 - gamma*beta."""
    from ocr_agent_ray.pipelines.streaming import gumbel_weekly_maxima

    rows = []
    # weekday Mondays anchor distinct ISO weeks; spike one day/week
    for w, peak in enumerate((10, 20, 30)):
        monday = pd.Timestamp("2024-01-01") + pd.Timedelta(weeks=w)
        for _ in range(peak):
            rows.append((len(rows), monday, 0, "view", 0.0))
        for d in range(1, 5):
            for _ in range(5):
                rows.append((len(rows), monday + pd.Timedelta(days=d),
                             0, "view", 0.0))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = gumbel_weekly_maxima(str(tmp_path))
    assert got["n_weeks"].tolist() == [3]
    assert got["mean_max"].tolist() == [20.0]
    beta = 10.0 * np.sqrt(6.0) / np.pi
    assert got["gumbel_beta"].tolist() == [round(beta, 6)]
    assert got["gumbel_mu"].tolist() == [round(20.0 - 0.577216 * beta,
                                               6)]


def test_simpson_planted_flip(ray_session, tmp_path):
    """Two strata each trending DOWN, but the later stratum sits
    higher -> pooled correlation is positive while both within-type
    correlations are negative: sign_flip = 1 for both."""
    from ocr_agent_ray.pipelines.relational import simpson_paradox_check

    rows = []
    base = pd.Timestamp("2024-01-01")
    for i in range(10):  # type a: early, values 10 -> 1 (down)
        rows.append(("a", base + pd.Timedelta(hours=i),
                     10.0 - float(i)))
    for i in range(10):  # type b: later, values 110 -> 101 (down)
        rows.append(("b", base + pd.Timedelta(days=5, hours=i),
                     110.0 - float(i)))
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_type", "ts", "value"]))
    got = simpson_paradox_check(str(tmp_path)).set_index("event_type")
    assert got.loc["a", "corr_within"] < 0
    assert got.loc["b", "corr_within"] < 0
    assert (got["pooled_corr"] > 0).all()
    assert got["sign_flip"].tolist() == [1, 1]


def test_dedup_savings_planted(ray_session, tmp_path):
    """Three copies of one doc plus a unique doc: 2 dropped, savings =
    dropped chars / total chars; first-wins keeps the lowest id."""
    from ocr_agent_ray.pipelines.dedup import dedup_savings_report

    docs = pd.DataFrame({
        "doc_id": [5, 1, 9, 3],
        "text": ["dup", "dup", "dup", "unique text"],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": [3, 3, 3, 11]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = dedup_savings_report(str(tmp_path))
    assert got["n_docs"].tolist() == [4]
    assert got["n_kept"].tolist() == [2]
    assert got["n_dropped"].tolist() == [2]
    assert got["chars_total"].tolist() == [20]
    assert got["chars_dropped"].tolist() == [6]
    assert got["savings_fraction"].tolist() == [round(6 / 20, 6)]


def test_source_hhi_uniform_and_concentrated(ray_session, tmp_path):
    """Uniform 4-source mix: HHI = 0.25, effective_n = 4; one dominant
    source pushes HHI toward 1."""
    from ocr_agent_ray.pipelines.text import source_hhi

    _write_docs(tmp_path, ["x"] * 8,
                ["a", "b", "c", "d"] * 2)
    got = source_hhi(str(tmp_path))
    assert got["hhi"].tolist() == [0.25]
    assert got["effective_n"].tolist() == [4.0]

    _write_docs(tmp_path, ["x"] * 10, ["big"] * 9 + ["small"])
    got = source_hhi(str(tmp_path))
    assert got["hhi"].tolist() == [round(0.81 + 0.01, 6)]


def test_cluster_source_ari_planted_agreement(ray_session, tmp_path):
    """Duplicate families aligned 1:1 with sources score ARI near 1
    (sklearn's adjusted_rand_score replayed densely as reference)."""
    from ocr_agent_ray.pipelines.dedup import cluster_source_ari

    # two exact-duplicate families, each wholly inside one source,
    # plus no cross-source text reuse
    texts = (["the quick brown fox jumps over the lazy dog " * 3] * 6
             + ["pack my box with five dozen liquor jugs now " * 3] * 6)
    _write_docs(tmp_path, texts, ["s1"] * 6 + ["s2"] * 6)
    got = cluster_source_ari(str(tmp_path))
    assert got["n_docs"].tolist() == [12]
    assert got["ari"].iloc[0] == 1.0


def test_user_jaccard_daily_planted(ray_session, tmp_path):
    """Day 1 users {1,2,3}, day 2 users {2,3,4}: J = 2/4 = 0.5;
    a calendar gap produces NO row (only consecutive observed days)."""
    from ocr_agent_ray.pipelines.streaming import user_jaccard_daily

    rows = []
    def ev(day, uid):
        rows.append((len(rows), pd.Timestamp("2024-01-01")
                     + pd.Timedelta(days=day), uid, "view", 0.0))
    for u in (1, 2, 3):
        ev(0, u)
    for u in (2, 3, 4):
        ev(1, u)
    for u in (7, 8):                      # day 3 skipped -> gap
        ev(3, u)
    _write_events(tmp_path, pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value"]))
    got = user_jaccard_daily(str(tmp_path))
    assert len(got) == 1
    assert got["n_users"].tolist() == [3]
    assert got["n_users_next"].tolist() == [3]
    assert got["n_common"].tolist() == [2]
    assert got["jaccard"].tolist() == [0.5]


def test_mrr_planted_first_hit(ray_session, tmp_path):
    """Candidate pool where length normalization puts a low-relevance
    doc first: the first rel>=3 doc's 1-based rank drives 1/r; a
    query whose candidates never reach rel 3 scores 0 with NULL rank."""
    from ocr_agent_ray.pipelines.text import mrr_search

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        # doc 0: short, rel=2 (ranks first on BM25 but NOT relevant);
        # doc 1: rel=4 (the first relevant); doc 2: filler for q1/q2
        "text": ["join hash",
                 "join join hash hash " + "pad " * 30,
                 "vector stream"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": [9, 100, 13]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = mrr_search(str(tmp_path)).to_pandas().set_index("query_id")
    assert got.loc[0, "first_rel_rank"] == 2
    assert got.loc[0, "reciprocal_rank"] == 0.5
    # query 1 ("vector","stream"): doc 2 has rel 2 < 3 -> no hit
    assert pd.isna(got.loc[1, "first_rel_rank"])
    assert got.loc[1, "reciprocal_rank"] == 0.0
