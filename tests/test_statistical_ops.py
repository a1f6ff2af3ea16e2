"""Statistical / window / pivot / exact-Jaccard operator wave:
moment-partial stddev+corr, mode with tie-break, pivot, lag deltas,
inverted-index n-gram Jaccard (exact recall) and its cluster round-trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_value_stats_moments_match_two_pass(ray_session):
    from ocr_agent_ray.pipelines.relational import value_stats_by_type

    got = value_stats_by_type(SF).sort_values("event_type").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    want = ev.groupby("event_type")["value"].agg(["count", "mean", "std"])
    want = want.sort_index()
    assert list(got["event_type"]) == list(want.index)
    np.testing.assert_allclose(got["mean_value"], want["mean"], atol=5e-7)
    np.testing.assert_allclose(got["stddev_value"], want["std"], atol=5e-7)
    assert got["n_events"].dtype == np.int64


def test_corr_partials_match_numpy(ray_session):
    from ocr_agent_ray.pipelines.relational import corr_qty_price

    got = corr_qty_price(SF).set_index("l_returnflag")
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    for flag, grp in li.groupby("l_returnflag"):
        want = np.corrcoef(grp["l_quantity"], grp["l_extendedprice"])[0, 1]
        assert abs(got.loc[flag, "corr_coef"] - want) < 5e-7
        want_cov = np.cov(grp["l_quantity"], grp["l_extendedprice"])[0, 1]
        assert abs(got.loc[flag, "covar"] - want_cov) < 5e-5


def test_mode_tie_break_is_lexicographic(ray_session):
    from ocr_agent_ray.pipelines.relational import mode_segment_by_nation

    got = mode_segment_by_nation(SF)
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_nationkey", "c_mktsegment"]).to_pandas()
    counts = cust.groupby(["c_nationkey", "c_mktsegment"]).size().reset_index(name="n")
    for _, row in got.iterrows():
        sub = counts[counts["c_nationkey"] == row["c_nationkey"]]
        best_n = sub["n"].max()
        ties = sorted(sub[sub["n"] == best_n]["c_mktsegment"])
        assert row["mode_segment"] == ties[0]
        assert row["n"] == best_n


def test_pivot_rows_sum_to_total(ray_session):
    from ocr_agent_ray.pipelines.relational import orders_status_pivot

    got = orders_status_pivot(SF)
    assert (got["n_f"] + got["n_o"] + got["n_p"] == got["n_total"]).all()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderpriority"]).to_pandas()
    assert got["n_total"].sum() == len(orders)


def test_event_deltas_lag_semantics(ray_session):
    from ocr_agent_ray.pipelines.streaming import event_deltas

    got = event_deltas(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts", "user_id"]).to_pandas()
    # one NULL per user (the first event), everything else a positive gap
    assert got["delta_us"].isna().sum() == ev["user_id"].nunique()
    assert (got["delta_us"].dropna() >= 0).all()
    # spot-check one user against a plain pandas shift
    u = int(ev["user_id"].iloc[0])
    sub = ev[ev["user_id"] == u].sort_values(["ts", "event_id"])
    want = sub["ts"].astype("int64").diff().dropna().astype("int64").to_numpy()
    g = got[got["user_id"] == u].sort_values(["ts", "event_id"])
    np.testing.assert_array_equal(
        g["delta_us"].dropna().astype("int64").to_numpy(), want)


def _brute_jaccard_pairs(docs: pd.DataFrame, n: int, threshold: float):
    import re

    tok = re.compile(r"[0-9a-z_]+")
    sets = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = tok.findall((text or "").lower())
        sets[did] = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    ids = sorted(sets)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa and not sb:
                continue
            inter = len(sa & sb)
            if not inter:
                continue
            j = round(inter / (len(sa) + len(sb) - inter), 6)
            if j >= threshold:
                out.append((a, b, j))
    return sorted(out)


def test_ngram_jaccard_all_pairs_exact_recall(ray_session):
    from ocr_agent_ray.pipelines.dedup import ngram_jaccard_all_pairs

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    want = _brute_jaccard_pairs(docs, n=4, threshold=0.5)
    got = ngram_jaccard_all_pairs(
        rd.from_pandas(docs), n=4, threshold=0.5
    ).to_pandas()
    got_pairs = sorted(
        (int(a), int(b), float(j))
        for a, b, j in zip(got["doc_id_a"], got["doc_id_b"], got["jaccard"])
    )
    assert got_pairs == want  # recall AND precision: identical pair set


def test_ngram_clusters_are_transitive(ray_session):
    from ocr_agent_ray.pipelines.dedup import (
        duplicate_clusters,
        ngram_jaccard_all_pairs,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pairs = ngram_jaccard_all_pairs(docs).materialize()
    labels = duplicate_clusters(pairs)
    lab = dict(zip(labels["doc_id"], labels["cluster_id"]))
    for a, b in zip(*(pairs.to_pandas()[c] for c in ("doc_id_a", "doc_id_b"))):
        assert lab[a] == lab[b]
    # every cluster_id is the min doc_id of its member set
    by_cluster = pd.DataFrame(
        {"doc_id": list(lab), "cluster_id": list(lab.values())}
    ).groupby("cluster_id")["doc_id"].min()
    assert (by_cluster.index == by_cluster.to_numpy()).all()


def test_topk_sketch_contains_exact_heavy_hitters(ray_session):
    from ocr_agent_ray.functions.sketch import topk_words_sketch
    from ocr_agent_ray.pipelines.relational import top_words

    exact = top_words(SF, k=10)
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    approx = topk_words_sketch(docs, k=20, capacity=512)
    # Misra-Gries guarantee: every true heavy hitter survives the sketch
    assert set(exact["word"]) <= set(approx["word"])
    # approx counts within n_words/capacity of the exact counts
    n_words = int(
        pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        .to_pandas()["text"].str.lower().str.findall(r"[0-9a-z_]+")
        .str.len().sum())
    err = n_words / 512
    merged = exact.merge(approx, on="word")
    assert ((merged["n"] - merged["approx_n"]).abs() <= err).all()
    # approximate counts never exceed true counts (MG only decrements)
    assert (merged["approx_n"] <= merged["n"]).all()


def test_tfidf_ranks_rare_terms_over_ubiquitous(ray_session):
    from ocr_agent_ray.pipelines.text import tfidf_top_terms

    out = tfidf_top_terms(SF, k=5).to_pandas()
    assert set(out.columns) == {"source", "word", "tfidf"}
    assert (out.groupby("source").size() <= 5).all()
    # a word present in every document has idf=0 and can never outrank a
    # positive-idf term; 'the'-like ubiquitous tokens must score 0 if present
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    in_all = docs["text"].str.lower().str.contains("data").all()
    if in_all:
        assert (out.loc[out["word"] == "data", "tfidf"] == 0).all()
    assert (out["tfidf"] >= 0).all()


def test_props_key_stats_extraction(ray_session):
    import json

    from ocr_agent_ray.pipelines.relational import props_key_stats

    got = props_key_stats(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "props"]).to_pandas()
    ev["k"] = ev["props"].map(lambda s: json.loads(s)["k"])
    want = ev.groupby("event_type")["k"].sum()
    got_sum = got.set_index("event_type")["sum_k"]
    assert got_sum.sort_index().equals(want.sort_index().astype("int64"))


def test_priciest_part_argmax_tiebreak(ray_session):
    from ocr_agent_ray.pipelines.relational import priciest_part_per_brand

    got = priciest_part_per_brand(SF)
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    for _, row in got.iterrows():
        sub = part[part["p_brand"] == row["p_brand"]]
        best = sub["p_retailprice"].max()
        ties = sub[sub["p_retailprice"] == best]["p_partkey"].min()
        assert row["p_partkey"] == ties
        assert abs(row["p_retailprice"] - round(best, 2)) < 1e-9


def test_set_ops_partition_purchasers(ray_session):
    from ocr_agent_ray.pipelines.relational import (
        purchasers_with_errors,
        purchasers_without_errors,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    p = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    e = set(ev.loc[ev["event_type"] == "error", "user_id"])
    without = set(purchasers_without_errors(SF)["user_id"])
    with_ = set(purchasers_with_errors(SF)["user_id"])
    assert without == p - e
    assert with_ == p & e
    assert without.isdisjoint(with_) and (without | with_) == p


def test_revenue_by_nation_matches_pandas(ray_session):
    from ocr_agent_ray.pipelines.relational import revenue_by_nation

    got = revenue_by_nation(SF).set_index("n_name").sort_index()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice", "l_discount"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"]).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    per_order = li.groupby("l_orderkey", as_index=False)["rev"].sum()
    j = (per_order.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
                  .merge(cust, left_on="o_custkey", right_on="c_custkey")
                  .merge(nation, left_on="c_nationkey", right_on="n_nationkey"))
    want = j.groupby("n_name")["rev"].agg(["sum", "size"]).sort_index()
    np.testing.assert_allclose(got["revenue"], want["sum"].round(2), atol=0.011)
    np.testing.assert_array_equal(got["n_orders"], want["size"])


def test_funnel_counts_conversions_within_window(ray_session):
    from ocr_agent_ray.pipelines.streaming import view_purchase_funnel

    got = view_purchase_funnel(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    # brute-force oracle
    for _, row in got.head(20).iterrows():
        sub = ev[ev["user_id"] == row["user_id"]]
        views = sub.loc[sub["event_type"] == "view", "ts"]
        buys = sub.loc[sub["event_type"] == "purchase", "ts"]
        conv = sum(
            ((buys > v) & (buys <= v + pd.Timedelta(hours=1))).any()
            for v in views)
        assert row["n_views"] == len(views)
        assert row["n_conversions"] == conv
    assert (got["n_conversions"] <= got["n_views"]).all()
    assert (got["n_views"] > 0).all()  # purchase-only users are excluded


def test_dau_and_shares(ray_session):
    from ocr_agent_ray.pipelines.relational import priority_share
    from ocr_agent_ray.pipelines.streaming import daily_active_users

    dau = daily_active_users(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    want = (ev.assign(day=ev["ts"].dt.floor("D"))
              .groupby("day")["user_id"].nunique())
    assert dau.set_index("day")["dau"].sort_index().equals(
        want.sort_index().astype("int64"))

    share = priority_share(SF)
    assert abs(share["share"].sum() - 1.0) < 1e-4
    assert share["n"].sum() == len(
        pq.read_table(f"{SF}/orders.parquet", columns=["o_orderpriority"]))


def test_monthly_cum_revenue_monotone(ray_session):
    from ocr_agent_ray.pipelines.relational import monthly_cum_revenue

    out = monthly_cum_revenue(SF)
    assert out["month"].is_monotonic_increasing
    assert out["cum_revenue"].is_monotonic_increasing
    assert abs(out["cum_revenue"].iloc[-1] - out["revenue"].sum()) < 0.05


def test_late_events_prefix_scan(ray_session):
    from ocr_agent_ray.pipelines.streaming import late_events

    # small range_size forces many ranges, exercising the carry chain
    got = late_events(SF, range_size=64).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts"]).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    want_wm = ev["ts"].cummax()
    np.testing.assert_array_equal(got["watermark"].to_numpy(),
                                  want_wm.to_numpy())
    want_late = ev["ts"] < want_wm - pd.Timedelta(minutes=5)
    np.testing.assert_array_equal(got["late"].to_numpy(),
                                  want_late.to_numpy())


def test_growth_and_retention_invariants(ray_session):
    from ocr_agent_ray.pipelines.relational import (
        weekly_retention,
        yearly_order_growth,
    )

    g = yearly_order_growth(SF)
    assert g["year"].is_monotonic_increasing
    assert g["prev_n"].isna().sum() == 1            # only the first year
    assert (g["n_orders"].iloc[1:].to_numpy()
            - g["n_orders"].iloc[:-1].to_numpy()
            == g["delta"].iloc[1:].to_numpy()).all()

    r = weekly_retention(SF)
    assert (r["retained_users"] <= r["active_users"]).all()
    assert r["week"].is_monotonic_increasing


def test_anova_f_planted_two_groups(ray_session, tmp_path):
    """Hand-computed one-way ANOVA: groups [1,2,3] and [4,5,6] give
    SSB 13.5, SSW 4 -> F = 13.5, eta^2 = 13.5/17.5."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.relational import anova_f_value_by_type

    ev = pd.DataFrame({
        "event_type": ["a"] * 3 + ["b"] * 3,
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = anova_f_value_by_type(str(tmp_path))
    assert got["n_groups"].tolist() == [2]
    assert got["n_total"].tolist() == [6]
    assert got["f_stat"].tolist() == [13.5]
    assert got["eta_squared"].tolist() == [0.771429]


def test_ks_planted_shifted_samples(ray_session, tmp_path):
    """src0 lengths {1,2,3,4} vs src1 {3,4,5,6}: max ECDF gap is 0.5,
    first reached at length 2; an unrelated source is ignored."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.text import ks_source_lengths

    docs = pd.DataFrame({
        "doc_id": range(9),
        "text": ["x"] * 9,
        "lang": ["en"] * 9,
        "source": ["src0"] * 4 + ["src1"] * 4 + ["srcZ"],
        "n_chars": [1, 2, 3, 4, 3, 4, 5, 6, 100]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = ks_source_lengths(str(tmp_path))
    assert got["n_a"].tolist() == [4]
    assert got["n_b"].tolist() == [4]
    assert got["ks_d"].tolist() == [0.5]
    assert got["at_len"].tolist() == [2]


def test_length_auc_separation_and_ties(ray_session, tmp_path):
    """Perfect separation -> AUC 1.0; a tied length counts half
    (planted case 0.125 checked against the pairwise definition)."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.text import length_auc_lang

    def _write(lens_pos, lens_neg, d):
        docs = pd.DataFrame({
            "doc_id": range(len(lens_pos) + len(lens_neg)),
            "text": ["x"] * (len(lens_pos) + len(lens_neg)),
            "lang": ["en"] * len(lens_pos) + ["de"] * len(lens_neg),
            "source": "src0",
            "n_chars": lens_pos + lens_neg})
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       str(d / "documents.parquet"))

    _write([3, 4], [1, 2], tmp_path)
    got = length_auc_lang(str(tmp_path))
    assert got["auc"].tolist() == [1.0]
    assert got["n_pos"].tolist() == [2] and got["n_neg"].tolist() == [2]

    _write([1, 2], [2, 3], tmp_path)  # overwrite: one tie at len 2
    got = length_auc_lang(str(tmp_path))
    assert got["auc"].tolist() == [0.125]


def test_spearman_ties_and_monotone(ray_session, tmp_path):
    """Tie-heavy planted case hand-computed via average ranks:
    x=[1,2,2,3] vs token counts [10,20,20,5] -> rho = -1.5/4.5; a
    perfectly monotone pair gives rho 1.0."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.text import spearman_chars_tokens

    def _write(n_chars, tok_counts, d):
        docs = pd.DataFrame({
            "doc_id": range(len(n_chars)),
            "text": [" ".join(["t"] * k) for k in tok_counts],
            "lang": "en", "source": "src0", "n_chars": n_chars})
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       str(d / "documents.parquet"))

    _write([1, 2, 2, 3], [10, 20, 20, 5], tmp_path)
    got = spearman_chars_tokens(str(tmp_path))
    assert got["n_docs"].tolist() == [4]
    assert got["spearman_rho"].tolist() == [-0.333333]

    _write([5, 1, 9, 3], [50, 10, 90, 30], tmp_path)
    got = spearman_chars_tokens(str(tmp_path))
    assert got["spearman_rho"].tolist() == [1.0]


def test_quality_pct_rank_ties_and_singleton(ray_session, tmp_path):
    """Ties share the strictly-below count (both 0.02 docs get 1/3);
    a single-doc source pins pct_rank to 0."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.text import quality_pct_rank_by_source

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["x", "x y z w", "x y z w", "the the the the", "z"],
        "lang": "en",
        "source": ["A", "A", "A", "A", "B"],
        "n_chars": [1, 7, 7, 15, 1]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = quality_pct_rank_by_source(str(tmp_path))
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["quality_score"].tolist() == [0.005, 0.02, 0.02, 0.52,
                                             0.005]
    assert got["pct_rank"].tolist() == [0.0, 0.333333, 0.333333, 1.0,
                                        0.0]


def test_user_burstiness_metronome_vs_bursty(ray_session, tmp_path):
    """Metronomic user (equal gaps) -> cv 0; bursty user gaps
    [1,1,28]s -> cv = sqrt(243)/10; a 2-event user is excluded."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.streaming import user_burstiness

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i, off in enumerate([0, 10, 20, 30]):          # user 1
        rows.append((100 + i, base + pd.Timedelta(seconds=off), 1))
    for i, off in enumerate([0, 1, 2, 30]):            # user 2
        rows.append((200 + i, base + pd.Timedelta(seconds=off), 2))
    for i, off in enumerate([0, 5]):                   # user 3: excluded
        rows.append((300 + i, base + pd.Timedelta(seconds=off), 3))
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["event_type"] = "view"
    ev["value"] = 1.0
    ev["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = user_burstiness(str(tmp_path))
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == [1, 2]
    assert got["n_events"].tolist() == [4, 4]
    assert got["mean_gap_s"].tolist() == [10.0, 10.0]
    assert got["cv_gap"].tolist() == [0.0, 1.558846]


def test_js_divergence_zero_and_symmetric(ray_session, tmp_path):
    """A single-source corpus has p = q exactly -> jsd 0; two mirrored
    sources get equal jsd matching the direct formula (full support
    including each source's zero-count words)."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.text import source_js_divergence

    def _write(texts_by_source, d):
        rows = []
        for src, texts in texts_by_source.items():
            for t in texts:
                rows.append((len(rows), t, "en", src, len(t)))
        docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                           "source", "n_chars"])
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       str(d / "documents.parquet"))

    _write({"A": ["x x y", "y x"]}, tmp_path)
    got = source_js_divergence(str(tmp_path))
    assert got["jsd"].tolist() == [0.0]

    # mirrored: A has x twice/y once + one 'only_a'; B swaps roles
    tmp2 = tmp_path / "two"
    tmp2.mkdir()
    _write({"A": ["x x y za"], "B": ["y y x zb"]}, tmp2)
    got = source_js_divergence(str(tmp2)).set_index("source")
    assert got.loc["A", "jsd"] == got.loc["B", "jsd"] > 0

    # direct-formula replay for source A: corpus q over support
    # {x:3, y:3, za:1, zb:1}/8, p_A = {x:.5, y:.25, za:.25, zb:0}
    q = np.array([3, 3, 1, 1], dtype=np.float64) / 8.0
    p = np.array([2, 1, 1, 0], dtype=np.float64) / 4.0
    mm = 0.5 * (p + q)
    tp = np.where(p > 0, p * np.log(np.where(p > 0, p, 1) / mm), 0.0)
    tq = q * np.log(q / mm)
    want = round(0.5 * tp.sum() + 0.5 * tq.sum(), 6)
    assert abs(got.loc["A", "jsd"] - want) < 2e-6


def test_welch_ttest_planted(ray_session, tmp_path):
    """Hand-computed Welch: purchase [1,2,3] vs view [2,4,6,8] gives
    v_a=1, v_b=20/3, se2=2, t=(2-5)/sqrt(2), df=216/53."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.relational import welch_ttest_values

    ev = pd.DataFrame({
        "event_type": ["purchase"] * 3 + ["view"] * 4 + ["click"],
        "value": [1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 8.0, 99.0]})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = welch_ttest_values(str(tmp_path))
    assert got["n_a"].tolist() == [3] and got["n_b"].tolist() == [4]
    assert got["mean_a"].tolist() == [2.0]
    assert got["mean_b"].tolist() == [5.0]
    assert got["t_stat"].tolist() == [round(-3.0 / np.sqrt(2.0), 6)]
    assert got["df_welch"].tolist() == [round(216.0 / 53.0, 6)]

    # degenerate: one side missing -> empty frame, stable schema
    ev2 = ev[ev["event_type"] != "view"]
    pq.write_table(pa.Table.from_pandas(ev2, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = welch_ttest_values(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["type_a", "type_b", "n_a", "n_b",
                                 "mean_a", "mean_b", "t_stat", "df_welch"]


def test_kendall_tau_planted(ray_session, tmp_path):
    """Daily counts [1,2,2,3]: C=5, D=0, n0=6, tie term 1 ->
    tau_b = 5/sqrt(30); strictly decreasing counts -> tau_b = -1."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.streaming import kendall_tau_daily

    def _write(counts, d):
        ts = []
        for i, c in enumerate(counts):
            base = pd.Timestamp("2024-03-01") + pd.Timedelta(days=i)
            ts += [base + pd.Timedelta(minutes=j) for j in range(c)]
        ev = pd.DataFrame({"ts": pd.Series(ts, dtype="datetime64[us]")})
        pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                       str(d / "events.parquet"))

    _write([1, 2, 2, 3], tmp_path)
    got = kendall_tau_daily(str(tmp_path))
    assert got["n_days"].tolist() == [4]
    assert got["n_concordant"].tolist() == [5]
    assert got["n_discordant"].tolist() == [0]
    assert got["tau_b"].tolist() == [round(5.0 / np.sqrt(30.0), 6)]

    _write([3, 2, 1], tmp_path)
    got = kendall_tau_daily(str(tmp_path))
    assert got["tau_b"].tolist() == [-1.0]


def test_skew_kurtosis_matches_pandas(ray_session, tmp_path):
    """The adjusted-moment formulas equal pandas .skew()/.kurt()."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.relational import skew_kurtosis_by_type

    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.gamma(2.0, 10.0, 200),      # right-skewed
                           rng.uniform(0.0, 100.0, 300)])   # flat
    ev = pd.DataFrame({
        "event_type": ["gamma"] * 200 + ["flat"] * 300,
        "value": vals})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = skew_kurtosis_by_type(str(tmp_path)).set_index("event_type")
    for t in ["gamma", "flat"]:
        s = ev.loc[ev["event_type"] == t, "value"]
        assert abs(got.loc[t, "skewness"] - s.skew()) < 1e-6, t
        assert abs(got.loc[t, "kurtosis_excess"] - s.kurt()) < 1e-6, t
    assert got.loc["gamma", "skewness"] > 0.5  # gamma(2) is right-skewed

    # groups smaller than 4 rows are dropped (df in the corrections)
    ev2 = pd.concat([ev, pd.DataFrame({
        "event_type": ["tiny"] * 3, "value": [1.0, 2.0, 3.0]})])
    pq.write_table(pa.Table.from_pandas(ev2, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = skew_kurtosis_by_type(str(tmp_path))
    assert "tiny" not in got["event_type"].tolist()


def test_ols_chars_model_matches_lstsq(ray_session, tmp_path):
    """Cramer-rule coefficients equal numpy lstsq on the design matrix;
    a perfectly linear corpus recovers the plant with r2 = 1."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.relational import ols_chars_model

    rng = np.random.RandomState(11)
    words = ["data", "spark", "ok", "zzz", "aeiou", "xyzzy", "table"]
    texts = [" ".join(rng.choice(words, rng.randint(3, 40)))
             for _ in range(300)]
    docs = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "text": texts,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = ols_chars_model(str(tmp_path))
    x1 = np.array([len(t.split()) for t in texts], dtype=np.float64)
    x2 = np.array([sum(t.count(v) for v in "aeiou") for t in texts],
                  dtype=np.float64)
    y = docs["n_chars"].to_numpy(np.float64)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert got["n"].tolist() == [300]
    assert abs(got["b0"][0] - beta[0]) < 1e-4
    assert abs(got["b1"][0] - beta[1]) < 1e-4
    assert abs(got["b2"][0] - beta[2]) < 1e-4
    resid = y - X @ beta
    r2 = 1.0 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    assert abs(got["r2"][0] - r2) < 1e-6

    # exactly-planted linear relation -> r2 == 1
    docs2 = docs.assign(n_chars=(5 + 3 * x1 + 2 * x2).astype(np.int64))
    pq.write_table(pa.Table.from_pandas(docs2, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = ols_chars_model(str(tmp_path))
    assert got["b0"].tolist() == [5.0]
    assert got["b1"].tolist() == [3.0]
    assert got["b2"].tolist() == [2.0]
    assert got["r2"].tolist() == [1.0]


def test_user_event_entropy_planted(ray_session, tmp_path):
    """Uniform 4-type mix -> ln(4); single-type user -> exactly 0.0;
    a 3:1 split -> the hand-computed two-term entropy."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.streaming import user_event_entropy

    rows = (
        [(1, t) for t in ["view", "click", "purchase", "error"]]
        + [(2, "view")] * 5
        + [(3, "view")] * 3 + [(3, "purchase")]
    )
    ev = pd.DataFrame({
        "user_id": np.array([u for u, _ in rows], dtype=np.int64),
        "event_type": [t for _, t in rows],
        "ts": pd.Series([pd.Timestamp("2024-01-01")] * len(rows),
                        dtype="datetime64[us]"),
        "event_id": np.arange(len(rows), dtype=np.int64),
        "value": np.zeros(len(rows))})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = user_event_entropy(str(tmp_path))
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got = got.sort_values("user_id").set_index("user_id")
    assert got.loc[1, "n_types"] == 4
    assert abs(got.loc[1, "entropy"] - np.log(4.0)) < 1e-6
    assert got.loc[2, "entropy"] == 0.0          # exact cancellation
    want3 = np.log(4.0) - (3.0 * np.log(3.0)) / 4.0
    assert abs(got.loc[3, "entropy"] - want3) < 1e-6
    assert got["n_events"].tolist() == [4, 5, 4]


def test_cramers_v_planted(ray_session, tmp_path):
    """A perfectly dependent 2x2 table gives V = 1; an independent one
    gives V = 0 (both exact)."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.relational import cramers_v_type_band

    # perfect association: type A always low, type B always high
    ev = pd.DataFrame({
        "event_type": ["A"] * 40 + ["B"] * 60,
        "value": [1.0] * 40 + [99.0] * 60})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = cramers_v_type_band(str(tmp_path))
    assert got["n"].tolist() == [100]
    assert got["dof"].tolist() == [1]
    assert got["cramers_v"].tolist() == [1.0]

    # independence: identical band mix in both types -> chi2 = 0
    ev2 = pd.DataFrame({
        "event_type": ["A"] * 40 + ["B"] * 40,
        "value": ([1.0] * 20 + [99.0] * 20) * 2})
    pq.write_table(pa.Table.from_pandas(ev2, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = cramers_v_type_band(str(tmp_path))
    assert got["cramers_v"].tolist() == [0.0]

    # single event type -> degenerate, empty with stable schema
    ev3 = ev[ev["event_type"] == "A"]
    pq.write_table(pa.Table.from_pandas(ev3, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = cramers_v_type_band(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["n", "dof", "cramers_v"]


def test_weekly_spectral_planted(ray_session, tmp_path):
    """A pure period-7 cosine over 28 days scores weekly_power ~= 1;
    a pure period-4 tone projects to ~0 at the weekly frequency."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.streaming import weekly_spectral_power

    def _write(counts, d):
        ts = []
        for i, c in enumerate(counts):
            base = pd.Timestamp("2024-03-04") + pd.Timedelta(days=i)
            ts += [base + pd.Timedelta(minutes=j) for j in range(c)]
        ev = pd.DataFrame({"ts": pd.Series(ts, dtype="datetime64[us]")})
        pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                       str(d / "events.parquet"))

    t = np.arange(28)
    weekly = np.round(50 + 20 * np.cos(2 * np.pi * t / 7)).astype(int)
    _write(weekly.tolist(), tmp_path)
    got = weekly_spectral_power(str(tmp_path))
    assert got["n_days"].tolist() == [28]
    assert got["weekly_power"][0] > 0.99

    four_day = np.round(50 + 20 * np.cos(2 * np.pi * t / 4)).astype(int)
    _write(four_day.tolist(), tmp_path)
    got = weekly_spectral_power(str(tmp_path))
    assert got["weekly_power"][0] < 0.05

    # constant series -> ss = 0 -> empty with stable schema
    _write([10] * 14, tmp_path)
    got = weekly_spectral_power(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["n_days", "weekly_power"]


def test_xcorr_daily_planted_lead(ray_session, tmp_path):
    """Purchases = views shifted by 2 days -> xcorr peaks at exactly
    lag +2 with r = 1."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.streaming import cross_correlation_daily

    rng = np.random.RandomState(3)
    views = rng.randint(20, 80, 20)
    ts = []
    types = []
    base = pd.Timestamp("2024-05-01")
    for i, v in enumerate(views):
        day_v = base + pd.Timedelta(days=i)
        ts += [day_v + pd.Timedelta(minutes=j) for j in range(int(v))]
        types += ["view"] * int(v)
        day_p = base + pd.Timedelta(days=i + 2)
        ts += [day_p + pd.Timedelta(minutes=j) for j in range(int(v))]
        types += ["purchase"] * int(v)
    ev = pd.DataFrame({
        "ts": pd.Series(ts, dtype="datetime64[us]"),
        "event_type": types})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = cross_correlation_daily(str(tmp_path)).set_index("lag")
    assert got.loc[2, "xcorr"] == 1.0
    assert got.loc[2, "n_pairs"] == 20
    # every other lag correlates the series against a shifted copy of
    # itself -> strictly less than the aligned peak
    assert all(got.loc[k, "xcorr"] < 1.0 for k in got.index if k != 2)


def test_durbin_watson_planted_series(ray_session, tmp_path):
    """Alternating counts around a flat trend -> near-perfect negative
    serial correlation (DW close to 4); a pure linear ramp has zero
    residual autocorrelation structure... but residuals of an exact
    ramp are all ~0, so plant alternation (dw -> 4) and a smooth
    random walk (dw << 2) and pin both against statsmodels' formula
    computed directly on the residuals."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.streaming import durbin_watson_daily

    base = pd.Timestamp("2024-03-01")
    ts, types = [], []
    # type A: 10/30 alternation, zero slope -> residuals alternate
    alt = [10, 30] * 15
    for i, c in enumerate(alt):
        day = base + pd.Timedelta(days=i)
        ts += [day + pd.Timedelta(minutes=j) for j in range(c)]
        types += ["alt"] * c
    # type B: smooth ramp + slow sine wobble -> positive residual
    # autocorrelation (DW < 2)
    smooth = (50 + 2 * np.arange(30)
              + (8 * np.sin(np.arange(30) / 6.0)).astype(int))
    for i, c in enumerate(smooth):
        day = base + pd.Timedelta(days=i)
        ts += [day + pd.Timedelta(minutes=j) for j in range(int(c))]
        types += ["smooth"] * int(c)
    ev = pd.DataFrame({
        "ts": pd.Series(ts, dtype="datetime64[us]"),
        "event_type": types})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = durbin_watson_daily(str(tmp_path)).set_index("event_type")
    assert got.loc["alt", "n_days"] == 30
    assert got.loc["smooth", "n_days"] == 30

    # reference: residuals of np.polyfit, statsmodels DW formula
    def ref_dw(counts):
        x = np.arange(len(counts), dtype=np.float64)
        y = np.asarray(counts, dtype=np.float64)
        b, a = np.polyfit(x, y, 1)
        e = y - (a + b * x)
        return np.sum(np.diff(e) ** 2) / np.sum(e ** 2)

    assert abs(got.loc["alt", "dw"] - ref_dw(alt)) < 1e-6
    assert abs(got.loc["smooth", "dw"] - ref_dw(smooth)) < 1e-6
    assert got.loc["alt", "dw"] > 3.5          # alternation -> near 4
    assert got.loc["smooth", "dw"] < 1.0       # smooth wobble -> < 2


def test_concurrent_sessions_planted_peak(ray_session, tmp_path):
    """Hand-built interval pattern: three users whose sessions overlap
    in a known stack (peak 3), one session crossing midnight (counts
    toward BOTH days, clipped), and a touching-at-an-instant pair
    (counts as concurrent — starts sort before ends)."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.streaming import concurrent_sessions_daily

    base = pd.Timestamp("2024-06-01 10:00:00")

    def burst(user, start, minutes):
        # events 1 min apart -> one session [start, start+minutes-1]
        return [(user, start + pd.Timedelta(minutes=i))
                for i in range(minutes)]

    rows = []
    # day 1: u1 10:00-10:09, u2 10:05-10:14, u3 10:09-10:18 -> peak 3
    rows += burst(1, base, 10)
    rows += burst(2, base + pd.Timedelta(minutes=5), 10)
    rows += burst(3, base + pd.Timedelta(minutes=9), 10)
    # u4 session ends exactly when u5's starts (same instant, later that
    # day, disjoint from the morning stack) -> concurrent pair of 2
    t4 = pd.Timestamp("2024-06-01 20:00:00")
    rows += burst(4, t4, 5)                       # 20:00-20:04
    rows += burst(5, t4 + pd.Timedelta(minutes=4), 5)  # 20:04-20:08
    # u6 crosses midnight: 23:50 day1 -> 00:10 day2 (21 events 1 min
    # apart, gap < 30 min keeps one session)
    rows += burst(6, pd.Timestamp("2024-06-01 23:50:00"), 21)
    # day 3 has ONLY a touching pair: u7 ends exactly when u8 starts ->
    # max_concurrent == 2 iff touching-at-an-instant counts (inclusive
    # intervals, starts sort before ends); 1 under exclusive semantics
    t7 = pd.Timestamp("2024-06-03 09:00:00")
    rows += burst(7, t7, 5)                            # 09:00-09:04
    rows += burst(8, t7 + pd.Timedelta(minutes=4), 5)  # 09:04-09:08
    ev = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "ts": pd.Series([r[1] for r in rows], dtype="datetime64[us]"),
    })
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = concurrent_sessions_daily(str(tmp_path)).to_pandas()
    got = got.sort_values("day").reset_index(drop=True)
    assert len(got) == 3
    d1, d2, d3 = got.iloc[0], got.iloc[1], got.iloc[2]
    assert d1["day"] == pd.Timestamp("2024-06-01")
    assert d1["n_sessions"] == 6           # 5 whole + midnight segment
    assert d1["max_concurrent"] == 3       # the morning stack
    assert d2["day"] == pd.Timestamp("2024-06-02")
    assert d2["n_sessions"] == 1           # the midnight spillover
    assert d2["max_concurrent"] == 1
    assert d3["day"] == pd.Timestamp("2024-06-03")
    assert d3["n_sessions"] == 2
    assert d3["max_concurrent"] == 2       # touching instant IS concurrent


def test_pacf_durbin_levinson_vs_yule_walker_solve(ray_session, tmp_path):
    """The closed-form Durbin-Levinson recursion == an independent
    Yule-Walker matrix solve (np.linalg.solve on the Toeplitz system)
    at every lag, on an AR(1)-flavored planted series; lag-1 PACF is
    large while lags 2-3 collapse toward zero (the AR-order
    signature)."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.streaming import pacf_daily

    rng = np.random.RandomState(17)
    # AR(1) with phi=0.7 around level 60, integerized positive counts
    y = [60.0]
    for _ in range(79):
        y.append(60.0 + 0.7 * (y[-1] - 60.0) + rng.normal(0, 6))
    counts = np.maximum(np.round(y).astype(int), 1)
    base = pd.Timestamp("2024-01-01")
    ts = []
    for i, c in enumerate(counts):
        day = base + pd.Timedelta(days=i)
        ts += [day + pd.Timedelta(seconds=j) for j in range(int(c))]
    ev = pd.DataFrame({"ts": pd.Series(ts, dtype="datetime64[us]")})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = pacf_daily(str(tmp_path)).set_index("lag")
    assert list(got.index) == [1, 2, 3]

    # independent reference: biased ACF -> solve the Toeplitz YW system
    yy = counts.astype(np.float64)
    mu = yy.mean()
    c = [np.sum((yy[k:] - mu) * (yy[:-k] - mu)) if k else
         np.sum((yy - mu) ** 2) for k in range(4)]
    rho = np.array(c) / c[0]
    for k in (1, 2, 3):
        R = np.array([[rho[abs(i - j)] for j in range(k)]
                      for i in range(k)])
        phi = np.linalg.solve(R, rho[1:k + 1])
        assert abs(got.loc[k, "pacf"] - phi[-1]) < 1e-6
    assert got.loc[1, "pacf"] > 0.5
    assert abs(got.loc[2, "pacf"]) < 0.3
    assert abs(got.loc[3, "pacf"]) < 0.3


def test_kruskal_wallis_planted_with_ties(ray_session, tmp_path):
    """Groups a=[1,2,3], b=[2,3,4] with ties at 2 and 3 (verified by
    hand: ranks 1, 2.5, 2.5, 4.5, 4.5, 6; R_a=8, R_b=13; scipy's
    kruskal returns the tie-corrected 1.262626)."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.relational import (
        kruskal_wallis_value_by_type)

    ev = pd.DataFrame({
        "event_type": ["a"] * 3 + ["b"] * 3,
        "value": [1.0, 2.0, 3.0, 2.0, 3.0, 4.0]})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = kruskal_wallis_value_by_type(str(tmp_path))
    assert got["n_groups"].tolist() == [2]
    assert got["n_total"].tolist() == [6]
    # H = 12/42 * (64/3 + 169/3) - 21 = 1.190476
    # C = 1 - ((8-2)+(8-2))/210 = 0.942857 -> Hc = 1.262626
    assert got["h_stat"].tolist() == [1.190476]
    assert got["h_tie_corrected"].tolist() == [1.262626]


def test_mutual_information_planted_independent_and_dependent(
        ray_session, tmp_path):
    """A perfectly dependent 2x2 table has MI = ln 2 and NMI = 1; an
    independent table has MI = 0."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.relational import (
        mutual_information_type_band)

    dep = pd.DataFrame({
        "event_type": ["a"] * 4 + ["b"] * 4,
        "value": [1.0] * 4 + [90.0] * 4})
    pq.write_table(pa.Table.from_pandas(dep, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = mutual_information_type_band(str(tmp_path))
    assert got["mi_nats"].tolist() == [round(float(np.log(2.0)), 6)]
    assert got["nmi"].tolist() == [1.0]

    ind = pd.DataFrame({
        "event_type": ["a", "a", "b", "b"],
        "value": [1.0, 90.0, 1.0, 90.0]})
    pq.write_table(pa.Table.from_pandas(ind, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = mutual_information_type_band(str(tmp_path))
    assert got["mi_nats"].tolist() == [0.0]
    assert got["nmi"].tolist() == [0.0]


def test_exact_median_by_type_even_odd_and_ties(ray_session, tmp_path):
    """Odd group picks the middle value; even group interpolates the
    two middles; duplicated values land on the duplicate."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.relational import exact_median_by_type

    ev = pd.DataFrame({
        "event_type": ["odd"] * 3 + ["even"] * 4 + ["tied"] * 5,
        "value": [3.0, 1.0, 2.0,
                  4.0, 1.0, 3.0, 2.0,
                  7.0, 7.0, 7.0, 1.0, 9.0]})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = exact_median_by_type(str(tmp_path)).set_index("event_type")
    assert got.loc["odd", "median_value"] == 2.0
    assert got.loc["even", "median_value"] == 2.5
    assert got.loc["tied", "median_value"] == 7.0
    assert got["n"].tolist() == [4, 3, 5]
