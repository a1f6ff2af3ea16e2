"""Dedup operators vs sequential oracles on planted duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from ocr_agent_ray.functions.hashing import (
    char_shingle_set,
    hamming64,
    jaccard,
    simhash64,
)
from ocr_agent_ray.pipelines.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays on "
    "and the crowd cheers for more music in the warm summer evening air"
)


@pytest.fixture(scope="module")
def planted():
    rows = []
    rng = np.random.default_rng(7)
    words = BASE.split()
    for i in range(40):
        w = list(rng.permutation(words))
        rows.append({"doc_id": i, "text": " ".join(w)})
    # exact dup pair (50, 51), near-dup pair (60, 61), far text (70)
    rows.append({"doc_id": 50, "text": BASE})
    rows.append({"doc_id": 51, "text": BASE})
    near = BASE.replace("summer", "winter")
    rows.append({"doc_id": 60, "text": BASE})
    rows.append({"doc_id": 61, "text": near})
    rows.append({"doc_id": 70, "text": "completely different content here xyz"})
    return pd.DataFrame(rows)


def test_exact_dedup(ray_session, planted):
    out = exact_dedup(rd.from_pandas(planted)).to_pandas()
    # 50/51 and 60 share identical text -> one fingerprint keeps min id 50
    assert 51 not in set(out["doc_id"])
    assert 50 in set(out["doc_id"])
    # distinct texts all kept: unique fingerprints == unique texts
    assert len(out) == planted["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip().nunique()


def test_minhash_finds_planted_pairs(ray_session, planted):
    out = minhash_lsh_dedup(rd.from_pandas(planted), threshold=0.5).to_pandas()
    pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
    assert (50, 51) in pairs or (50, 60) in pairs  # exact dups collide
    assert any({a, b} == {60, 61} or {a, b} == {50, 61} or {a, b} == {51, 61}
               for a, b in pairs)  # near-dup found
    assert all(70 not in (a, b) for a, b in pairs)
    # reported jaccard equals the sequential oracle value
    texts = dict(zip(planted["doc_id"], planted["text"]))
    for a, b, j in zip(out["doc_id_a"], out["doc_id_b"], out["jaccard"]):
        expect = jaccard(char_shingle_set(texts[a]), char_shingle_set(texts[b]))
        assert abs(j - expect) < 1e-6


def test_minhash_distributed_verify_medium_corpus(ray_session):
    """5k-doc corpus: verification runs through the bucket-join rejoin
    (no driver-side id→shingles map — a corpus this size per-driver would
    already be unreasonable at the real doc lengths this models)."""
    rng = np.random.default_rng(11)
    words = BASE.split()
    rows = [{"doc_id": i, "text": " ".join(rng.permutation(words))}
            for i in range(5000)]
    # plant 10 near-dup pairs at high ids
    for i in range(10):
        t = " ".join(rng.permutation(words))
        rows.append({"doc_id": 10_000 + 2 * i, "text": t})
        rows.append({"doc_id": 10_001 + 2 * i, "text": t.replace("summer", "winter")})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(8)
    out = minhash_lsh_dedup(ds, threshold=0.5).to_pandas()
    pairs = {frozenset((a, b)) for a, b in zip(out["doc_id_a"], out["doc_id_b"])}
    found = sum(frozenset((10_000 + 2 * i, 10_001 + 2 * i)) in pairs
                for i in range(10))
    assert found >= 8  # LSH recall over the planted pairs


def test_minhash_deterministic(ray_session, planted):
    a = minhash_lsh_dedup(rd.from_pandas(planted)).to_pandas()
    b = minhash_lsh_dedup(rd.from_pandas(planted)).to_pandas()
    key = lambda df: sorted(zip(df["doc_id_a"], df["doc_id_b"], df["jaccard"]))
    assert key(a) == key(b)


def test_simhash_finds_planted_pairs(ray_session, planted):
    out = simhash_dedup(rd.from_pandas(planted), max_hamming=6).to_pandas()
    pairs = {frozenset((a, b)) for a, b in zip(out["doc_id_a"], out["doc_id_b"])}
    assert frozenset((50, 51)) in pairs
    texts = dict(zip(planted["doc_id"], planted["text"]))
    for a, b, h in zip(out["doc_id_a"], out["doc_id_b"], out["hamming"]):
        assert hamming64(simhash64(texts[a]), simhash64(texts[b])) == h <= 6


def test_degenerate_corpus_hot_bucket_cap(ray_session):
    """300 identical docs overflow the LSH bucket cap (pairs skipped, not
    O(n^2)-exploded); exact dedup still collapses them to one keeper."""
    df = pd.DataFrame({"doc_id": range(300), "text": [BASE] * 300})
    pairs = minhash_lsh_dedup(rd.from_pandas(df)).to_pandas()
    assert len(pairs) <= 300 * 16  # far below the 44,850 full pair count
    kept = exact_dedup(rd.from_pandas(df)).to_pandas()
    assert list(kept["doc_id"]) == [0]


def test_embedding_near_dup_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    # plant: vec 100 ~ vec 0 (tiny noise)
    vecs = list(base) + [base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)]
    ids = list(range(20)) + [100]
    df = pd.DataFrame({
        "vec_id": ids,
        "embedding": [v.astype(np.float32) for v in vecs],
        "label": [0] * 21,
    })
    out = embedding_near_dup(rd.from_pandas(df), threshold=0.9).to_pandas()
    pairs = set(zip(out["vec_id_a"], out["vec_id_b"]))
    assert (0, 100) in pairs
    # oracle: brute-force double-precision cosine
    unit = np.stack([v / np.linalg.norm(v.astype(np.float64)) for v in vecs])
    for a, b, c in zip(out["vec_id_a"], out["vec_id_b"], out["cosine"]):
        ia, ib = ids.index(a), ids.index(b)
        assert abs(c - round(float(unit[ia] @ unit[ib]), 6)) <= 1e-6


def test_semantic_dedup_planted(ray_session):
    """SemDeDup keep-rule: a vector with an earlier near-identical
    neighbor in the same cluster is pruned (dup_of = that neighbor);
    cross-cluster near-dups are NOT compared."""
    from ocr_agent_ray.pipelines.dedup import semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((10, 16)).astype(np.float32)
    vecs = list(base)
    ids = list(range(10))
    labels = [0] * 10
    # 100 ~ 3, same cluster -> pruned, dup_of=3
    vecs.append(base[3] + 0.001 * rng.standard_normal(16).astype(np.float32))
    ids.append(100); labels.append(0)
    # 101 ~ 4 but DIFFERENT cluster -> kept
    vecs.append(base[4] + 0.001 * rng.standard_normal(16).astype(np.float32))
    ids.append(101); labels.append(1)
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [v.astype(np.float32) for v in vecs],
                       "label": pd.array(labels, dtype="int32")})
    out = semantic_dedup(rd.from_pandas(df), threshold=0.99).to_pandas()
    out = out.set_index("vec_id")
    assert not out.loc[100, "keep"] and out.loc[100, "dup_of"] == 3
    assert out.loc[101, "keep"] and pd.isna(out.loc[101, "dup_of"])
    assert len(out) == len(df)  # one row per input vector


def test_semantic_dedup_matches_pair_operator(ray_session):
    """Cross-operator invariant on real testdata: keep(v) is False
    exactly when v appears as vec_id_b in embedding_near_dup's pair set
    at the same threshold and blocking key."""
    from ocr_agent_ray.pipelines.dedup import semantic_dedup

    sf = "/root/testdata/sf0.001"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    pairs = embedding_near_dup(emb, threshold=0.3).to_pandas()
    kept = semantic_dedup(
        rd.read_parquet(f"{sf}/embeddings.parquet"), threshold=0.3
    ).to_pandas()
    dropped = set(kept.loc[~kept["keep"], "vec_id"])
    assert dropped == set(pairs["vec_id_b"])
    # dup_of = the MINIMUM earlier near neighbor
    first_nbr = pairs.groupby("vec_id_b")["vec_id_a"].min()
    got = kept.loc[~kept["keep"]].set_index("vec_id")["dup_of"]
    assert got.sort_index().astype("int64").equals(
        first_nbr.sort_index().astype("int64").rename("dup_of"))


def test_semantic_dedup_kmeans_deterministic(ray_session):
    from ocr_agent_ray.pipelines.dedup import semantic_dedup_kmeans

    sf = "/root/testdata/sf0.001"
    a = semantic_dedup_kmeans(sf, threshold=0.3).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    b = semantic_dedup_kmeans(sf, threshold=0.3).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert a.equals(b)
    nk = ~a["keep"]
    assert (a.loc[nk, "dup_of"] < a.loc[nk, "vec_id"]).all()
    assert a.loc[a["keep"], "dup_of"].isna().all()
    assert nk.any()  # threshold 0.3 prunes something on this corpus


def test_dedup_empty_inputs(ray_session):
    """Empty corpus flows through every dedup path without error."""
    import pandas as pd

    from ocr_agent_ray.pipelines.dedup import (
        dedup_keep_first,
        embedding_near_dup_lsh,
        minhash_lsh_dedup,
        ngram_jaccard_pairs,
    )

    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                         "text": pd.Series(dtype="object")}))
    assert len(minhash_lsh_dedup(empty).to_pandas()) == 0
    assert len(ngram_jaccard_pairs(empty).to_pandas()) == 0
    assert len(dedup_keep_first(empty).to_pandas()) == 0

    empty_vec = rd.from_pandas(pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                             "embedding": pd.Series(dtype="object")}))
    out = embedding_near_dup_lsh(empty_vec)
    assert len(out) == 0


def test_fingerprint_store_incremental_admission(ray_session, tmp_path):
    """Incremental exact dedup across arriving shards: a doc whose text
    was admitted in an earlier shard is rejected later; admission is
    idempotent (re-admitting a shard admits nothing)."""
    from ocr_agent_ray.pipelines.dedup import FingerprintStore

    store = FingerprintStore(str(tmp_path / "state"), num_buckets=8)

    shard1 = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha text", "beta text", "alpha text"],  # 3 dups 1
    })
    got1 = store.admit(rd.from_pandas(shard1)).to_pandas()
    assert sorted(got1["doc_id"]) == [1, 2]     # in-shard first-wins

    shard2 = pd.DataFrame({
        "doc_id": [10, 11],
        "text": ["beta text",                    # seen in shard 1 -> drop
                 "gamma text"],                  # new -> admit
    })
    got2 = store.admit(rd.from_pandas(shard2)).to_pandas()
    assert sorted(got2["doc_id"]) == [11]

    # idempotent: everything in shard2 is now known
    got3 = store.admit(rd.from_pandas(shard2)).to_pandas()
    assert len(got3) == 0


def test_fingerprint_store_concurrent_admission(tmp_path, monkeypatch):
    """Two shards racing on the SAME never-seen fingerprints must not
    both admit them: the per-bucket flock serializes load->check->append,
    so exactly one racer survives per fingerprint. The race window is
    widened by sleeping inside the (locked) bucket load."""
    import threading
    import time

    from ocr_agent_ray.pipelines.dedup import FingerprintStore, md5_fingerprint

    store = FingerprintStore(str(tmp_path / "state"), num_buckets=4)

    real_load = FingerprintStore._load_bucket

    def slow_load(self, b):
        out = real_load(self, b)
        time.sleep(0.15)  # hold the bucket long enough for the other
        return out        # thread to be blocked on the lock, not done

    monkeypatch.setattr(FingerprintStore, "_load_bucket", slow_load)

    texts = [f"shared doc {i}" for i in range(12)]

    def frame(id_base):
        return pd.DataFrame({
            "doc_id": np.arange(id_base, id_base + len(texts)),
            "fingerprint": md5_fingerprint(pd.Series(texts)),
        })

    results: dict[int, pd.DataFrame] = {}
    barrier = threading.Barrier(2)

    def admit(tid, id_base):
        barrier.wait()
        # drive the locked per-bucket admission directly (the Ray path
        # routes every bucket group through this same method)
        f = frame(id_base)
        f["__b"] = store._bucket_of(f["fingerprint"])
        parts = [store.admit_bucket_frame(g.drop(columns="__b"))
                 for _, g in f.groupby("__b")]
        results[tid] = pd.concat(parts) if parts else f.iloc[:0]

    threads = [threading.Thread(target=admit, args=(t, 100 * (t + 1)))
               for t in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    survivors = pd.concat([results[0], results[1]])
    # every fingerprint admitted exactly once across both racers
    assert len(survivors) == len(texts)
    assert survivors["fingerprint"].nunique() == len(texts)
    # and the store itself holds no duplicates
    all_fps = []
    for b in range(4):
        all_fps.extend(store._load_bucket(b))
    assert len(all_fps) == len(set(all_fps)) == len(texts)


def test_cdc_chunk_dedup_planted_duplicates(ray_session):
    """A byte run shared by two docs at DIFFERENT offsets must dedup:
    content-defined boundaries re-align inside the shared run."""
    import numpy as np
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import cdc_chunk_dedup

    rng = np.random.default_rng(11)

    def rand_text(n):
        return "".join(chr(c) for c in rng.integers(97, 123, n))

    shared = rand_text(4000)
    docs = [
        {"doc_id": 1, "text": rand_text(800) + shared + rand_text(300)},
        {"doc_id": 2, "text": rand_text(150) + shared + rand_text(900)},
        {"doc_id": 3, "text": rand_text(2000)},
    ]
    out = cdc_chunk_dedup(rd.from_items(docs))
    row = out.iloc[0]
    assert row["total_chunks"] > row["unique_chunks"]  # dupes found
    assert row["dup_chunks"] >= 20  # most of the 4000-byte run dedups
    assert 0 < row["dedup_ratio"] < 1
    assert row["total_bytes"] == sum(len(d["text"]) for d in docs)

    # no cross-doc duplication -> (almost) everything unique
    solo = cdc_chunk_dedup(rd.from_items(
        [{"doc_id": 1, "text": rand_text(3000)},
         {"doc_id": 2, "text": rand_text(3000)}]))
    assert solo.iloc[0]["dup_chunks"] <= 1


def test_cdc_chunk_dedup_deterministic(ray_session):
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import cdc_chunk_dedup

    docs = [{"doc_id": i, "text": f"doc {i} " * 50} for i in range(20)]
    a = cdc_chunk_dedup(rd.from_items(docs))
    b = cdc_chunk_dedup(rd.from_items(docs))
    pd.testing.assert_frame_equal(a, b)


def test_dup_graph_pagerank_matches_dense(ray_session):
    """Distributed PageRank equals a dense numpy power iteration on the
    same undirected graph."""
    import numpy as np
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import dup_graph_pagerank

    # docs engineered so the 4-gram Jaccard graph has real structure:
    # a hub text shared by docs 0-3, a pair 10/11, a loner 20
    hub = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [{"doc_id": i, "text": hub + f" tail{i}"} for i in range(4)]
    docs += [{"doc_id": 10, "text": "one two three four five six seven"},
             {"doc_id": 11, "text": "one two three four five six eight"},
             {"doc_id": 20, "text": "totally unrelated words only here"}]
    out = dup_graph_pagerank(rd.from_items(docs), iters=15)
    assert len(out) >= 2
    assert abs(out["pagerank"].sum() - 1.0) < 1e-6

    # dense reference on the identical edge set
    from ocr_agent_ray.pipelines.dedup import ngram_jaccard_all_pairs
    pairs = ngram_jaccard_all_pairs(rd.from_items(docs)).to_pandas()
    nodes = sorted(set(pairs["doc_id_a"]) | set(pairs["doc_id_b"]))
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    M = A / A.sum(axis=1, keepdims=True)
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(15):
        r = (1 - 0.85) / len(nodes) + 0.85 * (M.T @ r)
    got = out.set_index("doc_id")["pagerank"]
    for n in nodes:
        assert abs(got[n] - r[idx[n]]) < 1e-6, (n, got[n], r[idx[n]])

    # dataset-native path (forced): same graph, same ranks
    out_native = dup_graph_pagerank(rd.from_items(docs), iters=15,
                                    driver_max_edges=0, num_buckets=4)
    assert abs(out_native["pagerank"].sum() - 1.0) < 1e-6
    got_n = out_native.set_index("doc_id")["pagerank"]
    for n in nodes:
        assert abs(got_n[n] - r[idx[n]]) < 1e-6, (n, got_n[n], r[idx[n]])
    assert list(out_native["doc_id"]) == list(out["doc_id"])


def test_minhash_signatures_batch_matches_per_doc():
    """The batch flat-array MinHash (one rolling-hash pass + segmented
    mins) is value-identical to the per-doc path — including empty,
    shorter-than-k, duplicate-heavy, and multi-byte-unicode docs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_agent_ray.functions.hashing import (
        lsh_band_keys,
        lsh_band_keys_batch,
        minhash_signature,
        minhash_signatures_batch,
    )

    fixed = ["", "ab", "abcd", "abcde", "aaaaaaaaaa", BASE,
             "héllo wörld — ünïcode ≠ ascii ✓", "x" * 5, None,
             "tab\tand\nnewline chars", BASE + " tail", " " * 12]
    sigs = minhash_signatures_batch(fixed, k=5, num_perm=64)
    for i, t in enumerate(fixed):
        expect = minhash_signature(char_shingle_set(t or "", 5), 64)
        assert (sigs[i] == expect).all(), (i, t)
    keys = lsh_band_keys_batch(sigs, 16)
    for i in range(len(fixed)):
        assert list(keys[i]) == lsh_band_keys(sigs[i], 16), i

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(max_size=40), min_size=1, max_size=12),
           st.sampled_from([3, 5, 8]))
    def fuzz(texts, k):
        got = minhash_signatures_batch(texts, k=k, num_perm=16)
        for i, t in enumerate(texts):
            expect = minhash_signature(char_shingle_set(t, k), 16)
            assert (got[i] == expect).all(), (k, t)

    fuzz()


def test_ngram_containment_catches_partial_copy(ray_session):
    """A short doc quoted inside a much longer one: Jaccard dilutes below
    0.5 (small ∩ over a big ∪) but containment is exactly 1.0 — and the
    score equals the brute-force set computation."""
    from ocr_agent_ray.pipelines.dedup import (
        _word_ngram_hash_sets,
        ngram_containment_all_pairs,
        ngram_jaccard_all_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog again"
    filler = " ".join(f"word{i}" for i in range(80))
    docs = [
        {"doc_id": 1, "text": quote},
        {"doc_id": 2, "text": filler + " " + quote},
        {"doc_id": 3, "text": "totally unrelated content lives here okay"},
    ]
    cont = ngram_containment_all_pairs(
        rd.from_items(docs), threshold=0.8).to_pandas()
    assert [(r.doc_id_a, r.doc_id_b) for r in cont.itertuples()] == [(1, 2)]
    # doc 1's grams all appear in doc 2 except the boundary-crossing ones
    a, b = _word_ngram_hash_sets([docs[0]["text"], docs[1]["text"]], 4)
    expect = len(np.intersect1d(a, b)) / min(len(a), len(b))
    assert abs(cont["containment"].iloc[0] - expect) < 1e-9
    assert expect == 1.0  # every 4-gram of the quote is inside doc 2

    jac = ngram_jaccard_all_pairs(
        rd.from_items(docs), threshold=0.5).to_pandas()
    assert len(jac) == 0  # the partial copy is invisible to Jaccard ≥ 0.5


def test_dup_graph_kcore_matches_bruteforce_peel(ray_session):
    """k-core peel equals the brute-force sequential peel on the same
    near-dup edge set: the 4-doc template clique survives k=2 with
    in-core degree 3; the isolated pair and the loner peel away."""
    from ocr_agent_ray.pipelines.dedup import (
        dup_graph_kcore,
        ngram_jaccard_all_pairs,
    )

    hub = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [{"doc_id": i, "text": hub + f" tail{i}"} for i in range(4)]
    docs += [{"doc_id": 10, "text": "one two three four five six seven"},
             {"doc_id": 11, "text": "one two three four five six eight"},
             {"doc_id": 20, "text": "totally unrelated words only here"}]

    got = dup_graph_kcore(rd.from_items(docs), k=2).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    # brute-force peel on the identical pair set
    pairs = ngram_jaccard_all_pairs(rd.from_items(docs)).to_pandas()
    adj: dict = {}
    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < 2:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    want = sorted((n, len(v)) for n, v in adj.items())
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert want == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_dup_graph_kcore_empty_core(ray_session):
    """k larger than any degree peels everything → empty typed result."""
    from ocr_agent_ray.pipelines.dedup import dup_graph_kcore

    docs = [{"doc_id": 10, "text": "one two three four five six seven"},
            {"doc_id": 11, "text": "one two three four five six eight"}]
    out = dup_graph_kcore(rd.from_items(docs), k=5).to_pandas()
    assert len(out) == 0


def test_minhash_store_incremental_near_dup_admission(ray_session, tmp_path):
    """Incremental NEAR-dup admission: near-dups of earlier-admitted docs
    are rejected across waves AND within a wave (min-id wins); novel docs
    are admitted; re-admission is idempotent (stored self rejects)."""
    import numpy as np

    from ocr_agent_ray.pipelines.dedup import MinHashStore

    rng = np.random.default_rng(21)
    vocab = [f"tok{i}" for i in range(200)]

    def mk(seed_words, edit_at=None):
        w = list(seed_words)
        if edit_at is not None:
            w[edit_at] = "EDITED"
        return " ".join(w)

    base_a = list(rng.choice(vocab, size=80))
    base_b = list(rng.choice(vocab, size=80))
    base_c = list(rng.choice(vocab, size=80))

    store = MinHashStore(str(tmp_path / "state"), threshold=0.7,
                         num_buckets=8)

    wave1 = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [mk(base_a), mk(base_b), mk(base_a, edit_at=40)],
    })
    got1 = set(store.admit(rd.from_pandas(wave1)).to_pandas()["doc_id"])
    assert got1 == {1, 2}          # 3 is a near-dup of 1 (in-wave)

    wave2 = pd.DataFrame({
        "doc_id": [10, 11],
        "text": [mk(base_b, edit_at=10),   # near-dup of stored 2
                 mk(base_c)],              # novel
    })
    got2 = set(store.admit(rd.from_pandas(wave2)).to_pandas()["doc_id"])
    assert got2 == {11}

    # idempotent: stored self-signature rejects on re-admission
    got3 = store.admit(rd.from_pandas(wave2)).to_pandas()
    assert len(got3) == 0

    # no false rejects on genuinely distinct docs
    wave3 = pd.DataFrame({
        "doc_id": [20, 21],
        "text": [" ".join(rng.choice(vocab, size=80)) for _ in range(2)],
    })
    got4 = set(store.admit(rd.from_pandas(wave3)).to_pandas()["doc_id"])
    assert got4 == {20, 21}


def test_minhash_store_estimate_matches_pairwise(tmp_path):
    """The store's accept rule is the signature estimate — spot-check the
    bucket kernel agrees with the direct signature comparison."""
    import numpy as np

    from ocr_agent_ray.functions.hashing import (lsh_band_keys_batch,
                                                 minhash_signatures_batch)
    from ocr_agent_ray.pipelines.dedup import MinHashStore

    store = MinHashStore(str(tmp_path / "s"), threshold=0.5, num_buckets=4)
    texts = ["the quick brown fox jumps over the lazy dog " * 4,
             "the quick brown fox jumps over the lazy cat " * 4]
    sigs = minhash_signatures_batch(texts, k=store.shingle_k,
                                    num_perm=store.num_perm)
    est = float((sigs[0] == sigs[1]).mean())
    assert est >= 0.5  # near-dups by construction

    df = pd.DataFrame({"doc_id": [1, 2], "text": texts})
    rows = store._band_rows(df, "text", "doc_id")
    rejected = pd.concat([
        store._check_bucket(g)
        for _, g in rows.groupby("__b")], ignore_index=True)
    assert set(rejected["doc_id"]) == {2}
    # band keys really collide somewhere (the LSH route exists)
    keys = lsh_band_keys_batch(sigs, store.num_bands)
    assert (keys[0] == keys[1]).any()


def test_dup_graph_hops_chain_and_both_tiers(ray_session):
    """Planted A~B~C shingle chain (A!~C) plus an exact-dup pair:
    hop distances match the hand-derived BFS, and the dataset-native
    tier (driver_max_edges=0) agrees with the driver fast path."""
    from ocr_agent_ray.pipelines.dedup import dup_graph_hops

    w = [f"w{i}" for i in range(14)]
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [" ".join(w[0:10]),    # A
                 " ".join(w[2:12]),    # B: jaccard(A,B)=6/10
                 " ".join(w[4:14]),    # C: jaccard(B,C)=6/10, (A,C)=4/12
                 "zz yy xx ww vv uu tt ss rr qq",
                 "zz yy xx ww vv uu tt ss rr qq"],
    })
    want = {(1, 1, 0), (2, 1, 1), (3, 1, 2), (4, 4, 0), (5, 4, 1)}

    fast = dup_graph_hops(rd.from_pandas(docs))
    fast = fast if isinstance(fast, pd.DataFrame) else fast.to_pandas()
    assert set(map(tuple, fast[["doc_id", "root_id", "hops"]]
                   .to_numpy())) == want

    native = dup_graph_hops(rd.from_pandas(docs), driver_max_edges=0)
    native = native if isinstance(native, pd.DataFrame) \
        else native.to_pandas()
    assert set(map(tuple, native[["doc_id", "root_id", "hops"]]
                   .to_numpy())) == want


def test_neighbor_jaccard_triangle_and_pendant(ray_session):
    """Planted K3 (three identical docs) + an isolated exact-dup pair:
    every triangle edge has one common neighbor (J = 1/3), the pendant
    edge has none (J = 0, surviving the LEFT join with n_common 0)."""
    from ocr_agent_ray.pipelines.dedup import dup_graph_neighbor_jaccard

    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "one two three four five six seven eight nine"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [t1, t1, t1, t2, t2],
    })
    got = dup_graph_neighbor_jaccard(rd.from_pandas(docs))
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got = got.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    assert list(map(tuple, got[["doc_id_a", "doc_id_b"]].to_numpy())) \
        == [(1, 2), (1, 3), (2, 3), (4, 5)]
    assert got["n_common"].tolist() == [1, 1, 1, 0]
    assert got.loc[:2, "jaccard"].tolist() == [0.333333] * 3
    assert got.loc[3, "jaccard"] == 0.0


def test_clustering_coefficient_k3_path_pendant(ray_session):
    """Planted K3 (cc = 1 for all three), a path A-B-C (center has two
    neighbors but no closing edge -> cc = 0), and an isolated dup pair
    (degree 1 -> excluded by the deg >= 2 filter)."""
    from ocr_agent_ray.pipelines.dedup import (
        dup_graph_clustering_coefficient)

    k3 = "alpha beta gamma delta epsilon zeta eta theta"
    w = [f"w{i}" for i in range(14)]
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "text": [k3, k3, k3,                 # K3: 1-2, 1-3, 2-3
                 " ".join(w[0:10]),          # path: 4-5, 5-6 (not 4-6)
                 " ".join(w[2:12]),
                 " ".join(w[4:14]),
                 "zz yy xx ww vv uu tt ss",  # pendant pair 7-8
                 "zz yy xx ww vv uu tt ss"],
    })
    got = dup_graph_clustering_coefficient(rd.from_pandas(docs))
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [1, 2, 3, 5]
    assert got["degree"].tolist() == [2, 2, 2, 2]
    assert got["triangles"].tolist() == [1, 1, 1, 0]
    assert got["clustering_coeff"].tolist() == [1.0, 1.0, 1.0, 0.0]


def test_shared_ngram_pairs_cache(ray_session, tmp_path):
    """VERDICT r4 #1: the persisted pair table is value-identical to a
    fresh build, serves cache hits without rebuilding, and a
    regenerated corpus invalidates it (content fingerprint)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_agent_ray.pipelines.dedup import (ngram_jaccard_all_pairs,
                                               shared_ngram_pairs)

    texts = [BASE, BASE, BASE.replace("dog", "cat"),
             "totally different words entirely unrelated content here"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    root = str(tmp_path / "paircache")

    fresh = (ngram_jaccard_all_pairs(
        rd.read_parquet(str(tmp_path / "documents.parquet")))
        .to_pandas().sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True))
    c1 = (shared_ngram_pairs(str(tmp_path), cache_root=root).to_pandas()
          .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True))
    c2 = (shared_ngram_pairs(str(tmp_path), cache_root=root).to_pandas()
          .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(fresh, c1[fresh.columns])
    pd.testing.assert_frame_equal(fresh, c2[fresh.columns])
    assert len(fresh) >= 2  # the planted exact + near pairs

    # regenerate the corpus -> the cache must rebuild, not serve stale
    df2 = pd.DataFrame({"doc_id": [0, 1], "text": ["x y z w", "a b c d"]})
    pq.write_table(pa.Table.from_pandas(df2, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    c3 = shared_ngram_pairs(str(tmp_path), cache_root=root)
    assert c3.count() == 0  # no shared 4-grams in the regenerated corpus

    # empty pair set keeps the declared Dataset schema (to_pandas() of
    # an empty Dataset drops columns — a Ray quirk, so check the schema)
    assert c3.schema().names == ["doc_id_a", "doc_id_b", "jaccard"]


def test_harmonic_2hop_path_and_clique(ray_session):
    """Planted 5-node path (each end sees one node at distance 2, the
    center sees two) + a K3 whose N2 is empty (h2 collapses to the
    degree) — hand-computed h2 = deg + 0.5*|N2|."""
    from ocr_agent_ray.pipelines.dedup import dup_graph_harmonic_2hop

    k3 = "alpha beta gamma delta epsilon zeta eta theta"
    w = [f"w{i}" for i in range(18)]
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "text": [" ".join(w[0:10]), " ".join(w[2:12]),
                 " ".join(w[4:14]), " ".join(w[6:16]),
                 " ".join(w[8:18]),                     # path 1-2-3-4-5
                 k3, k3, k3],                           # K3: 6,7,8
    })
    got = dup_graph_harmonic_2hop(rd.from_pandas(docs))
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [1, 2, 3, 4, 5, 6, 7, 8]
    assert got["n_dist1"].tolist() == [1, 2, 2, 2, 1, 2, 2, 2]
    assert got["n_dist2"].tolist() == [1, 1, 2, 1, 1, 0, 0, 0]
    assert got["harmonic_2hop"].tolist() == \
        [1.5, 2.5, 3.0, 2.5, 1.5, 2.0, 2.0, 2.0]


def test_assortativity_star_and_clique(ray_session):
    """A star K_{1,3} is maximally disassortative (r = -1); adding a
    disjoint K3 (all degrees equal inside it) keeps every K3 edge at
    zero variance contribution and the pooled r matches the explicit
    Pearson over the symmetrized edge list."""
    from ocr_agent_ray.pipelines.dedup import dup_graph_assortativity

    import ray.data as rd2

    pairs = pd.DataFrame({
        "doc_id_a": [1, 1, 1],
        "doc_id_b": [2, 3, 4],
        "jaccard": [0.9, 0.9, 0.9]})
    got = dup_graph_assortativity(None, pairs=rd2.from_pandas(pairs))
    assert got["n_edges_directed"].tolist() == [6]
    assert got["assortativity"].tolist() == [-1.0]

    pairs2 = pd.concat([pairs, pd.DataFrame({
        "doc_id_a": [10, 10, 11],
        "doc_id_b": [11, 12, 12],
        "jaccard": [0.9, 0.9, 0.9]})], ignore_index=True)
    got = dup_graph_assortativity(None, pairs=rd2.from_pandas(pairs2))
    # explicit reference over the 12 directed edges
    deg = {1: 3, 2: 1, 3: 1, 4: 1, 10: 2, 11: 2, 12: 2}
    xs, ys = [], []
    for a, b in zip(pairs2["doc_id_a"], pairs2["doc_id_b"]):
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    x = np.array(xs, dtype=np.float64)
    y = np.array(ys, dtype=np.float64)
    n = len(x)
    r = ((n * (x * y).sum() - x.sum() * y.sum())
         / (np.sqrt(n * (x * x).sum() - x.sum() ** 2)
            * np.sqrt(n * (y * y).sum() - y.sum() ** 2)))
    assert got["n_edges_directed"].tolist() == [12]
    assert got["assortativity"].tolist() == [round(r, 6)]
