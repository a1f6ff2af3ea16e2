"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding cosine.

Shuffle discipline (the thing that matters at 100 TB):
- exact: hash inside map_batches, ONE groupby(fingerprint) with per-group
  first-wins — rows carrying only (fingerprint, doc_id) through the wire.
- MinHash-LSH: shingle→signature per batch (no shuffle), explode to
  (band_key, doc_id) rows, ONE groupby(band_key) producing candidate
  pairs, then verify exact Jaccard. Bucket caps guard degenerate keys.
- SimHash: 64-bit signature per batch, pigeonhole bands, same band-groupby.
- embedding near-dup: blocked by ``label`` (the blocking key) —
  groupby(label) then an in-group double-precision cosine matrix.

Candidate verification here rejoins texts via a driver-side broadcast
(fine up to ~10^6 docs of metadata); the documented scale path swaps the
broadcast for two bucket_hash_joins (pipelines/joins.py) on doc_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ocr_agent_ray.functions.hashing import (
    char_shingle_set,
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    simhash_band_keys,
)
from ocr_agent_ray.functions.textstats import md5_fingerprint

_PAIR_COLS = ["doc_id_a", "doc_id_b"]
MAX_BUCKET = 256  # candidate-bucket cap: a bucket this hot is degenerate text


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the minimum id per identical (normalized) text.

    Reference analog: first-wins work dedup (.processed markers / page-PNG
    cache, SURVEY.md §2.7), as data: hash-partition + per-group min.
    """

    def _fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "fingerprint": md5_fingerprint(batch[text_col]),
            }
        )

    from ray.data.aggregate import Min

    return (
        ds.map_batches(_fp, batch_format="pandas")
        .groupby("fingerprint")
        .aggregate(Min(id_col, alias_name=id_col))
    )


def _pairs_from_bucket(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    ids = sorted(g[id_col].unique())
    if len(ids) < 2 or len(ids) > MAX_BUCKET:
        return pd.DataFrame(columns=_PAIR_COLS)
    a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
    return pd.DataFrame({"doc_id_a": a, "doc_id_b": b})


def minhash_candidates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, num_bands: int = 16, k: int = 5):
    """(doc_id_a, doc_id_b) candidate near-dup pairs via MinHash banding."""

    def _bands(batch: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_key = [], []
        for did, text in zip(batch[id_col], batch[text_col]):
            sig = minhash_signature(char_shingle_set(text or "", k), num_perm)
            for key in lsh_band_keys(sig, num_bands):
                rows_id.append(did)
                rows_key.append(np.uint64(key))
        return pd.DataFrame({id_col: rows_id, "band_key": np.array(rows_key, dtype=np.uint64)})

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_from_bucket(g, id_col)

    pairs = (
        ds.map_batches(_bands, batch_format="pandas")
        .groupby("band_key")
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    # one row per distinct pair (a pair can fire in many bands)
    return pairs.groupby(_PAIR_COLS).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def minhash_lsh_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.7, num_perm: int = 64,
                      num_bands: int = 16, k: int = 5):
    """Verified near-dup pairs: LSH candidates filtered by exact Jaccard ≥ t.

    Verification broadcasts an id→shingle-set map built from the (small)
    candidate id set; at 100 TB swap for bucket joins on doc_id.
    """
    import ray

    cands = minhash_candidates(
        ds, text_col=text_col, id_col=id_col,
        num_perm=num_perm, num_bands=num_bands, k=k,
    ).materialize()
    need = set()
    for row in cands.take_all():
        need.add(row["doc_id_a"])
        need.add(row["doc_id_b"])
    if not need:
        return cands

    shingles: dict = {}
    for batch in ds.iter_batches(batch_format="pandas", batch_size=4096):
        m = batch[batch[id_col].isin(need)]
        for did, text in zip(m[id_col], m[text_col]):
            shingles[did] = char_shingle_set(text or "", k)
    ref = ray.put(shingles)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(ref)
        sims = [
            jaccard(sh[a], sh[b])
            for a, b in zip(batch["doc_id_a"], batch["doc_id_b"])
        ]
        batch = batch.copy()
        batch["jaccard"] = np.round(sims, 6)
        return batch[batch["jaccard"] >= threshold]

    return cands.map_batches(_verify, batch_format="pandas")


def simhash_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, num_bands: int = 4):
    """Near-dup pairs by SimHash: banded candidates, verified Hamming ≤ d.

    Pigeonhole: distance < num_bands guarantees a shared band. The
    signature travels with the band rows, so verification needs no rejoin.
    """

    def _bands(batch: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_key, rows_sig = [], [], []
        for did, text in zip(batch[id_col], batch[text_col]):
            sig = simhash64(text or "")
            for key in simhash_band_keys(sig, num_bands):
                rows_id.append(did)
                rows_key.append(np.uint64(key))
                rows_sig.append(np.uint64(sig))
        return pd.DataFrame(
            {id_col: rows_id,
             "band_key": np.array(rows_key, dtype=np.uint64),
             "sig": np.array(rows_sig, dtype=np.uint64)}
        )

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates(id_col).sort_values(id_col)
        ids = rows[id_col].tolist()
        sigs = rows["sig"].tolist()
        if len(ids) < 2 or len(ids) > MAX_BUCKET:
            return pd.DataFrame(columns=_PAIR_COLS + ["hamming"])
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = hamming64(int(sigs[i]), int(sigs[j]))
                if h <= max_hamming:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_h.append(h)
        return pd.DataFrame({"doc_id_a": out_a, "doc_id_b": out_b, "hamming": out_h})

    pairs = (
        ds.map_batches(_bands, batch_format="pandas")
        .groupby("band_key")
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(_PAIR_COLS).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def embedding_near_dup(ds, *, threshold: float = 0.95, id_col: str = "vec_id",
                       vec_col: str = "embedding", block_col: str = "label"):
    """Near-dup pairs by embedding cosine within a blocking key.

    groupby(block_col) then a double-precision cosine matrix per block —
    the standard blocked all-pairs pattern. Scores rounded to 6 so the
    DuckDB list_cosine_similarity oracle hashes identically.
    """

    def _block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        cos = unit @ unit.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = cos[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "vec_id_a": ids[iu[keep]],
                "vec_id_b": ids[ju[keep]],
                "cosine": np.round(cos[iu, ju][keep], 6),
            }
        )

    return ds.groupby(block_col).map_groups(_block_pairs, batch_format="pandas")


def ngram_jaccard_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5):
    """Word n-gram Jaccard near-dup pairs (LSH-free small-scale variant):
    candidates = docs sharing any n-gram hash band via minhash, verified on
    word-ngram sets."""

    def _ngram_set(text: str) -> np.ndarray:
        from ocr_agent_ray.functions.hashing import rolling_hashes

        toks = (text or "").lower().split()
        joined = "\x00".join(toks)
        # hash every n-token window by hashing the joined string windows
        grams = [" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))]
        if not grams:
            return np.empty(0, dtype=np.uint64)
        arr = np.unique(
            np.concatenate([rolling_hashes(g, len(g.encode())) for g in grams if g])
        )
        return arr

    import ray

    cands = minhash_candidates(ds, text_col=text_col, id_col=id_col).materialize()
    need = set()
    for row in cands.take_all():
        need.add(row["doc_id_a"]); need.add(row["doc_id_b"])
    if not need:
        return cands
    sets: dict = {}
    for batch in ds.iter_batches(batch_format="pandas", batch_size=4096):
        m = batch[batch[id_col].isin(need)]
        for did, text in zip(m[id_col], m[text_col]):
            sets[did] = _ngram_set(text)
    ref = ray.put(sets)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        ss = ray.get(ref)
        sims = [jaccard(ss[a], ss[b]) for a, b in zip(batch["doc_id_a"], batch["doc_id_b"])]
        batch = batch.copy()
        batch["jaccard"] = np.round(sims, 6)
        return batch[batch["jaccard"] >= threshold]

    return cands.map_batches(_verify, batch_format="pandas")
