"""Text-analysis pipelines over a flat documents table.

Operate on ``documents(doc_id, text, lang, source, n_chars)``
(/root/testdata layout); every stage is a vectorized ``map_batches``.
Regex/setup state (compiled patterns, marker tables) is module-level —
loaded once per worker process, not per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ocr_agent_ray.sources.readers import read_table

from ocr_agent_ray.functions.textstats import (
    detect_language,
    md5_fingerprint,
    quality_features,
    rolling_fingerprint,
)


def _read_documents(sf_dir: str, columns=("doc_id", "text")):
    return read_table(sf_dir, "documents", list(columns))


def quality_scores(sf_dir: str):
    """doc_id + n_chars/n_tokens/stop_ratio/quality_score per document."""

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        feats = quality_features(batch["text"])
        feats.insert(0, "doc_id", batch["doc_id"])
        return feats

    return _read_documents(sf_dir).map_batches(_score, batch_format="pandas")


def token_count_total(sf_dir: str):
    """Corpus-wide token count grouped by source — partial aggregation
    inside map_batches (one row per source per batch), then a tiny groupby:
    the pre-aggregate pattern for shuffle-free counting at scale."""

    from ocr_agent_ray.functions.textstats import token_counts
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    def _count(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(n_tokens=token_counts(batch["text"]))

    return combine_partials_driver(
        _read_documents(sf_dir, columns=("doc_id", "text", "source")).map_batches(
            _count, batch_format="pandas"
        ),
        ["source"],
        {"n_tokens": ("n_tokens", "sum")},
    )


def bpe_token_counts_per_doc(sf_dir: str):
    """Per-doc BPE-ish token counts (SQL oracle uses the identical
    RE2-compatible pattern)."""
    from ocr_agent_ray.functions.textstats import bpe_token_counts

    def _count(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": bpe_token_counts(batch["text"]),
        })

    return _read_documents(sf_dir).map_batches(_count, batch_format="pandas")


def language_id(sf_dir: str):
    """Heuristic language-ID per doc (marker words + char trigrams).

    Not SQL-expressible — golden-tested on multilingual fixtures in pytest.
    """

    from ocr_agent_ray.functions.textstats import detect_language_batch

    def _lid(batch: pd.DataFrame) -> pd.DataFrame:
        out = detect_language_batch(batch["text"])
        out.insert(0, "doc_id", batch["doc_id"])
        return out

    return _read_documents(sf_dir).map_batches(_lid, batch_format="pandas")


def fingerprints(sf_dir: str):
    """md5 content fingerprint per doc (SQL-checkable against DuckDB md5)."""

    def _fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": md5_fingerprint(batch["text"]),
            }
        )

    return _read_documents(sf_dir).map_batches(_fp, batch_format="pandas")


def winnowing_fingerprints(sf_dir: str):
    """Winnowing-style rolling-hash fingerprints (count per doc exposed;
    the full sets feed near-dup detection). Rows-only oracle."""

    def _fp(batch: pd.DataFrame) -> pd.DataFrame:
        counts = np.fromiter(
            (len(rolling_fingerprint(t or "")) for t in batch["text"]),
            dtype=np.int64, count=len(batch),
        )
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "n_fingerprints": counts}
        )

    return _read_documents(sf_dir).map_batches(_fp, batch_format="pandas")


def pii_scrub(sf_dir: str):
    """Redact emails/phones/IPv4s per doc; (doc_id, clean_text,
    n_redactions). Oracle: the identical RE2 regexp_replace chain in
    DuckDB; planted-PII goldens in pytest (testdata is PII-free)."""
    from ocr_agent_ray.functions.textstats import scrub_pii

    def _scrub(batch: pd.DataFrame) -> pd.DataFrame:
        out = scrub_pii(batch["text"])
        out.insert(0, "doc_id", batch["doc_id"])
        return out

    return _read_documents(sf_dir).map_batches(_scrub, batch_format="pandas")


def repetition_scores(sf_dir: str):
    """Gopher-style repetition signals (dup-word ratio, top-word ratio)
    per doc — SQL-expressible via unnest of the token list."""
    from ocr_agent_ray.functions.textstats import repetition_features

    def _rep(batch: pd.DataFrame) -> pd.DataFrame:
        out = repetition_features(batch["text"])
        out.insert(0, "doc_id", batch["doc_id"])
        return out

    return _read_documents(sf_dir).map_batches(_rep, batch_format="pandas")


def alnum_filter(sf_dir: str, threshold: float = 0.8):
    """C4-style filter: docs whose alphanumeric fraction >= threshold,
    with the ratio exposed."""
    from ocr_agent_ray.functions.textstats import alnum_ratios

    def _ratio(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "alnum_ratio": alnum_ratios(batch["text"]),
        })
        return out[out["alnum_ratio"] >= threshold]

    return _read_documents(sf_dir).map_batches(_ratio, batch_format="pandas")


def chars_quantiles_by_source(sf_dir: str):
    """Exact per-source length quantiles (median + p90, linear
    interpolation == DuckDB quantile_cont). Small group count -> one
    groupby, vectorized numpy quantile per group; at larger key
    cardinality the same shape hash-partitions by source."""

    from ocr_agent_ray.functions.textstats import round_half_away

    def _q(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_chars"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "n_docs": [len(g)],
            "median_chars": [float(round_half_away(np.quantile(v, 0.5), 6))],
            "p90_chars": [float(round_half_away(np.quantile(v, 0.9), 6))],
        })

    return (
        _read_documents(sf_dir, columns=("doc_id", "source", "n_chars"))
        .groupby("source")
        .map_groups(_q, batch_format="pandas")
    )


def decontaminate(sf_dir: str, *, n: int = 8, benchmark_mod: int = 97):
    """Training-set decontamination: drop docs sharing any word n-gram
    with a benchmark set (here: docs with doc_id % benchmark_mod == 0,
    standing in for an eval suite). Benchmark n-grams are collected once
    and broadcast (benchmark sets are small by construction); the corpus
    streams through a membership filter. Returns surviving doc_ids with
    their overlap count (0 by construction) plus dropped contaminated ids
    flagged — emitted as (doc_id, contaminated)."""
    import ray

    from ocr_agent_ray.functions.textstats import word_ngrams

    docs = _read_documents(sf_dir)

    bench = docs.map_batches(
        lambda b: b[b["doc_id"] % benchmark_mod == 0], batch_format="pandas")
    grams: set = set()
    for b in bench.iter_batches(batch_format="pandas", batch_size=4096):
        for did, text in zip(b["doc_id"], b["text"]):
            grams.update(word_ngrams(text, n))
    ref = ray.put(grams)

    def _flag(batch: pd.DataFrame) -> pd.DataFrame:
        gset = ray.get(ref)
        contaminated = [
            any(g in gset for g in word_ngrams(t, n)) for t in batch["text"]
        ]
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "contaminated": pd.array(contaminated, dtype="bool"),
        })

    return docs.map_batches(_flag, batch_format="pandas")
