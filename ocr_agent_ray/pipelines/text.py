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
