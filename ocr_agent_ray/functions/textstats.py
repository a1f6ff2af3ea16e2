"""Vectorized text-analysis kernels: tokens, quality, language-ID, fingerprints.

These extend the engine beyond the reference's operator set toward what a
large-scale training-data pipeline needs (driver brief). All kernels are
batch-vectorized (pandas str / numpy); regexes are ASCII-classed (`[0-9A-Za-z_]`)
so Ray and the DuckDB (RE2) oracle agree on tokenization.

Rounding: DuckDB ROUND is half-away-from-zero while Python/numpy round
half-even; :func:`round_half_away` reproduces DuckDB so value hashes match.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from ocr_agent_ray.functions.hashing import rolling_hashes

TOKEN_RE = r"[0-9A-Za-z_]+"

# BPE-ish pre-tokenizer: GPT-2-style contraction/word/punct splitting,
# simplified to RE2-compatible alternation (no lookaheads) so the DuckDB
# oracle tokenizes identically. Alternation order is load-bearing.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[0-9A-Za-z]+| ?[^\s0-9A-Za-z]+"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

# per-language marker words for the n-gram/marker language heuristic
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it was for on are with as his they at be this have from".split()),
    "de": frozenset("der die das und ist nicht ich sie mit ein eine den dem zu auf für von werden".split()),
    "fr": frozenset("le la les et de des un une est que pour dans qui sur pas avec ce il au du".split()),
    "es": frozenset("el la los las y de un una es que por para con no se su al lo como más".split()),
    "it": frozenset("il la le e di un una è che per con non si del alla sono come più anche".split()),
}

_LANG_TRIGRAMS: dict[str, frozenset[str]] = {
    "en": frozenset(["the", "ing", "and", "ion", "tio", "ent", "ati", "for"]),
    "de": frozenset(["der", "ein", "ich", "nde", "sch", "die", "den", "cht"]),
    "fr": frozenset(["les", "ent", "des", "que", "ait", "eur", "our", "ais"]),
    "es": frozenset(["que", "ión", "los", "ado", "con", "por", "ent", "una"]),
    "it": frozenset(["che", "ione", "ell", "per", "con", "ato", "gli", "are"]),
}


def round_half_away(x: np.ndarray | float, digits: int = 6):
    """DuckDB-compatible ROUND (ties away from zero)."""
    scale = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def token_counts(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.count(TOKEN_RE).astype("int64")


def bpe_token_counts(texts: pd.Series) -> pd.Series:
    """Token counts under the BPE-ish pre-tokenizer (the brief's
    'whitespace + a BPE-ish regex' counting)."""
    return texts.fillna("").str.count(BPE_TOKEN_RE).astype("int64")


def stopword_ratios(texts: pd.Series) -> pd.Series:
    toks = texts.fillna("").str.lower().str.findall(TOKEN_RE)
    toks.index = pd.RangeIndex(len(toks))
    n_tok = toks.str.len().clip(lower=1)
    # vectorized membership: explode tokens, isin, re-aggregate by row
    ex = toks.explode().dropna()
    n_stop = ex.isin(STOPWORDS).groupby(level=0).sum()
    n_stop = n_stop.reindex(toks.index, fill_value=0)
    out = n_stop / n_tok
    out.index = texts.index
    return out


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """n_chars, n_tokens, stop_ratio, quality_score (all SQL-expressible).

    quality_score = round(0.5*min(n_tokens,100)/100 + 0.5*stop_ratio, 6):
    a crude length x natural-language-ness score in [0,1].
    """
    t = texts.fillna("")
    n_chars = t.str.len().astype("int64")
    n_tokens = token_counts(t)
    stop_ratio = round_half_away(stopword_ratios(t).to_numpy(), 6)
    score = round_half_away(
        0.5 * np.minimum(n_tokens.to_numpy(), 100) / 100.0 + 0.5 * stop_ratio, 6
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "stop_ratio": stop_ratio,
            "quality_score": score,
        },
        index=t.index,
    )


def detect_language(text: str) -> tuple[str, float]:
    """Marker-word + character-trigram language heuristic.

    Scores each candidate language by marker-word hits (weight 2) and
    trigram hits (weight 1), normalized by token count; returns
    (best_lang, score). 'und' (undetermined) when nothing scores.
    """
    words = [w for w in text.lower().split() if w]
    if not words:
        return ("und", 0.0)
    tris: set[str] = set()
    for w in words[:200]:
        for i in range(len(w) - 2):
            tris.add(w[i : i + 3])
    best_lang, best = "und", 0.0
    for lang in sorted(_LANG_MARKERS):
        mw = sum(1 for w in words[:200] if w in _LANG_MARKERS[lang])
        tg = len(tris & _LANG_TRIGRAMS[lang])
        score = (2.0 * mw + tg) / (len(words[:200]) + 1)
        if score > best:
            best_lang, best = lang, score
    return (best_lang, float(round_half_away(best, 6)))


def detect_language_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized :func:`detect_language` over a batch.

    Same scores bit-for-bit (marker words weight 2, distinct-trigram hits
    weight 1, normalized by capped token count; first language in sorted
    order wins ties), but computed with explode/isin/groupby instead of a
    Python loop per row. Returns (lang_pred, lang_score).
    """
    t = texts.fillna("").str.lower()
    words = t.str.split().str[:200]
    words.index = pd.RangeIndex(len(words))
    n_words = words.str.len().fillna(0).astype("int64")
    ex = words.explode().dropna()
    ex = ex[ex != ""]

    langs = sorted(_LANG_MARKERS)
    n = len(t)
    scores = np.zeros((n, len(langs)), dtype=np.float64)

    # marker-word hits per language (weight 2)
    for j, lang in enumerate(langs):
        hits = ex.isin(_LANG_MARKERS[lang]).groupby(level=0).sum()
        scores[hits.index.to_numpy(), j] += 2.0 * hits.to_numpy(dtype=np.float64)

    # distinct character trigrams per doc, matched against each language set
    if len(ex):
        maxlen = int(ex.str.len().max())
        parts = []
        for i in range(max(0, maxlen - 2)):
            s = ex.str[i : i + 3]
            parts.append(s[s.str.len() == 3])
        if parts:
            tris = pd.concat(parts)
            tdf = pd.DataFrame({"doc": tris.index.to_numpy(),
                                "tri": tris.to_numpy()}).drop_duplicates()
            for j, lang in enumerate(langs):
                tg = tdf.loc[tdf["tri"].isin(_LANG_TRIGRAMS[lang])] \
                        .groupby("doc").size()
                scores[tg.index.to_numpy(), j] += tg.to_numpy(dtype=np.float64)

    scores /= (n_words.to_numpy() + 1)[:, None]
    best = scores.max(axis=1)
    pred = np.where(best > 0, np.asarray(langs, dtype=object)[scores.argmax(axis=1)],
                    "und")
    return pd.DataFrame(
        {"lang_pred": pred, "lang_score": round_half_away(best, 6)},
        index=texts.index,
    )


def md5_fingerprint(texts: pd.Series, normalize: bool = True) -> pd.Series:
    """Content fingerprint: md5 hex of the (optionally normalized) text.

    Normalization = lowercase + collapse whitespace runs to single spaces +
    strip — expressible in DuckDB as
    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))).
    The whitespace class is pinned to RE2's ASCII \\s ([\\t\\n\\f\\r ]) and
    the strip to plain spaces (DuckDB TRIM), so texts containing Unicode
    whitespace (NBSP, \\x0b) fingerprint identically on both sides.
    """
    t = texts.fillna("")
    if normalize:
        t = t.str.lower().str.replace(r"[\t\n\f\r ]+", " ", regex=True).str.strip(" ")
    return pd.Series(
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t],
        index=texts.index, dtype="object",
    )


"""PII scrubbing + repetition-quality kernels (C4/Gopher-style filters).

RE2-compatible patterns (no lookaheads/backrefs) so the DuckDB oracle
applies the IDENTICAL regexes with regexp_replace(..., 'g').
Order is load-bearing: emails before phones (an email's digits must not
be half-eaten by the phone pattern).
"""

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone",
     r"(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
     "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)

_PII_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def scrub_pii(texts: pd.Series) -> pd.DataFrame:
    """Redact emails / phone numbers / IPv4s; returns (clean_text,
    n_redactions). Vectorized pandas str.replace per pattern."""
    t = texts.fillna("")
    total = np.zeros(len(t), dtype=np.int64)
    for _name, pat, repl in _PII_COMPILED:
        total += t.str.count(pat).to_numpy(dtype=np.int64)
        t = t.str.replace(pat, repl, regex=True)
    return pd.DataFrame({"clean_text": t, "n_redactions": total},
                        index=texts.index)


def repetition_features(texts: pd.Series) -> pd.DataFrame:
    """Gopher-style repetition signals per doc (all SQL-expressible):

    - dup_word_ratio: 1 - distinct_words/words (0 when empty)
    - top_word_ratio: most frequent word count / words (0 when empty)

    Computed with explode + groupby (no per-row Python loop).
    """
    toks = texts.fillna("").str.lower().str.findall(TOKEN_RE)
    toks.index = pd.RangeIndex(len(toks))
    n = toks.str.len()
    ex = toks.explode().dropna()
    grp = ex.groupby(level=0)
    distinct = grp.nunique().reindex(toks.index, fill_value=0)
    top = (
        ex.to_frame("w").groupby([ex.index, "w"]).size()
        .groupby(level=0).max().reindex(toks.index, fill_value=0)
    )
    denom = n.clip(lower=1).to_numpy()
    out = pd.DataFrame(
        {
            "n_words": n.to_numpy(dtype=np.int64),
            "dup_word_ratio": round_half_away(
                1.0 - distinct.to_numpy() / denom, 6) * (n.to_numpy() > 0),
            "top_word_ratio": round_half_away(
                top.to_numpy() / denom, 6),
        },
        index=texts.index,
    )
    return out


def alnum_ratios(texts: pd.Series) -> pd.Series:
    """Alphanumeric-character fraction of each doc (C4-ish signal)."""
    t = texts.fillna("")
    n_alnum = t.str.count(r"[0-9A-Za-z]")
    return pd.Series(
        round_half_away(n_alnum.to_numpy() / t.str.len().clip(lower=1).to_numpy(), 6),
        index=texts.index,
    )


def gopher_features(texts: pd.Series) -> pd.DataFrame:
    """Gopher-style (Rae et al. 2021, §A1.1) document-quality signals, all
    SQL-expressible so the DuckDB oracle checks them exactly:

    - n_words: TOKEN_RE tokens;
    - mean_word_len: word chars / n_words (word chars == sum of token
      lengths because every ``[0-9A-Za-z_]`` char is in exactly one token);
    - symbol_ratio: ('#' count + non-overlapping '...' count) / n_words;
    - bullet_ratio / ellipsis_ratio: fraction of lines starting with a
      bullet / ending with '...';
    - alpha_word_ratio: fraction of words containing >= 1 [A-Za-z];
    - keep: the Gopher rule conjunction over the ROUNDED ratios (both
      sides compare the same 6-dp values, so the boundary is stable).
    """
    t = texts.fillna("")
    n_words = t.str.count(TOKEN_RE).astype("int64")
    denom_w = n_words.clip(lower=1).to_numpy(dtype=np.float64)
    word_chars = t.str.count(r"[0-9A-Za-z_]").to_numpy(dtype=np.float64)
    mean_word_len = round_half_away(word_chars / denom_w, 6)
    symbols = (t.str.count("#") + t.str.count(r"\.\.\.")).to_numpy(np.float64)
    symbol_ratio = round_half_away(symbols / denom_w, 6)
    n_lines = (t.str.count("\n") + 1).to_numpy(dtype=np.float64)
    bullet_lines = t.str.count(r"(?m)^[ \t]*[-*•]").to_numpy(np.float64)
    ellipsis_lines = t.str.count(r"(?m)\.\.\.$").to_numpy(np.float64)
    bullet_ratio = round_half_away(bullet_lines / n_lines, 6)
    ellipsis_ratio = round_half_away(ellipsis_lines / n_lines, 6)

    # words containing at least one letter (explode + contains + regroup)
    toks = t.str.findall(TOKEN_RE)
    toks.index = pd.RangeIndex(len(toks))
    ex = toks.explode().dropna()
    if len(ex):
        alpha = ex.str.contains(r"[A-Za-z]").groupby(level=0).sum()
        alpha = alpha.reindex(toks.index, fill_value=0).to_numpy(np.float64)
    else:
        alpha = np.zeros(len(toks), dtype=np.float64)
    alpha_word_ratio = round_half_away(alpha / denom_w, 6)

    nw = n_words.to_numpy()
    keep = (
        (nw >= 50) & (nw <= 100_000)
        & (mean_word_len >= 3) & (mean_word_len <= 10)
        & (symbol_ratio < 0.1)
        & (bullet_ratio <= 0.9)
        & (ellipsis_ratio <= 0.3)
        & (alpha_word_ratio >= 0.8)
    )
    return pd.DataFrame(
        {
            "n_words": n_words.to_numpy(),
            "mean_word_len": mean_word_len,
            "symbol_ratio": symbol_ratio,
            "bullet_ratio": bullet_ratio,
            "ellipsis_ratio": ellipsis_ratio,
            "alpha_word_ratio": alpha_word_ratio,
            "keep": pd.array(keep, dtype="bool"),
        },
        index=texts.index,
    )


def c4_line_filter(texts: pd.Series, min_words: int = 5) -> pd.DataFrame:
    """C4-style (Raffel et al. 2020, §2.2) line-level cleaning: keep only
    lines that end in terminal punctuation ([.!?"]) AND have >= min_words
    tokens; rebuild clean_text; flag docs containing '{', 'lorem ipsum' or
    'javascript' (case-insensitive). All SQL-expressible (string_split +
    generate_subscripts + ordered string_agg in DuckDB)."""
    t = texts.fillna("")
    lines = t.str.split("\n")
    lines.index = pd.RangeIndex(len(lines))
    ex = lines.explode()
    mask = ex.str.contains(r'[.!?"]$', regex=True, na=False) & (
        ex.str.count(TOKEN_RE) >= min_words
    )
    kept = ex[mask]
    clean = kept.groupby(level=0).agg("\n".join).reindex(
        lines.index, fill_value="")
    n_kept = mask.groupby(level=0).sum().reindex(lines.index, fill_value=0)
    low = t.str.lower()
    return pd.DataFrame(
        {
            "clean_text": clean.to_numpy(dtype=object),
            "n_kept_lines": n_kept.to_numpy(dtype=np.int64),
            "n_lines": lines.str.len().to_numpy(dtype=np.int64),
            "has_brace": pd.array(t.str.contains("{", regex=False), dtype="bool"),
            "has_lorem": pd.array(
                low.str.contains("lorem ipsum", regex=False), dtype="bool"),
            "has_javascript": pd.array(
                low.str.contains("javascript", regex=False), dtype="bool"),
        },
        index=texts.index,
    )


_TOKEN_COMPILED = re.compile(TOKEN_RE)


def word_ngrams(text: str, n: int = 8) -> list[str]:
    """Token n-grams as strings (decontamination unit); tokens are the
    ASCII TOKEN_RE class so SQL tokenizes identically."""
    toks = _TOKEN_COMPILED.findall((text or "").lower())
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def rolling_fingerprint(text: str, window: int = 16, mod_select: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: polynomial rolling hashes over
    byte windows, keeping hashes ≡ 0 (mod mod_select). Not SQL-expressible;
    golden-tested in pytest."""
    h = rolling_hashes(text, window)
    if h.size == 0:
        return []
    kept = h[h % mod_select == 0]
    return sorted(set(int(v) for v in kept))
