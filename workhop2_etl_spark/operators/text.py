"""Text-analysis operators for LLM training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language
identification, quality scoring, token counting, and document
fingerprinting over a `documents(text)` table. All pure column
expressions — at 100 TB these run inside whole-stage codegen with
zero Python in the hot path; nothing here shuffles (per-row only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------


def tokens(c: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array
    (split('') would yield [''])."""
    t = F.trim(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


#: A BPE-ish subword proxy: alternating letter-runs / digit-runs /
#: single punctuation marks — the standard cheap stand-in for a real
#: tokenizer when estimating token budgets at corpus scale.
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpeish_token_count(c: Column) -> Column:
    """Count of BPE-ish units (regexp_count — one pass, no array)."""
    return F.regexp_count(c, F.lit(_BPE_ISH))


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword / repetition ratios)
# ---------------------------------------------------------------------------

_STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]


def punct_ratio(c: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, stopwords: list[str] | None = None) -> Column:
    """Stopword tokens / total tokens (0 for empty docs)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or _STOPWORDS_EN)])
    toks = tokens(F.lower(c))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_len(c: Column) -> Column:
    """Average token length — flags boilerplate/garbage (very long or
    very short means)."""
    toks = tokens(c)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """Composite [0,1] heuristic: length band + punctuation sanity +
    stopword presence. Deterministic, expression-only; the weights
    mirror common pretraining-filter recipes (length/punct/stopword
    gates), not a learned model."""
    n_chars = F.length(c)
    len_ok = F.when((n_chars >= 50) & (n_chars <= 20_000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio(c) <= 0.3, 1.0).otherwise(0.5)
    sw_ok = F.when(stopword_ratio(c) >= 0.05, 1.0).otherwise(0.6)
    return F.round((len_ok * 0.4 + punct_ok * 0.3 + sw_ok * 0.3), 4)


# ---------------------------------------------------------------------------
# Language identification (stopword-profile heuristic)
# ---------------------------------------------------------------------------

#: Minimal per-language function-word profiles (public linguistic
#: common knowledge). Scoring = fraction of tokens in the profile;
#: argmax wins, ties broken by language code for determinism.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "du", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "zh": ["的", "了", "是", "我", "不", "在", "有", "人", "这", "他"],
}


def lang_scores(c: Column) -> list[Column]:
    """One score column per language (hit-fraction of tokens)."""
    toks = tokens(F.lower(c))
    n = F.size(toks)
    out = []
    for lang, words in LANG_PROFILES.items():
        prof = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(prof, t)))
        score = F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
        out.append(F.round(score, 6).alias(f"score_{lang}"))
    return out


def lang_id(c: Column) -> Column:
    """Predicted language = argmax profile score (ties → lexicographic
    smallest code; all-zero → 'und').

    Argmax as array_min over (−score, lang) structs — struct ordering
    is lexicographic, so the min is highest-score-then-smallest-code.
    (A chained when-fold would embed each prior expression twice per
    step: exponential expression growth, measured 129s vs <2s here.)
    """
    toks = tokens(F.lower(c))
    n = F.size(toks)
    entries, scores = [], []
    for lang in sorted(LANG_PROFILES):
        prof = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(prof, t)))
        score = F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
        scores.append(score)
        entries.append(F.struct((-score).alias("neg"), F.lit(lang).alias("l")))
    best = F.array_min(F.array(*entries))
    return F.when(F.greatest(*scores) > 0, best["l"]).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(c: Column) -> Column:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text. Identical content → identical
    fingerprint regardless of case/spacing — the exact-dedup key."""
    normed = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(normed)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full analysis profile to a documents table."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpeish_token_count(c).alias("n_bpeish"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(mean_token_len(c), 6).alias("mean_token_len"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
