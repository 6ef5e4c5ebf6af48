"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting. All JVM-side column
expressions (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword profiles for the n-gram/stopword language heuristic.
# Deliberately tiny: language ID here is a deterministic heuristic,
# not a model — enough to route documents at pipeline speed.
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
    "it": ["il", "la", "di", "che", "per", "una", "con", "non", "del", "gli"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation
    runs with a GPT-style pre-tokenizer regex. Deterministic and
    JVM-side (regexp_count), ~matches tiktoken within ±15% on prose.
    """
    pattern = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+|\s+(?!\S)"
    return F.regexp_count(col, F.lit(pattern))


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / repetition features, the
    standard web-corpus quality heuristics (Gopher/C4 style)."""
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    stop_lit = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(toks, stop_lit))
    mean_word_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace(col, r"[^.!?,;:]", ""))
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_word_len": mean_word_len.cast("double"),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)).cast("double"),
        "stopword_ratio": F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)).cast("double"),
        "distinct_token_ratio": distinct_ratio.cast("double"),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score from the features: length band,
    word-length band, repetition penalty. Deterministic."""
    f = quality_features(col)
    len_ok = (f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000)
    wl_ok = (f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 12)
    rep_ok = f["distinct_token_ratio"] >= 0.3
    return (
        len_ok.cast("double") * 0.4 + wl_ok.cast("double") * 0.3 + rep_ok.cast("double") * 0.3
    )


def language_id(col: Column) -> Column:
    """Stopword-profile language ID: argmax over per-language stopword
    hit counts; 'und' (undetermined) when nothing matches.
    """
    toks = tokens(col)
    scores = []
    for lang, stops in _LANG_STOPWORDS.items():
        stop_lit = F.array(*[F.lit(w) for w in stops])
        overlap = F.size(F.array_intersect(F.array_distinct(toks), stop_lit))
        scores.append(F.struct(overlap.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))


def fingerprint64(col: Column, normalize: bool = True) -> Column:
    """64-bit document fingerprint: xxhash64 over whitespace- and
    case-normalized text (rolling-hash style dedup key)."""
    c = col
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(c)


def winnowing_fingerprints(col: Column, k: int = 7, window: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer et al. 2003): k-gram
    hashes, min per sliding window, distinct mins. array<bigint>.
    """
    n = F.length(col) - (k - 1)
    kgram_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
        lambda i: F.xxhash64(F.substring(col, i + 1, k)),
    )
    m = F.size(kgram_hashes) - (window - 1)
    mins = F.transform(
        F.sequence(F.lit(0), F.greatest(m - 1, F.lit(0))),
        lambda i: F.array_min(F.slice(kgram_hashes, i + 1, window)),
    )
    return F.array_distinct(F.when(m > 0, mins).otherwise(kgram_hashes))


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass document analysis: all features + language + quality +
    fingerprint as new columns."""
    out = df
    for name, col in quality_features(F.col(text_col)).items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("bpe_token_count", bpe_ish_token_count(F.col(text_col)).cast("long"))
        .withColumn("quality", quality_score(F.col(text_col)))
        .withColumn("lang_detected", language_id(F.col(text_col)))
        .withColumn("fingerprint", fingerprint64(F.col(text_col)))
    )
