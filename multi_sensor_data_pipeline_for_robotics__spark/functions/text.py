"""Text-analysis column expressions for large-scale training-data
pipelines: tokenization, quality scoring, language-ID heuristics,
document fingerprinting.

Everything here is a pure JVM-side Column expression (built-ins +
higher-order array functions) — no Python UDFs, so the hot path stays
inside whole-stage codegen and scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker-word lists for the heuristic language ID
# (classic stopword-profile approach; lists kept deliberately small and
# deterministic so the operator is oracle-checkable)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht"],
    "en": ["the", "a", "and", "of", "is"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}

DEFAULT_STOPWORDS = ["the", "a", "and", "of", "is"]


def tokens(col: Column | str, pattern: str = " ") -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    return F.split(F.col(col) if isinstance(col, str) else col, pattern)


BPE_ISH_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"


def tokens_regex(col: Column | str, pattern: str = BPE_ISH_PATTERN) -> Column:
    """BPE-ish regex tokenization: lowercase alnum runs plus every
    punctuation byte as its own token — the pre-tokenization split most
    BPE vocabularies assume. The default pattern is valid in both Java
    regex (Spark) and RE2 (DuckDB/others), so counts are
    oracle-comparable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), 0)


def n_tokens(toks: Column) -> Column:
    return F.size(toks)


def n_distinct_tokens(toks: Column) -> Column:
    return F.size(F.array_distinct(toks))


def avg_token_len(toks: Column) -> Column:
    """Mean token length as double (total chars / token count)."""
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(toks)


def stopword_count(toks: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or DEFAULT_STOPWORDS
    return F.size(F.filter(toks, lambda t: t.isin(*sw)))


def stopword_ratio(toks: Column, stopwords: list[str] | None = None) -> Column:
    return stopword_count(toks, stopwords).cast("double") / F.size(toks)


def quality_flags(toks: Column, text: Column) -> dict[str, Column]:
    """Gopher-style heuristic quality signals (public-rule flavor):
    length bounds, mean token length bounds, stopword presence."""
    nt = n_tokens(toks)
    atl = avg_token_len(toks)
    swr = stopword_ratio(toks)
    return {
        "n_tokens": nt,
        "avg_token_len": atl,
        "stopword_ratio": swr,
        "ok_length": (nt >= 10) & (nt <= 100_000),
        "ok_token_len": (atl >= 2.0) & (atl <= 12.0),
        "ok_stopwords": swr > 0.0,
    }


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-word hit count per language."""
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }


def lang_id(toks: Column) -> Column:
    """Argmax language with deterministic lexicographic tie-break:
    among max-scoring languages pick the alphabetically first."""
    scores = lang_scores(toks)
    best = None
    for lang in sorted(scores):  # later langs must BEAT (strictly) to win
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            cond = s > best[0]
            best = (F.when(cond, s).otherwise(best[0]), F.when(cond, F.lit(lang)).otherwise(best[1]))
    return best[1]


def chunks(toks: Column, chunk_tokens: int, stride: int) -> Column:
    """Overlapping fixed-size token windows — the context-chunking
    primitive for training/RAG pipelines.

    Returns an array of structs ``(chunk_idx, chunk_text, n_tokens)``;
    window k starts at token ``k*stride`` (0-based) and spans up to
    ``chunk_tokens`` tokens (the tail window may be shorter). Pure
    Column expressions — explode downstream to get one row per chunk,
    which distributes chunks across partitions with no Python.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)).alias("chunk_text"),
            F.least(F.size(toks) - s, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )


def fingerprint(toks: Column, modulus: int = 1_000_000_007) -> Column:
    """Deterministic position-weighted token fingerprint.

    ``sum_i (31*len(t_i) + ascii(t_i[0])) * ((i mod 13) + 1) mod M``
    with 1-based i. Pure integer arithmetic → identical in any engine;
    used for cheap content-drift detection at scale (not cryptographic).
    """
    weighted = F.transform(
        toks,
        lambda t, i: (
            (F.lit(31) * F.length(t) + F.ascii(F.substring(t, 1, 1))).cast("long")
            * ((i + 1) % 13 + 1)
        ),
    )
    total = F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)
    return total % modulus
