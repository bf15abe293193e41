"""L4 text-analysis operators for training-data pipelines.

All expressions are built-in Column functions (JVM, codegen) — token
counting, quality features and fingerprints run at full scan speed with no
Python in the loop. Language ID uses a stopword-hit heuristic over a
broadcast-able token dictionary, also pure expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword seed lists for the n-gram/stopword heuristic.
# Deliberately small: the heuristic is a scoring demo, not a model.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "la", "los", "que", "es", "una", "por"),
    "zh": ("的", "是", "了", "在", "我", "有", "和"),
}


def tokens_expr(col: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace), EMPTY
    tokens dropped: ``split('')`` yields ``['']`` and non-space edge
    whitespace survives ``F.trim`` (spaces only), so a naive split made
    an empty/whitespace-only document count 1 token and a leading
    newline produce a phantom token.

    Implementation stays inside whole-stage codegen: regexp-strip the
    EDGE whitespace, then split — interior ``\\s+`` runs collapse and
    the edges are gone, so no empty tokens can appear and no
    interpreted higher-order ``F.filter`` is needed on this
    every-document hot path."""
    stripped = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.when(
        F.length(stripped) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(stripped, r"\s+"))


def token_count_expr(col: Column) -> Column:
    """Token count WITHOUT materializing the token array: a token is a
    maximal non-whitespace run, so ``regexp_count(col, '\\S+')`` equals
    ``size(tokens_expr(col))`` by construction (equivalence pinned by
    tests/test_text_multimodal.py::test_token_count_equals_array_size).
    Stays inside whole-stage
    codegen on the every-document hot path; ``tokens_expr`` remains for
    consumers that need the array itself (stopword_ratio, language_id)."""
    return F.regexp_count(col, F.lit(r"\S+")).cast("long")


def bpe_ish_token_count_expr(col: Column) -> Column:
    """A BPE-ish proxy: count word chunks and standalone punctuation the way
    a byte-pair tokenizer roughly segments (regexp-based, ~chars/4 floor)."""
    words = F.size(F.regexp_extract_all(col, F.lit(r"\w+|[^\w\s]"), 0))
    return F.greatest(words, F.ceil(F.length(col) / 4)).cast("long")


def stopword_hits_expr(col: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of whitespace tokens exactly equal to a stopword, as ONE
    ``regexp_count`` scan: ``(?<!\\S)(?:w1|w2|...)(?!\\S)`` matches a
    stopword only at token boundaries (lookarounds make alternation
    order irrelevant), exactly once per qualifying ``\\S+`` run — equal
    to the per-token ``isin`` array filter by construction (hypothesis
    differential pin in tests/test_text_multimodal.py), but inside
    whole-stage codegen instead of an interpreted higher-order lambda
    (measured 20.9 s -> 7.3 s per signal on the 500k-doc 100x corpus,
    SCALE.md r7). Words are regex-escaped (a metacharacter stopword like
    "c++" must count literally, as isin did); an empty list is refused —
    "(?:)" would match the zero-width boundary in every document where
    isin over nothing matches none. Empty or whitespace-containing
    stopwords are refused for the same divergence reason: a
    whitespace-split token can never EQUAL one (isin counts 0), but the
    regex would match zero-width at every boundary (empty) or across
    token boundaries ("a b" counting 1 in "a b")."""
    if not stopwords:
        raise ValueError("stopword_hits_expr needs at least one stopword")
    bad = [w for w in stopwords if not w or re.search(r"\s", w)]
    if bad:
        raise ValueError(
            "stopword_hits_expr requires non-empty, whitespace-free "
            f"stopwords (no whitespace-split token can equal {bad[0]!r})"
        )
    alternation = "|".join(re.escape(w) for w in stopwords)
    return F.regexp_count(
        F.lower(col),
        F.lit(r"(?<!\S)(?:" + alternation + r")(?!\S)"),
    )


def stopword_ratio_expr(col: Column, stopwords: tuple[str, ...]) -> Column:
    hits = stopword_hits_expr(col, stopwords)
    # denominator: token_count_expr == size(tokens_expr) by the pinned
    # equivalence (lowering changes no whitespace)
    return (
        hits.cast("double")
        / F.greatest(token_count_expr(col), F.lit(1))
    ).alias("stopword_ratio")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality features per document."""
    c = F.col(text_col)
    # regexp_count('\S+') == size(tokens_expr(c)) by construction (a token
    # IS a maximal non-whitespace run) — the count stays in codegen and the
    # hot path never materializes the token array; only stopword_ratio
    # (array consumer, pruned away when the caller doesn't select it)
    # still builds tokens.
    n_tokens = F.regexp_count(c, F.lit(r"\S+"))
    return df.withColumns(
        {
            "n_chars_measured": F.length(c).cast("long"),
            "n_tokens": n_tokens.cast("long"),
            # sum of token lengths over the token count — the old
            # (length - n + 1) / n shortcut is only valid for untrimmed
            # single-space-separated text and inflated the feature on
            # edge whitespace / multi-space separators. Tokens are the
            # maximal non-whitespace runs, so their total length is
            # exactly the non-whitespace character count — one codegen
            # regexp_replace instead of an interpreted higher-order
            # aggregate (measured +0.27s on the sf0.1 corpus scan).
            "avg_token_len": (
                F.length(F.regexp_replace(c, "\\s", "")).cast("double")
                / F.greatest(n_tokens, F.lit(1))
            ),
            "punct_ratio": (
                F.length(F.regexp_replace(c, "[^.,;:!?]", "")).cast("double")
                / F.greatest(F.length(c), F.lit(1))
            ),
            "stopword_ratio": stopword_ratio_expr(c, LANG_STOPWORDS["en"]),
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword hits per language.

    Pure expressions: one pass, a score column per language, greatest()
    for the argmax. Ties resolve by language code order (deterministic).
    Each language's hit count is one ``stopword_hits_expr`` regex scan —
    five scans total instead of five interpreted per-token filters over
    a materialized token array (measured 109.3 s -> ~34 s on the
    500k-doc 100x corpus, SCALE.md r7; result values identical, oracle
    hash unchanged)."""
    scores = {
        lang: stopword_hits_expr(F.col(text_col), sw)
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = None
    best_lang = F.lit("und")
    # Fold right-to-left so earlier languages win ties.
    for lang in reversed(sorted(scores)):
        score = scores[lang]
        if best is None:
            best = score
            best_lang = F.when(score > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when((score > 0) & (score >= best), F.lit(lang)).otherwise(
                best_lang
            )
            best = F.greatest(score, best)
    return df.withColumn("lang_pred", best_lang)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-content md5 + a normalized rolling-hash
    style signature (lowercased, whitespace-collapsed md5 prefix)."""
    c = F.col(text_col)
    normalized = F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")
    return df.withColumns(
        {
            "content_md5": F.md5(c),
            "normalized_fp": F.substring(F.md5(normalized), 1, 16),
        }
    )


# --------------------------------------------------------------------------
# Gopher-style repetition and quality signals (Rae et al. 2021, public) —
# the standard pretraining-corpus filter rules, as pure Column
# expressions: every signal is array/regexp algebra inside whole-stage
# codegen, no explode, no shuffle, no Python.
# --------------------------------------------------------------------------


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition/structure signals over lines and
    paragraphs:

    - ``n_lines`` — non-empty line count;
    - ``dup_line_ratio`` — fraction of non-empty lines that are repeats
      of an earlier line (``1 - distinct/total``, the Gopher
      "duplicate line fraction");
    - ``dup_paragraph_ratio`` — same over blank-line-separated
      paragraphs;
    - ``longest_line_frac`` — longest line's share of total characters
      (boilerplate/table detector);
    - ``bullet_line_ratio`` / ``ellipsis_line_ratio`` — fraction of
      lines starting with a bullet mark / ending with an ellipsis (the
      Gopher structural-noise signals).

    NULL text yields NULL features; empty/whitespace-only text yields
    zero lines and zero ratios.

    Scale shape (measured on the 500k-doc 100x corpus, SCALE.md): the
    line/paragraph arrays are materialized ONCE in their own projection
    and every signal reads that column — withColumns over the raw text
    would re-split per referencing signal (higher-order array exprs see
    no cross-column CSE; 36.0 s -> 15.3 s paired). Catalyst keeps the
    two projections apart because re-inlining a multi-referenced
    non-cheap alias is exactly what CollapseProject refuses to do. The
    bullet/ellipsis counters run as (?m) ``regexp_count`` directly on
    the text instead of per-line interpreted rlike filters; the array
    path survives only where arrays are semantically required
    (distinct/longest-line)."""
    c = F.col(text_col)
    stripped = F.regexp_replace(c, r"^\s+|\s+$", "")

    def _nonempty(parts: Column) -> Column:
        return F.filter(parts, lambda s: F.length(F.trim(s)) > 0)

    clash = {"__rep_lines", "__rep_paras"} & set(df.columns)
    if clash:
        # withColumns would silently REPLACE (and the final drop would
        # destroy) a same-named caller column
        raise ValueError(
            f"repetition_features reserves column names {sorted(clash)}"
        )
    tmp = df.withColumns(
        {
            "__rep_lines": _nonempty(F.split(stripped, r"\n")),
            "__rep_paras": _nonempty(F.split(stripped, r"\n\s*\n")),
        }
    )
    lines, paras = F.col("__rep_lines"), F.col("__rep_paras")
    n_lines = F.size(lines)
    n_paras = F.size(paras)

    def _dup_ratio(parts: Column, n: Column) -> Column:
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(parts)) / n.cast("double")
        )

    line_lens = F.transform(lines, lambda s: F.length(s))
    total_chars = F.aggregate(
        line_lens, F.lit(0), lambda acc, x: acc + x
    )
    # one multiline regex scan each instead of a per-line interpreted
    # rlike filter. A bullet line = optional horizontal whitespace,
    # marker, horizontal whitespace, then CONTENT — the old trim-based
    # formulation accidentally counted a tab-only tail ("-\t") because
    # F.trim strips spaces only; this one is consistent. An ellipsis
    # line = "..."/"…" then only horizontal whitespace (incl. tabs —
    # same F.rtrim space-only accident fixed) to end of line. Both
    # match at most once per line (^ anchors; $ requires the tail).
    # (?d) = Java UNIX_LINES: ^/$ anchor ONLY at \n, matching the \n
    # split that defines n_lines — without it (?m) also anchors at
    # lone \r / U+0085 / U+2028 / U+2029 and the ratios could exceed
    # 1.0 on \r-terminated text (pinned by test).
    bullet = F.regexp_count(
        stripped, F.lit(r"(?md)^[^\S\n]*(?:[-*•▪●]|\d+[.)])[^\S\n]+\S")
    )
    ellipsis = F.regexp_count(stripped, F.lit(r"(?md)(\.\.\.|…)[^\S\n]*$"))
    return tmp.withColumns(
        {
            "n_lines": n_lines.cast("long"),
            "dup_line_ratio": _dup_ratio(lines, n_lines),
            "dup_paragraph_ratio": _dup_ratio(paras, n_paras),
            "longest_line_frac": F.when(n_lines <= 0, F.lit(0.0)).otherwise(
                F.array_max(line_lens).cast("double")
                / F.greatest(total_chars, F.lit(1)).cast("double")
            ),
            "bullet_line_ratio": F.when(n_lines <= 0, F.lit(0.0)).otherwise(
                bullet.cast("double") / n_lines
            ),
            "ellipsis_line_ratio": F.when(n_lines <= 0, F.lit(0.0)).otherwise(
                ellipsis.cast("double") / n_lines
            ),
        }
    ).drop("__rep_lines", "__rep_paras")


def gopher_quality_flag(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 3.0,
    max_avg_token_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The published Gopher quality-filter rules as ONE boolean column
    ``passes_gopher`` (thresholds are the paper's defaults, overridable):
    token-count bounds, mean-token-length bounds, hash/ellipsis
    symbol-to-word ratio, bullet/ellipsis line ratios, fraction of
    words containing an alphabetic character, and a minimum number of
    distinct-position stopword hits. Composes ``repetition_features``
    plus token signals — all codegen expressions, so the flag evaluates
    at scan speed and pushes down as a plain filter when used in
    ``df.filter``.

    The token-level signals never materialize a token array: a token is
    a maximal ``\\S+`` run, so "tokens containing a letter" is
    ``n_tokens`` minus one ``regexp_count`` of LETTERLESS tokens
    (``(?<!\\S)[^\\s<letters>]++(?!\\S)`` — the possessive run plus the
    O(1) lookbehind reject at mid-token starts keeps the scan LINEAR,
    where the naive ``\\S*[letter]\\S*`` form backtracks quadratically
    over a long letter-free token) and "tokens equal to a
    stopword" is one whitespace-lookaround alternation — measured 22.8 s
    -> 8.6 s and 20.9 s -> 7.3 s respectively on the 500k-doc 100x
    corpus vs the interpreted per-token filter lambdas (SCALE.md)."""
    c = F.col(text_col)
    n_tokens = F.regexp_count(c, F.lit(r"\S+"))
    avg_len = F.length(F.regexp_replace(c, "\\s", "")).cast("double") / F.greatest(
        n_tokens, F.lit(1)
    )
    symbols = F.regexp_count(c, F.lit(r"#|\.\.\.|…"))
    letterless = F.regexp_count(c, F.lit(r"(?<!\S)[^\sA-Za-zÀ-ɏ]++(?!\S)"))
    alpha_words = n_tokens - letterless
    stop_hits = stopword_hits_expr(c, LANG_STOPWORDS["en"])
    with_rep = repetition_features(df, text_col)
    passes = (
        (n_tokens >= min_tokens)
        & (n_tokens <= max_tokens)
        & (avg_len >= min_avg_token_len)
        & (avg_len <= max_avg_token_len)
        & (symbols.cast("double") / F.greatest(n_tokens, F.lit(1))
           <= max_symbol_word_ratio)
        & (F.col("bullet_line_ratio") <= max_bullet_ratio)
        & (F.col("ellipsis_line_ratio") <= max_ellipsis_ratio)
        & (alpha_words.cast("double") / F.greatest(n_tokens, F.lit(1))
           >= min_alpha_word_ratio)
        & (stop_hits >= min_stopword_hits)
    )
    return with_rep.withColumn("passes_gopher", F.coalesce(passes, F.lit(False)))
