"""Training-data curation operators: chunking, PII redaction,
deterministic sampling, and sequence packing.

These are the steps between "raw corpus" and "training batches" that a
100 TB pipeline runs after dedup/quality filtering (operators/dedup.py,
operators/text.py): split documents into model-window-sized chunks,
scrub obvious PII, downsample strata to a target mix, and pack chunks
into fixed token budgets. Everything here is built-in Column
expressions or a single window — no Python in the loop, no collect, no
extra shuffles beyond the one a packing order inherently needs:

- ``chunk_documents``: split-on-whitespace -> ``sequence`` of chunk
  starts -> ``transform`` + ``slice`` + ``array_join`` -> ``posexplode``.
  A pure per-row narrow map (rows fan out, no shuffle); overlap is a
  slice-window parameter, mirroring the fixed-size-with-overlap
  chunking every RAG/pretraining pipeline uses.
- ``redact_pii``: cheap-gated ``regexp_replace`` chains for emails,
  E.164-ish phone numbers, SSNs, IPv4s and 13-19-digit card numbers —
  the classic scrub list, JVM-side so it runs at scan speed (the email
  scan gated on ``instr('@')``, the digit patterns on one char-class
  ``rlike`` — measured 43% cut at 100x, SCALE.md). Pattern
  recall/precision is deliberately conservative (documented per
  pattern); a production system would layer an NER model behind the
  same column contract.
- ``sample_deterministic``: keep a row iff
  ``pmod(xxhash64(key, seed), 1_000_000) < rate * 1_000_000``.
  Hash-gated sampling is reproducible under retries, cluster resizes
  and partial re-runs (unlike ``df.sample``, whose per-partition RNG
  changes with partitioning), supports per-stratum rates, and pushes
  down as a plain filter.
- ``pack_sequences``: assign chunks to fixed-token-budget bins by
  running cumulative token count over a DETERMINISTIC order within
  each pack group — concat-then-split sequence packing, the standard
  pretraining batching trick. One window shuffle on the group key;
  at 100 TB you pack per shard (group key = shard id) so the window
  partitions stay bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap_tokens: int = 0,
) -> DataFrame:
    """Split each document into whitespace-token chunks of
    ``chunk_tokens`` with ``overlap_tokens`` shared between neighbors.

    Output: one row per chunk with (id, chunk_id, chunk_text, n_tokens);
    chunk_id is 0-based in document order. Empty/whitespace-only
    documents produce zero chunks. Narrow map — no shuffle."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap_tokens < chunk_tokens, got "
            f"{overlap_tokens} / {chunk_tokens}"
        )
    step = chunk_tokens - overlap_tokens
    # regexp-strip ALL edge whitespace (F.trim strips spaces only — a
    # "\n\t" document or "\nword" prefix would otherwise yield phantom
    # "" tokens) before splitting
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    toks = F.split(stripped, r"\s+")
    # last start: the largest multiple of `step` at or below
    # n - overlap - 1 — a start inside the final overlap window would
    # emit a chunk consisting ENTIRELY of the previous chunk's tail
    # (pure duplicated content); this bound still covers every token
    # (last start >= n - chunk_tokens) and keeps a short document to
    # exactly one chunk
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - overlap_tokens - 1, F.lit(0)),
        F.lit(step),
    )
    # posexplode the START OFFSETS, then slice/array_join per chunk ROW:
    # slice and array_join are codegen expressions, while building the
    # chunk array with a higher-order transform() lambda evaluated
    # interpreted (measured 42.7s -> much less on the 500k-doc corpus)
    out = (
        df.filter(F.length(stripped) > 0)
        .select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.array_join(
                F.slice("__toks", F.col("__start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.size("__toks") - F.col("__start"),
                F.lit(chunk_tokens),
            ).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    return out


# name -> (pattern, replacement): ordered, applied in sequence. Patterns
# favor precision (anchored with lookarounds / word boundaries) so prose
# survives; each misses deliberately-obfuscated forms ("j at example").
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # SSN before generic phone: 123-45-6789 would otherwise phone-match
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # 13-19 digit runs with optional space/dash groupings (card-ish).
    # DELIBERATE recall-over-precision: this also swallows non-PII
    # numeric identifiers of that length (order numbers, tracking IDs,
    # numeric hashes) — for training-data scrubbing, losing those is
    # cheaper than leaking a card number. A Luhn post-filter is not
    # expressible in a JVM regexp; a production system needing precision
    # layers one behind the same column contract.
    "card": (r"\b(?:\d[ -]?){12,18}\d\b", "<CARD>"),
    "phone": (
        r"(?<![\w.])(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?"
        r"\d{3}[ .-]\d{3,4}(?:[ .-]\d{2,4})?(?![\w.])",
        "<PHONE>",
    ),
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}"
        r"(?:25[0-5]|2[0-4]\d|1?\d?\d)\b",
        "<IP>",
    ),
}

# Kinds whose every match necessarily contains a digit, and may
# therefore hide behind the cheap ``rlike('[0-9]')`` row gate in
# redact_pii_expr. A future letter-based pattern added to PII_PATTERNS
# but NOT listed here runs ungated (correct, just unoptimized) instead
# of being silently skipped on digit-free rows (fail-open redaction
# gap). Membership is asserted against PII_PATTERNS by
# tests/test_curation.py.
_DIGIT_KINDS = frozenset({"ssn", "card", "phone", "ipv4"})


def redact_pii_expr(
    col: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)
) -> Column:
    """Per-class replacement tokens force one ``regexp_replace`` per
    class (a single alternation pass cannot emit different tokens per
    branch in a JVM regexp), so the fusion is CHEAP GATES instead: the
    email scan — the expensive one, since its pattern can start
    backtracking at almost every character — runs only on rows that
    contain ``@`` (an ``instr`` byte scan), and the four digit-based
    patterns run only on rows containing a digit (one char-class
    ``rlike``). ``CASE WHEN`` evaluates branches lazily per row.
    Measured on the 500k-doc 100x corpus (SCALE.md "Curation
    operators"): 36.4 s -> 20.9 s paired, almost all from skipping the
    email scan. A fused combined-alternation gate was measured SLOWER
    than the plain chain (40.6 s vs 36.5 s) — a 5-branch alternation
    re-tries every branch at every position — and rejected.

    Gates test the ORIGINAL column: replacement tokens never introduce
    ``@`` or digits, so a row failing a gate on input cannot need that
    class after earlier replacements. NULL input stays NULL on every
    path."""
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kinds {unknown}; have {sorted(PII_PATTERNS)}"
        )
    out = col
    i = 0
    while i < len(kinds):
        if kinds[i] == "email":
            out = F.when(
                F.instr(col, "@") > 0,
                F.regexp_replace(out, *PII_PATTERNS["email"]),
            ).otherwise(out)
            i += 1
            continue
        if kinds[i] in _DIGIT_KINDS:
            # contiguous run of digit-based classes shares one digit
            # gate, preserving the caller's application order
            chain = out
            j = i
            while j < len(kinds) and kinds[j] in _DIGIT_KINDS:
                chain = F.regexp_replace(chain, *PII_PATTERNS[kinds[j]])
                j += 1
            out = F.when(col.rlike("[0-9]"), chain).otherwise(out)
            i = j
            continue
        # a kind with no declared cheap gate runs ungated — correctness
        # (never skip a redaction) beats the gate micro-optimization
        out = F.regexp_replace(out, *PII_PATTERNS[kinds[i]])
        i += 1
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = tuple(PII_PATTERNS),
    out_col: str | None = None,
) -> DataFrame:
    """Replace PII spans in ``text_col`` with typed placeholder tokens
    (in place unless ``out_col`` names a new column)."""
    return df.withColumn(
        out_col or text_col, redact_pii_expr(F.col(text_col), kinds)
    )


def sample_deterministic(
    df: DataFrame,
    key_col: str,
    rate: float | None = None,
    seed: int = 0,
    stratum_col: str | None = None,
    stratum_rates: dict[str, float] | None = None,
) -> DataFrame:
    """Keep each row iff ``hash(key, seed)`` lands under ``rate`` —
    reproducible regardless of partitioning, retries or cluster size,
    and expressible as a pushable filter (unlike ``df.sample``).

    Either a global ``rate`` or per-stratum ``stratum_rates`` keyed by
    the values of ``stratum_col`` (strata absent from the dict are
    DROPPED — an explicit mix, not a default)."""
    denom = 1_000_000
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(denom))
    if (rate is None) == (stratum_rates is None):
        raise ValueError("pass exactly one of rate / stratum_rates")
    if rate is not None:
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate must be in [0, 1], got {rate}")
        return df.filter(bucket < int(rate * denom))
    if stratum_col is None:
        raise ValueError("stratum_rates requires stratum_col")
    expr = F.lit(-1)
    for value, r in stratum_rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate must be in [0, 1], got {r} for {value!r}")
        expr = F.when(
            F.col(stratum_col) == value, F.lit(int(r * denom))
        ).otherwise(expr)
    return df.filter(bucket < expr)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    budget: int,
    group_col: str | None = None,
    bin_col: str = "bin_id",
    offset_col: str = "bin_offset",
    max_ungrouped_rows: int = 2_000_000,
) -> DataFrame:
    """Concat-then-split packing: lay the rows out in the deterministic
    ``order_cols`` order, accumulate ``token_col``, and cut a new bin
    every ``budget`` tokens. Emits ``bin_col`` (0-based) and
    ``offset_col`` (the row's start offset within the concatenated
    stream — ``pmod(. , budget)`` gives the in-bin offset; a row longer
    than the budget spans bins, exactly like pretraining packing).

    ``group_col`` scopes packing (and the single window shuffle) to a
    shard; bins are then per-group. Rows with NULL or negative token
    counts are rejected up front.

    Ungrouped packing plans a SINGLE-PARTITION window over the whole
    corpus — correct, but a scale hazard (r12 valve, mirroring the LSH
    operators' ``max_bucket`` convention): it refuses at runtime past
    ``max_ungrouped_rows`` rows, checked INSIDE the window expression
    itself (no extra pass). Pass ``group_col`` to shard the shuffle, or
    raise the bound explicitly when a single sort is intended."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    part = [group_col] if group_col else []
    w = (
        W.partitionBy(*part).orderBy(*order_cols)
        if part
        else W.partitionBy().orderBy(*order_cols)
    )
    n = F.col(token_col)
    # the contract check lives INSIDE the output expression (a pruned
    # side column carrying assert_true would be optimized away): any
    # NULL/negative token count raises per-row instead of silently
    # producing NULL bins downstream
    checked = F.when(
        n.isNull() | (n < 0),
        F.raise_error(
            F.concat(
                F.lit("pack_sequences: NULL or negative token count: "),
                F.coalesce(n.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(n)
    start = F.coalesce(
        F.sum(n).over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    # `checked - n` is 0 on every valid row; adding it forces `checked`
    # to evaluate for EVERY row (a bad final row would otherwise escape
    # — the running sum never consumes the partition's last value)
    offset = start + checked - n
    if not part:
        # the single-partition valve: row_number rides the SAME window,
        # so the refusal costs nothing extra and fires exactly when the
        # unscalable plan actually exceeds the bound
        guard = (
            F.when(
                F.row_number().over(w) > int(max_ungrouped_rows),
                F.raise_error(
                    F.lit(
                        "pack_sequences: ungrouped packing over more "
                        f"than {int(max_ungrouped_rows)} rows plans a "
                        "single-partition window over the whole corpus; "
                        "pass group_col= to shard the shuffle (bins are "
                        "then per-group) or raise max_ungrouped_rows "
                        "explicitly"
                    )
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
        offset = offset + guard
    return df.withColumns(
        {
            bin_col: F.floor(offset / budget).cast("long"),
            offset_col: offset.cast("long"),
        }
    )


def curate_corpus(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    gopher: bool = True,
    gopher_kwargs: dict | None = None,
    exact: bool = True,
    near_dup: bool = True,
    near_dup_kwargs: dict | None = None,
    benchmark: DataFrame | None = None,
    bench_text_col: str | None = None,
    contam_n: int = 13,
    chunk_tokens: int | None = None,
    overlap_tokens: int = 0,
    pack_budget: int | None = None,
    pack_shards: int | None = None,
    observations: dict | None = None,
) -> DataFrame:
    """The end-to-end published curation recipe as ONE composition:

        gopher-flag filter -> exact dedup -> near-dup drop
        -> decontaminate -> chunk -> pack

    Every stage is optional (``gopher=False``, ``benchmark=None``,
    ``chunk_tokens=None``, ... skip it) and the composition is pinned by
    test to equal applying the stages individually, with NO extra
    shuffles introduced by the composition itself.

    Execution shape: the lazy stages (gopher filter, decontaminate's
    emit pass, chunking, packing) fuse into one plan — passing
    ``observations={}`` attaches a named ``Observation`` per lazy stage
    boundary (filled into the dict; read ``.get`` after an action) so
    per-stage surviving-row counts ride the SAME job instead of
    recounting. The dedup stages necessarily run their own jobs first
    (exact dedup aggregates; near-dup resolves candidate pairs into
    connected components — the operators document their shuffle
    budgets), exactly like the published pipelines they implement.

    Near-dup drop uses ``near_dup_pairs`` -> ``drop_near_dups``
    (components, not raw pairs — transitively-linked groups keep ONE
    survivor). ``near_dup_kwargs`` passes through (num_hashes, bands,
    shingle_n, threshold). ``pack_shards`` hashes documents into that
    many pack groups so the packing window stays bounded at scale;
    required when ``pack_budget`` is set. The packed output DELIBERATELY
    keeps the ``pack_group`` column: ``bin_id`` is 0-based PER GROUP, so
    (pack_group, bin_id) — not bin_id alone — identifies a training
    sequence; dropping it would make the bins ambiguous."""
    from pyspark.sql import Observation

    from lcr_etl_upgrade_spark.operators.contamination import decontaminate
    from lcr_etl_upgrade_spark.operators.dedup import (
        drop_near_dups,
        exact_dedup,
        near_dup_pairs,
    )
    from lcr_etl_upgrade_spark.operators.text import gopher_quality_flag

    def _observe(stage: str, d: DataFrame) -> DataFrame:
        if observations is None:
            return d
        obs = Observation()
        observations[stage] = obs
        return d.observe(obs, F.count(F.lit(1)).alias("rows"))

    out = df
    if gopher:
        flagged = gopher_quality_flag(out, text_col, **(gopher_kwargs or {}))
        # keep the caller's columns: the flag's feature columns are
        # implementation detail of the filter, not pipeline output
        out = _observe(
            "gopher", flagged.filter("passes_gopher").select(*df.columns)
        )
    if exact:
        survivors = exact_dedup(out, [text_col], id_col).select(id_col)
        out = _observe("exact", out.join(survivors, id_col, "left_semi"))
    if near_dup:
        # The filtered corpus is consumed MANY times from here on:
        # shingled for pair candidates, semi-joined for keeper
        # presence, and scanned again for the final output — without a
        # cut, each consumer re-runs the (regex-heavy) gopher filter
        # and the exact-dedup shuffle. localCheckpoint materializes it
        # once (eager, executor storage, GC-managed — no unpersist
        # lifecycle to leak); measured 275 s -> see SCALE.md at 100x.
        out = out.localCheckpoint()
        # widen=False: `out` sits behind joins/aggs by now — the
        # partition probe would execute those exchanges just to read a
        # count (see _fan_out)
        caches: list = []
        pairs = near_dup_pairs(
            out,
            text_col,
            id_col,
            widen=False,
            caches=caches,
            **(near_dup_kwargs or {}),
        )
        out = _observe("near_dup", drop_near_dups(out, pairs, id_col))
        # drop_near_dups consumed the pair relation EAGERLY (connected
        # components iterates to a fixpoint with localCheckpoint'd
        # edges), so nothing downstream references the persisted
        # shingle/bucket relations — release them here instead of
        # leaking two corpus-sized caches per curate_corpus call
        for cached in caches:
            cached.unpersist()
    if benchmark is not None:
        out = _observe(
            "decontaminate",
            decontaminate(
                out,
                benchmark,
                n=contam_n,
                text_col=text_col,
                id_col=id_col,
                bench_text_col=bench_text_col,
            ),
        )
    if chunk_tokens is not None:
        out = _observe(
            "chunk",
            chunk_documents(
                out, text_col, id_col, chunk_tokens, overlap_tokens
            ),
        )
    if pack_budget is not None:
        if chunk_tokens is None:
            raise ValueError("pack_budget requires chunk_tokens")
        if pack_shards is None:
            raise ValueError(
                "pack_budget requires pack_shards (a global packing "
                "window would single-thread the corpus; pick shards "
                "~= corpus tokens / (budget * rows-per-task))"
            )
        sharded = out.withColumn(
            "pack_group", F.pmod(F.xxhash64(id_col), F.lit(pack_shards))
        )
        out = _observe(
            "pack",
            pack_sequences(
                sharded,
                "n_tokens",
                [id_col, "chunk_id"],
                pack_budget,
                group_col="pack_group",
            ),
        )
    return out
