"""operators.curation — chunking, PII redaction, deterministic sampling,
sequence packing. Python-restatement oracles for the windowed/packing
logic; golden strings for the regex scrubs; determinism properties for
the hash sampler (same rows kept under any repartitioning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.curation import (
    PII_PATTERNS,
    chunk_documents,
    pack_sequences,
    redact_pii,
    sample_deterministic,
)


# ------------------------------------------------------------- chunking --
def test_chunking_matches_python_restatement(spark):
    docs = [
        (1, " ".join(f"w{i}" for i in range(10))),
        (2, "single"),
        (3, " ".join(f"x{i}" for i in range(4))),
        (4, ""),
        (5, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(
            df, chunk_tokens=4, overlap_tokens=1
        ).collect()
    }
    want = {}
    step = 3
    for doc_id, text in docs:
        toks = text.split()
        # starts stop before the final overlap window: a start there
        # would emit a chunk that is purely the previous chunk's tail
        for cid, s in enumerate(range(0, max(len(toks) - 1, 1), step)):
            chunk = toks[s : s + 4]
            if chunk:
                want[(doc_id, cid)] = (" ".join(chunk), len(chunk))
    assert got == want
    # overlap: chunk k shares its last token with chunk k+1's first
    assert got[(1, 0)][0] == "w0 w1 w2 w3"
    assert got[(1, 1)][0] == "w3 w4 w5 w6"


def test_chunking_non_space_whitespace(spark):
    """Tab/newline-only docs emit zero chunks; edge newlines never
    create phantom empty tokens (F.trim strips spaces only — the
    operator must regexp-strip)."""
    df = spark.createDataFrame(
        [(1, "\n\t"), (2, "\nhello world\t"), (3, "a\n\nb")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, chunk_tokens=8).collect()
    }
    assert got == {
        (2, 0): ("hello world", 2),
        (3, 0): ("a b", 2),
    }


def test_chunking_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    plan = (
        chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_chunking_bad_overlap_raises(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


# ------------------------------------------------------------ redaction --
def test_redaction_goldens(spark):
    cases = [
        ("contact j.doe+x@example.co.uk now", "contact <EMAIL> now"),
        ("ssn 123-45-6789 ok", "ssn <SSN> ok"),
        ("card 4111 1111 1111 1111 charged", "card <CARD> charged"),
        ("call +1 (555) 867-5309 today", "call <PHONE> today"),
        ("host 192.168.0.1 up", "host <IP> up"),
        # non-PII survivors: versions, dates, small numbers, prose dots
        ("v1.2.3 released 2024-06-01 cost 42", "v1.2.3 released 2024-06-01 cost 42"),
        ("pi is 3.14159 and e is 2.71828", "pi is 3.14159 and e is 2.71828"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "id long, text string"
    )
    got = {
        r.id: r.text for r in redact_pii(df).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_redaction_kind_subset_and_unknown(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co or 123-45-6789")], "id long, text string"
    )
    only_email = redact_pii(df, kinds=("email",)).collect()[0].text
    assert only_email == "<EMAIL> or 123-45-6789"
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(df, kinds=("email", "dna"))
    assert set(PII_PATTERNS) == {"email", "ssn", "card", "phone", "ipv4"}


# ------------------------------------------------------------- sampling --
def test_sampling_deterministic_under_repartitioning(spark):
    df = spark.range(5000).select(F.col("id").alias("k"))
    a = {r.k for r in sample_deterministic(df, "k", rate=0.25).collect()}
    b = {
        r.k
        for r in sample_deterministic(
            df.repartition(13), "k", rate=0.25
        ).collect()
    }
    assert a == b  # identical keep-set under any partitioning
    assert 0.2 < len(a) / 5000 < 0.3  # rate is approximately honored
    c = {r.k for r in sample_deterministic(df, "k", rate=0.25, seed=9).collect()}
    assert c != a  # seed changes the keep-set


def test_sampling_stratified_rates(spark):
    df = spark.range(9000).select(
        F.col("id").alias("k"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = sample_deterministic(
        df,
        "k",
        stratum_col="lang",
        stratum_rates={"en": 1.0, "de": 0.2},
    )
    counts = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("en") == 3000  # rate 1.0 keeps everything
    assert 400 < counts.get("de", 0) < 800  # ~600
    assert "fr" not in counts  # absent stratum dropped explicitly


def test_sampling_argument_contracts(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="exactly one"):
        sample_deterministic(df, "k")
    with pytest.raises(ValueError, match="exactly one"):
        sample_deterministic(df, "k", rate=0.5, stratum_rates={"a": 1.0})
    with pytest.raises(ValueError, match="rate must be"):
        sample_deterministic(df, "k", rate=1.5)


# -------------------------------------------------------------- packing --
def test_packing_matches_python_restatement(spark):
    rows = [(i, f"s{i % 2}", (i * 37) % 90 + 10) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, shard string, n long")
    got = {
        r.id: (r.bin_id, r.bin_offset)
        for r in pack_sequences(
            df, "n", ["id"], budget=256, group_col="shard"
        ).collect()
    }
    want = {}
    for shard in ("s0", "s1"):
        acc = 0
        for i, s, n in sorted(rows):
            if s != shard:
                continue
            want[i] = (acc // 256, acc)
            acc += n
    assert got == want


def test_packing_row_longer_than_budget_spans_bins(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 900), (3, 50)], "id long, n long"
    )
    got = {r.id: r.bin_id for r in pack_sequences(df, "n", ["id"], 256).collect()}
    # row 2 starts at offset 100 (bin 0) and spills; row 3 starts at
    # offset 1000 -> bin 3
    assert got == {1: 0, 2: 0, 3: 3}


def test_packing_rejects_null_and_negative_tokens(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "id long, n long"
    )
    with pytest.raises(Exception, match="NULL or negative"):
        pack_sequences(df, "n", ["id"], 16).collect()
    df2 = spark.createDataFrame([(1, -5)], "id long, n long")
    with pytest.raises(Exception, match="NULL or negative"):
        pack_sequences(df2, "n", ["id"], 16).collect()
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df2, "n", ["id"], 0)


# ------------------------------------------------------- property tests --
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_docs = st.lists(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
            min_size=1,
            max_size=5,
        ),
        max_size=30,
    ),
    min_size=1,
    max_size=8,
)


@given(docs=_docs, chunk=st.integers(2, 8), overlap=st.integers(0, 3))
@_SETTINGS
def test_chunk_reconstruction_property(spark, docs, chunk, overlap):
    """Dropping each later chunk's first `overlap` tokens and
    concatenating in chunk order reconstructs the document's token
    stream exactly — no token lost, duplicated (beyond the declared
    overlap) or reordered."""
    if overlap >= chunk:
        overlap = chunk - 1
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    out = chunk_documents(
        df, chunk_tokens=chunk, overlap_tokens=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, toks in enumerate(docs):
        if not toks:
            assert i not in by_doc
            continue
        chunks = [t for _, t in sorted(by_doc[i])]
        rebuilt = chunks[0].split()
        for c in chunks[1:]:
            fresh = c.split()[overlap:]
            # every chunk past the first must contribute NEW tokens — an
            # all-overlap chunk is pure duplicated content
            assert fresh, (i, chunks)
            rebuilt.extend(fresh)
        assert rebuilt == toks, (i, chunks, toks)


@given(
    ns=st.lists(st.integers(0, 300), min_size=1, max_size=40),
    budget=st.integers(1, 500),
)
@_SETTINGS
def test_packing_invariants_property(spark, ns, budget):
    """Offsets are the exclusive prefix sums in order; bin_id is
    floor(offset/budget); total stream length is preserved."""
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(ns)], "id long, n long"
    )
    got = sorted(
        (r.id, r.bin_id, r.bin_offset)
        for r in pack_sequences(df, "n", ["id"], budget).collect()
    )
    acc = 0
    for i, n in enumerate(ns):
        rid, bid, off = got[i]
        assert (rid, bid, off) == (i, acc // budget, acc)
        acc += n


def test_digit_kinds_declared_for_every_pattern():
    """Every PII kind is either 'email' (instr('@') gate) or a member of
    _DIGIT_KINDS (rlike('[0-9]') gate); a new kind outside both still
    redacts (ungated), but this assertion forces the author to DECLARE
    the gate so a letter-based pattern is never silently digit-gated."""
    from lcr_etl_upgrade_spark.operators.curation import (
        PII_PATTERNS,
        _DIGIT_KINDS,
    )

    assert _DIGIT_KINDS <= set(PII_PATTERNS)
    assert set(PII_PATTERNS) == {"email"} | _DIGIT_KINDS


def test_ungated_kind_redacts_on_digit_free_rows(spark, monkeypatch):
    """A future letter-based pattern (not in _DIGIT_KINDS) must redact on
    rows with no digits and no '@' — pinning that unknown kinds run
    ungated instead of hiding behind the digit gate (fail-open gap the
    r6 ADVICE flagged)."""
    from lcr_etl_upgrade_spark.operators import curation

    monkeypatch.setitem(
        curation.PII_PATTERNS, "codeword", (r"\bhunter-two\b", "<CODE>")
    )
    df = spark.createDataFrame(
        [("call me at hunter-two ok",), ("no secrets here",)], ["text"]
    )
    out = curation.redact_pii(df, "text", kinds=("codeword",))
    got = sorted(r.text for r in out.collect())
    assert got == ["call me at <CODE> ok", "no secrets here"]


def _curation_corpus(spark):
    """Small corpus exercising every stage: a too-short doc (gopher
    drop), exact duplicates, a transitively-linked near-dup trio, and a
    benchmark-contaminated doc."""
    base_words = " ".join(
        f"the quick brown fox number {i} jumps over the lazy dog and then"
        for i in range(12)
    )
    near_a = base_words
    near_b = base_words.replace("number 3", "number three")
    near_c = base_words.replace("number 3", "number three").replace(
        "number 7", "number seven"
    )
    contaminated = (
        "completely different opening words here so no near dup overlap "
        + " ".join(f"benchmark secret token {i} for the eval set" for i in range(20))
    )
    clean = " ".join(
        f"this is the clean unrelated document sentence {i} and it stays"
        for i in range(12)
    )
    rows = [
        (1, "too short"),
        (2, near_a),
        (3, near_a),          # exact dup of 2
        (4, near_b),          # near dup of 2
        (5, near_c),          # near dup of 4 (transitively of 2)
        (6, contaminated),
        (7, clean),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bench_df(spark):
    bench = " ".join(f"benchmark secret token {i} for the eval set" for i in range(20))
    return spark.createDataFrame([(0, bench)], ["bid", "text"])


def test_curate_corpus_matches_individual_stages(spark):
    from lcr_etl_upgrade_spark.operators.contamination import decontaminate
    from lcr_etl_upgrade_spark.operators.curation import (
        chunk_documents,
        curate_corpus,
        pack_sequences,
    )
    from lcr_etl_upgrade_spark.operators.dedup import (
        drop_near_dups,
        exact_dedup,
        near_dup_pairs,
    )
    from lcr_etl_upgrade_spark.operators.text import gopher_quality_flag

    df = _curation_corpus(spark)
    bench = _bench_df(spark)
    nd_kwargs = dict(num_hashes=16, bands=8, shingle_n=3, threshold=0.5)

    # individual stages, applied by hand in the documented order
    manual = (
        gopher_quality_flag(df, "text", min_tokens=20)
        .filter("passes_gopher")
        .select("doc_id", "text")
    )
    manual = manual.join(
        exact_dedup(manual, ["text"], "doc_id").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    manual = drop_near_dups(
        manual,
        near_dup_pairs(manual, "text", "doc_id", widen=False, **nd_kwargs),
        "doc_id",
    )
    manual = decontaminate(manual, bench, id_col="doc_id")
    manual = chunk_documents(manual, "text", "doc_id", 16, 0)
    manual_packed = pack_sequences(
        manual.withColumn(
            "pack_group", F.pmod(F.xxhash64("doc_id"), F.lit(4))
        ),
        "n_tokens",
        ["doc_id", "chunk_id"],
        32,
        group_col="pack_group",
    )

    composed = curate_corpus(
        df,
        gopher_kwargs={"min_tokens": 20},
        near_dup_kwargs=nd_kwargs,
        benchmark=bench,
        chunk_tokens=16,
        pack_budget=32,
        pack_shards=4,
    )
    a = sorted(map(tuple, composed.collect()))
    b = sorted(map(tuple, manual_packed.collect()))
    assert a == b
    # semantics spot-check: 1 gone (short), one of {2,3} gone (exact),
    # 4/5 gone (near-dup component keeps min id 2), 6 gone (contam),
    # chunks only for docs 2 and 7
    assert {r[0] for r in a} == {2, 7}


def test_curate_corpus_observations_ride_one_action(spark):
    from lcr_etl_upgrade_spark.operators.curation import curate_corpus

    df = _curation_corpus(spark)
    obs = {}
    out = curate_corpus(
        df,
        gopher_kwargs={"min_tokens": 20},
        near_dup_kwargs=dict(num_hashes=16, bands=8, threshold=0.5),
        benchmark=_bench_df(spark),
        observations=obs,
    )
    out.write.format("noop").mode("overwrite").save()
    counts = {k: v.get["rows"] for k, v in obs.items()}
    assert counts == {
        "gopher": 6,       # doc 1 dropped
        "exact": 5,        # doc 3 dropped
        "near_dup": 3,     # docs 4, 5 dropped
        "decontaminate": 2,  # doc 6 dropped
    }


def test_curate_corpus_composition_adds_no_shuffles(spark):
    """The composed lazy tail (decontaminate-emit + chunk + pack) must
    not introduce exchanges beyond what the stages themselves own: with
    all dedup stages off, the plan from corpus to packed output carries
    exactly ONE exchange (the packing window's shard shuffle)."""
    from lcr_etl_upgrade_spark.operators.curation import curate_corpus

    df = _curation_corpus(spark)
    out = curate_corpus(
        df,
        gopher=False,
        exact=False,
        near_dup=False,
        benchmark=None,
        chunk_tokens=16,
        pack_budget=32,
        pack_shards=4,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_curate_corpus_argument_contracts(spark):
    from lcr_etl_upgrade_spark.operators.curation import curate_corpus

    df = _curation_corpus(spark)
    with pytest.raises(ValueError, match="requires chunk_tokens"):
        curate_corpus(df, pack_budget=32, pack_shards=4)
    with pytest.raises(ValueError, match="requires pack_shards"):
        curate_corpus(df, chunk_tokens=16, pack_budget=32)


def test_packing_ungrouped_valve(spark):
    """r12 valve: ungrouped packing refuses past max_ungrouped_rows
    (single-partition window hazard); grouped packing never fires it,
    and the bound is caller-adjustable."""
    from pyspark.sql.utils import PythonException

    df = spark.createDataFrame(
        [(i, f"s{i % 2}", 10) for i in range(20)],
        "id long, shard string, n long",
    )
    with pytest.raises(Exception, match="single-partition window"):
        pack_sequences(
            df, "n", ["id"], budget=64, max_ungrouped_rows=5
        ).collect()
    # grouped: same data, valve not consulted
    assert (
        pack_sequences(
            df, "n", ["id"], budget=64, group_col="shard",
            max_ungrouped_rows=5,
        ).count()
        == 20
    )
    # ungrouped below the bound: unchanged behavior
    got = {
        r.id: r.bin_offset
        for r in pack_sequences(
            df, "n", ["id"], budget=64, max_ungrouped_rows=20
        ).collect()
    }
    assert got == {i: i * 10 for i in range(20)}
