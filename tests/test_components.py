"""connected_components / drop_near_dups — goldens vs a brute-force
union-find oracle on adversarial graphs, repartition determinism, and the
log-round convergence pin for a chain graph."""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lcr_etl_upgrade_spark.operators.dedup import (
    connected_components,
    drop_near_dups,
)


def _oracle_components(edges, ids=None):
    """Brute-force union-find: id -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for a, b in edges:
        union(a, b)
    for i in ids or ():
        find(i)
    comps = {}
    for x in parent:
        comps.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comps.values() for x in members}


def _run_cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = connected_components(df, **kw)
    return {r.id: r.component for r in got.collect()}


ADVERSARIAL_GRAPHS = {
    "chain": [(i, i + 1) for i in range(1, 20)],
    "star_max_center": [(100, i) for i in range(1, 30)],
    "cycle": [(i, (i % 12) + 1) for i in range(1, 13)],
    "two_components": [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)],
    "binary_tree": [(i, 2 * i) for i in range(1, 16)]
    + [(i, 2 * i + 1) for i in range(1, 16)],
    "self_loops_and_dups": [(1, 1), (2, 2), (1, 2), (2, 1), (1, 2), (3, 3)],
    "bridge_of_stars": [(1, i) for i in range(2, 10)]
    + [(20, i) for i in range(21, 30)]
    + [(9, 29)],
}


@pytest.mark.parametrize("name", sorted(ADVERSARIAL_GRAPHS))
def test_components_match_union_find_oracle(spark, name):
    edges = ADVERSARIAL_GRAPHS[name]
    assert _run_cc(spark, edges) == _oracle_components(edges)


def test_components_random_graphs_match_oracle(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(5, 80))
        ]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        assert _run_cc(spark, edges) == _oracle_components(edges), (
            trial,
            edges,
        )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_components_property_vs_oracle(spark, edges):
    got = _run_cc(spark, edges)
    want = _oracle_components(
        [e for e in edges if e[0] != e[1]],
        ids={x for e in edges for x in e},
    )
    assert got == want


def test_components_string_ids_and_nulls(spark):
    edges = [("b", "a"), ("c", "b"), (None, "z"), ("q", None), ("x", "y")]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.id: r.component for r in connected_components(df).collect()}
    # null endpoints connect nothing, but their non-null partners still
    # label as singletons (ids come from the raw relation)
    assert got == {
        "a": "a",
        "b": "a",
        "c": "a",
        "x": "x",
        "y": "x",
        "z": "z",
        "q": "q",
    }


def test_components_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    got = connected_components(df)
    assert got.columns == ["id", "component"]
    assert got.count() == 0


def test_components_deterministic_under_repartitioning(spark):
    edges = ADVERSARIAL_GRAPHS["bridge_of_stars"]
    base = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    want = _oracle_components(edges)
    for parts in (1, 3, 16):
        got = {
            r.id: r.component
            for r in connected_components(base.repartition(parts)).collect()
        }
        assert got == want, parts


def test_chain_converges_in_log_rounds(spark):
    """Alternating large-star/small-star contracts a 64-node path in
    O(log n) rounds; naive neighbor-min propagation would need ~63.
    The pin (<= 10) is the published bound with slack for the final
    fixpoint-confirmation round."""
    edges = [(i, i + 1) for i in range(1, 64)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    stats = {}
    got = {
        r.id: r.component
        for r in connected_components(df, _stats=stats).collect()
    }
    assert got == {i: 1 for i in range(1, 65)}
    assert 1 <= stats["iterations"] <= 10, stats


def test_components_max_iter_raises_not_partial(spark):
    edges = [(i, i + 1) for i in range(1, 40)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def _corpus(spark):
    rows = [
        (1, "aaa", 0.9),
        (2, "aab", 0.5),
        (3, "aac", 0.9),
        (4, "solo", 0.1),
        (5, "bbb", None),
        (6, "bbc", 0.7),
    ]
    return spark.createDataFrame(rows, ["id", "text", "quality"])


def test_drop_near_dups_min_id_keeper(spark):
    # components: {1,2,3} via transitivity, {5,6}; 4 untouched; pair id 99
    # has no corpus row and selects no victim
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (99, 98)], ["doc_a", "doc_b"]
    )
    out = drop_near_dups(_corpus(spark), pairs, "id")
    assert sorted(r.id for r in out.collect()) == [1, 4, 5]
    assert out.columns == ["id", "text", "quality"]


def test_drop_near_dups_quality_keeper_with_tiebreak(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["doc_a", "doc_b"])
    out = drop_near_dups(_corpus(spark), pairs, "id", quality_col="quality")
    # {1,2,3}: max quality 0.9 tie between 1 and 3 -> min id 1
    # {5,6}: 5 has NULL quality -> scored 6 wins
    assert sorted(r.id for r in out.collect()) == [1, 4, 6]


def test_drop_near_dups_all_unscored_component_falls_to_min_id(spark):
    corpus = spark.createDataFrame(
        [(7, None), (8, None), (9, 0.2)], "id long, quality double"
    )
    pairs = spark.createDataFrame([(7, 8)], ["doc_a", "doc_b"])
    out = drop_near_dups(corpus, pairs, "id", quality_col="quality")
    assert sorted(r.id for r in out.collect()) == [7, 9]


def test_drop_near_dups_transitive_closure_vs_oracle(spark):
    """Randomized end-to-end: survivors == one min-id per oracle
    component plus every unpaired doc."""
    rng = random.Random(21)
    ids = list(range(50))
    corpus = spark.createDataFrame([(i, f"d{i}") for i in ids], ["id", "text"])
    edges = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(35)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    comp = _oracle_components(edges)
    keep = {min(m for m in comp if comp[m] == c) for c in set(comp.values())}
    want = sorted(keep | (set(ids) - set(comp)))
    out = drop_near_dups(corpus, pairs, "id")
    assert sorted(r.id for r in out.collect()) == want


def test_drop_near_dups_absent_min_id_never_elected_keeper(spark):
    """Pairs computed on a superset corpus: component {0, 1} where doc 0
    was filtered out upstream must keep doc 1, not drop every present
    member (review finding r7)."""
    corpus = spark.createDataFrame([(1, "x"), (9, "y")], ["id", "text"])
    pairs = spark.createDataFrame([(0, 1)], ["doc_a", "doc_b"])
    out = drop_near_dups(corpus, pairs, "id")
    assert sorted(r.id for r in out.collect()) == [1, 9]

    # quality path: present member has NULL quality, absent min-id 0
    # must still not win
    corpus_q = spark.createDataFrame(
        [(1, None), (9, 0.5)], "id long, quality double"
    )
    out_q = drop_near_dups(corpus_q, pairs, "id", quality_col="quality")
    assert sorted(r.id for r in out_q.collect()) == [1, 9]


def test_drop_near_dups_duplicate_corpus_ids_keep_the_keeper(spark):
    """A corpus holding duplicate ROWS per id (exact dedup not yet run)
    must not delete its own keeper (review finding r7 pass 3): the
    quality join aggregates to one row per id first, so the elected
    keeper's duplicates can't land it in the loser set and wipe the
    whole component."""
    corpus = spark.createDataFrame(
        [(1, "a", 5.0), (1, "a2", 3.0), (2, "b", 1.0), (4, "d", 9.0)],
        ["id", "text", "quality"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    out = drop_near_dups(corpus, pairs, "id", quality_col="quality")
    # keeper of {1,2} is id 1 (max quality 5.0 > 1.0); BOTH id-1 rows
    # survive verbatim (drop_near_dups dedups components, not exact rows)
    assert sorted((r.id, r.quality) for r in out.collect()) == [
        (1, 3.0),
        (1, 5.0),
        (4, 9.0),
    ]
