"""Duplicated-span removal (operators/spandedup.py): exact agreement
with a hand-rolled local implementation on the real fixture corpus,
synthetic keep-first/scope semantics, and the single-gram-shuffle plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.spandedup import (
    duplicated_spans,
    remove_duplicated_spans,
)
from nyc_taxi_data_warehouse_spark.plans.audit import collect_with_metrics
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"
N = 5


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9 ]", "", text.lower())
    t = re.sub(r" +", " ", t).strip()
    return t.split(" ")


def _local_reference(
    docs: list[tuple], n: int, scope: str, keep_first: bool
) -> dict:
    """Pure-Python reimplementation: returns {doc_id: (clean_text,
    n_tokens, n_removed, n_dup_spans)}."""
    toks = {d: _norm_tokens(t) for d, t in docs}
    occs: dict[tuple, list[tuple]] = {}
    for d, tk in toks.items():
        if len(tk) < n:
            continue
        for p in range(len(tk) - n + 1):
            occs.setdefault(tuple(tk[p : p + n]), []).append((d, p))
    flagged: dict = {}
    for gram, lst in occs.items():
        if scope == "corpus":
            dup = len(lst) >= 2
        else:
            dup = len({d for d, _ in lst}) >= 2
        if not dup:
            continue
        spare = {min(lst)} if keep_first else set()
        for o in lst:
            if o not in spare:
                flagged.setdefault(o[0], []).append(o[1])
    out = {}
    for d, tk in toks.items():
        starts = sorted(flagged.get(d, []))
        spans: list[list[int]] = []
        for p in starts:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + n)
            else:
                spans.append([p, p + n])
        removed = {i for s, e in spans for i in range(s, e)}
        clean = " ".join(t for i, t in enumerate(tk) if i not in removed)
        out[d] = (clean, len(tk), sum(e - s for s, e in spans), len(spans))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


@pytest.mark.parametrize("scope,keep_first", [("corpus", True), ("cross_doc", False)])
def test_matches_local_reference_on_fixture_corpus(spark, docs, scope, keep_first):
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    want = _local_reference(rows, N, scope, keep_first)
    got = remove_duplicated_spans(
        docs, "text", "doc_id", n=N, scope=scope, keep_first=keep_first
    ).collect()
    assert len(got) == len(want)
    for r in got:
        exp = want[r.doc_id]
        assert (r.clean_text, r.n_tokens, r.n_removed, r.n_dup_spans) == exp, (
            f"doc {r.doc_id}: got {(r.n_tokens, r.n_removed, r.n_dup_spans)}, "
            f"want {exp[1:]}"
        )


def test_keep_first_spares_exactly_one_copy(spark):
    """Two docs share an N-token block: the earlier (doc_id, pos)
    occurrence survives, the later one is excised."""
    block = " ".join(f"dup{i}" for i in range(N))
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {block} gamma delta"),
            (2, f"one two three {block} four five"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in remove_duplicated_spans(df, "text", "doc_id", n=N).collect()
    }
    assert block in out[1].clean_text
    assert "dup0" not in out[2].clean_text
    assert out[2].n_removed == N and out[2].n_dup_spans == 1
    assert out[1].n_removed == 0


def test_keep_first_false_removes_all_copies(spark):
    block = " ".join(f"dup{i}" for i in range(N))
    df = spark.createDataFrame(
        [(1, f"a b {block} c"), (2, f"x {block} y z")],
        "doc_id long, text string",
    )
    out = remove_duplicated_spans(
        df, "text", "doc_id", n=N, keep_first=False
    ).collect()
    assert all("dup0" not in r.clean_text for r in out)


def test_cross_doc_scope_ignores_within_doc_repeat(spark):
    block = " ".join(f"dup{i}" for i in range(N))
    df = spark.createDataFrame(
        [(1, f"{block} filler0 filler1 {block}")], "doc_id long, text string"
    )
    cross = remove_duplicated_spans(
        df, "text", "doc_id", n=N, scope="cross_doc"
    ).collect()[0]
    assert cross.n_removed == 0
    corpus = remove_duplicated_spans(
        df, "text", "doc_id", n=N, scope="corpus"
    ).collect()[0]
    assert corpus.n_removed == N  # second copy excised, first kept


def test_overlapping_flags_merge_into_one_span(spark):
    """A 2N-token shared block flags N+1 overlapping windows in the
    copy; they must merge to ONE removed span of 2N tokens."""
    block = " ".join(f"dup{i}" for i in range(2 * N))
    df = spark.createDataFrame(
        [(1, f"head {block} tail"), (2, f"pre {block} post")],
        "doc_id long, text string",
    )
    loser = [
        r
        for r in remove_duplicated_spans(df, "text", "doc_id", n=N).collect()
        if r.n_removed > 0
    ]
    assert len(loser) == 1
    assert loser[0].n_dup_spans == 1 and loser[0].n_removed == 2 * N


def test_short_docs_pass_through_untouched(spark):
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    out = remove_duplicated_spans(df, "text", "doc_id", n=N).collect()
    assert all(r.n_removed == 0 and r.clean_text == "tiny doc" for r in out)


def test_max_occurrences_guard_drops_pathological_gram(spark):
    block = " ".join(f"dup{i}" for i in range(N))
    df = spark.createDataFrame(
        [(i, f"u{i} {block} v{i}") for i in range(6)], "doc_id long, text string"
    )
    capped = duplicated_spans(
        df, "text", "doc_id", n=N, max_occurrences=3
    ).count()
    uncapped = duplicated_spans(df, "text", "doc_id", n=N).count()
    assert capped == 0 and uncapped == 5  # 6 copies, keeper spared


def test_span_dedup_shuffle_budget(spark, docs):
    """The token-scale occurrence table crosses the wire exactly once
    (the gram-hash window); everything after moves only flagged rows."""
    m = collect_with_metrics(
        remove_duplicated_spans(docs, "text", "doc_id", n=N)
    )
    assert m["n_shuffles"] <= 4, m
    assert m["spill_bytes"] == 0, m


def test_scope_validation(spark, docs):
    with pytest.raises(ValueError):
        duplicated_spans(docs, "text", "doc_id", scope="nope")


# ---------------------------------------------------------------------------
# remove_boilerplate_units
# ---------------------------------------------------------------------------


def _boiler_reference(docs, unit, min_docs):
    """Pure-Python reimplementation for exact parity."""
    split = (
        (lambda t: re.split(r"\r?\n", t))
        if unit == "line"
        else (lambda t: re.split(r"(?<=[.!?])\s+", t))
    )
    joiner = "\n" if unit == "line" else " "
    norm = lambda u: re.sub(  # noqa: E731
        " +", " ", re.sub(r"[^a-z0-9 ]", "", u.lower())
    ).strip()
    per_doc = {
        d: [u for u in split(t) if u.strip()] for d, t in docs
    }
    seen: dict[str, set] = {}
    for d, us in per_doc.items():
        for u in us:
            seen.setdefault(norm(u), set()).add(d)
    out = {}
    for d, us in per_doc.items():
        kept = [u for u in us if len(seen[norm(u)]) < min_docs]
        out[d] = (joiner.join(kept), len(us), len(us) - len(kept))
    return out


BOILER_DOCS = [
    (1, "unique intro one\nsubscribe to our newsletter\nreal content A"),
    (2, "Subscribe to our Newsletter!\nreal content B\ncookie policy"),
    (3, "real content C\nsubscribe to our newsletter\ncookie policy"),
    (4, "cookie policy\nanother unique line"),
    (5, None),
    (6, "   \n  "),
]


def test_boilerplate_lines_match_reference(spark):
    from nyc_taxi_data_warehouse_spark.operators.spandedup import (
        remove_boilerplate_units,
    )

    df = spark.createDataFrame(BOILER_DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_units, r.n_removed_units)
        for r in remove_boilerplate_units(
            df, "text", "doc_id", unit="line", min_docs=3
        ).collect()
    }
    want = _boiler_reference(
        [(d, t) for d, t in BOILER_DOCS if t is not None], "line", 3
    )
    for d, exp in want.items():
        assert got[d] == exp, (d, got[d], exp)
    # "subscribe" (3 docs, case-insensitive) and "cookie policy" (3 docs)
    # are gone everywhere; 2-doc lines survive
    assert "newsletter" not in got[1][0].lower()
    assert "real content A" in got[1][0]
    # null text: zero units, nothing removed
    assert got[5] == ("", 0, 0)


def test_boilerplate_null_and_blank_docs(spark):
    from nyc_taxi_data_warehouse_spark.operators.spandedup import (
        remove_boilerplate_units,
    )

    df = spark.createDataFrame(BOILER_DOCS, "doc_id long, text string")
    rows = {
        r.doc_id: r
        for r in remove_boilerplate_units(
            df, "text", "doc_id", unit="line", min_docs=3
        ).collect()
    }
    assert rows[6].clean_text == "" and rows[6].n_units == 0
    assert rows[6].n_removed_units == 0
    assert rows[5].clean_text == ""  # null text -> empty, no error


def test_boilerplate_sentences(spark):
    from nyc_taxi_data_warehouse_spark.operators.spandedup import (
        remove_boilerplate_units,
    )

    docs = [
        (1, "All rights reserved. Alpha insight here. More alpha."),
        (2, "Beta thought. All rights reserved. Beta closing."),
        (3, "Gamma only. All rights reserved!"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.clean_text
        for r in remove_boilerplate_units(
            df, "text", "doc_id", unit="sentence", min_docs=3
        ).collect()
    }
    assert got[1] == "Alpha insight here. More alpha."
    assert got[2] == "Beta thought. Beta closing."
    assert got[3] == "Gamma only."


def test_boilerplate_unit_validation(spark):
    from nyc_taxi_data_warehouse_spark.operators.spandedup import (
        remove_boilerplate_units,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_boilerplate_units(df, "text", "doc_id", unit="paragraph")


# ---------------------------------------------------------------------------
# hypothesis fuzz: random tiny-vocab corpora (forced collisions) must
# match the pure-Python references exactly
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

FUZZ = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 3-word vocabulary and short docs force heavy window-hash collisions,
# overlapping spans, keeper ties, and sub-n docs all at once
fuzz_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@given(docs_tokens=fuzz_docs, n=st.integers(2, 4))
@settings(**FUZZ)
def test_fuzz_span_dedup_matches_reference(spark, docs_tokens, n):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = _local_reference(rows, n, "corpus", True)
    got = remove_duplicated_spans(df, "text", "doc_id", n=n).collect()
    for r in got:
        # normalize: reference treats "" as [''] like Spark's split
        assert (r.clean_text, r.n_tokens, r.n_removed, r.n_dup_spans) == want[
            r.doc_id
        ], (r.doc_id, rows)


@given(docs_tokens=fuzz_docs, n_merges=st.integers(0, 6))
@settings(**FUZZ)
def test_fuzz_bpe_train_matches_reference(spark, docs_tokens, n_merges):
    from nyc_taxi_data_warehouse_spark.operators.bpe import train_bpe

    from .test_bpe import _local_train

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want, _ = _local_train([t for _, t in rows], n_merges)
    got = train_bpe(df, "text", n_merges=n_merges)
    assert got == want, rows
