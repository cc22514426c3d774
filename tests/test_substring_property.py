"""Property-based substring-dedup test: the distributed window-hash →
first-occurrence → gaps-and-islands pipeline must equal a direct Python
transcription of the keep-first duplicate-span definition on arbitrary
small corpora — including within-doc repeats, cross-doc copies, empty and
too-short docs, and overlapping islands."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_realtime_sessionize_sample_spark.operators.dedup import (
    duplicate_substring_spans,
    substring_dedup_coverage,
)

MIN_SPAN = 3
# A 2-token alphabet makes duplicate windows (and overlapping islands)
# common at tiny doc lengths.
_DOC = st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=12)
_CORPUS = st.lists(_DOC, min_size=1, max_size=4)


def reference_spans(corpus):
    """Keep-first duplicate spans, brute force: walk docs in id order,
    positions ascending; a window is a duplicate iff an identical window
    was seen at a strictly earlier (doc, pos); spans = maximal runs of
    consecutive duplicate positions."""
    seen: set = set()
    dup_pos: dict[int, list[int]] = {}
    for doc_id, toks in enumerate(corpus, start=1):
        for pos in range(1, len(toks) - MIN_SPAN + 2):
            w = tuple(toks[pos - 1 : pos - 1 + MIN_SPAN])
            if w in seen:
                dup_pos.setdefault(doc_id, []).append(pos)
            else:
                seen.add(w)
    spans = set()
    for doc_id, ps in dup_pos.items():
        run_start = prev = ps[0]
        for p in ps[1:] + [None]:
            if p is None or p != prev + 1:
                spans.add((doc_id, run_start, prev - run_start + MIN_SPAN))
                if p is not None:
                    run_start = p
            prev = p if p is not None else prev
    return spans, dup_pos


def reference_coverage(corpus, dup_pos):
    cov = {}
    for doc_id, ps in dup_pos.items():
        tokens = set()
        for p in ps:
            tokens.update(range(p, p + MIN_SPAN))
        cov[doc_id] = (len(corpus[doc_id - 1]), len(tokens))
    return cov


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_CORPUS)
def test_spans_and_coverage_match_reference(spark, corpus):
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus, start=1)],
        "doc_id long, text string",
    )
    expected_spans, dup_pos = reference_spans(corpus)
    got_spans = {
        (r["doc_id"], r["span_start"], r["span_len_tokens"])
        for r in duplicate_substring_spans(docs, min_span=MIN_SPAN).collect()
    }
    assert got_spans == expected_spans
    expected_cov = reference_coverage(corpus, dup_pos)
    got_cov = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in substring_dedup_coverage(docs, min_span=MIN_SPAN).collect()
    }
    assert got_cov == expected_cov
