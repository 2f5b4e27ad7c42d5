"""Property-based parity tests (hypothesis): the Spark operators against
pure-Python reimplementations of the reference semantics.

Each property batches all generated cases into ONE DataFrame so a hypothesis
example costs one Spark job, not one per case.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.text import text_filter_predicate
from flouds_vectordb_spark.operators.upsert import upsert
from flouds_vectordb_spark.stopwords import DEFAULT_STOPWORDS

WORDS = ["scan", "merge", "the", "of", "fast", "table", "zz1", "qq2", "batch"]
chunk_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join)
filter_st = st.lists(st.sampled_from(WORDS), min_size=1, max_size=4).map(" ".join)


def _ref_matches_text_filter(chunk: str, text_filter: str, minimum_words_match: int,
                             include_stop_words: bool) -> bool:
    """Pure-Python port of the reference `_matches_text_filter`
    (vector_store.py:888-936)."""
    words = [w for w in text_filter.lower().split() if w]
    if not include_stop_words:
        words = [w for w in words if w not in DEFAULT_STOPWORDS]
    if not words:
        return False
    low = chunk.lower()
    matches = sum(1 for w in words if w in low)
    return matches >= min(len(words), minimum_words_match)


@settings(max_examples=8, deadline=None)
@given(
    cases=st.lists(
        st.tuples(chunk_st, filter_st, st.integers(1, 4), st.booleans()),
        min_size=1, max_size=25,
    )
)
def test_text_filter_matches_reference_semantics(spark, cases):
    rows = [(i, c) for i, (c, _, _, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, chunk string")
    preds = [
        text_filter_predicate(F.col("chunk"), tf, mwm, inc).alias(f"p{i}")
        for i, (_, tf, mwm, inc) in enumerate(cases)
    ]
    got = {r["i"]: r for r in df.select("i", *preds).collect()}
    for i, (chunk, tf, mwm, inc) in enumerate(cases):
        expected = _ref_matches_text_filter(chunk, tf, mwm, inc)
        assert got[i][f"p{i}"] == expected, (chunk, tf, mwm, inc)


@settings(max_examples=8, deadline=None)
@given(
    current=st.dictionaries(st.integers(0, 15), st.text("ab", min_size=1, max_size=3),
                            min_size=0, max_size=10),
    batch=st.dictionaries(st.integers(0, 15), st.text("cd", min_size=1, max_size=3),
                          min_size=0, max_size=10),
)
def test_upsert_matches_dict_semantics(spark, current, batch):
    expected = {**current, **batch}
    cur_df = spark.createDataFrame(
        [(k, v, 0) for k, v in current.items()], "id long, chunk string, batch_ts long")
    b_df = spark.createDataFrame(
        [(k, v, 1) for k, v in batch.items()], "id long, chunk string, batch_ts long")
    got = {r["id"]: r["chunk"] for r in upsert(cur_df, b_df).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=1, max_size=20,
    ),
    q=st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=4, max_size=4),
)
def test_metric_scores_match_python_fold(spark, vecs, q):
    """Scores equal the driver-side sequential float64 fold bit-for-bit —
    the determinism contract behind oracle hashing."""
    from flouds_vectordb_spark.functions import vector as V

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "i long, v array<double>")
    got = {
        r["i"]: (r["ip"], r["l2"])
        for r in df.select(
            "i",
            V.metric_score_q("IP", F.col("v"), q).alias("ip"),
            V.metric_score_q("L2", F.col("v"), q).alias("l2"),
        ).collect()
    }
    for i, v in enumerate(vecs):
        acc = 0.0
        for a, b in zip(v, q):
            acc += float(a) * float(b)
        assert got[i][0] == acc, "IP must equal the sequential fold exactly"
        acc2 = 0.0
        for a, b in zip(v, q):
            acc2 += (float(a) - float(b)) * (float(a) - float(b))
        # Milvus L2 unit: squared distance, negated
        assert got[i][1] == -acc2


# ---- r6 operators: decontamination + auto-id allocator -----------------------

doc_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=10).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(
    train=st.lists(doc_st, min_size=1, max_size=8),
    test=st.lists(doc_st, min_size=1, max_size=4),
    n=st.integers(min_value=2, max_value=4),
)
def test_decontaminate_matches_python_set_semantics(spark, train, test, n):
    """decontaminate == pure-Python distinct-n-gram set intersection."""
    from flouds_vectordb_spark.operators.dedup import decontaminate

    def grams(text):
        toks = [w for w in text.lower().split() if w]
        if not toks:
            # mirrors the r10 shingles() pin: ZERO-token docs emit NO
            # shingles (the SQL twins always behaved this way; empty docs
            # must not match each other)
            return set()
        if len(toks) <= n:
            # short docs emit ONE shingle of the whole joined text
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    test_grams = set().union(*(grams(t) for t in test))
    expected = {}
    for i, t in enumerate(train):
        m = len(grams(t) & test_grams)
        if m >= 1:
            expected[f"d{i}"] = m

    tdf = spark.createDataFrame([(f"d{i}", t) for i, t in enumerate(train)],
                                "id string, text string")
    qdf = spark.createDataFrame([(f"t{i}", t) for i, t in enumerate(test)],
                                "id string, text string")
    got = {r["id"]: r["matched_ngrams"]
           for r in decontaminate(tdf, qdf, n=n, min_matches=1).collect()}
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=9), min_size=2, max_size=3),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_auto_id_allocator_dense_unique_any_partitioning(
        spark, tmp_path_factory, sizes, nparts):
    """Across any sequence of batch sizes and partition counts, the
    allocator's id SET is exactly 0..total-1 — dense, collision-free."""
    from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
    from flouds_vectordb_spark.operators.upsert import CollectionWriter

    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_prop")))
    cat.set_vector_store("t0")
    cat.generate_schema(CollectionSpec("t0", "m2", dimension=2,
                                       primary_key_data_type="INT64"))
    w = CollectionWriter(cat, "t0", "m2")
    total = 0
    for ts, size in enumerate(sizes, start=1):
        batch = spark.createDataFrame(
            [(f"c{i}", [float(i), 0.0]) for i in range(size)],
            "chunk string, vector array<float>").repartition(nparts)
        w.insert_data(batch, batch_ts=ts, auto_flush_min_batch=-1)
        total += size
    ids = sorted(r["id"] for r in w.read_latest().select("id").collect())
    assert ids == list(range(total))


# ---- r8 pipeline operators: pure-Python reference parity ----------------------

_LINE_WORDS = ["alpha", "beta", "gamma", "delta", "footer", "menu"]
line_st = st.lists(st.sampled_from(_LINE_WORDS), min_size=0, max_size=3).map(" ".join)
doc_st = st.lists(line_st, min_size=0, max_size=5).map("\n".join)


def _ref_remove_common_lines(docs: list[tuple[int, str]], min_docs: int):
    from collections import defaultdict

    seen = defaultdict(set)
    for i, t in docs:
        for ln in t.split("\n"):
            if ln.strip():
                seen[ln].add(i)
    flagged = {ln for ln, ids in seen.items() if len(ids) >= min_docs}
    out = {}
    for i, t in docs:
        lines = t.split("\n")
        kept = [ln for ln in lines if ln not in flagged or not ln.strip()]
        out[i] = ("\n".join(kept), len(lines) - len(kept))
    return out


@settings(max_examples=6, deadline=None)
@given(texts=st.lists(doc_st, min_size=1, max_size=12),
       min_docs=st.integers(2, 4))
def test_remove_common_lines_matches_reference(spark, texts, min_docs):
    from flouds_vectordb_spark.operators.dedup import remove_common_lines

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "id bigint, text string")
    got = {r["id"]: (r["text_clean"], r["n_lines_removed"])
           for r in remove_common_lines(df, min_docs=min_docs).collect()}
    assert got == _ref_remove_common_lines(docs, min_docs)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]),
                  st.integers(0, 20)),  # token count per doc
        min_size=1, max_size=20),
    budgets=st.dictionaries(st.sampled_from(["s0", "s1"]),
                            st.integers(0, 60), min_size=1, max_size=2),
)
def test_token_budget_matches_greedy_prefix_reference(spark, docs, budgets):
    from flouds_vectordb_spark.functions.hashing import hash64
    from flouds_vectordb_spark.operators.sampling import sample_token_budget

    rows = [(i, src, " ".join(f"w{j}" for j in range(n)))
            for i, (src, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "id bigint, source string, text string")
    got = {r["id"] for r in
           sample_token_budget(df, budgets, key_col="id", seed=2)
           .select("id").collect()}
    hv = {r["id"]: r["h"] for r in df.select(
        "id", hash64(F.col("id").cast("string"), seed=2).alias("h")).collect()}
    ref = set()
    for src in budgets:
        cum = 0
        for i, s, t in sorted(rows, key=lambda r: (hv[r[0]], r[0])):
            if s != src:
                continue
            n = len(t.split())
            if cum + n <= budgets[src]:
                cum += n
                ref.add(i)
            else:
                break
    assert got == ref


@settings(max_examples=6, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 40), min_size=1, max_size=16),
    seq_len=st.integers(1, 24),
)
def test_pack_sequences_matches_concat_and_chop_reference(spark, sizes, seq_len):
    from flouds_vectordb_spark.functions.hashing import hash64
    from flouds_vectordb_spark.operators.chunking import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(n)))
            for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "id bigint, text string")
    got = sorted(map(tuple,
                     pack_sequences(df, seq_len=seq_len, seed=6).collect()))
    hv = {r["id"]: r["h"] for r in df.select(
        "id", hash64(F.col("id").cast("string"), seed=6).alias("h")).collect()}
    # reference: concatenate in (hash, id) order, chop every seq_len tokens
    ref = []
    pos = 0
    for i, text in sorted(rows, key=lambda r: (hv[r[0]], r[0])):
        n = len(text.split())
        if n == 0:
            continue
        start, end = pos, pos + n
        for seq in range(start // seq_len, (end - 1) // seq_len + 1):
            lo, hi = max(start, seq * seq_len), min(end, (seq + 1) * seq_len)
            ref.append((seq, i, lo - seq * seq_len, lo - start, hi - lo))
        pos = end
    assert got == sorted(ref)
