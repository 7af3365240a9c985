"""Hypothesis parity suites for the round-8 operators: PageRank vs a
single-machine power-iteration reference, the BPE trainer vs an
independent pure-Python trainer, and the JL projection's driver-side /
SQL-side fold bit-equality — the same brute-force-parity discipline as
the jaccard/CEP/temporal-join suites.
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from felixzh_flink_spark.operators.graph import pagerank
from felixzh_flink_spark.operators.similarity import (
    project_vec,
    random_projection_sql,
)
from felixzh_flink_spark.operators.text import bpe_train_merges

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


# ----------------------------------------------------------- pagerank

def _pr_reference(nodes, edges, iterations, damping=0.85):
    from collections import defaultdict
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(float)
        mass = 0.0
        for v in nodes:
            if out[v]:
                share = r[v] / len(out[v])
                for d in out[v]:
                    contrib[d] += share
            else:
                mass += r[v]
        r = {v: (1 - damping) / n + damping * (contrib[v] + mass / n)
             for v in nodes}
    return r


edges_st = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 17)),  # some dsts
    min_size=0, max_size=40)                            # outside nodes


@SLOW
@given(edges=edges_st)
def test_pagerank_matches_reference_on_arbitrary_graphs(spark, edges):
    """Any mix of self-loops, parallel edges, dangling nodes, and
    out-of-node-set targets: the engine's decimal-exact quantized
    pipeline must track the float reference to ~1e-9 (4 rounds keeps
    each example cheap; the reference matches any round count)."""
    nodes = list(range(15))
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long") \
        if edges else spark.createDataFrame([], "src long, dst long")
    got = {r.node: r.rank
           for r in pagerank(ndf, edf, n_nodes=15, iterations=4).collect()}
    ref = _pr_reference(nodes, edges, iterations=4)
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - ref[v]) < 1e-9, (v, got[v], ref[v])


# -------------------------------------------------------- BPE trainer

def _bpe_reference(word_freqs, n_merges):
    vocab = {tuple(w): n for w, n in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        mx = max(pairs.values())
        best = min(p for p in pairs if pairs[p] == mx)
        merges.append(best + (pairs[best],))
        merged = best[0] + best[1]
        nv = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best[:2]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


corpus_st = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1, max_size=30)


@SLOW
@given(words=corpus_st)
def test_bpe_trainer_matches_independent_reference(spark, words):
    """Trainer output (pairs AND weighted counts) over arbitrary small
    corpora must equal an independently-written greedy reference —
    catches tokenization, tiebreak, weighting, and apply drift."""
    d = spark.createDataFrame([(1, " ".join(words))],
                              "doc_id long, text string")
    got = bpe_train_merges(d, n_merges=4, max_vocab=None,
                           return_counts=True)
    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    assert got == _bpe_reference(freqs, 4)


# ------------------------------------------------------ JL projection

vec_st = st.lists(
    st.floats(min_value=-10, max_value=10,
              allow_nan=False, allow_infinity=False, width=32),
    min_size=8, max_size=8)


@SLOW
@given(vecs=st.lists(vec_st, min_size=1, max_size=4))
def test_projection_driver_and_sql_folds_are_bit_equal(spark, vecs):
    """project_vec must reproduce the SQL-side fold bit-for-bit for
    arbitrary float inputs — the property every rp oracle rides on."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "vec_id long, embedding array<float>")
    rows = df.select("vec_id", "embedding",
                     F.expr(random_projection_sql("embedding", 4, 8))
                     .alias("p")).collect()
    for r in rows:
        py = project_vec([float(x) for x in r["embedding"]], 4)
        assert list(r["p"]) == py
        assert all(math.isfinite(x) for x in py)
