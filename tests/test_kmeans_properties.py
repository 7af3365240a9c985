"""Property suite for the spherical k-means trainer behind the IVF
indexes (similarity.ivf_centroids / ivf_refine_centroids / ivf_train).

Laws, not examples (the registry twin is `kmeans_spherical_checks`,
which pins the same laws on the embeddings table — here hypothesis
drives them over random corpora, dimensions and centroid counts):

- monotonicity: the spherical objective J = Σ_rows max_c dot(v, ĉ_c) is
  non-decreasing across EVERY refinement step (assignment maximizes each
  term; the mean direction is the exact per-cell maximizer);
- assignment optimality: every row's assigned cell attains the row's
  maximum centroid similarity;
- stability: refining already-converged centroids changes J by at most
  fp noise.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

import felixzh_flink_spark.operators.similarity as SIM

SLOW = settings(max_examples=6, deadline=None,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.function_scoped_fixture])

corpus_st = st.tuples(
    st.integers(8, 40),          # rows
    st.integers(2, 6),           # dim
    st.integers(2, 4),           # centroids
    st.integers(0, 2**31 - 1),   # seed
)


def _objective(df, cents):
    return df.agg(F.sum(
        F.array_max(SIM._cell_sims("embedding", cents)))).collect()[0][0]


@SLOW
@given(corpus_st)
def test_refinement_is_monotone_and_assignment_optimal(spark, corpus):
    import random
    n, dim, k, seed = corpus
    rnd = random.Random(seed)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = SIM.ivf_centroids(df, k)
    objs = [_objective(df, cents)]
    for _ in range(3):
        cents = SIM.ivf_refine_centroids(df, cents, iterations=1)
        objs.append(_objective(df, cents))
    for a, b in zip(objs, objs[1:]):
        assert b >= a - 1e-9 * (abs(a) + abs(b) + 1), objs

    assigned = (SIM.ivf_assign(df, cents)
                .withColumn("_s", SIM._cell_sims("embedding", cents)))
    bad = assigned.filter(
        F.expr("_s[ivf_cell - 1] < array_max(_s) - 1e-12")).count()
    assert bad == 0
