"""Sequence-packing invariants (operators/packing.py)."""

import pandas as pd
from pyspark.sql import functions as F

from felixzh_flink_spark.operators import packing as PK


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _reference_greedy(rows, pack_budget):
    """Driver-side replay of the documented greedy walk."""
    out = {}
    by_shard = {}
    for doc_id, n, shard in rows:
        by_shard.setdefault(shard, []).append((doc_id, n))
    for shard, docs in by_shard.items():
        seq, running = 0, 0
        for doc_id, n in sorted(docs):
            if running > 0 and running + n > pack_budget:
                seq, running = seq + 1, 0
            running += n
            out[doc_id] = (shard, seq)
    return out


def test_shard_assignment_matches_plain_cumsum(spark, sf_dir):
    d = _docs(spark, sf_dir)
    got = PK.assign_token_shards(d, 32768).collect()
    rows = sorted((r["doc_id"], r["n_tokens"]) for r in got)
    cum, expect = 0, {}
    for doc_id, n in rows:
        expect[doc_id] = cum // 32768
        cum += n
    assert all(r["shard_id"] == expect[r["doc_id"]] for r in got)
    # shards are contiguous id ranges starting at 0
    ids = sorted(set(r["shard_id"] for r in got))
    assert ids == list(range(len(ids)))


def test_greedy_packs_respect_budget_and_match_reference(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = PK.pack_greedy(d, 512, 32768).collect()
    # budget respected unless a single doc exceeds it alone
    for r in packed:
        assert r["pack_tokens"] <= 512 or r["n_tokens"] > 512, r
    sharded = [(r["doc_id"], r["n_tokens"], r["shard_id"]) for r in packed]
    expect = _reference_greedy(sharded, 512)
    for r in packed:
        assert (r["shard_id"], r["pack_seq"]) == expect[r["doc_id"]]


def test_greedy_pack_seq_contiguous_and_deterministic(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = PK.pack_greedy(d, 512, 32768)
    pdf = a.toPandas().sort_values("doc_id").reset_index(drop=True)
    again = PK.pack_greedy(d, 512, 32768).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pdf, again)
    for _, grp in pdf.groupby("shard_id"):
        seqs = grp.sort_values("doc_id")["pack_seq"]
        assert seqs.is_monotonic_increasing
        assert set(seqs) == set(range(seqs.max() + 1))


def test_pack_tokens_is_pack_total(spark, sf_dir):
    d = _docs(spark, sf_dir)
    pdf = PK.pack_greedy(d, 512, 32768).toPandas()
    totals = pdf.groupby(["shard_id", "pack_seq"])["n_tokens"].sum()
    declared = pdf.groupby(["shard_id", "pack_seq"])["pack_tokens"].first()
    assert (totals == declared).all()


def test_oversized_doc_gets_own_pack(spark):
    rows = [(1, "a " * 700), (2, "b"), (3, "c " * 600), (4, "d e f")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = {r["doc_id"]: r for r in PK.pack_greedy(df, 512, 10**9).collect()}
    assert packed[1]["pack_tokens"] == 700
    assert packed[3]["pack_seq"] != packed[2]["pack_seq"]
    # doc 4 shares no pack with the oversized doc 3
    assert packed[4]["pack_seq"] == packed[3]["pack_seq"] + 1
