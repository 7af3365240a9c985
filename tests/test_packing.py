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


# ---- property tests on the pure walk (no Spark) ----

from hypothesis import given, strategies as st

from felixzh_flink_spark.operators.packing import greedy_walk


@given(st.lists(st.integers(min_value=0, max_value=2000), max_size=200),
       st.integers(min_value=1, max_value=1024))
def test_greedy_walk_properties(tokens, budget):
    seqs, totals = greedy_walk(tokens, budget)
    assert len(seqs) == len(totals) == len(tokens)
    if not tokens:
        return
    # pack ids start at 0 and advance by at most 1
    assert seqs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
    # per-pack sum respects budget unless the pack holds ONE oversized doc
    # (zero-token docs may ride along in any pack — they contribute nothing)
    sums, biggest, nonzero = {}, {}, {}
    for n, s in zip(tokens, seqs):
        sums[s] = sums.get(s, 0) + n
        biggest[s] = max(biggest.get(s, 0), n)
        nonzero[s] = nonzero.get(s, 0) + (n > 0)
    for s, tot in sums.items():
        assert tot <= budget or (biggest[s] > budget and nonzero[s] == 1)
    # greedy is maximal: a doc opens a new pack ONLY because it wouldn't fit
    boundaries = [i for i in range(1, len(seqs)) if seqs[i] != seqs[i - 1]]
    for i in boundaries:
        assert sums[seqs[i - 1]] + tokens[i] > budget
    # running totals are consistent with pack membership
    for i, (n, s, t) in enumerate(zip(tokens, seqs, totals)):
        prev = totals[i - 1] if i and seqs[i - 1] == s else 0
        assert t == prev + n


def test_streaming_pack_continues_across_batches(spark, tmp_path):
    """U4 unified packing: the streaming packer's state (open pack seq +
    running total) carries across micro-batches, and the final assignment
    equals the batch greedy walk over the same per-key arrival order."""
    from pyspark.sql import types as T
    from felixzh_flink_spark.operators.packing import greedy_walk
    from felixzh_flink_spark.sources.builders import file_stream_source
    from felixzh_flink_spark.streaming.packing import pack_stream

    src = str(tmp_path / "src")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    batch1 = [(1, "s1", "a " * 300), (2, "s1", "b " * 300),
              (3, "s2", "c " * 100)]
    batch2 = [(4, "s1", "d " * 300), (5, "s2", "e " * 100)]
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    q = (pack_stream(file_stream_source(spark, src, schema), 512)
         .writeStream.format("memory").queryName("packed_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"]: (r["key"], r["pack_seq"]) for r in
           spark.sql("SELECT * FROM packed_stream").collect()}
    # per-key reference walks over doc-id arrival order
    s1_seqs, _ = greedy_walk([300, 300, 300], 512)   # docs 1, 2, 4
    s2_seqs, _ = greedy_walk([100, 100], 512)        # docs 3, 5
    assert got[1] == ("s1", s1_seqs[0]) and got[2] == ("s1", s1_seqs[1])
    assert got[4] == ("s1", s1_seqs[2])              # state crossed batches
    assert got[3] == ("s2", s2_seqs[0]) and got[5] == ("s2", s2_seqs[1])
    assert got[4][1] == 2                            # 300+300>512 twice over
