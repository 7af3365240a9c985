"""Focused units for the r12 optimization-round internals changes —
each pins a rewritten operator internal bit-identical to its previous
form (pair-set/ordering/byte parity), per the optimization brief's
"add a focused test when an optimization changes an operator's
internals"."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from felixzh_flink_spark.operators import multimodal as MM
from felixzh_flink_spark.operators import similarity as SIM
from felixzh_flink_spark.operators import text as TX


# ------------------------- packed-long banded Hamming (multimodal r12)

def test_packed_band_values_match_slice_fold(spark):
    """Band values extracted from the packed BIGINT equal the old
    per-band slice + acc*2+x fold, and bit_count(xor) equals the old
    sum-of-|diff| Hamming — on adversarial bit patterns including the
    sign-bit row (bit 0 set at grid=8, i.e. packed < 0)."""
    import random

    rng = random.Random(7)
    for grid, bands in ((4, 4), (8, 4)):
        n = grid * grid
        bw = n // bands
        rows = [[1] * n, [0] * n, [1] + [0] * (n - 1), [0] * (n - 1) + [1]]
        rows += [[rng.randint(0, 1) for _ in range(n)] for _ in range(8)]
        df = spark.createDataFrame(
            [(i, bits) for i, bits in enumerate(rows)],
            "doc_id bigint, bits array<int>")
        pack = ("aggregate(bits, CAST(0 AS BIGINT), "
                "(acc, x) -> shiftleft(acc, 1) | CAST(x AS BIGINT))")
        mask = (1 << bw) - 1
        new_bands = (f"transform(sequence(0, {bands - 1}), b -> "
                     f"shiftrightunsigned(_pb, ({bands} - 1 - "
                     f"CAST(b AS INT)) * {bw}) & {mask}L)")
        old_bands = (f"transform(sequence(0, {bands - 1}), b -> "
                     f"aggregate(slice(bits, b * {bw} + 1, {bw}), "
                     "CAST(0 AS BIGINT), (acc, x) -> acc * 2 + x))")
        got = (df.withColumn("_pb", F.expr(pack))
               .select("doc_id", F.expr(new_bands).alias("nb"),
                       F.expr(old_bands).alias("ob")).collect())
        for r in got:
            assert list(r["nb"]) == list(r["ob"]), r["doc_id"]
        # Hamming parity across all pairs
        a = df.select(F.col("doc_id").alias("ia"),
                      F.col("bits").alias("ba"),
                      F.expr(pack).alias("pa"))
        b = df.select(F.col("doc_id").alias("ib"),
                      F.col("bits").alias("bb"),
                      F.expr(pack).alias("pb"))
        pairs = (a.crossJoin(b).filter("ia < ib")
                 .select(F.expr("bit_count(pa ^ pb)").alias("new_h"),
                         F.expr("aggregate(zip_with(ba, bb, (x, y) -> "
                                "abs(x - y)), 0, (acc, d) -> acc + d)")
                         .alias("old_h")).collect())
        assert all(r["new_h"] == r["old_h"] for r in pairs)


def test_image_neardup_pairs_planted_pairs_survive_pack(spark):
    """End-to-end through the packed operator: the planted Hamming
    0/1/2 envelope groups still come out exactly (grid=4 fixture)."""
    d = spark.range(16).select(F.col("id").alias("doc_id"))
    hashed = MM.image_ahash_bits(
        MM.audio_fingerprint_cells(
            d, windows=16, synth=MM._wav_envelope_payload_fn()),
        grid=4).localCheckpoint(eager=True)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in MM.image_neardup_pairs(
               hashed, grid=4, bands=4, max_hamming=2).collect()}
    # groups of 4: members 0,1 exact (H0), member 2 flips one window
    # (H1), member 3 flips two (H2 from base, H1 from member 2)
    for g in range(4):
        b0 = 4 * g
        assert got[(b0, b0 + 1)] == 0
        assert got[(b0, b0 + 2)] == 1
        assert got[(b0 + 2, b0 + 3)] == 1
        assert got[(b0, b0 + 3)] == 2


# --------------------------------- WARC header-block split parse (r12)

def test_warc_parse_split_edge_cases():
    from felixzh_flink_spark.functions.warc_codec import (
        decode_warc, encode_warc, encode_warc_record)

    recs = [({"WARC-Type": "warcinfo", "WARC-Record-ID": "a"},
             b"software: x\r\n"),
            ({"WARC-Type": "response", "WARC-Record-ID": "b",
              "WARC-Target-URI": "http://e/1",
              "Content-Type": "text/html"}, b"the block")]
    for gz in (False, True):
        p = encode_warc(recs, gzip_per_record=gz)
        out = decode_warc(p)
        assert [(
            {k: v for k, v in h.items() if k != "Content-Length"}, blk)
            for h, blk in out] == recs
        assert all(h["Content-Length"] == str(len(blk))
                   for h, blk in out)
    # zero-header record: parse reaches the blank line immediately and
    # reports the missing Content-Length, not a parse crash
    with pytest.raises(ValueError, match="Content-Length"):
        decode_warc(b"WARC/1.0\r\n\r\n\r\n\r\n")
    # header block without the blank-line terminator
    with pytest.raises(ValueError, match="truncated WARC header"):
        decode_warc(b"WARC/1.0\r\nA: b")
    # malformed header line (no colon)
    with pytest.raises(ValueError, match="malformed WARC header"):
        decode_warc(b"WARC/1.0\r\nNoColon\r\n\r\n\r\n\r\n")
    # encode parity: Content-Length is computed, conflicting one raises
    r = encode_warc_record({"WARC-Type": "t"}, b"abc")
    assert b"Content-Length: 3\r\n" in r
    with pytest.raises(ValueError):
        encode_warc_record({"Content-Length": "4"}, b"abc")


# ------------------------------------- gopher flags in place (r12)

def test_gopher_flag_cols_match_operator(spark):
    docs = [
        (0, "the quick brown fox jumps over the lazy dog " * 12),
        (1, "short doc"),
        (2, "#### #### #### symbols " * 30),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    via_op = {r["doc_id"]: r.asDict()
              for r in TX.gopher_quality_flags(df).collect()}
    cols = TX.gopher_flag_cols("text")
    via_cols = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", *[v.alias(k) for k, v in cols.items()]).collect()}
    for i in via_op:
        for flag in ("wc_ok", "mwl_ok", "symbol_ok", "bullet_ok",
                     "ellipsis_ok", "alpha_ok", "stop_ok"):
            assert via_op[i][flag] == via_cols[i][flag], (i, flag)


# ----------------------- shared hash-sampled init (similarity r12)

def test_shared_init_prefix_is_bit_identical(spark):
    e = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), i -> "
               "cast(pmod(xxhash64(id, i), 97) as float) / 97)")
        .alias("embedding"))
    e = e.localCheckpoint(eager=True)
    init = SIM.ivf_centroids(e, 16, "vec_id", "embedding")
    cents_self = SIM.ivf_train(e, 8, max_iter=1, id_col="vec_id",
                               vec_col="embedding")
    cents_seeded = SIM.ivf_train(e, 8, max_iter=1, id_col="vec_id",
                                 vec_col="embedding",
                                 init_cents=init[:8])
    assert cents_self == cents_seeded
    books_self = SIM.pq_train(e, m=4, code_k=8, dim=8, id_col="vec_id",
                              vec_col="embedding", train_iter=1)
    books_seeded = SIM.pq_train(e, m=4, code_k=8, dim=8,
                                id_col="vec_id", vec_col="embedding",
                                train_iter=1, init_vecs=init[:8])
    assert books_self == books_seeded


def test_semantic_dedup_pre_assigned_matches_self_assigned(spark):
    e = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), i -> "
               "cast(pmod(xxhash64(id div 3, i), 53) as float) / 53)")
        .alias("embedding")).localCheckpoint(eager=True)
    cents = SIM.ivf_train(e, 4, max_iter=1)
    base = sorted(map(tuple, SIM.semantic_dedup(
        e, threshold=0.9, cents=cents).collect()))
    pre = sorted(map(tuple, SIM.semantic_dedup(
        SIM.ivf_assign(e, cents), threshold=0.9,
        cents=cents).collect()))
    assert base == pre and len(base) == 60
