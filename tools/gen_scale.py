"""Scale-up generator: replicate the driver's sf0.1 tables to sf1/sf10
with KEY REMAPPING so cardinalities scale like a real TPC-H scale-up
(not a degenerate 10x duplication of every key).

Usage:  python tools/gen_scale.py 1 [out_root]
        python tools/gen_scale.py 10

Design per table (k = target_sf / 0.1 copies; copy 0 is verbatim):
- region/nation: fixed dimensions, copied as-is (as in TPC-H).
- customer/supplier/part/orders/lineitem: key columns offset by
  i * (max_key of the base) per copy, with FK columns offset by the
  SAME per-table constant so referential joins scale (10x customers
  each still own ~10 orders; join fan-outs are preserved, not
  squared).
- events: event_id/user_id offset; timestamps KEPT (10x density per
  hour — how a busier deployment actually scales; window results stay
  window-shaped).
- documents: doc_id offset; per-copy TEXT MUTATION replaces ~45% of
  tokens with hash-derived words (deterministic xxhash64 of
  (doc_id, copy, position)), so copies are NOT near-duplicates of
  each other: token-set Jaccard between two mutated copies is ~0.18,
  far below every dedup threshold. Without this, every dedup/minhash
  query would see k^2-sized duplicate cliques — a different workload,
  not a bigger one.
- embeddings: vec_id offset; vector dims circularly ROTATED by a
  per-copy shift (preserves norm and component distribution while
  decorrelating directions, so ANN/near-dup structure scales instead
  of collapsing into k-sized duplicate clusters).

Deterministic (seeded hashes only), single pass per table, written
with Spark so sf10 (~60M lineitem rows) streams through executors.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from felixzh_flink_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
BASE_SF = 0.1


def _copies(df: DataFrame, k: int, shifts: dict[str, int],
            mutate=None) -> DataFrame:
    out = []
    for i in range(k):
        c = df
        for col, off in shifts.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * off))
        if mutate is not None:
            c = mutate(c, i)
        out.append(c)
    u = out[0]
    for c in out[1:]:
        u = u.unionByName(c)
    return u


def _mutate_text(c: DataFrame, i: int) -> DataFrame:
    if i == 0:
        return c
    toks = F.split(F.trim(F.col("text")), r"\s+")
    mutated = F.expr(
        # position j's fate is a pure hash of (doc_id, copy, j): 45%
        # of tokens become hash-derived words, decorrelating copies
        f"array_join(transform(tokens_tmp, (t, j) -> "
        f"IF(pmod(xxhash64(doc_id, {i}, j), 100) < 45, "
        f"concat('w', pmod(xxhash64(doc_id, {i}, j, 7), 5000)), t)), ' ')")
    return (c.withColumn("tokens_tmp", toks)
            .withColumn("text",
                        F.when(F.length(F.trim(F.col("text"))) == 0,
                               F.col("text")).otherwise(mutated))
            .withColumn("n_chars", F.length("text").cast("long"))
            .drop("tokens_tmp"))


def _rotate_embedding(c: DataFrame, i: int) -> DataFrame:
    if i == 0:
        return c
    shift = (i * 7) % 16 or 3
    return c.withColumn(
        "embedding",
        F.expr(f"concat(slice(embedding, {shift + 1}, "
               f"size(embedding) - {shift}), "
               f"slice(embedding, 1, {shift}))"))


def main() -> None:
    target_sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out_root = (sys.argv[2] if len(sys.argv) > 2
                else str(Path(__file__).resolve().parent.parent
                         / "scaledata"))
    k = round(target_sf / BASE_SF)
    sf_name = (f"sf{int(target_sf)}" if target_sf == int(target_sf)
               else f"sf{target_sf}")
    out = os.path.join(out_root, sf_name)
    os.makedirs(out, exist_ok=True)
    spark = get_spark("gen_scale")

    def rd(name):
        return spark.read.parquet(f"{BASE}/{name}.parquet")

    def wr(df, name, parts):
        (df.repartition(parts)
         .write.mode("overwrite").parquet(f"{out}/{name}.parquet"))
        print(f"{name}: {df.count()} rows -> {out}/{name}.parquet",
              flush=True)

    maxes = {
        "customer": 15_000, "supplier": 1_000, "part": 20_000,
        "orders": rd("orders").agg(F.max("o_orderkey")).first()[0],
        "events": rd("events").agg(F.max("event_id")).first()[0],
        "users": rd("events").agg(F.max("user_id")).first()[0],
        "documents": rd("documents").agg(F.max("doc_id")).first()[0] + 1,
        "embeddings": rd("embeddings").agg(F.max("vec_id")).first()[0] + 1,
    }

    for name in ("region", "nation"):
        rd(name).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: copied", flush=True)

    wr(_copies(rd("customer"), k, {"c_custkey": maxes["customer"]}),
       "customer", max(1, k // 2))
    wr(_copies(rd("supplier"), k, {"s_suppkey": maxes["supplier"]}),
       "supplier", 1)
    wr(_copies(rd("part"), k, {"p_partkey": maxes["part"]}),
       "part", max(1, k // 2))
    wr(_copies(rd("orders"), k, {"o_orderkey": maxes["orders"],
                                 "o_custkey": maxes["customer"]}),
       "orders", 4 * k)
    wr(_copies(rd("lineitem"), k, {"l_orderkey": maxes["orders"],
                                   "l_partkey": maxes["part"],
                                   "l_suppkey": maxes["supplier"]}),
       "lineitem", 8 * k)
    wr(_copies(rd("events"), k, {"event_id": maxes["events"],
                                 "user_id": maxes["users"]}),
       "events", 2 * k)
    wr(_copies(rd("documents"), k, {"doc_id": maxes["documents"]},
               mutate=_mutate_text),
       "documents", 2 * k)
    wr(_copies(rd("embeddings"), k, {"vec_id": maxes["embeddings"]},
               mutate=_rotate_embedding),
       "embeddings", max(1, k // 2))
    spark.stop()


if __name__ == "__main__":
    main()
