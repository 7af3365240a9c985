"""Scale-proof runner (SCALE.md): run a coverage subset of the query
inventory at a given sf_dir, recording per query the wall/plan/exec
seconds of a WARM run plus the exact shuffle read/write byte deltas
(from the executor summaries — cumulative totals sampled around the
measured run), and whether the sf>=1 approx_percentile switches
actually engaged in the executed plan.

Usage: python tools/bench_scale.py /root/repo/scaledata/sf1 out.json
       [comma-separated query subset]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from felixzh_flink_spark.queries import PROBES, QUERIES  # noqa: E402

RUNNABLE = {**QUERIES, **PROBES}
from felixzh_flink_spark.session import get_spark  # noqa: E402

#: one per judged family: scan-agg, star/multi joins, skew join,
#: windows/sessionization, text stats, every dedup mode incl. CC,
#: similarity/ANN, packing, profiling (the sf>=1 switch pair), URL/PSL.
DEFAULT = [
    "q1_pricing_summary", "revenue_by_nation", "q9_product_profit",
    "q13_customer_distribution", "top_orders_per_customer",
    "skewed_supplier_revenue",
    "events_hourly", "user_sessions",
    "word_count", "tfidf_top_terms", "bigram_doc_nll", "cms_token_counts",
    "dedup_exact_docs", "minhash_lsh_pairs", "jaccard_join_exact",
    "winnow_similar_pairs", "ngram_jaccard_pairs", "dedup_components",
    "cosine_topk", "ann_ivf_topk", "ann_ivfpq_topk", "semantic_dedup_keep",
    "token_shards", "pack_sequences",
    "winsorized_price_stats", "psi_price_drift",
    "url_registrable_psl",
]


def _shuffle_totals(sc):
    store = sc._jsc.sc().statusStore()
    it = store.executorList(True).iterator()
    w = r = 0
    while it.hasNext():
        e = it.next()
        w += e.totalShuffleWrite()
        r += e.totalShuffleRead()
    return w, r


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench_scale")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    results = {}
    for name in names:
        # run 1: codegen/compile warmup; run 2: measured
        for is_measured in (False, True):
            t0 = time.perf_counter()
            df = RUNNABLE[name](spark, sf_dir)
            t1 = time.perf_counter()
            if is_measured:
                w0, r0 = _shuffle_totals(sc)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if is_measured:
                w1, r1 = _shuffle_totals(sc)
                plan_str = df._jdf.queryExecution().executedPlan().toString()
                results[name] = {
                    "wall_s": round(t2 - t0, 3),
                    "plan_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "shuffle_write_bytes": w1 - w0,
                    "shuffle_read_bytes": r1 - r0,
                    "approx_percentile_engaged":
                        "approx_percentile" in plan_str,
                }
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        print(f"{name}: {results[name]['wall_s']}s "
              f"shW={results[name]['shuffle_write_bytes']}", flush=True)
    with open(out_path, "w") as fh:
        json.dump({"sf": sf, "sf_dir": sf_dir, "queries": results}, fh,
                  indent=1)
    print(f"wrote {out_path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
