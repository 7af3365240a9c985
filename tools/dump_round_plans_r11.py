"""Capture the PER-ROUND physical plan of the iterative graph kernels.

The committed `plans/r11/<q>_{before,after}.txt` files hold the FINAL plan,
which for eager-construction iterative queries is checkpoint-truncated (the
PLANS.md disclosure discipline) — the per-round shape the round-11 kernel
rewrites changed is invisible there. This tool monkeypatches
`DataFrame.localCheckpoint` to identity for one capture session, runs ONE
round of the kernel on the sf0.001 fixture graph, and dumps
`.explain("formatted")` of the round's un-truncated output to
plans/r11/<name>_round1_<tag>.txt.

Usage: python tools/dump_round_plans_r11.py <repo_dir> <tag>
"""
import io
import os
import sys
from contextlib import redirect_stdout

repo, tag = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)

from pyspark.sql import SparkSession, functions as F
# Spark 4: sessions hand out the `classic` concrete subclass — patch it,
# not the abstract pyspark.sql.DataFrame base.
from pyspark.sql.classic.dataframe import DataFrame

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .appName(f"round-plans-{tag}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

out_dir = "/root/repo/plans/r11"
sf_dir = "/root/testdata/sf0.001"

_real_lc = DataFrame.localCheckpoint
DataFrame.localCheckpoint = lambda self, eager=True: self  # capture mode

from felixzh_flink_spark.operators.graph import (  # noqa: E402
    connected_components_star, pagerank)
from felixzh_flink_spark import queries as Q  # noqa: E402


def dump(name, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_round1_{tag}.txt"), "w") as f:
        f.write("NOTE: captured with localCheckpoint patched to identity so\n"
                "the per-round lineage is visible (the committed final plans\n"
                "are checkpoint-truncated). One kernel round, sf0.001.\n\n")
        f.write(buf.getvalue())
    print(f"ok {name}")


# --- star contraction: one round over the dedup_components_star fixture ---
d = Q._t(spark, sf_dir, "documents").select("doc_id")
mx = d.agg(F.max("doc_id")).first()[0]
edges = (d.filter((F.col("doc_id") % 64 != 63) & (F.col("doc_id") < mx))
         .select(F.col("doc_id").alias("src"),
                 (F.col("doc_id") + 1).alias("dst")))
captured = []
DataFrame.localCheckpoint = (
    lambda self, eager=True: (captured.append(self), self)[1])
try:
    connected_components_star(edges, max_iter=1)
except RuntimeError:
    pass
# captured: [nodes, e, round-1 new_e]
dump("dedup_components_star", captured[-1])

# --- pagerank: one round over the pagerank_scores fixture ---
captured.clear()
n = Q._documents_n(spark, sf_dir)
deg = F.lit(1) + F.col("doc_id") % 3
pedges = (d.filter(F.col("doc_id") % 17 != 0)
          .select(F.col("doc_id").alias("src"),
                  F.explode(F.sequence(F.lit(1), deg)).alias("k"))
          .select("src",
                  ((F.col("src") * 131 + F.col("k") * 97) % n).alias("dst")))
ranks = pagerank(d.select(F.col("doc_id").alias("node")), pedges,
                 n_nodes=n, iterations=1, damping=0.85)
dump("pagerank_scores", ranks)

DataFrame.localCheckpoint = _real_lc
spark.stop()
