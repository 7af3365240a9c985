"""Dump .explain('formatted') for a list of queries to plans/r12/<q>_<tag>.txt.

Usage: python tools/dump_plans_r12.py <repo_dir> <tag> <query> [<query> ...]

Run once with <repo_dir>=/tmp/r12_before tag=before (pre-r12 code) and once
with <repo_dir>=/root/repo tag=after. Plans are captured with the same
session shape as bench.py (local[$SPARK_GRAFT_CPUS]).
"""
import io
import os
import sys
from contextlib import redirect_stdout

repo, tag = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, repo)

import importlib.util
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(repo, "__spark_entry__.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         # match get_spark's driver sizing: PQ-family plan construction
         # (literal codebook trees) OOMs the default 1g driver heap
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
         .appName(f"plans-r12-{tag}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

out_dir = "/root/repo/plans/r12"
os.makedirs(out_dir, exist_ok=True)
qs = mod.queries()
for name in names:
    try:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"ok {name}")
    except Exception as e:  # noqa: BLE001 - record and continue
        print(f"FAIL {name}: {e}")
spark.stop()
