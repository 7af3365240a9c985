"""cProfile the per-row WARC fixture roundtrip (encode + decode) that
dominates crawl_to_corpus's fused Arrow stage — pure Python, no Spark.

Usage: python tools/profile_warc.py [n_docs]
"""
from __future__ import annotations

import cProfile
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from felixzh_flink_spark.functions.warc_codec import decode_warc  # noqa: E402
from felixzh_flink_spark.operators.multimodal import _warc_payload  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
text = ("the quick brown fox jumps over the lazy dog " * 40).strip()
html = ("<html><head><style>p{color:red}</style></head><body><h1>src</h1><p>"
        + text + "</p><script>var x=1;</script><p>Tail</p></body></html>")


def roundtrip():
    for i in range(n):
        p = _warc_payload(i, html, f"https://example.com/public/{i}")
        records = decode_warc(p)
        responses = [(h, b) for h, b in records
                     if h.get("WARC-Type") == "response"]
        assert len(responses) == 1
        h, b = responses[0]
        _ = (len(records), h.get("WARC-Target-URI"), len(b),
             b.decode("utf-8"))


t0 = time.perf_counter()
roundtrip()
print(f"wall {time.perf_counter() - t0:.3f} s for {n} docs")

pr = cProfile.Profile()
pr.enable()
roundtrip()
pr.disable()
stats = pstats.Stats(pr)
stats.sort_stats("cumulative").print_stats(25)
