"""Bloom-filter semi-join pruning — the runtime-filter pattern, explicit.

Spark's AQE injects bloom runtime filters into shuffle joins on its own
(`spark.sql.optimizer.runtime.bloomFilter.enabled`); this module makes the
same trick available as a LIBRARY primitive for the decontamination /
denylist workloads of a training-data pipeline, where the "small" side
(an eval set or blocklist of millions of fingerprints) is too big to
broadcast as a JOIN HASH RELATION (~100 bytes/key in a BroadcastHashJoin)
but whose BLOOM is tiny (10 bits/key → 80× smaller, a few MB for millions
of keys, shipped once in the plan).

Scale shape at 100 TB:
- the filter is a flat ``array<bigint>`` bit set attached as a single
  literal column — evaluated once per row inside whole-stage codegen,
  zero Python, zero shuffle, zero extra scan for the membership test;
- corpus rows that miss the bloom (the overwhelming majority) are decided
  map-side and never shuffle;
- only bloom HITS (true matches + the ~1% false-positive tail) reach the
  exact confirm join, so the join's shuffle volume is O(matches), not
  O(corpus).

The price is a second scan of the corpus for the hit branch (scan ≪
shuffle at scale; persist the fingerprinted corpus if scans are the
bottleneck). Everything here is deterministic — xxhash64 with fixed
seeds — so results are reproducible and oracle-checkable.

No counterpart in the reference (its only join surface is SQL joins,
felixzh-flink has no bloom/runtime-filter machinery); this is a
beyond-reference scale primitive.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for a key: pmod(xxhash64(key, seed), m) per seed.
    Independent seeded hashes (not the Kirsch-Mitzenmacher double-hash
    trick) — xxhash64 is cheap and codegen'd, and k is small."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def _to_signed64(w: int) -> int:
    return w - (1 << 64) if w >= (1 << 63) else w


#: above this filter size, `bloom_build` switches to the word-aggregated
#: path automatically: a 2²⁷-bit filter's distinct positions are ~1 GiB of
#: collected rows worst-case, while its words are ≤ 16 MiB.
WORD_AGG_THRESHOLD_BITS = 1 << 27


def bloom_build(keys: DataFrame, key_col: str, num_bits: int,
                num_hashes: int = 7) -> list[int]:
    """Build the bit set: one distributed pass over `keys` computing bit
    positions, then a driver collect of the DISTINCT positions — bounded by
    min(num_bits, n_keys × num_hashes), i.e. by the filter size itself,
    never by the key count. Returns ceil(num_bits/64) signed 64-bit words.

    For filters ≥ `WORD_AGG_THRESHOLD_BITS` (decontamination against 10⁷+
    key denylists at 100-TB corpus scale) this dispatches to
    `bloom_build_words`, which ORs positions into 64-bit words inside
    Spark first so the driver collects at most num_bits/64 rows — a 64×
    tighter bound that also drops the wide `distinct` shuffle in favor of
    a partial-aggregated `bit_or`."""
    if num_bits >= WORD_AGG_THRESHOLD_BITS:
        return bloom_build_words(keys, key_col, num_bits, num_hashes)
    return bloom_build_distinct(keys, key_col, num_bits, num_hashes)


def bloom_build_distinct(keys: DataFrame, key_col: str, num_bits: int,
                         num_hashes: int = 7) -> list[int]:
    """The distinct-position build path, callable directly regardless of
    `num_bits` (the `bloom_word_agg_checks` assertion oracle needs it to
    stay a genuine second implementation above the dispatch threshold —
    comparing `bloom_build` to `bloom_build_words` there would compare
    the word-agg path against itself). Production code should call
    `bloom_build`, which picks the path by filter size."""
    pos = (keys
           .select(F.explode(F.array(*_bit_positions(F.col(key_col),
                                                     num_bits, num_hashes))).alias("p"))
           .distinct()
           .collect())
    words = [0] * ((num_bits + 63) // 64)
    for row in pos:
        p = row["p"]
        words[p // 64] |= 1 << (p % 64)
    return [_to_signed64(w) for w in words]


def bloom_build_words(keys: DataFrame, key_col: str, num_bits: int,
                      num_hashes: int = 7) -> list[int]:
    """Word-aggregated bloom build: positions → (word_idx, single-bit
    word) → `groupBy(word_idx).agg(bit_or)` → collect NON-EMPTY words.

    Scale shape: the per-partition partial `bit_or` collapses every
    position a partition sees into ≤ num_bits/64 rows BEFORE the
    shuffle (map-side combine), the final agg merges word-sized rows,
    and the driver materializes only words with at least one set bit —
    min(num_bits/64, n_keys × num_hashes) rows of 16 bytes. A 10⁹-bit
    decontamination filter collects ≤ 15.6 M words ≈ 250 MB worst case
    and typically far less, where the distinct-position path would
    collect up to 10⁹ rows. Bit-identical output to the local path
    (same seeds, same position math)."""
    pos = F.explode(F.array(*_bit_positions(F.col(key_col),
                                            num_bits, num_hashes)))
    rows = (keys
            .select(pos.alias("p"))
            # positions are non-negative (pmod), so div/% are exact
            .select(F.expr("p div 64").alias("w"),
                    F.expr("shiftleft(1L, int(p % 64))").alias("bit"))
            .groupBy("w").agg(F.bit_or("bit").alias("word"))
            .collect())
    words = [0] * ((num_bits + 63) // 64)
    for row in rows:
        words[row["w"]] = row["word"]  # already signed-64 from the JVM
    return words


def with_bloom_hit(df: DataFrame, key_col: str, words: list[int],
                   num_bits: int, num_hashes: int = 7,
                   alias: str = "_bloom_hit") -> DataFrame:
    """Attach a boolean membership-test column. The bit set travels as a
    ONE-ROW BROADCAST relation (BroadcastNestedLoopJoin against a single
    row), not as a plan literal: a literal would be inlined by
    CollapseProject into every per-seed probe and serialized into every
    task binary — the expression-bloat anti-pattern (the IVF lesson) —
    while a broadcast ships the words once per executor and the probes
    reference an attribute evaluated once per row."""
    spark = df.sparkSession
    bits_df = spark.createDataFrame([(words,)], "_bloom_bits array<bigint>")
    staged = df.crossJoin(F.broadcast(bits_df))
    pos = _bit_positions(F.col(key_col), num_bits, num_hashes)
    for i, p in enumerate(pos):
        staged = staged.withColumn(f"_bp{i}", p)
    # variable-amount shiftleft needs the SQL form (the Column API only
    # takes a literal shift); positions are already non-negative via pmod
    tests = [
        F.expr(f"(element_at(_bloom_bits, int(_bp{i} div 64) + 1)"
               f" & shiftleft(1L, int(_bp{i} % 64))) != 0")
        for i in range(num_hashes)
    ]
    hit = reduce(lambda a, b: a & b, tests)
    return (staged.withColumn(alias, hit)
            .drop("_bloom_bits", *[f"_bp{i}" for i in range(num_hashes)]))


def sized_bits(n_keys: int, bits_per_key: int = 10) -> int:
    """Power-of-two bit count ≥ bits_per_key×n (10 bits/key ≈ 1% FP at
    k=7). Pow-of-two keeps pmod cheap and sizes predictable; floor 1024."""
    target = max(1024, bits_per_key * max(1, n_keys))
    m = 1024
    while m < target:
        m *= 2
    return m


def decontaminate_bloom(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        bits_per_key: int = 10,
                        num_hashes: int = 7) -> DataFrame:
    """Exact test-set decontamination with a bloom pre-filter: identical
    RESULT to `text.decontaminate` (drop corpus docs whose normalized
    fingerprint appears in the benchmark), different SCALE SHAPE — for
    benchmark sets too big to broadcast-hash-join:

      1. bloom over the benchmark fingerprints (one pass over the small
         side + a bounded driver collect of set bits);
      2. corpus rows failing the membership test pass map-side — no
         shuffle, no join, decided inside codegen;
      3. only bloom hits (matches + FP tail) are exact-confirmed with an
         anti-join, so the shuffled volume is O(contaminated), not
         O(corpus).

    False positives cannot drop clean docs — the confirm join re-checks
    every hit against the real fingerprint set. Deterministic seeds →
    the full pipeline is oracle-checkable against a plain anti-join.
    """
    from felixzh_flink_spark.operators.text import fingerprint_md5

    bench_fp = (fingerprint_md5(benchmark, text_col)
                .select("fingerprint").distinct())
    # the benchmark side is the small one by definition; counting it is one
    # tiny job and fixes the filter size before the corpus pass
    num_bits = sized_bits(bench_fp.count(), bits_per_key)
    words = bloom_build(bench_fp, "fingerprint", num_bits, num_hashes)

    corpus_fp = with_bloom_hit(fingerprint_md5(corpus, text_col),
                               "fingerprint", words, num_bits, num_hashes)
    clean_fast = corpus_fp.filter(~F.col("_bloom_hit"))
    confirmed_clean = (corpus_fp.filter(F.col("_bloom_hit"))
                       .join(bench_fp, "fingerprint", "left_anti"))
    return (clean_fast.unionByName(confirmed_clean)
            .drop("fingerprint", "_bloom_hit"))
