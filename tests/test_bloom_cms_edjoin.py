"""Operator-level tests for the round-4 additions: Bloom join pruning,
Count-Min frequency sketch, and the Ed-Join edit-distance similarity join.

The registered queries prove end-to-end oracle parity; these tests pin the
operator guarantees on adversarial synthetic inputs the testdata can't
produce (hot collision regimes, random typo mutations, keys absent from the
build side).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.operators.bloom import (
    bloom_bitset,
    bloom_might_contain,
)


def test_bloom_no_false_negatives_and_prunes(spark):
    # Build side: 500 even keys. Probe side: 0..9999.
    build = spark.range(0, 1000, 2).limit(500).select(F.col("id").alias("k"))
    m, k = 1 << 12, 3
    bits = bloom_bitset(build, "k", num_bits=m, num_hashes=k)
    assert len(bits) == m // 64
    probe = spark.range(10000).select(F.col("id").alias("k"))
    kept = probe.filter(bloom_might_contain(F.col("k"), bits, m, k))
    kept_keys = {r.k for r in kept.collect()}
    # No false negatives: every build key survives the filter.
    build_keys = {r.k for r in build.collect()}
    assert build_keys <= kept_keys
    # The filter actually prunes: most of the 10k probe keys are dropped.
    # (500 keys in 4096 bits, k=3 → FP rate ~4%; allow a wide margin.)
    assert len(kept_keys) < 2500


def test_bloom_filter_precedes_join_exchange(spark):
    # The probe filter must be a plain codegen predicate — visible in the
    # physical plan as a Filter containing xxhash64, NOT an extra join.
    build = spark.range(100).select(F.col("id").alias("k"))
    bits = bloom_bitset(build, "k", num_bits=1 << 10, num_hashes=3)
    probe = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    plan = probe.filter(
        bloom_might_contain(F.col("k"), bits, 1 << 10, 3)
    )._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "Join" not in plan


def test_cms_never_undercounts(spark):
    # Zipf-ish skewed items with a tiny width so collisions are guaranteed:
    # the CMS invariant est >= true must hold for EVERY item regardless.
    rng = random.Random(7)
    items = [f"item{int(rng.paretovariate(1.2)) % 50}" for _ in range(5000)]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    d, w = 3, 32  # 50 distinct into 32 cells: heavy collision regime
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(row).alias("d"),
                        F.pmod(F.xxhash64("item", F.lit(row)), F.lit(w)).alias("c"),
                    )
                    for row in range(d)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.c")
    sketch = {(r.d, r.c): r.cnt for r in cells.groupBy("d", "c").count().withColumnRenamed("count", "cnt").collect()}
    true = {r.item: r.cnt for r in df.groupBy("item").count().withColumnRenamed("count", "cnt").collect()}
    probe = df.select("item").distinct().select(
        "item",
        *[
            F.pmod(F.xxhash64("item", F.lit(row)), F.lit(w)).alias(f"c{row}")
            for row in range(d)
        ],
    )
    total = len(items)
    for r in probe.collect():
        est = min(sketch[(row, r[f"c{row}"])] for row in range(d))
        assert est >= true[r.item]
        assert est <= total


def _brute_pairs(names: list[str], k: int) -> set[tuple[str, str, int]]:
    def lev(a: str, b: str) -> int:
        if abs(len(a) - len(b)) > k:
            return k + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            x, y = (a, b) if a < b else (b, a)
            dd = lev(x, y)
            if dd <= k:
                out.add((x, y, dd))
    return out


def test_edjoin_prefix_filter_is_lossless_on_random_typos(spark):
    # Random base strings + ≤2-edit mutants: the q-gram prefix filter chain
    # must find exactly the brute-force pair set.
    rng = random.Random(13)
    alpha = "abcdefgh"
    bases = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(7, 12)))
        for _ in range(40)
    ]

    def mutate(s: str) -> str:
        for _ in range(rng.randint(1, 2)):
            op = rng.choice("sid")
            p = rng.randrange(len(s))
            if op == "s":
                s = s[:p] + rng.choice(alpha) + s[p + 1 :]
            elif op == "i":
                s = s[:p] + rng.choice(alpha) + s[p:]
            elif len(s) > 7:
                s = s[:p] + s[p + 1 :]
        return s

    names = sorted({*bases, *[mutate(b) for b in bases for _ in range(2)]})
    k, q = 2, 2
    prefix_len = k * q + 1
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    grams = df.select(
        "p_name",
        F.explode(
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.expr(
                            "transform(sequence(1, length(p_name) - 1),"
                            " i -> substring(p_name, i, 2))"
                        )
                    )
                ),
                1,
                prefix_len,
            )
        ).alias("g"),
    )
    b = grams.select(F.col("p_name").alias("name_b"), F.col("g").alias("g_b"))
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in (
            grams.join(
                b, (F.col("g") == F.col("g_b")) & (F.col("p_name") < F.col("name_b"))
            )
            .select(F.col("p_name").alias("name_a"), "name_b")
            .distinct()
            .filter(F.abs(F.length("name_a") - F.length("name_b")) <= k)
            .withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("dist") <= k)
            .collect()
        )
    }
    assert got == _brute_pairs(names, k)


def test_edjoin_low_gram_fallback_catches_zero_overlap_pairs(spark):
    # r4 advisor: strings with <= k*q distinct bigrams can be within edit
    # distance k yet share ZERO grams ("aaaa" vs "abab": gram sets {aa} vs
    # {ab, ba}). The low-gram fallback tier must recover exactly the
    # brute-force pair set anyway.
    from flink_realtime_sessionize_sample_spark.plans.analytics_queries import (
        fuzzy_edit_distance_pairs,
    )

    names = ["aaaa", "abab", "aaab", "zzzz", "zzyz", "qrstuvw", "a"]
    df = spark.createDataFrame([(n,) for n in sorted(set(names))], "p_name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_edit_distance_pairs(df).collect()
    }
    want = _brute_pairs(sorted(set(names)), 2)
    assert got == want


def test_edjoin_lossless_on_short_repetitive_alphabet(spark):
    # Small alphabet + short lengths maximize low-gram strings (<= 4
    # distinct bigrams), exercising the fallback tier against brute force
    # across the full mixed population, not just handpicked cases.
    from flink_realtime_sessionize_sample_spark.plans.analytics_queries import (
        fuzzy_edit_distance_pairs,
    )

    rng = random.Random(97)
    alpha = "abc"
    names = sorted(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(2, 9)))
            for _ in range(60)
        }
    )
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_edit_distance_pairs(df).collect()
    }
    want = _brute_pairs(names, 2)
    assert got == want
