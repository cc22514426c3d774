"""Broadcast Bloom-filter join pruning.

The classic big-data join optimization the reference never needs (its one
pipeline has no joins — SURVEY.md §2.9): when a selective dimension filter
drives a join against a huge fact table, shuffling the full fact side just
to discard most of it at the join is the dominant cost. A Bloom filter built
over the dimension keys is a *constant-size* summary (here 32 Ki bits =
4 KiB, independent of data volume) that the fact scan can test **before any
exchange**, so rows that cannot join are dropped at the parquet scan's
output, inside WholeStageCodegen, with zero network cost.

Spark itself injects runtime bloom filters under AQE
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this module makes the
pattern explicit and portable — the build side is a DataFrame aggregation,
the probe side a pure column expression — so it composes with any plan and
its effect is visible/testable rather than optimizer-dependent.

Correctness contract: a Bloom filter has **no false negatives**, so
``filter(bloom_might_contain(...))`` followed by the exact join returns
bit-identical results to the unpruned join — which is exactly what the
DuckDB oracle of ``bloom_pruned_join`` checks. False positives only cost
work; the exact join removes them.

Scale notes (100 TB design point):

* The bitset is built with one narrow aggregation over the (already
  filtered) dimension keys: explode k positions per key → ``bit_or`` per
  64-bit word → at most ``num_bits/64`` rows cross the wire. The driver
  materializes O(num_bits) bytes — a **fixed** 4 KiB here, like the O(1)
  convergence fingerprint in ``dedup.py`` — then re-broadcasts it as a
  literal array in the probe expression. Nothing data-proportional ever
  touches the driver.
* The probe is k ``xxhash64`` + bit tests per row — pure codegen, no
  Python, no shuffle, evaluated before the join exchange so the filter
  *precedes* the shuffle in the physical plan.
* Sizing: with n keys and m bits, the false-positive rate is
  ``(1 - e^(-kn/m))^k``; callers pick ``num_bits`` for their n (the query
  below uses m=2^15, k=3 for ~3k keys → ~1.4% FP).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit(pos: Column) -> Column:
    """1 << (pos % 64) as a long (F.shiftleft only takes a literal count)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of a key: pmod(xxhash64(key, seed), m) per seed."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(num_bits))
        for seed in range(num_hashes)
    ]


def bloom_bitset(
    df: DataFrame, col: str, num_bits: int = 1 << 15, num_hashes: int = 3
) -> list[int]:
    """Aggregate ``df[col]`` into a Bloom bitset of ``num_bits`` bits.

    Returns the bitset as a dense list of ``num_bits // 64`` signed 64-bit
    words (Java long semantics — bit 63 makes the word negative; the probe
    side tests with bitwise AND, which is sign-agnostic). The aggregation
    ships at most ``num_bits/64`` (word, bits) rows to the driver — a fixed
    few KiB regardless of ``df``'s size.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = df.select(
        F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            _bit(F.col("pos")).alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    out = [0] * (num_bits // 64)
    for row in words:
        out[row["w"]] = row["bits"]
    return out


def bloom_might_contain(
    col: Column, bitset: list[int], num_bits: int, num_hashes: int = 3
) -> Column:
    """Pure-codegen membership test against a bitset from ``bloom_bitset``.

    True ⇐ the key was in the build side (no false negatives); may be true
    for a small fraction of absent keys (false positives), which a
    downstream exact join eliminates.
    """
    # One SQL-parsed array literal instead of F.lit(list) (r16): F.lit on
    # a Python list builds array() from one py4j-materialized Literal per
    # element — 512 driver round trips for the 32 Kib bitset, ~0.8 s of
    # plan-BUILD time per probe (measured; the parsed expr is ~4 ms). The
    # resulting Catalyst Literal array is identical. Long.MIN_VALUE needs
    # a cast spelling: Spark's lexer rejects -9223372036854775808L because
    # the unary minus parses after the (out-of-range) magnitude.
    arr = F.expr(
        "array("
        + ",".join(
            "CAST('-9223372036854775808' AS BIGINT)" if w == -(1 << 63) else f"{w}L"
            for w in bitset
        )
        + ")"
    )
    tests = []
    for pos in _positions(col, num_bits, num_hashes):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        mask = _bit(pos)
        tests.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, tests)
