"""Hashing primitives for dedup: shingling, MinHash, SimHash.

Two families on purpose:

- **md5-string MinHash** — each of the k hash functions is
  ``min(md5(seed || shingle))`` compared as hex strings. Slower than
  integer hashing but engine-portable (md5 is identical everywhere),
  which is what makes the MinHash/LSH pipeline DuckDB-oracle-checkable.
- **xxhash64 SimHash** — 64-bit signatures from Spark's native
  xxhash64; the fast JVM path for production, rows-only checked.

All builders return Column expressions (no UDFs, no shuffle of their
own); the shuffles belong to the operators that use them.

NOTE on the per-row forms: ``minhash_signature`` and ``simhash64``
here are the *reference definitions* — higher-order-function folds
that read as the algorithm. The production paths in
``operators/dedup.py`` re-express both as explode + grouped
aggregates (codegen, map-side combine; 10-20x faster — HOF lambdas
are interpreted and get inlined per use by projection collapse) and
are pinned bit-identical to these forms by
``tests/test_advanced.py::test_aggregate_forms_match_reference_hofs``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_tokens(text: Column) -> Column:
    """Whitespace tokenization. split on \\s+ after trim; empty text
    yields [''] in both Spark and DuckDB (kept as-is for parity)."""
    return F.split(F.trim(text), r"\s+")


def shingles(words: Column, n: int) -> Column:
    """Word n-gram shingles: ['a','b','c','d'] with n=3 ->
    ['a b c', 'b c d']. Documents shorter than n yield []."""
    count = F.size(words) - F.lit(n - 1)
    # guard: sequence(1, 0) would count DOWN in Spark, yielding [1, 0]
    return F.when(count >= 1, F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def minhash_one(shingle_arr: Column, seed: int) -> Column:
    """One MinHash value: lexicographic min of md5('<seed>|' || s).

    Hex-string min is a valid min-wise hash (uniform over the 128-bit
    space ordered lexicographically). Null on empty shingle sets.
    """
    hashed = F.transform(
        shingle_arr, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))
    )
    return F.array_min(hashed)


def minhash_signature(shingle_arr: Column, k: int) -> Column:
    """MinHash signature: array of k independent min-hashes."""
    return F.array(*[minhash_one(shingle_arr, i) for i in range(k)])


def lsh_band_keys(
    signature: Column, bands: int, rows_per_band: int, band_hash: str = "md5"
) -> Column:
    """LSH banding: hash each band of the signature to a bucket key.

    Two documents land in the same bucket for band b iff their
    signatures agree on all ``rows_per_band`` positions of that band —
    the standard S-curve knob (bands x rows = k).
    Returns array<string> of '<band>:<hash of band slice>'.

    ``band_hash``: 'md5' (portable, string-concat digest — the legacy
    oracle family) or 'xxhash64' (the production fast path: the band's
    elements feed one CHAINED multi-column ``xxhash64(e1..er)`` —
    Spark folds each long through hashLong with the running hash as
    seed, so no string concat is materialized at all; since round 4
    the DuckDB oracle reproduces the chain bit-for-bit via
    functions/xxh64_sql.py).
    """
    keys = []
    for b in range(bands):
        if band_hash == "md5":
            band_slice = F.slice(signature, b * rows_per_band + 1, rows_per_band)
            h = F.md5(F.concat_ws("", band_slice))
        else:
            els = [
                F.element_at(signature, b * rows_per_band + j + 1)
                for j in range(rows_per_band)
            ]
            h = F.xxhash64(*els).cast("string")
        keys.append(F.concat(F.lit(f"{b}:"), h))
    return F.array(*keys)


def simhash64(words: Column) -> Column:
    """64-bit SimHash of a token array, fully JVM-side.

    Per token: xxhash64 -> 64 bit indicators; summed positionally via
    a zip_with fold; bit i of the result is 1 when at least half the
    tokens have bit i set. Edge cases (pinned by tests): an EMPTY token
    array yields all-ones (-1) — the 0 >= 0 majority rule is vacuously
    true per bit; a NULL array yields null. Callers canonicalize null
    text to '' upstream (see operators/dedup.py), which tokenizes to
    [''] and hashes like any 1-token doc.
    """
    zeros = F.array_repeat(F.lit(0).cast("long"), 64)
    bit_idx = F.sequence(F.lit(0), F.lit(63))
    counts = F.aggregate(
        words,
        zeros,
        lambda acc, w: F.zip_with(
            acc,
            bit_idx,
            # call_function: the SQL shiftright accepts a Column shift
            # amount; the Python F.shiftright wrapper only takes int
            lambda a, i: a
            + F.call_function("shiftright", F.xxhash64(w), i).bitwiseAND(F.lit(1)),
        ),
    )
    n = F.size(words)
    bits = F.zip_with(
        counts,
        bit_idx,
        lambda c, i: F.when(
            c * 2 >= n, F.call_function("shiftleft", F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of XOR)."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)
