"""Spark-compatible xxHash64 as generated DuckDB SQL.

Why this exists: the fast MinHash/LSH family hashes with Spark's
``xxhash64`` (one JVM 64-bit hash per value — no md5 digest + hex
formatting), but DuckDB ships no xxhash64, so round 3 had to pin the
ORACLED headline query to the md5 family and keep the fast family as a
recall-parity sibling. This module removes that pin: it expands the
XXH64 algorithm (public spec; Spark's variant lives in
``org.apache.spark.sql.catalyst.expressions.XXH64``, seed 42) into
pure DuckDB SQL — HUGEINT arithmetic mod 2^64, ``xor`` on UBIGINT,
rotations as shift-sums of disjoint bit ranges — so the oracle
recomputes the exact signed-64 values Spark produces, bit for bit.

Expression-size discipline: every mul/rot/xor references its operand
2-3 times, so naive nesting is exponential, and DuckDB *textually
inlines* lateral column aliases (measured: a 40-step alias chain with
3 refs per step never finishes binding). Two mechanisms keep the
generated SQL linear:

- **nested subqueries** — each hash step is one real column per
  subquery level (``SELECT *, <expr> AS step FROM (...)``), evaluated
  once per row; built by :func:`wrap_levels`. Independent chains (the
  16 seeded hashes) share levels, so depth stays ~the chain length.
- **lambda binds** — ``list_transform([expr], v -> body)[1]`` — used
  inside ``list_reduce`` loop lambdas where columns can't be added.

Checked bit-exact against ``pyspark.sql.functions.xxhash64`` over
empty/ascii/multibyte/1-100-byte strings, signed-long edge values, and
multi-column seed chains (tests/test_properties.py).
"""

from __future__ import annotations

# XXH64 constants (public algorithm, same values in Spark's XXH64.java)
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M64 = 1 << 64
_MASK = M64 - 1

SEED = 42  # Spark's fixed xxhash64 seed


# ---------------------------------------------------------------------------
# Python reference (constant folding + test ground truth)
# ---------------------------------------------------------------------------


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _MASK
    h ^= h >> 29
    h = (h * P3) & _MASK
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * P2) & _MASK, 31) * P1) & _MASK


def hash_long_py(inp: int, seed: int) -> int:
    """Spark XXH64.hashLong — unsigned result in [0, 2^64)."""
    inp &= _MASK
    h = (seed + P5 + 8) & _MASK
    h ^= (_rotl((inp * P2) & _MASK, 31) * P1) & _MASK
    h = (_rotl(h, 27) * P1 + P4) & _MASK
    return _fmix(h)


def hash_bytes_py(b: bytes, seed: int = SEED) -> int:
    """Spark XXH64.hashUnsafeBytes — unsigned result in [0, 2^64)."""
    n = len(b)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _MASK
        v2 = (seed + P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - P1) & _MASK
        while off <= n - 32:
            v1 = _round(v1, int.from_bytes(b[off : off + 8], "little"))
            v2 = _round(v2, int.from_bytes(b[off + 8 : off + 16], "little"))
            v3 = _round(v3, int.from_bytes(b[off + 16 : off + 24], "little"))
            v4 = _round(v4, int.from_bytes(b[off + 24 : off + 32], "little"))
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & _MASK
    else:
        h = (seed + P5) & _MASK
    h = (h + n) & _MASK
    while off <= n - 8:
        h ^= _round(0, int.from_bytes(b[off : off + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _MASK
        off += 8
    if off <= n - 4:
        h ^= (int.from_bytes(b[off : off + 4], "little") * P1) & _MASK
        h = (_rotl(h, 23) * P2 + P3) & _MASK
        off += 4
    while off < n:
        h ^= (b[off] * P5) & _MASK
        h = (_rotl(h, 11) * P1) & _MASK
        off += 1
    return _fmix(h)


def hash_str_py(s: str, seed: int = SEED) -> int:
    return hash_bytes_py(s.encode("utf-8"), seed)


def signed(v: int) -> int:
    """Two's-complement reinterpret: unsigned [0,2^64) -> Spark long."""
    return v - M64 if v >= (1 << 63) else v


def unsigned(v: int) -> int:
    return v + M64 if v < 0 else v


# ---------------------------------------------------------------------------
# SQL fragment builders. Every state value is HUGEINT in [0, 2^64).
# Args named `var` MUST be cheap (a column or lambda variable): they
# are referenced 2-3 times textually.
# ---------------------------------------------------------------------------

_M = "18446744073709551616::HUGEINT"


def _mod(e: str) -> str:
    return f"(({e}) % {_M})"


def _mul_const(var: str, c: int) -> str:
    """(var * c) mod 2^64 without 128-bit overflow: split both factors
    into 32-bit halves; every partial product stays under 2^64 and the
    mod-2^32 recombination of the cross terms is exact."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return _mod(
        f"({var} % 4294967296) * {lo}::HUGEINT"
        f" + ((({var} // 4294967296) * {lo}::HUGEINT"
        f" + ({var} % 4294967296) * {hi}::HUGEINT) % 4294967296) * 4294967296"
    )


def _rotl_sql(var: str, r: int) -> str:
    # the two parts occupy disjoint bit ranges, so + == |
    return f"((({var}) * {1 << r} % {_M}) + ({var}) // {1 << (64 - r)})"


def _xor_sql(a: str, b: str) -> str:
    return f"xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT))::HUGEINT"


def _shr(var: str, s: int) -> str:
    return f"(({var}) // {1 << s})"


def _bind(expr: str, var: str, body: str) -> str:
    """Lambda-bind for use inside list_reduce lambdas."""
    return f"list_transform([{expr}], {var} -> {body})[1]"


def _u64le(hx: str, off2_var: str) -> str:
    """Read 8 bytes little-endian from hex column ``hx`` starting at
    CHAR offset var ``off2_var`` (0-based = 2x byte offset)."""
    parts = " || ".join(
        f"substr({hx}, ({off2_var})::BIGINT + {2 * j + 1}, 2)" for j in range(7, -1, -1)
    )
    return f"CAST('0x' || {parts} AS UBIGINT)::HUGEINT"


def _u32le(hx: str, off2_var: str) -> str:
    parts = " || ".join(
        f"substr({hx}, ({off2_var})::BIGINT + {2 * j + 1}, 2)" for j in range(3, -1, -1)
    )
    return f"CAST('0x' || {parts} AS UBIGINT)::HUGEINT"


def _byte(hx: str, off2_var: str) -> str:
    return f"CAST('0x' || substr({hx}, ({off2_var})::BIGINT + 1, 2) AS UBIGINT)::HUGEINT"


Level = list[tuple[str, str]]  # one subquery level: [(alias, expr), ...]


def wrap_levels(
    inner: str,
    levels: list[Level],
    base_cols: list[str] | None = None,
    keep: list[str] | None = None,
) -> str:
    """Nest ``SELECT .., <exprs> FROM (...)`` one level per step group.
    Exprs in a level may reference columns from any EARLIER level (real
    columns — evaluated once per row, no textual inlining).

    With ``base_cols`` (the inner query's column names) and ``keep``
    (columns the caller needs from the final level), each level
    projects ONLY the columns still referenced downstream instead of
    ``SELECT *`` — without this, a ~60-level tower drags every dead
    intermediate through every projection, which measured as the
    dominant cost of the minhash oracle (generated aliases contain no
    word-boundary ambiguity, so \\b-regex liveness is exact)."""
    import re

    if base_cols is None or keep is None:
        sql = inner
        for level in levels:
            cols = ", ".join(f"{expr} AS {alias}" for alias, expr in level)
            sql = f"SELECT *, {cols} FROM (\n{sql}\n)"
        return sql

    # live[i] = columns (existing before level i's outputs) referenced
    # by level i..end exprs or by the final keep set
    live_after: list[set[str]] = [set(keep)]
    for level in reversed(levels):
        refs = set(live_after[-1])
        refs -= {alias for alias, _ in level}
        for _, expr in level:
            for name in re.findall(r"\b[A-Za-z_][A-Za-z0-9_]*\b", expr):
                refs.add(name)
        live_after.append(refs)
    live_before = list(reversed(live_after))  # live_before[i] for level i

    sql = inner
    avail = list(base_cols)
    for i, level in enumerate(levels):
        # live_before[i+1] = columns needed at entry to the NEXT level
        # (the keep set is seeded into the liveness computation)
        carry = [c for c in avail if c in live_before[i + 1]]
        cols = ", ".join(
            carry + [f"{expr} AS {alias}" for alias, expr in level]
        )
        sql = f"SELECT {cols} FROM (\n{sql}\n)"
        avail = carry + [alias for alias, _ in level]
    return sql


def fmix_levels(p: str) -> list[Level]:
    """Avalanche of column ``{p}_d`` into result column ``{p}``."""
    return [
        [(f"{p}_f1", _xor_sql(f"{p}_d", _shr(f"{p}_d", 33)))],
        [(f"{p}_f2", _mul_const(f"{p}_f1", P2))],
        [(f"{p}_f3", _xor_sql(f"{p}_f2", _shr(f"{p}_f2", 29)))],
        [(f"{p}_f4", _mul_const(f"{p}_f3", P3))],
        [(p, _xor_sql(f"{p}_f4", _shr(f"{p}_f4", 32)))],
    ]


def hash_long_levels(p: str, inp, seed) -> list[Level]:
    """Levels computing hashLong(inp, seed) into column ``{p}``.

    ``inp``: int (constant-folded here in Python) or a column name.
    ``seed``: int or a column name. Chain depth: 4 + 5 (fmix).
    """
    levels: list[Level] = []
    if isinstance(inp, int):
        k1 = (_rotl(((inp & _MASK) * P2) & _MASK, 31) * P1) & _MASK
        k1_expr = f"{k1}::HUGEINT"
    else:
        levels += [
            [(f"{p}_i1", _mul_const(inp, P2))],
            [(f"{p}_i2", _rotl_sql(f"{p}_i1", 31))],
            [(f"{p}_i3", _mul_const(f"{p}_i2", P1))],
        ]
        k1_expr = f"{p}_i3"
    seed_expr = f"{seed & _MASK}::HUGEINT" if isinstance(seed, int) else seed
    levels += [
        [(f"{p}_a", _mod(f"({seed_expr}) + {(P5 + 8) & _MASK}::HUGEINT"))],
        [(f"{p}_b", _xor_sql(f"{p}_a", k1_expr))],
        [(f"{p}_c", _rotl_sql(f"{p}_b", 27))],
        [(f"{p}_d", _mod(f"{_mul_const(f'{p}_c', P1)} + {P4}::HUGEINT"))],
    ]
    levels += fmix_levels(p)
    return levels


def merge_parallel(chains: list[list[Level]]) -> list[Level]:
    """Zip independent chains level-wise so total subquery depth is the
    MAX chain depth, not the sum."""
    depth = max(len(c) for c in chains)
    out: list[Level] = []
    for i in range(depth):
        level: Level = []
        for c in chains:
            if i < len(c):
                level.extend(c[i])
        out.append(level)
    return out


# ---------------------------------------------------------------------------
# Variable-length string hash (columns: hex bytes + byte length)
# ---------------------------------------------------------------------------


def _round_lambda(acc_expr: str, off2_expr: str, hx: str, tag: str) -> str:
    """round(acc, u64le(off)) with lambda binds: each intermediate is
    bound once, so the expansion is linear. For stripe-loop lambdas."""
    o, w, t, s, r = f"o{tag}", f"w{tag}", f"t{tag}", f"s{tag}", f"r{tag}"
    return _bind(
        off2_expr,
        o,
        _bind(
            _u64le(hx, o),
            w,
            _bind(
                _mul_const(w, P2),
                t,
                _bind(
                    _mod(f"({acc_expr}) + {t}"),
                    s,
                    _bind(_rotl_sql(s, 31), r, _mul_const(r, P1)),
                ),
            ),
        ),
    )


def xxh64_str_levels(p: str, hx: str, n: str, seed: int = SEED) -> list[Level]:
    """Levels computing Spark ``xxhash64`` of a VARCHAR whose UTF-8
    bytes are hex-encoded in column ``hx`` with byte-length column
    ``n`` (HUGEINT). Handles every length: >=32-byte stripes via
    list_reduce over a [v1..v4] state list, remaining 8-byte words, the
    4-byte chunk, tail bytes, avalanche. NULL input -> NULL result
    (callers CASE over it). Result: unsigned HUGEINT column ``{p}``."""
    v_init = [
        (seed + P1 + P2) & _MASK,
        (seed + P2) & _MASK,
        seed & _MASK,
        (seed - P1) & _MASK,
    ]
    # Stripe state: list [init] || [[i,0,0,0] per stripe]; the lambda's
    # element arg carries the stripe index in slot 1. Lane L of stripe
    # i reads byte offset 32i + 8L -> char offset 64i + 16L.
    stripe_lambda = (
        "(acc, b) -> ["
        + ", ".join(
            _round_lambda(f"acc[{lane + 1}]", f"64*b[1] + {16 * lane}", hx, f"l{lane}")
            for lane in range(4)
        )
        + "]"
    )
    init_sql = "[" + ", ".join(f"{v}::HUGEINT" for v in v_init) + "]"
    levels: list[Level] = [
        [(f"{p}_nst", f"({n} // 32)")],
        [
            (
                f"{p}_vs",
                f"CASE WHEN {n} >= 32 THEN list_reduce("
                f"[{init_sql}]"
                f" || [[x::HUGEINT, 0::HUGEINT, 0::HUGEINT, 0::HUGEINT]"
                f" FOR x IN generate_series(0, ({p}_nst - 1)::BIGINT)], {stripe_lambda})"
                f" ELSE NULL END",
            )
        ],
        [
            (f"{p}_e1", f"{p}_vs[1]"),
            (f"{p}_e2", f"{p}_vs[2]"),
            (f"{p}_e3", f"{p}_vs[3]"),
            (f"{p}_e4", f"{p}_vs[4]"),
        ],
        [
            (
                f"{p}_hm0",
                _mod(
                    f"{_rotl_sql(f'{p}_e1', 1)} + {_rotl_sql(f'{p}_e2', 7)}"
                    f" + {_rotl_sql(f'{p}_e3', 12)} + {_rotl_sql(f'{p}_e4', 18)}"
                ),
            )
        ],
    ]
    # mergeRound(h, v) = ((h ^ round(0, v)) * P1 + P4) mod 2^64, 4x
    for j in range(1, 5):
        levels += [
            [(f"{p}_mr{j}a", _mul_const(f"{p}_e{j}", P2))],
            [(f"{p}_mr{j}b", _rotl_sql(f"{p}_mr{j}a", 31))],
            [(f"{p}_mr{j}c", _mul_const(f"{p}_mr{j}b", P1))],
            [(f"{p}_mr{j}d", _xor_sql(f"{p}_hm{j - 1}", f"{p}_mr{j}c"))],
            [
                (
                    f"{p}_hm{j}",
                    _mod(f"{_mul_const(f'{p}_mr{j}d', P1)} + {P4}::HUGEINT"),
                )
            ],
        ]
    # post-stripe state + length; word offsets restart at 32*nst
    word_body = _bind(
        f"2*({p}_off + 8*j)",
        "wo",
        _bind(
            _u64le(hx, "wo"),
            "wv",
            _bind(
                _mul_const("wv", P2),
                "wt",
                _bind(
                    _rotl_sql("wt", 31),
                    "wr",
                    _bind(
                        _mul_const("wr", P1),
                        "wu",
                        _bind(
                            _xor_sql("acc", "wu"),
                            "wx",
                            _bind(
                                _rotl_sql("wx", 27),
                                "wy",
                                _mod(f"{_mul_const('wy', P1)} + {P4}::HUGEINT"),
                            ),
                        ),
                    ),
                ),
            ),
        ),
    )
    levels += [
        [
            (
                f"{p}_h1",
                _mod(
                    f"CASE WHEN {n} >= 32 THEN {p}_hm4"
                    f" ELSE {(seed + P5) & _MASK}::HUGEINT END + {n}"
                ),
            ),
            (f"{p}_off", f"(CASE WHEN {n} >= 32 THEN 32 * {p}_nst ELSE 0 END)"),
        ],
        [(f"{p}_nw", f"(({n} - {p}_off) // 8)")],
        [
            (
                f"{p}_h2",
                f"CASE WHEN {p}_nw > 0 THEN list_reduce("
                f"[{p}_h1] || [x::HUGEINT FOR x IN generate_series(0, ({p}_nw - 1)::BIGINT)],"
                f" (acc, j) -> {word_body}) ELSE {p}_h1 END",
            )
        ],
        # 4-byte chunk: h = rotl(h ^ (u32*P1), 23)*P2 + P3
        [(f"{p}_o4", f"({p}_off + 8 * {p}_nw)")],
        [
            (f"{p}_has4", f"({n} - {p}_o4 >= 4)"),
            (f"{p}_o42", f"(2 * {p}_o4)"),
        ],
        [(f"{p}_c4", f"CASE WHEN {p}_has4 THEN {_u32le(hx, f'{p}_o42')} ELSE 0::HUGEINT END")],
        [(f"{p}_c4m", _mul_const(f"{p}_c4", P1))],
        [(f"{p}_x4", _xor_sql(f"{p}_h2", f"{p}_c4m"))],
        [(f"{p}_r4", _rotl_sql(f"{p}_x4", 23))],
        [
            (
                f"{p}_h3",
                f"CASE WHEN {p}_has4 THEN "
                + _mod(f"{_mul_const(f'{p}_r4', P2)} + {P3}::HUGEINT")
                + f" ELSE {p}_h2 END",
            ),
            (f"{p}_o5", f"(CASE WHEN {p}_has4 THEN {p}_o4 + 4 ELSE {p}_o4 END)"),
        ],
    ]
    # tail bytes (at most 3): h = rotl(h ^ (byte * P5), 11) * P1
    prev = f"{p}_h3"
    for t in range(3):
        levels += [
            [
                (
                    f"{p}_tb{t}",
                    f"CASE WHEN {p}_o5 + {t} < {n}"
                    f" THEN {_byte(hx, f'(2*({p}_o5 + {t}))')} ELSE NULL END",
                )
            ],
            [(f"{p}_tm{t}", _mul_const(f"{p}_tb{t}", P5))],
            [(f"{p}_tx{t}", _xor_sql(prev, f"{p}_tm{t}"))],
            [(f"{p}_tr{t}", _rotl_sql(f"{p}_tx{t}", 11))],
            [
                (
                    f"{p}_h4{t}",
                    f"CASE WHEN {p}_o5 + {t} < {n}"
                    f" THEN {_mul_const(f'{p}_tr{t}', P1)} ELSE {prev} END",
                )
            ],
        ]
        prev = f"{p}_h4{t}"
    levels += [[(f"{p}_d", prev)]] + fmix_levels(p)
    return levels


def xxh64_str_sql(
    inner: str,
    text_col: str,
    out_col: str,
    carry_cols: list[str] | None = None,
) -> str:
    """Wrap ``inner`` (any SELECT producing ``text_col``) so the result
    gains unsigned-HUGEINT column ``out_col`` = Spark xxhash64 of the
    VARCHAR. NULL text -> 42 (Spark hash expressions SKIP null children,
    leaving the seed untouched — pinned by test vectors).

    ``carry_cols``: the inner query's OTHER columns to keep alongside
    ``out_col``; when given, every level projects only live columns
    (see :func:`wrap_levels`)."""
    prep: list[Level] = [
        [
            (f"{out_col}_hx", f"hex(encode({text_col}))"),
            (f"{out_col}_n", f"octet_length(encode({text_col}))::HUGEINT"),
        ]
    ]
    body = xxh64_str_levels(f"{out_col}_u", f"{out_col}_hx", f"{out_col}_n")
    final: list[Level] = [
        [
            (
                out_col,
                f"CASE WHEN {text_col} IS NULL THEN {SEED}::HUGEINT"
                f" ELSE {out_col}_u END",
            )
        ]
    ]
    if carry_cols is None:
        return wrap_levels(inner, prep + body + final)
    return wrap_levels(
        inner,
        prep + body + final,
        base_cols=list(carry_cols) + [text_col],
        keep=list(carry_cols) + [out_col],
    )


# ---------------------------------------------------------------------------
# The full MinHash/LSH oracle for the xxhash64 production family
# ---------------------------------------------------------------------------


def _signed_sql(u: str) -> str:
    """Unsigned HUGEINT [0,2^64) -> signed BIGINT (two's complement)."""
    return (
        f"(CASE WHEN {u} >= 9223372036854775808::HUGEINT"
        f" THEN ({u} - {_M}) ELSE {u} END)::BIGINT"
    )


def _unsigned_sql(v: str) -> str:
    """Signed BIGINT -> unsigned HUGEINT bit reinterpretation."""
    return (
        f"(CASE WHEN {v} < 0 THEN {v}::HUGEINT + {_M}"
        f" ELSE {v}::HUGEINT END)"
    )


def minhash_lsh_xxhash64_oracle(
    shingle_n: int = 3, num_hashes: int = 16, bands: int = 4
) -> str:
    """DuckDB oracle for ``dedup.lsh_candidate_pairs(...,
    hash_family='xxhash64')`` — the production fast family.

    Reproduces the Spark plan value-for-value:
    1. word shingles (identical split/trim to the md5-family oracle;
       short docs keep one NULL-shingle marker row, which Spark's
       null-skipping xxhash64 turns into the raw seed 42);
    2. per-shingle base hash = Spark xxhash64(shingle) via the
       generated byte-exact XXH64 expansion;
    3. k seeded values = xxhash64(base, k) = hashLong(k,
       hashLong(base, 42)) — Spark's multi-column seed chain;
    4. signature = per-doc MIN of each seeded value over SIGNED
       64-bit values (Spark's long ordering);
    5. band keys = '<b>:' || xxhash64(sig[4b+1..4b+4]) chained over
       the band's signed elements, cast to string;
    6. bucket self-join, i < j, DISTINCT.
    """
    rows = num_hashes // bands
    shingle_src = f"""
SELECT doc_id,
       unnest(CASE WHEN len(sh) > 0 THEN sh
                   ELSE [CAST(NULL AS VARCHAR)] END) AS s
FROM (
  SELECT doc_id,
         CASE WHEN len(w) >= {shingle_n}
              THEN [array_to_string(w[i:i+{shingle_n - 1}], ' ')
                    FOR i IN generate_series(1, len(w) - {shingle_n - 1})]
              ELSE [] END AS sh
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents)
)"""
    base = xxh64_str_sql(shingle_src, "s", "hb", carry_cols=["doc_id"])
    # h1 = hashLong(hb, 42): the shared inner link of every seed chain
    h1 = wrap_levels(
        base,
        hash_long_levels("h1", "hb", SEED),
        base_cols=["doc_id", "hb"],
        keep=["doc_id", "h1"],
    )
    # 16 parallel outer links: s{k} = signed(hashLong(k, h1))
    chains = [hash_long_levels(f"s{k}u", k, "h1") for k in range(num_hashes)]
    sign_level: Level = [
        (f"s{k}", _signed_sql(f"s{k}u")) for k in range(num_hashes)
    ]
    seeded = wrap_levels(
        h1,
        merge_parallel(chains) + [sign_level],
        base_cols=["doc_id", "h1"],
        keep=["doc_id"] + [f"s{k}" for k in range(num_hashes)],
    )
    mins = ", ".join(f"MIN(s{k})" for k in range(num_hashes))
    sig = f"SELECT doc_id, [{mins}] AS sig FROM (\n{seeded}\n) GROUP BY doc_id"
    # band chains over the signed signature elements
    band_inner = (
        f"SELECT doc_id, b, "
        + ", ".join(
            f"sig[b*{rows} + {j + 1}] AS be{j + 1}" for j in range(rows)
        )
        + f" FROM (\n{sig}\n) CROSS JOIN"
        f" (SELECT unnest(generate_series(0, {bands - 1})) AS b)"
    )
    levels: list[Level] = []
    prev_seed: int | str = SEED
    for j in range(rows):
        levels.append([(f"bu{j + 1}", _unsigned_sql(f"be{j + 1}"))])
        levels += hash_long_levels(f"bc{j + 1}", f"bu{j + 1}", prev_seed)
        prev_seed = f"bc{j + 1}"
    levels.append(
        [
            (
                "bucket",
                f"CAST(b AS VARCHAR) || ':' ||"
                f" CAST({_signed_sql(f'bc{rows}')} AS VARCHAR)",
            )
        ]
    )
    band_tower = wrap_levels(
        band_inner,
        levels,
        base_cols=["doc_id", "b"] + [f"be{j + 1}" for j in range(rows)],
        keep=["doc_id", "bucket"],
    )
    bands_sql = f"SELECT doc_id, bucket FROM (\n{band_tower}\n)"
    return f"""
WITH xbands AS MATERIALIZED (
{bands_sql}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM xbands a JOIN xbands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
"""
