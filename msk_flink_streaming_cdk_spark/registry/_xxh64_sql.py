"""Spark ``xxhash64`` replayed in pure DuckDB SQL — the primitive
that converts hash-derived operators (count-min cells, MinHash
permutations, SimHash votes, rolling fingerprints) from rows-only
driver checks to value-compared oracles.

xxHash64 is a public algorithm (Cyan4973/xxHash spec); Spark's
``XxHash64`` expression applies it per input type — an 8-byte
little-endian block for longs, a 4-byte block for ints, the general
variable-length byte path for strings — chaining multi-argument calls
by feeding each result in as the next seed. Everything here generates
plain SQL text over mod-2^64 arithmetic:

- Multiplications are 32-bit-split so no intermediate overflows
  HUGEINT (a full 64x64 product would).
- Multi-step chains MUST be rendered as nested-subquery projection
  levels (one alias per level): DuckDB expands lateral column
  references INLINE, and a chain whose steps reference the previous
  alias 3-6 times blows up exponentially (measured >17 min for a
  same-SELECT chain vs ~1s nested).
- Variable-length loops (32-byte stripes, 8-byte words, tail bytes)
  are ``list_reduce`` folds over ``list_transform(range(...))`` —
  lambda parameters are runtime VALUES, not planner aliases, so the
  expression tree stays fixed-size. ``list_prepend(init, items)``
  seeds the fold and makes the empty case total (DuckDB's
  ``list_reduce`` errors on empty lists).

Verified value-identical to Spark for longs (positive/negative/zero),
ints, and strings of every length 0..100 including multi-byte UTF-8
(`tests/test_llm_ops.py::test_xxh64_sql_matches_spark`).
"""

from __future__ import annotations

_M64 = "18446744073709551616::HUGEINT"

# xxHash64 prime constants (public xxHash spec), unsigned literals.
P1 = "11400714785074694791::UBIGINT"  # 0x9E3779B185EBCA87
P2 = "14029467366897019727::UBIGINT"  # 0xC2B2AE3D27D4EB4F
P3 = "1609587929392839161::UBIGINT"   # 0x165667B19E3779F9
P4 = "9650029242287828579::UBIGINT"   # 0x85EBCA77C2B2AE63
P5 = "2870177450012600261::UBIGINT"   # 0x27D4EB2F165667C5

# (2^64 - P1) % 2^64, for the v4 = seed - P1 stripe accumulator.
NEG_P1 = "7046029288634856825::UBIGINT"


def umul64(a: str, b: str) -> str:
    """Mod-2^64 multiply: 32-bit split keeps every intermediate
    inside HUGEINT."""
    return (
        f"CAST((((({a}) >> 32)::HUGEINT * (({b}) & 4294967295)::HUGEINT"
        f" + (({a}) & 4294967295)::HUGEINT * (({b}) >> 32)::HUGEINT"
        f") % 4294967296 * 4294967296"
        f" + (({a}) & 4294967295)::HUGEINT * (({b}) & 4294967295)::HUGEINT"
        f") % {_M64} AS UBIGINT)"
    )


def add64(*terms: str) -> str:
    body = " + ".join(f"({t})::HUGEINT" for t in terms)
    return f"CAST(({body}) % {_M64} AS UBIGINT)"


def rotl64(x: str, r: int) -> str:
    # the two parts occupy disjoint bits, so + is |.
    return (
        f"CAST(((({x})::HUGEINT * {1 << r}) % {_M64}"
        f" + (({x}) >> {64 - r})::HUGEINT) AS UBIGINT)"
    )


def sql_u64(col: str) -> str:
    """Two's-complement reinterpret BIGINT -> UBIGINT (a plain CAST
    on a negative value errors)."""
    return f"CAST(((({col})::HUGEINT % {_M64}) + {_M64}) % {_M64} AS UBIGINT)"


def sql_i64(col: str) -> str:
    """Two's-complement reinterpret UBIGINT -> BIGINT (the inverse of
    ``sql_u64`` — Spark's xxhash64 returns the signed view)."""
    return (
        f"CAST((({col})::HUGEINT - CASE WHEN ({col}) >= "
        f"9223372036854775808::UBIGINT THEN {_M64} ELSE 0::HUGEINT END)"
        f" AS BIGINT)"
    )


def _round(acc: str, lane: str) -> str:
    # acc = rotl31(acc + lane * P2) * P1
    return umul64(rotl64(add64(acc, umul64(lane, P2)), 31), P1)


def _round0(lane: str) -> str:
    return umul64(rotl64(umul64(lane, P2), 31), P1)


def _avalanche_steps(acc: str, p: str) -> list:
    return [
        (f"fv1{p}", f"xor({acc}, ({acc}) >> 33)"),
        (f"fv2{p}", umul64(f"fv1{p}", P2)),
        (f"fv3{p}", f"xor(fv2{p}, fv2{p} >> 29)"),
        (f"fv4{p}", umul64(f"fv3{p}", P3)),
        (f"h{p}", f"xor(fv4{p}, fv4{p} >> 32)"),
    ]


def xxh64_long_steps(v_u: str, seed_u: str, p: str) -> list:
    """(alias, expr) chain computing ``h{p}`` = XXH64 of one 8-byte
    little-endian long ``v_u`` with seed ``seed_u`` (both UBIGINT
    expressions) — Spark's ``xxhash64`` long path."""
    return [
        (f"k1a{p}", umul64(v_u, P2)),
        (f"k1b{p}", rotl64(f"k1a{p}", 31)),
        (f"k1c{p}", umul64(f"k1b{p}", P1)),
        (f"ac0{p}", add64(seed_u, P5, "8::UBIGINT")),
        (f"ac1{p}", f"xor(ac0{p}, k1c{p})"),
        (f"ac2{p}", rotl64(f"ac1{p}", 27)),
        (f"ac3{p}", umul64(f"ac2{p}", P1)),
        (f"ac4{p}", add64(f"ac3{p}", P4)),
    ] + _avalanche_steps(f"ac4{p}", p)


def xxh64_int_steps(v_u: str, seed_u: str, p: str) -> list:
    """(alias, expr) chain computing ``h{p}`` = XXH64 of one 4-byte
    little-endian int ``v_u`` (UBIGINT expression holding a value in
    [0, 2^32)) with seed ``seed_u`` — Spark's ``xxhash64`` int path."""
    return [
        (f"ia0{p}", add64(seed_u, P5, "4::UBIGINT")),
        (f"ia1{p}", f"xor(ia0{p}, {umul64(v_u, P1)})"),
        (f"ia2{p}", rotl64(f"ia1{p}", 23)),
        (f"ia3{p}", umul64(f"ia2{p}", P2)),
        (f"ia4{p}", add64(f"ia3{p}", P3)),
    ] + _avalanche_steps(f"ia4{p}", p)


def _lane8(hx: str, off: str) -> str:
    """Little-endian 8-byte lane at byte offset ``off`` (expression)
    of the zero-padded hex string ``hx``: reverse the byte pairs into
    a big-endian hex literal and parse."""
    parts = " || ".join(
        f"substr({hx}, 2*(({off}) + {k}) + 1, 2)" for k in range(7, -1, -1)
    )
    return f"CAST('0x' || {parts} AS UBIGINT)"


def _lane4(hx: str, off: str) -> str:
    parts = " || ".join(
        f"substr({hx}, 2*(({off}) + {k}) + 1, 2)" for k in range(3, -1, -1)
    )
    return f"CAST('0x' || {parts} AS UBIGINT)"


def _byte(hx: str, off: str) -> str:
    return f"CAST('0x' || substr({hx}, 2*({off}) + 1, 2) AS UBIGINT)"


def xxh64_str_steps(s_col: str, seed_u: str, p: str) -> list:
    """(alias, expr) chain computing ``h{p}`` = XXH64 of the UTF-8
    bytes of VARCHAR expression ``s_col`` with seed ``seed_u`` —
    Spark's ``xxhash64`` string path, any length.

    The byte stream is the hex encoding padded with zeros so lane
    reads past the end never error (their values only flow into
    branches the length arithmetic discards). Stripe and tail loops
    are list folds; all offsets are computed from ``nb{p}`` (the byte
    length) exactly as the xxHash reference walks its pointer."""
    hx = f"hx{p}"
    nb = f"nb{p}"
    stripe_lanes = (
        f"list_transform(range((({nb}) // 32)::BIGINT), i -> ["
        + ", ".join(_lane8(hx, f"32*i + {8 * q}") for q in range(4))
        + "])"
    )
    stripe_fold = (
        f"list_reduce(list_prepend(["
        + ", ".join(
            [add64(seed_u, P1, P2), add64(seed_u, P2), f"({seed_u})",
             add64(seed_u, NEG_P1)]
        )
        + f"], {stripe_lanes}), (a, l) -> ["
        + ", ".join(_round(f"a[{q + 1}]", f"l[{q + 1}]") for q in range(4))
        + "])"
    )
    # tail geometry: after the stripes, r = nb % 32 bytes remain at
    # offset t0; n8 full 8-byte words, then maybe one 4-byte word,
    # then r % 4 single bytes. Both tail loops are bounded (<= 3
    # iterations each), so they are UNROLLED into CASE-guarded
    # projection levels: a list_reduce lambda fold measured ~0.1 ms
    # per step in DuckDB (7.6 s for 26k rows), the unrolled integer
    # arithmetic is ~100x cheaper. Reads past the end are safe (the
    # hex stream is zero-padded); the CASE keeps the accumulator
    # unchanged for lanes beyond n8.
    t8_steps = []
    for i in range(3):
        li = f"tl{i}{p}"
        prev = f"sa1{p}" if i == 0 else f"ta{i - 1}{p}"
        t8_steps += [
            (li, _lane8(hx, f"t0{p} + {8 * i}")),
            (f"tr{i}{p}", _round0(li)),
            (f"ta{i}{p}",
             f"CASE WHEN ((({nb}) % 32) // 8) >= {i + 1} THEN "
             + add64(
                 umul64(rotl64(f"xor({prev}, tr{i}{p})", 27), P1), P4
             )
             + f" ELSE {prev} END"),
        ]
    byte_steps = []
    for i in range(3):
        bi = f"bl{i}{p}"
        prev = f"sa3{p}" if i == 0 else f"ba{i - 1}{p}"
        byte_steps += [
            (bi, _byte(hx, f"pb{p} + {i}")),
            (f"ba{i}{p}",
             f"CASE WHEN (({nb}) % 4) >= {i + 1} THEN "
             + umul64(
                 rotl64(f"xor({prev}, {umul64(bi, P5)})", 11), P1
             )
             + f" ELSE {prev} END"),
        ]
    return [
        (hx,
         f"hex(encode({s_col})) || repeat('0', 64)"),
        (nb, f"octet_length(encode({s_col}))"),
        # the whole stripe machinery is guarded: for nb < 32 the fold
        # result is unused, and the per-row list allocation it costs
        # is the hot path for short strings (DuckDB evaluates CASE
        # branches lazily via selection vectors).
        (f"sv{p}", f"CASE WHEN ({nb}) >= 32 THEN {stripe_fold}"
                   f" ELSE NULL END"),
        # merge the four stripe accumulators (only used when nb >= 32)
        (f"mg0{p}",
         add64(rotl64(f"sv{p}[1]", 1), rotl64(f"sv{p}[2]", 7),
               rotl64(f"sv{p}[3]", 12), rotl64(f"sv{p}[4]", 18))),
        (f"mg1{p}",
         add64(umul64(f"xor(mg0{p}, {_round0(f'sv{p}[1]')})", P1), P4)),
        (f"mg2{p}",
         add64(umul64(f"xor(mg1{p}, {_round0(f'sv{p}[2]')})", P1), P4)),
        (f"mg3{p}",
         add64(umul64(f"xor(mg2{p}, {_round0(f'sv{p}[3]')})", P1), P4)),
        (f"mg4{p}",
         add64(umul64(f"xor(mg3{p}, {_round0(f'sv{p}[4]')})", P1), P4)),
        (f"sa0{p}",
         f"CASE WHEN {nb} >= 32 THEN mg4{p}"
         f" ELSE {add64(seed_u, P5)} END"),
        (f"sa1{p}", add64(f"sa0{p}", f"({nb})::UBIGINT")),
        (f"t0{p}", f"(({nb}) - (({nb}) % 32))::BIGINT"),
    ] + t8_steps + [
        (f"sa2{p}", f"ta2{p}"),
        (f"p4{p}", f"(({nb}) - (({nb}) % 8))::BIGINT"),
        (f"sa3{p}",
         f"CASE WHEN (({nb}) % 8) >= 4 THEN "
         + add64(
             umul64(
                 rotl64(
                     f"xor(sa2{p}, {umul64(_lane4(hx, f'p4{p}'), P1)})", 23
                 ),
                 P2,
             ),
             P3,
         )
         + f" ELSE sa2{p} END"),
        (f"pb{p}", f"(({nb}) - (({nb}) % 4))::BIGINT"),
    ] + byte_steps + [
        (f"sa4{p}", f"ba2{p}"),
    ] + _avalanche_steps(f"sa4{p}", p)


def nest(base_select: str, steps: list) -> str:
    """Render a step chain as nested-subquery projection levels over
    ``base_select`` (see module docstring for why not lateral)."""
    q = base_select
    for alias, expr in steps:
        q = f"SELECT *, {expr} AS {alias} FROM ({q})"
    return q
