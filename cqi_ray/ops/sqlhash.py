"""DuckDB SQL replay of the engine's splitmix64 hash chain.

The sketches in ``ops/sketch.py`` (HyperLogLog registers, count-min
bucket indices) are deterministic pure functions of the input multiset
because their value hash is unseeded splitmix64.  That makes them
ORACLE-ABLE: DuckDB can recompute the exact same uint64 hashes and
replay the register/bucket math bit-for-bit, turning "approximate by
design" sketch queries into hash-exact driver checks (the estimate is
approximate relative to the true answer, but it is an exact,
deterministic function of the data — and THAT function is what the
oracle replays).

DuckDB has no wrapping 64-bit multiply (``UBIGINT * UBIGINT`` raises on
overflow, and ``<< 32`` overflow-checks even UBIGINT), so the helpers
below synthesize ``(a * C) mod 2**64`` from 32-bit limb products —
every intermediate stays under 2**64:

    lo = (a & M32) * (C & M32)                       -- < 2**64
    cross = ((a&M32)*(C>>32) & M32) + ((a>>32)*(C&M32) & M32)
    result = (lo & M32) + (((lo >> 32) + cross) & M32) * 2**32

Verified element-for-element against the numpy implementation in
``relational._splitmix64`` (tests/test_ops.py::TestSqlHashReplay).
"""

from __future__ import annotations

_M32 = "4294967295::UBIGINT"
_SH32 = "* 4294967296::UBIGINT"  # << 32 (DuckDB overflow-checks shifts)


def mul64(z: str, c: int) -> str:
    """SQL expression: ``(z * c) mod 2**64`` for UBIGINT expr ``z`` and
    python int constant ``c``."""
    c_lo, c_hi = c & 0xFFFFFFFF, c >> 32
    zl = f"({z} & {_M32})"
    zh = f"({z} >> 32)"
    lo = f"({zl} * {c_lo}::UBIGINT)"
    cross = (f"((({zl} * {c_hi}::UBIGINT) & {_M32}) + "
             f"(({zh} * {c_lo}::UBIGINT) & {_M32}))")
    return (f"((({lo}) & {_M32}) + "
            f"(((({lo} >> 32) + {cross}) & {_M32}) {_SH32}))")


def add64(z: str, c: int) -> str:
    """SQL expression: ``(z + c) mod 2**64``."""
    c_lo, c_hi = c & 0xFFFFFFFF, c >> 32
    lo = f"(({z} & {_M32}) + {c_lo}::UBIGINT)"
    return (f"(({lo} & {_M32}) + "
            f"(((({z} >> 32) + {c_hi}::UBIGINT + ({lo} >> 32)) & {_M32}) "
            f"{_SH32}))")


def splitmix64_select(inner_sql: str, in_expr: str, out_col: str,
                      rounds: int = 1) -> str:
    """SELECT over ``inner_sql`` adding ``out_col`` =
    splitmix64^rounds(``in_expr``); all other columns pass through.

    Matches ``relational._splitmix64`` (and the engine's int-column
    ``_splitmix64_any``, which is one extra splitmix64 round).  Each
    mixing step becomes one nested subselect so the expression stays
    linear in size.
    """
    sql = f"SELECT *, CAST({in_expr} AS UBIGINT) AS {out_col} FROM ({inner_sql})"
    for _ in range(rounds):
        z = out_col
        steps = [
            add64(z, 0x9E3779B97F4A7C15),
            lambda a: mul64(f"xor({a}, {a} >> 30)", 0xBF58476D1CE4E5B9),
            lambda b: mul64(f"xor({b}, {b} >> 27)", 0x94D049BB133111EB),
            lambda c: f"xor({c}, {c} >> 31)",
        ]
        sql = (f"SELECT * EXCLUDE ({z}), {steps[0]} AS __sm_a FROM ({sql})")
        sql = (f"SELECT * EXCLUDE (__sm_a), {steps[1]('__sm_a')} AS __sm_b "
               f"FROM ({sql})")
        sql = (f"SELECT * EXCLUDE (__sm_b), {steps[2]('__sm_b')} AS __sm_c "
               f"FROM ({sql})")
        sql = (f"SELECT * EXCLUDE (__sm_c), {steps[3]('__sm_c')} AS {z} "
               f"FROM ({sql})")
    return sql
