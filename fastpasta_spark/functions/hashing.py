"""Portable deterministic hashing shared by dedup/similarity operators.

Engines disagree on built-in hash functions (Spark xxhash64 vs DuckDB's
murmur-based hash), so every hash the ORACLE must reproduce is derived
from md5 hex — identical everywhere:

    Spark : cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)
    DuckDB: ('0x' || substr(md5(x), 1, 15))::bigint

15 hex chars = 60 bits, always positive, no overflow. Seeded variants
prepend "<seed>:" to the input. Python twin provided for test oracles.
"""

from __future__ import annotations

import hashlib

# tokenizer shared by Spark SQL / DuckDB SQL / Python: ASCII-only
# case-fold via translate(), then split on non-[a-z0-9] runs. Unicode
# lower() is NOT portable (Java/Python lower('İ') = 'i' + combining
# dot, DuckDB = 'i' — fuzz-found token divergence); translate touches
# ONLY A-Z, leaves every non-ASCII character alone (it stays a
# separator), and — unlike a per-token transform(lower) — is a single
# vectorized scalar pass, which matters because shingle pipelines
# re-evaluate the token expression inside per-shingle lambdas (a
# transform-based fold benched 10-16x slower on minhash/jaccard).
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def spark_md5_hash(expr: str, seed: int | None = None) -> str:
    inp = expr if seed is None else f"concat('{seed}:', {expr})"
    return f"cast(conv(substr(md5({inp}), 1, 15), 16, 10) as bigint)"


def duckdb_md5_hash(expr: str, seed: int | None = None) -> str:
    inp = expr if seed is None else f"('{seed}:' || {expr})"
    return f"('0x' || substr(md5({inp}), 1, 15))::bigint"


def py_md5_hash(value: str, seed: int | None = None) -> int:
    inp = value if seed is None else f"{seed}:{value}"
    return int(hashlib.md5(inp.encode()).hexdigest()[:15], 16)


# MinHash permutation family: ONE md5 per shingle, then k cheap affine
# mixes mod a 30-bit prime — identical arithmetic in Spark SQL, DuckDB
# SQL and Python, and overflow-safe under Spark 4 ANSI mode:
# (h % MOD) * a + b <= ~2^60 < 2^63.
MIX_MOD = 1_000_000_007


def mix_constants(k: int) -> list[tuple[int, int]]:
    """Deterministic per-permutation (a, b) affine constants, themselves
    derived from md5 so every implementation regenerates the same family."""
    return [
        (py_md5_hash(f"mh:a:{j}") % (MIX_MOD - 1) + 1,
         py_md5_hash(f"mh:b:{j}") % MIX_MOD)
        for j in range(k)
    ]


def py_mix(h: int, a: int, b: int) -> int:
    return ((h % MIX_MOD) * a + b) % MIX_MOD


def spark_tokens(col: str = "text") -> str:
    """SQL expr: token array (ASCII case-fold, split, drop empties)."""
    return (
        f"filter(split(translate({col}, '{_UPPER}', '{_LOWER}'), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def duckdb_tokens(col: str = "text") -> str:
    return (
        f"list_filter(regexp_split_to_array("
        f"translate({col}, '{_UPPER}', '{_LOWER}'), '{TOKEN_SPLIT_RE}'), "
        "t -> t <> '')"
    )


_PY_FOLD = str.maketrans(_UPPER, _LOWER)


def py_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(TOKEN_SPLIT_RE,
                                (text or "").translate(_PY_FOLD)) if t]
