"""Cross-engine deterministic hashing primitives.

All dedup/similarity operators need hashes that the DuckDB oracle can
reproduce exactly, so everything derives from md5 (available and
bit-identical in both engines) rather than Spark's xxhash64/murmur:

- ``h32(col)``: first 8 hex chars of md5 → long in [0, 2^32).
  Spark: ``conv(substr(md5(x),1,8),16,10)``;
  DuckDB: ``('0x' || substr(md5(x),1,8))::UBIGINT``.
- minhash permutations: ``(a_i * (h mod P) + b_i) mod P`` with
  P = 2^31-1 (products stay < 2^62 — no signed-64 overflow, ANSI-safe).

The constants are fixed so signatures are stable across sessions —
content-addressed dedup output is reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# deterministic permutation constants (generated once from a fixed seed;
# a_i odd, in [1, P), b_i in [0, P))
MINHASH_A = [
    1106258711, 636103939, 1201411261, 1931057767, 1408335461, 570409411,
    859484767, 1265549107, 1711708241, 402678959, 1477271503, 769060337,
    1861421563, 253586233, 1035678217, 1549372877,
]
MINHASH_B = [
    592387217, 1983733459, 310082573, 1257951511, 872643991, 1651482209,
    78843371, 1402817453, 958103729, 1795126087, 523310893, 1092201347,
    230498561, 1889215583, 671382919, 1322100457,
]
NUM_HASHES = len(MINHASH_A)


def h32(col: Column) -> Column:
    """32-bit hash of a string column, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB twin of :func:`h32`."""
    return f"CAST(('0x' || substr(md5({expr}),1,8)) AS UBIGINT)::BIGINT"


def minhash_perm(hash_col: Column, i: int) -> Column:
    """i-th minhash permutation of an ``h32`` value (element level)."""
    return (F.lit(MINHASH_A[i]) * (hash_col % MERSENNE_P) + F.lit(MINHASH_B[i])) % MERSENNE_P


def minhash_perm_sql(hash_expr: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * ({hash_expr} % {MERSENNE_P}) + {MINHASH_B[i]}) % {MERSENNE_P})"


def zvalue(x: Column, y: Column, bits: int = 12) -> Column:
    """Morton/Z-order interleave of two non-negative ints (``bits`` low
    bits each → one ``2·bits``-bit key). Sorting by the z-value gives a
    write layout whose files are small rectangles in (x, y) space, so
    file-level min/max statistics prune scans filtered on EITHER
    dimension — the multi-column clustering trick single-key sorting
    can't provide. Pure shift/mask arithmetic: identical in DuckDB
    (:func:`zvalue_sql`), exact, JVM-codegen'd.
    """
    terms = None
    for i in range(bits):
        tx = F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        t = tx + ty
        terms = t if terms is None else terms + t
    return terms.cast("long")


def zvalue_sql(x: str, y: str, bits: int = 12) -> str:
    """DuckDB twin of :func:`zvalue` (same shift/mask arithmetic)."""
    parts = []
    for i in range(bits):
        parts.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
        parts.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return "CAST((" + " + ".join(parts) + ") AS BIGINT)"
