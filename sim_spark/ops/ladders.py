"""Deterministic corpus-count-keyed scale dials (round 9).

Round 8's sf1 rehearsal measured two super-linear keys whose only
defect was a FIXED partition-count dial: `dedup_semantic_clusters`
(fixed ``_SEM_K`` centroids — per-cell candidate pairs grow n²/K) and
`dedup_embedding_ann` (fixed IVF ``nlist`` — probe cost n·(n/nlist)).
The production fix every IVF/SemDeDup deployment uses is K ∝ √n; what
this module adds is a DETERMINISTIC integer ladder for it, so the dial
is a pure function of the corpus count and the DuckDB oracle can
recompute the identical K from the identical COUNT(*) — the keys stay
hash-oracled at every scale factor with no float log/sqrt boundary
hazard (the ladder is defined by integer shifts only).

Ladder: ``j* = min{{j : 4^j >= n}}``, ``K = max(floor, 2^(j*-shift))``
— i.e. K is √n rounded UP to a power of two, optionally divided by
``2^shift`` for a gentler constant (larger cells → higher LSH/IVF
recall), floored so degenerate corpora keep a sane cell count.

At 10× rows K grows ~√10×, per-cell membership grows ~√10×, so the
quadratic-within-cell stage grows ~10^1.5 ÷ 10^0.5 = 10× total — linear
in the work a 10× corpus must do, which is what the r8 verdict's
"wall ratio ≈ linear" gate asks of these keys.
"""

from __future__ import annotations


def pow2_sqrt_ladder(n: int, shift: int = 0, floor: int = 8) -> int:
    """Smallest power of two >= sqrt(n), >> ``shift``, floored.

    Pure integer arithmetic — bit-identical to the SQL twin
    :func:`pow2_sqrt_ladder_sql` for any n >= 0."""
    j = 0
    while (1 << (2 * j)) < n:
        j += 1
    return max(floor, 1 << max(0, j - shift))


def pow10_suffix_ladder(n: int, target: int = 150, max_k: int = 6) -> int:
    """Digit-suffix blocking-key length: smallest k with 10^k · target
    >= n, capped — i.e. enough suffix digits that uniform blocks hold
    ~target members no matter the corpus size. Pure integers;
    bit-identical to :func:`pow10_suffix_ladder_sql`."""
    k = 1
    while k < max_k and 10**k * target < n:
        k += 1
    return k


def pow10_suffix_ladder_sql(count_from: str, target: int = 150,
                            max_k: int = 6) -> str:
    """DuckDB scalar twin of :func:`pow10_suffix_ladder`. 10^j is built
    as CAST('1' || repeat('0', j) AS BIGINT) — exact integer, no float
    power boundary hazard."""
    return (
        f"(SELECT COALESCE(MIN(t.j), {max_k}) FROM range(1, {max_k + 1}) t(j) "
        f"WHERE CAST('1' || repeat('0', t.j) AS BIGINT) * {target} >= "
        f"(SELECT COUNT(*) FROM {count_from}))"
    )


def pow2_sqrt_ladder_sql(count_from: str, shift: int = 0, floor: int = 8) -> str:
    """DuckDB scalar-subquery twin of :func:`pow2_sqrt_ladder`.

    ``count_from`` is a FROM-clause body whose COUNT(*) is the corpus
    size (e.g. ``"embeddings"``). Emits a self-contained scalar
    subquery, integer shifts only (no float log/sqrt), so both engines
    derive the identical K from the identical count."""
    return (
        f"(SELECT GREATEST({floor}, 1 << GREATEST(0, MIN(t.j) - {shift})) "
        f"FROM range(0, 32) t(j) "
        f"WHERE (CAST(1 AS BIGINT) << (2 * t.j)) >= "
        f"(SELECT COUNT(*) FROM {count_from}))"
    )
