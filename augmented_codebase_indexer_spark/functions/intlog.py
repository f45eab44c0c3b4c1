"""Libm-free fixed-point integer logarithm, identical in Spark and DuckDB.

Round 4/5 lesson: any gated column whose dataflow touches ``ln`` — even
"quantize once to micro-nats" — is hostage to the libm build of whichever
engine evaluates it.  ``round(ln(p)·1e6)`` differed by 1 ulp between the
driver's DuckDB build and this sandbox's, flipping one token's lp_micro
and poisoning every per-document sum (CORRECTNESS r4/r5: lm_quality
rows ✓ schema ✓ hash ✗).  The fix is to remove libm from the gate
entirely: define the quantization as PURE BIGINT arithmetic both engines
must evaluate bit-identically.

Construction (classic shift-and-square binary logarithm — Knuth TAOCP
vol. 1 §1.2.2, also HAKMEM/CORDIC lineage; nothing engine-specific):

1. ``p = n/d`` for BIGINT ``n, d ≥ 1``.  Find ``a = msb(n)``,
   ``b = msb(d)`` by a 6-step compare-and-shift cascade (no loops).
2. Normalize both to Q30 in ``[2^30, 2^31)``; one truncating division
   gives the mantissa ``m ∈ [2^30, 2^31)`` and exponent ``e`` with
   ``p ≈ (m/2^30)·2^e``.
3. 20 squaring steps extract 20 fractional bits of ``log2(m)``:
   square (Q30·Q30 ≤ 2^62, no overflow), renormalize, emit a bit.
4. ``l2q20 = e·2^20 + frac`` is ``log2(p)`` in Q20 fixed point;
   ``ln_micro = round(l2q20 · ln2·1e6 / 2^20)`` converts to integer
   micro-nats with ln(2)·1e6 carried as the two-part integer constant
   ``693147 + 180559945/1e9`` (15 significant digits — a single
   693147 constant would bias results by 2.6e-7 relative, i.e. 8 micro
   at 30 nats), so no float ever exists.

Accuracy: ≤ 2 micro-nats from true ln for all (n, d) (error budget:
mantissa truncations ≈ 2^-28 in log2, frac floor 2^-20 ≈ 0.66
micro-nats, final rounding 0.5, ln2 constant ~1e-15 relative) —
measured in ``tests/test_intlog.py``.  Determinism: every step is BIGINT compare /
multiply / truncating divide / shift, bit-identical across engines by
the SQL standard, like the md5 register expressions in
``operators/hll.py``.

Every expression is emitted as the SAME arithmetic in two dialects
(Spark: ``DIV``/``shiftleft``; DuckDB: ``//``/``<<`` — both divisions
truncate toward zero, probed), consumed as lateral column aliases
(supported by Spark ≥ 3.4 and DuckDB).

Domain: ``n, d`` BIGINT ≥ 1, both < 2^62.  Works for p < 1 (log-probs),
p = 1 (→ 0) and p > 1 (idf).  At 100-TB corpus scale the inputs are
token counts (n ≤ d ≈ 10^13 ≈ 2^44) — far inside the domain.

Reference anchor: the reference gates quality scores before indexing
(`src/aci/core/scanner.py:283`); this module is the exactness layer
that lets those gates be byte-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# ln(2)·1e6 = 693147.180559945309… split as A + B/1e9 (exact to ~1e-15
# relative) so the Q20→micro conversion stays in BIGINT range:
# |l2q20| ≤ 63·2^20 ≈ 6.6e7, ×B ≈ 1.2e16 < 2^63
LN2_MICRO_A = 693_147
LN2_MICRO_B = 180_559_945
_B_SCALE = 1_000_000_000
_Q = 20             # fractional bits of log2
_HALF_Q = 1 << (_Q - 1)
_ONE_Q30 = 1 << 30
_TWO_Q30 = 1 << 31


def _div(x: str, y: str, dialect: str) -> str:
    op = "DIV" if dialect == "spark" else "//"
    return f"(({x}) {op} ({y}))"


def _shl(x: str, k: str, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftleft({x}, CAST({k} AS INT))"
    return f"(({x}) << ({k}))"


def _shr(x: str, k: str, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftright({x}, CAST({k} AS INT))"
    return f"(({x}) >> ({k}))"


def _msb_steps(src: str, out: str, dialect: str) -> list[tuple[str, str]]:
    """floor(log2(src)) for BIGINT src ≥ 1 — compare-and-shift cascade
    with the (value, exponent) pair PACKED into one BIGINT per step
    (``x * 64 + e`` — e ≤ 63 fits in 6 bits, and after the first 32-bit
    reduction x < 2^32 so the pack stays < 2^38).  One alias per level
    instead of two: plan-node count is a measured fixed cost per
    execution (see module docstring, r6 compaction)."""
    steps: list[tuple[str, str]] = [
        # level 32 unpacked (x may be up to 2^62 — too big to pack)
        (f"{out}_x32",
         f"CASE WHEN {src} >= {1 << 32} "
         f"THEN {_shr(src, '32', dialect)} ELSE {src} END"),
        (f"{out}_p",
         f"CASE WHEN {src} >= {1 << 32} "
         f"THEN {out}_x32 * 64 + 32 ELSE {out}_x32 * 64 END"),
    ]
    cur = f"{out}_p"
    for shift in (16, 8, 4, 2, 1):
        thr = 1 << shift
        nxt = f"{out}_p{shift}"
        x = _div(cur, "64", dialect)
        steps.append(
            (nxt,
             f"CASE WHEN {x} >= {thr} "
             f"THEN {_shr(x, str(shift), dialect)} * 64 + ({cur} % 64) + {shift} "
             f"ELSE {cur} END")
        )
        cur = nxt
    steps.append((out, f"{cur} % 64"))
    return steps


def ln_micro_steps(
    n_expr: str, d_expr: str, out: str, dialect: str, prefix: str = "_il"
) -> list[tuple[str, str]]:
    """Ordered (alias, expr) steps computing
    ``out = ln_micro(n_expr / d_expr)`` — see module docstring.

    r6 compaction: each squaring iteration packs (mantissa, frac-bits)
    into ONE BIGINT state ``m·2^20 + f`` (m < 2^31, f < 2^20 → < 2^51),
    so the whole construction is ~44 plan nodes instead of 97.  The
    packing is algebraically lossless — ``ln_micro_py`` (unpacked)
    asserts value identity in tests/test_intlog.py.  References to the
    previous step are COLUMN references inside a chained projection, so
    a step may use its predecessor several times without duplicating
    the upstream tree (CollapseProject keeps multi-referenced non-cheap
    aliases un-inlined)."""
    p = prefix
    steps: list[tuple[str, str]] = [
        (f"{p}_n", f"CAST(({n_expr}) AS BIGINT)"),
        (f"{p}_d", f"CAST(({d_expr}) AS BIGINT)"),
    ]
    steps += _msb_steps(f"{p}_n", f"{p}_a", dialect)
    steps += _msb_steps(f"{p}_d", f"{p}_b", dialect)
    a, b = f"{p}_a", f"{p}_b"
    steps.append(
        (
            f"{p}_ns",
            f"CASE WHEN {a} <= 30 THEN {_shl(f'{p}_n', f'30 - {a}', dialect)} "
            f"ELSE {_shr(f'{p}_n', f'{a} - 30', dialect)} END",
        )
    )
    steps.append(
        (
            f"{p}_ds",
            f"CASE WHEN {b} <= 30 THEN {_shl(f'{p}_d', f'30 - {b}', dialect)} "
            f"ELSE {_shr(f'{p}_d', f'{b} - 30', dialect)} END",
        )
    )
    # mantissa in [2^30, 2^31): ns, ds both in [2^30, 2^31) so ns/ds in
    # (1/2, 2); one renormalizing doubling folds the low half up
    steps.append(
        (f"{p}_m0", _div(_shl(f"{p}_ns", "30", dialect), f"{p}_ds", dialect))
    )
    # packed walk state: (m·2^20 + f)·128 + (e + 64); m ∈ [2^30, 2^31),
    # f < 2^20 fractional bits, e+64 ∈ [1, 127] → state < 2^58
    steps.append(
        (
            f"{p}_st_0",
            f"CASE WHEN {p}_m0 < {_ONE_Q30} "
            f"THEN ({p}_m0 * 2 * {1 << _Q}) * 128 + ({a} - {b} - 1 + 64) "
            f"ELSE ({p}_m0 * {1 << _Q}) * 128 + ({a} - {b} + 64) END",
        )
    )
    m_of = lambda st: _div(st, str(1 << (_Q + 7)), dialect)  # noqa: E731
    f_of = lambda st: f"({_div(st, '128', dialect)} % {1 << _Q})"  # noqa: E731
    for k in range(1, _Q + 1):
        st = f"{p}_st_{k - 1}"
        m = m_of(st)
        s = _div(f"{m} * {m}", str(_ONE_Q30), dialect)
        steps.append(
            (
                f"{p}_st_{k}",
                f"CASE WHEN {s} >= {_TWO_Q30} "
                f"THEN ({_div(s, '2', dialect)} * {1 << _Q} "
                f"+ {f_of(st)} * 2 + 1) * 128 + {st} % 128 "
                f"ELSE ({s} * {1 << _Q} + {f_of(st)} * 2) * 128 "
                f"+ {st} % 128 END",
            )
        )
    last = f"{p}_st_{_Q}"
    steps.append(
        (
            f"{p}_l2",
            f"(({last} % 128) - 64) * {1 << _Q} + {f_of(last)}",
        )
    )
    # |l2| then two-part ln2 multiply, round-half-up on the magnitude
    steps.append(
        (f"{p}_al2", f"CASE WHEN {p}_l2 < 0 THEN -{p}_l2 ELSE {p}_l2 END")
    )
    num = (
        f"{p}_al2 * {LN2_MICRO_A} + "
        + _div(f"{p}_al2 * {LN2_MICRO_B}", str(_B_SCALE), dialect)
    )
    mag = _div(f"{num} + {_HALF_Q}", str(1 << _Q), dialect)
    steps.append(
        (out, f"CASE WHEN {p}_l2 < 0 THEN -{mag} ELSE {mag} END")
    )
    return steps


# Steps per selectExpr batch in with_ln_micro. Within one batch the steps
# resolve as LATERAL column aliases (Spark >= 3.4 implicit lateral alias
# resolution rewrites them into nested Projects — the same chained-Project
# structure as before, so each alias still evaluates once per row and the
# values are identical). Lateral resolution burns roughly one analyzer
# iteration per level, so the batch must stay well under the 100-iteration
# Resolution cap: 22 uses ~22 iterations and leaves 4x headroom (the full
# ~44-step chain in ONE batch also resolves today, but with no margin).
# r7 measurement (1k-row frame, warm JVM): one-select-per-step build 0.96 s
# + exec 1.33 s vs batch=22 build 0.20 s + exec 0.53 s — the per-chain
# fixed cost was the dominant wall on every intlog-swept bench entry.
_LN_BATCH = 22


def with_ln_micro(
    df: DataFrame, n_expr: str, d_expr: str, out: str, prefix: str = "_il"
) -> DataFrame:
    """Spark: add BIGINT column ``out = ln_micro(n_expr/d_expr)``.

    Batched lateral-alias selects (see ``_LN_BATCH``); never ONE flat
    lateral select of all ~44 steps (no analyzer-cap margin) and never a
    44-deep nested-transform let expression (analyzer hangs) nor one
    nested-subquery SQL (trips the 100-iteration Resolution cap outright)."""
    steps = ln_micro_steps(n_expr, d_expr, out, "spark", prefix)
    for i in range(0, len(steps), _LN_BATCH):
        chunk = steps[i:i + _LN_BATCH]
        df = df.selectExpr("*", *[f"{expr} AS {alias}" for alias, expr in chunk])
    return df.drop(*[a for a, _ in steps if a != out])


def duckdb_ln_micro_sql(
    inner_sql: str, n_expr: str, d_expr: str, out: str,
    keep_cols: str, prefix: str = "_il",
) -> str:
    """DuckDB: ``SELECT keep_cols, out FROM <97-level nested chain>``.

    One nested subquery PER STEP, never lateral column aliases: a lateral
    alias is inlined TEXTUALLY by the binder, and every step here
    references its predecessor 2-3 times, so a flat alias list explodes
    the expression tree exponentially (measured: Q=4 already un-bindable).
    The nested-projection chain binds in milliseconds and evaluates each
    step once."""
    steps = ln_micro_steps(n_expr, d_expr, out, "duckdb", prefix)
    sql = f"({inner_sql})"
    for alias, expr in steps:
        sql = f"(SELECT *, {expr} AS {alias} FROM {sql})"
    cols = f"{keep_cols}, {out}" if keep_cols else out
    return f"SELECT {cols} FROM {sql}"


def ln_micro_py(n: int, d: int) -> int:
    """Pure-Python mirror of the SQL construction — the test oracle for
    engine parity (every shift/divide below is on positive ints, where
    Python ``>>``/``//`` == SQL trunc division)."""
    if n < 1 or d < 1:
        raise ValueError("ln_micro_py: n, d must be >= 1")
    a = n.bit_length() - 1
    b = d.bit_length() - 1
    ns = n << (30 - a) if a <= 30 else n >> (a - 30)
    ds = d << (30 - b) if b <= 30 else d >> (b - 30)
    m0 = (ns << 30) // ds
    e = a - b + (-1 if m0 < _ONE_Q30 else 0)
    m = m0 * 2 if m0 < _ONE_Q30 else m0
    f = 0
    for _ in range(_Q):
        s = (m * m) >> 30
        bit = 1 if s >= _TWO_Q30 else 0
        f = f * 2 + bit
        m = s >> 1 if bit else s
    l2 = e * (1 << _Q) + f
    al2 = -l2 if l2 < 0 else l2
    num = al2 * LN2_MICRO_A + (al2 * LN2_MICRO_B) // _B_SCALE
    mag = (num + _HALF_Q) >> _Q
    return -mag if l2 < 0 else mag
