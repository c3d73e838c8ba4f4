"""Property-based invariants (hypothesis) for the pure kernels."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
)
@settings(max_examples=200, deadline=None)
def test_morton_interleave_roundtrip(x, y):
    """morton_sql's arithmetic == the reference bit interleave, and the
    code deinterleaves back to (x, y) exactly — for EVERY 16-bit pair,
    not just the gated corpus."""
    # evaluate the generated expression in pure python (same ops)
    from unstract_spark.operators.export import morton_sql

    expr = morton_sql("x", "y", 16)
    z = eval(expr.replace(">>", ">>").replace("&", "&"))  # noqa: S307 — arithmetic only
    ref = 0
    for i in range(16):
        ref |= ((x >> i) & 1) << (2 * i)
        ref |= ((y >> i) & 1) << (2 * i + 1)
    assert z == ref
    # deinterleave
    rx = ry = 0
    for i in range(16):
        rx |= ((z >> (2 * i)) & 1) << i
        ry |= ((z >> (2 * i + 1)) & 1) << i
    assert (rx, ry) == (x, y)


@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=40),
       st.text(min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_bloom_no_false_negatives_property(history, probe):
    """The Bloom bit math (md5-derived, m=8192, k=4) NEVER false-
    negatives: every member's probe finds all k bits set; a non-member
    may collide (maybe_seen True) but membership of actual history
    strings always holds — checked in pure python against the same
    derivation the Spark/DuckDB twins use."""
    m, k = 8192, 4

    def bits_of(s):
        return {
            int(hashlib.md5(f"{j}:{s}".encode()).hexdigest()[:8], 16) % m
            for j in range(k)
        }

    bit_set = set()
    for h in history:
        bit_set |= bits_of(h)
    for h in history:
        assert bits_of(h) <= bit_set  # no false negatives, ever
    # non-member probes are allowed either answer; just exercise it
    _ = bits_of(probe) <= bit_set
