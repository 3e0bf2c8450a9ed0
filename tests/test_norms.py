"""SmallFloat norm quantization (FIXTURES.md §6)."""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from sparksearch.norms import (
    byte4_to_int, int_to_byte4, int_to_byte4_np, quantize_length,
    quantize_length_np,
)


def test_small_values_exact():
    for i in range(8):
        assert int_to_byte4(i) == i
        assert quantize_length(i) == i


def test_known_points():
    # 4-bit mantissa floor: quantize keeps top 4 bits
    assert quantize_length(8) == 8
    assert quantize_length(15) == 15
    assert quantize_length(16) == 16
    assert quantize_length(17) == 16
    assert quantize_length(31) == 30
    assert quantize_length(100) == 96
    assert quantize_length(255) == 240
    assert quantize_length(1000) == 960


@given(st.integers(min_value=0, max_value=2**30))
def test_monotone_and_idempotent(i):
    q = quantize_length(i)
    assert q <= i
    assert quantize_length(q) == q            # idempotent on decoded values
    assert quantize_length(i + 1) >= q        # monotone


@given(st.lists(st.integers(min_value=0, max_value=2**30), min_size=1, max_size=200))
def test_np_matches_scalar(xs):
    arr = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(
        int_to_byte4_np(arr), np.array([int_to_byte4(x) for x in xs]))
    np.testing.assert_array_equal(
        quantize_length_np(arr), np.array([quantize_length(x) for x in xs]))


def test_byte_roundtrip_all_256():
    for b in range(256):
        assert int_to_byte4(byte4_to_int(b)) == b


def test_quantized_dl_sql_matches_python_duckdb():
    import duckdb
    from sparksearch.norms import quantized_dl_sql
    expr = quantized_dl_sql("i")
    got = duckdb.sql(
        f"SELECT i, {expr} AS q FROM range(0, 5000) t(i)").fetchall()
    for i, q in got:
        assert q == quantize_length(i), (i, q, quantize_length(i))
