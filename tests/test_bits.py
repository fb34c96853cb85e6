"""F7: IEEE-754 float32 bit decomposition vs Python's struct module
(the same ground truth bitstring.BitArray(float=v, length=32) uses)."""

import math
import struct

import pyspark.sql.functions as F
import pytest

from kglids_spark.functions.bits import float32_bit_array, float32_bits, ieee754_fields


def _py_bits(v: float) -> str:
    (u,) = struct.unpack(">I", struct.pack(">f", v))
    return format(u, "032b")


CASES = [22.0, -22.0, 0.0, 1.0, 0.15625, -0.15625, 1e-7, 3.4e38, float("inf")]


def test_float32_bits_matches_struct(spark):
    df = spark.createDataFrame([(float(v),) for v in CASES], "v float")
    rows = df.select("v", float32_bits("v").alias("bits")).collect()
    assert len(rows) == len(CASES)
    for r in rows:
        # r.v is the float32-exact value read back, so packing it back
        # to >f is lossless — the bit string must round-trip
        assert r.bits == _py_bits(r.v), r.v


def test_float32_bits_null_passthrough(spark):
    # NaN and SQL NULL share the pandas float lane, so both map to
    # null — matching the reference, which dropna()s before decomposing
    # (numerical_profile_creator.py:37)
    df = spark.createDataFrame([(1.0,), (None,), (float("nan"),)], "v float")
    rows = df.select(float32_bits("v").alias("b")).collect()
    assert sorted([r.b for r in rows], key=lambda x: (x is None, x or "")) == [
        _py_bits(1.0),
        None,
        None,
    ]


def test_float32_bit_array_is_model_input_row(spark):
    df = spark.createDataFrame([(22.0,), (None,)], "v float")
    rows = {tuple(r.a) if r.a is not None else None for r in df.select(float32_bit_array("v").alias("a")).collect()}
    assert tuple(int(c) for c in _py_bits(22.0)) in rows
    assert None in rows


def test_ieee754_fields_roundtrip(spark):
    df = spark.createDataFrame([(v,) for v in [22.0, -0.15625, 1.0]], "v float")
    out = df.select("v", float32_bits("v").alias("bits")).select("v", *ieee754_fields("bits")).collect()
    for r in out:
        (u,) = struct.unpack(">I", struct.pack(">f", r.v))
        assert r.sign == u >> 31
        assert r.exponent == (u >> 23) & 0xFF
        assert r.mantissa == u & 0x7FFFFF
