"""F7: IEEE-754 float32 bit decomposition (embedding-model input).

The reference turns every sampled numeric value into a 32-element 0/1
vector — ``bitstring.BitArray(float=v, length=32).bin`` — as the input
tensor for its learned column-embedding model
(kg_governor/data_profiling/profile_creators/numerical_profile_creator.py:43-46,
date_profile_creator.py:51).  The model weights are absent from the
checkout, but the decomposition itself is pure data prep, so it is
ported: the bit matrix is exactly what a user would feed their own
model via the embedding-ingestion hook.

Spark has no float→bits builtin, so this is a genuine Pandas-UDF case:
one Arrow batch in, a numpy ``astype('>f4').view(uint8)`` +
``unpackbits`` out — no per-row Python.  The sign/exponent/mantissa
splits are derived JVM-side from the bit string (substring + conv), so
everything downstream of the single UDF stays in codegen.  The UDFs
are built lazily (inside the call) because ``pandas_udf`` needs an
active session to resolve its return type.

NaN maps to null (not the NaN bit pattern): the pandas float lane
cannot distinguish SQL NULL from NaN, and the reference dropna()s
before decomposing anyway (numerical_profile_creator.py:37).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _unpack_bits(values):
    """(n, 32) uint8 bit matrix, MSB-first — bitstring's .bin order."""
    import numpy as np

    v = values.fillna(0.0).to_numpy(dtype=np.float64).astype(">f4")
    return np.unpackbits(v.view(np.uint8).reshape(-1, 4), axis=1)


def float32_bits(col: Column | str) -> Column:
    """32-char '0'/'1' string: sign, 8 exponent bits, 23 mantissa bits."""

    @F.pandas_udf("string")
    def _bits(values):
        import numpy as np
        import pandas as pd

        mask = values.isna().to_numpy()
        ascii_ = (_unpack_bits(values) + 48).astype(np.uint8)
        out = np.ascontiguousarray(ascii_).view("S32").ravel().astype(object)
        out[mask] = None
        return pd.Series([b.decode() if b is not None else None for b in out])

    return _bits(F.col(col) if isinstance(col, str) else col)


def float32_bit_array(col: Column | str) -> Column:
    """The reference's exact model-input row: list of 32 ints in {0,1}
    (numerical_profile_creator.py:43-44). Null in → null out."""

    @F.pandas_udf("array<int>")
    def _bit_array(values):
        import numpy as np
        import pandas as pd

        mask = values.isna().to_numpy()
        bits = _unpack_bits(values).astype(np.int32)
        out = pd.Series(list(bits), dtype=object)
        out[mask] = None
        return out

    return _bit_array(F.col(col) if isinstance(col, str) else col)


def ieee754_fields(bits: Column | str) -> list[Column]:
    """sign / exponent / mantissa integers from the 32-bit string —
    derived with substring + conv so only the bit string itself needed
    the UDF."""
    bits = F.col(bits) if isinstance(bits, str) else bits
    return [
        F.substring(bits, 1, 1).cast("int").alias("sign"),
        F.conv(F.substring(bits, 2, 8), 2, 10).cast("int").alias("exponent"),
        F.conv(F.substring(bits, 10, 23), 2, 10).cast("int").alias("mantissa"),
    ]
