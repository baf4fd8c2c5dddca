"""Distributed Bloom filter over a long hash column (Arrow-vectorized).

The decontamination probe's broadcast DISTINCT eval-gram set stops fitting
executor memory when the eval corpus grows; the classic swap is a Bloom
filter: fixed-size bit array regardless of input cardinality, no false
negatives, tunable false-positive rate.  Spark's built-in BloomFilter
aggregate is not exposed to SQL/PySpark, so this builds one with the same
distributed shape:

  1. ``build``: mapInPandas over the hash column emits ONE partial bloom
     (packed bit array) per input partition -- numpy-vectorized position
     computation, executor-side;
  2. the partials OR-fold in ONE executor tree stage (repartition to
     _FAN_IN, OR inside each task), so the driver receives at most _FAN_IN
     partials -- a FIXED byte bound (_FAN_IN x bits/8, 4 MB at defaults)
     independent of BOTH row count and partition count.  Without the tree
     stage, blooming a million-partition train-side input would push
     partitions x 512 KB through the driver;
  3. ``probe_col``: a pandas UDF tests membership per row, vectorized over
     Arrow batches with the identical position arithmetic.

Positions: k multiply-shift hashes over the 64-bit input
(h * odd_j wrapping mod 2^64, top bits modulo the bit count) -- the same
closed-form in build and probe, no engine-specific hashing."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

# odd multipliers for the k multiply-shift hashes (fixed -> deterministic)
_MULTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _positions(h: np.ndarray, n_bits: int, k: int) -> list[np.ndarray]:
    out = []
    hu = h.astype(np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            mixed = hu * np.uint64(_MULTS[j])  # wraps mod 2^64
            out.append(((mixed >> np.uint64(33)) % np.uint64(n_bits)).astype(np.int64))
    return out


# max partials the driver ever collects; the tree stage folds everything
# above this executor-side (driver bound: _FAN_IN * n_bits/8 bytes)
_FAN_IN = 8


def _reduced_partials(hashes: DataFrame, col: str, n_bits: int, k: int) -> DataFrame:
    """Per-partition partial blooms, OR-folded executor-side down to at most
    _FAN_IN rows (exposed separately so tests can pin the bound)."""

    def partial(batches):
        arr = np.zeros(n_bits, dtype=bool)
        for pdf in batches:
            h = pdf[col].to_numpy(dtype=np.int64)
            for pos in _positions(h, n_bits, k):
                arr[pos] = True
        yield pd.DataFrame({"bits": [np.packbits(arr).tobytes()]})

    def orfold(batches):
        acc = None
        for pdf in batches:
            for b in pdf["bits"]:
                v = np.frombuffer(b, dtype=np.uint8)
                acc = v.copy() if acc is None else acc | v
        if acc is not None:
            yield pd.DataFrame({"bits": [acc.tobytes()]})

    partials = hashes.select(col).mapInPandas(partial, schema="bits binary")
    return partials.repartition(_FAN_IN).mapInPandas(orfold, schema="bits binary")


def build(hashes: DataFrame, col: str, n_bits: int = 1 << 22, k: int = 4) -> bytes:
    """Bloom bit array (packed bytes) from a DataFrame's long hash column.
    One partial per partition, tree-OR-folded to <= _FAN_IN rows
    executor-side, final OR on the driver: driver traffic is a constant
    _FAN_IN * n_bits/8 bytes however many rows or partitions come in."""
    rows = _reduced_partials(hashes, col, n_bits, k).collect()
    acc = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in rows:
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return acc.tobytes()


def probe_col(
    spark: SparkSession, bloom_bytes: bytes, n_bits: int = 1 << 22, k: int = 4
) -> "callable":
    """Returns fn(col) -> BooleanType Column testing bloom membership; the
    bit array ships to executors once via a Spark broadcast, each Arrow
    batch probes vectorized."""
    bc = spark.sparkContext.broadcast(bloom_bytes)
    unpacked: dict[str, np.ndarray] = {}  # per-worker-process cache

    @F.pandas_udf(BooleanType())
    def might_contain(s: pd.Series) -> pd.Series:
        bits = unpacked.get("bits")
        if bits is None:
            bits = np.unpackbits(np.frombuffer(bc.value, dtype=np.uint8)).astype(bool)
            unpacked["bits"] = bits
        h = s.to_numpy(dtype=np.int64)
        hit = np.ones(len(h), dtype=bool)
        for pos in _positions(h, n_bits, k):
            hit &= bits[pos]
        return pd.Series(hit)

    return might_contain
