"""Vectorized XXH64 (seed 42) — numpy twin of Spark's ``F.xxhash64``.

The DataSource write path (plans/datasource.py) must route rows to
storage buckets with the exact hash the JVM write path uses, inside an
executor Python worker where no SparkSession exists. Hashing per row in
pure Python would put a Python loop on the hot path (banned by the
engine's no-per-row-Python rule), so the kernel runs batch-at-a-time on
numpy uint64 lanes: fixed-width keys (int32/int64) in one shot, strings
grouped by byte length so every group is a dense (rows, L) uint8 matrix.
All three encodings are pinned bit-equal to the JVM in
tests/test_datasource.py::test_vectorized_xxhash_matches_jvm.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)
_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _round(acc, inp):
    return _rotl(acc + inp * _P2, 31) * _P1


def _avalanche(acc: np.ndarray) -> np.ndarray:
    acc ^= acc >> np.uint64(33)
    acc *= _P2
    acc ^= acc >> np.uint64(29)
    acc *= _P3
    acc ^= acc >> np.uint64(32)
    return acc


def _fixed_width(mat: np.ndarray, seed: np.uint64 = _SEED) -> np.ndarray:
    """XXH64 of every row of a (rows, L) uint8 matrix, vectorized across
    rows (the python loop is over L's byte positions, not rows)."""
    k, n = mat.shape
    zero = np.uint64(0)
    if n >= 32:
        v1 = np.full(k, seed + _P1 + _P2, dtype=np.uint64)
        v2 = np.full(k, seed + _P2, dtype=np.uint64)
        v3 = np.full(k, seed, dtype=np.uint64)
        v4 = np.full(k, seed - _P1, dtype=np.uint64)
        i = 0
        while i + 32 <= n:
            blk = mat[:, i : i + 32].copy().view("<u8")
            v1 = _round(v1, blk[:, 0])
            v2 = _round(v2, blk[:, 1])
            v3 = _round(v3, blk[:, 2])
            v4 = _round(v4, blk[:, 3])
            i += 32
        acc = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            acc = (acc ^ _round(np.zeros(k, dtype=np.uint64), v)) * _P1 + _P4
    else:
        acc = np.full(k, seed + _P5, dtype=np.uint64)
        i = 0
    acc = acc + np.uint64(n)
    while i + 8 <= n:
        k8 = mat[:, i : i + 8].copy().view("<u8").ravel()
        acc = _rotl(acc ^ _round(np.zeros(k, dtype=np.uint64), k8), 27) * _P1 + _P4
        i += 8
    if i + 4 <= n:
        k4 = mat[:, i : i + 4].copy().view("<u4").ravel().astype(np.uint64)
        acc = _rotl(acc ^ (k4 * _P1), 23) * _P2 + _P3
        i += 4
    while i < n:
        acc = _rotl(acc ^ (mat[:, i].astype(np.uint64) * _P5), 11) * _P1
        i += 1
    return _avalanche(acc)


def xxh64_int64(values: np.ndarray) -> np.ndarray:
    """Spark xxhash64 of an int64 column (hashes the 8 LE bytes)."""
    mat = np.ascontiguousarray(values, dtype=np.int64).view(np.uint8).reshape(-1, 8)
    return _fixed_width(mat).view(np.int64)


def xxh64_int32(values: np.ndarray) -> np.ndarray:
    """Spark xxhash64 of an int32 column (hashes the 4 LE bytes)."""
    mat = np.ascontiguousarray(values, dtype=np.int32).view(np.uint8).reshape(-1, 4)
    return _fixed_width(mat).view(np.int64)


def xxh64_strings(values) -> np.ndarray:
    """Spark xxhash64 of a string sequence (hashes each UTF-8 byte run).

    Rows are grouped by byte length; each group hashes as one dense
    matrix, so cost is O(total bytes) numpy work + O(#distinct lengths)
    python iterations (conv ids share a handful of lengths)."""
    enc = [str(v).encode("utf-8") for v in values]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    out = np.empty(len(enc), dtype=np.int64)
    for n in np.unique(lens):
        idx = np.nonzero(lens == n)[0]
        if n == 0:
            mat = np.zeros((len(idx), 0), dtype=np.uint8)
        else:
            buf = b"".join(enc[i] for i in idx)
            mat = np.frombuffer(buf, dtype=np.uint8).reshape(len(idx), int(n))
        out[idx] = _fixed_width(mat).view(np.int64)
    return out


def xxh64_utf8_arrow(arr) -> np.ndarray:
    """Spark xxhash64 of a pyarrow string array, straight off the Arrow
    buffers (validity/offsets/data) — zero per-row Python. Null slots
    return 42 (Spark's xxhash64 passes the seed through unchanged on
    null input); callers routing buckets must mask nulls themselves."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    arr = arr.slice(0)  # normalize any parent offset into the buffers
    n = len(arr)
    out = np.full(n, 42, dtype=np.int64)
    if n == 0:
        return out
    off_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    offsets = np.frombuffer(off_buf, dtype="<i4", count=n + 1 + arr.offset)[
        arr.offset : arr.offset + n + 1
    ]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.empty(0, np.uint8)
    )
    lens = np.diff(offsets)
    valid = ~np.asarray(arr.is_null())
    for ln in np.unique(lens[valid]):
        idx = np.nonzero(valid & (lens == ln))[0]
        if ln == 0:
            mat = np.zeros((len(idx), 0), dtype=np.uint8)
        else:
            gather = offsets[idx][:, None] + np.arange(int(ln), dtype=np.int64)[None, :]
            mat = data[gather]
        out[idx] = _fixed_width(mat).view(np.int64)
    return out


def bucket_of(values, num_buckets: int, spark_type: str) -> np.ndarray:
    """``pmod(xxhash64(col), n)`` for a whole column — the write path's
    bucket routing. numpy's % already returns the divisor's sign, which
    matches Spark's pmod for positive n."""
    try:
        import pyarrow as pa

        is_arrow = isinstance(values, (pa.Array, pa.ChunkedArray))
    except ImportError:
        is_arrow = False
    if spark_type == "string":
        h = xxh64_utf8_arrow(values) if is_arrow else xxh64_strings(values)
    elif spark_type in ("long", "bigint"):
        if is_arrow:
            values = values.to_numpy(zero_copy_only=False)
        h = xxh64_int64(np.asarray(values, dtype=np.int64))
    elif spark_type in ("integer", "int"):
        if is_arrow:
            values = values.to_numpy(zero_copy_only=False)
        h = xxh64_int32(np.asarray(values, dtype=np.int32))
    else:
        raise ValueError(f"unsupported bucket column type: {spark_type}")
    return h % np.int64(num_buckets)
