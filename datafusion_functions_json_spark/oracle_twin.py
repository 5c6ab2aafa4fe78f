"""Independent pure-Python twin of the xxhash64-based dedup tier, used
ONLY to generate literal ``VALUES`` oracles for the driver's DuckDB
correctness gate.

Why this exists: ``minhash_dup_pairs`` / ``minhash_dup_pairs_against`` /
``simhash_dup_pairs`` key their candidate generation on Spark's
``xxhash64``, which DuckDB cannot compute — so those registry entries
were previously rows-only checks (the weakest verification surface in
the repo; the reference's own tests value-check everything, see
reference tests/utils/mod.rs:258-268). This module re-implements the
WHOLE pipeline — XXH64 itself (from the public xxHash spec by Yann
Collet, seed 42 like Spark's ``XxHash64`` expression), tokenization,
n-gram hash mixing, permutation minima, LSH banding, pigeonhole
blocking, and Jaccard/Hamming verification — in pure Python + numpy
with NO Spark involvement. The expected pair sets it produces are
inlined into oracle SQL as ``VALUES`` rows, so the driver hash-checks
the pair SETS, not just downstream recall.

Independence notes:
* XXH64 here is written from the public algorithm specification and is
  pinned against both the spec's published test vectors and Spark's
  ``F.xxhash64`` in tests/test_oracle_twin.py. A divergence in either
  implementation turns the driver row red.
* The per-doc pipeline is a from-scratch scalar/numpy implementation;
  it shares only the *parameters* (permutation seed, mix constants)
  with operators/dedup.py, never code paths.
"""

from __future__ import annotations

import math
import random
import re
import struct

import numpy as np

__all__ = [
    "xxh64",
    "xxh64_str",
    "tokens",
    "minhash_pairs",
    "minhash_pairs_against",
    "simhash_pairs",
    "values_sql",
]

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

_MH_PRIME = 2147483647  # 2^31 - 1 (same modulus as operators/dedup.py)

# Java's ASCII-only \s class (Spark tokenizes with a Java regex; Python's
# \s is Unicode-aware and would split on U+00A0 etc. where Spark doesn't)
_JAVA_WS = re.compile("[ \\t\\n\\x0b\\f\\r]+")


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with ``seed`` (unsigned 64-bit result), from the
    public xxHash specification. Spark's ``xxhash64`` uses seed 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while i <= limit:
            a, b, c, d = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, a)
            v2 = _round(v2, b)
            v3 = _round(v3, c)
            v4 = _round(v4, d)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


class _StrHasher:
    """Memoized signed-64 XXH64 over UTF-8 strings — corpora repeat
    tokens heavily, so the cache turns O(corpus tokens) hash work into
    O(vocabulary)."""

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}

    def __call__(self, s: str) -> int:
        h = self._cache.get(s)
        if h is None:
            h = _signed64(xxh64(s.encode("utf-8")))
            self._cache[s] = h
        return h


def xxh64_str(s: str, seed: int = 42) -> int:
    """Signed-64 XXH64 of a string's UTF-8 bytes (Spark ``xxhash64``)."""
    return _signed64(xxh64(s.encode("utf-8"), seed))


def tokens(text: str) -> list[str]:
    """Whitespace tokens under Java regex semantics (ASCII \\s only)."""
    return [t for t in _JAVA_WS.split(text) if t]


def _perm_coeffs(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MH_PRIME), rnd.randrange(0, _MH_PRIME))
        for _ in range(num_perm)
    ]


_WORD_MIX = [0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1]


def _word_shingle_hashes(text: str, n: int, hasher: _StrHasher) -> np.ndarray | None:
    """Word-family shingle-hash set: per-token xxhash64 values mixed
    numerically over n-token windows, mod 2^31-1, deduped. ``None`` for
    docs with fewer than ``n`` tokens (the documented NULL-signature
    contract)."""
    toks = tokens(text)
    if len(toks) < n:
        return None
    hv = np.array([hasher(t) for t in toks], dtype=np.int64).astype(np.uint64)
    mix = np.array(
        _WORD_MIX[:n] if n <= 5 else [0x9E3779B1 + 2 * i + 1 for i in range(n)],
        dtype=np.uint64,
    )
    acc = hv[: len(hv) - n + 1] * mix[0]
    for i in range(1, n):
        acc = acc ^ (hv[i : len(hv) - n + 1 + i] * mix[i])
    return np.unique((acc % np.uint64(_MH_PRIME)).astype(np.int64))


def _signature(sh: np.ndarray, a_vec: np.ndarray, b_vec: np.ndarray) -> list[int]:
    return ((a_vec * sh[None, :] + b_vec) % _MH_PRIME).min(axis=1).tolist()


def _band_keys(
    sig: list[int], bands: int, rows: int, hasher: _StrHasher
) -> list[tuple[int, int]]:
    return [
        (b, hasher(",".join(str(v) for v in sig[b * rows : (b + 1) * rows])))
        for b in range(bands)
    ]


def _index(docs, *, num_perm: int, seed: int, n: int, hasher: _StrHasher):
    """(id -> (sig, hash-set)) for word-family minhash, skipping docs
    whose signature is NULL (fewer than n tokens)."""
    coeffs = _perm_coeffs(num_perm, seed)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]
    out = {}
    for doc_id, text in docs:
        if text is None:
            continue
        sh = _word_shingle_hashes(text, n, hasher)
        if sh is None or len(sh) == 0:
            continue
        out[doc_id] = (_signature(sh, a_vec, b_vec), sh)
    return out


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union > 0 else 0.0


def _band_rows(num_perm: int, bands: int) -> int:
    """Mirror of ``dedup._band_rows``: a remainder would silently drop
    trailing signature elements from banding, so the twin must reject
    exactly the configs production rejects (otherwise it would emit a
    wrong 'expected' pair set for a config production errors on)."""
    if bands < 1 or num_perm % bands:
        raise ValueError(
            f"num_perm ({num_perm}) must be a positive multiple of "
            f"bands ({bands}); a remainder would drop trailing signature "
            "elements from banding and silently degrade recall"
        )
    return num_perm // bands


def minhash_pairs(
    docs,
    *,
    num_perm: int,
    bands: int,
    seed: int,
    n: int,
    threshold: float,
) -> list[tuple[int, int, float]]:
    """Twin of ``dedup.minhash_dup_pairs`` (word mode): verified
    near-dup pairs (id_a, id_b, jaccard) with id_a < id_b.

    All tuning parameters are REQUIRED keyword-only: the caller must
    pass one explicit shared config to both the production query and
    this twin — defaults here could silently diverge from production's
    defaults and compare mismatched configurations."""
    rows = _band_rows(num_perm, bands)
    hasher = _StrHasher()
    idx = _index(docs, num_perm=num_perm, seed=seed, n=n, hasher=hasher)
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, (sig, _) in idx.items():
        for key in _band_keys(sig, bands, rows, hasher):
            buckets.setdefault(key, []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        if len(ids) < 2:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    out = []
    for ia, ib in sorted(cand):
        jac = _jaccard(idx[ia][1], idx[ib][1])
        if jac >= threshold:
            out.append((ia, ib, jac))
    return out


def _bucket_stats(buckets: dict) -> dict:
    """Shared candidate-volume reduction over an LSH bucket map:
    mirrors ``dedup.band_candidate_stats`` (join_rows = sum of C(c,2),
    the rows the banded self-join materializes pre-verification)."""
    sizes = [len(ids) for ids in buckets.values() if len(ids) > 1]
    cand = set()
    for ids in buckets.values():
        if len(ids) < 2:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    return {
        "join_rows": sum(c * (c - 1) // 2 for c in sizes),
        "max_bucket": max(sizes, default=0),
        "buckets_multi": len(sizes),
        "distinct_pairs": len(cand),
    }


def minhash_candidate_stats(
    docs, *, num_perm: int, bands: int, seed: int, n: int
) -> dict:
    """Twin of ``dedup.minhash_candidate_stats`` (word mode): the
    pre-verification join volume of the banded minhash self-join."""
    rows = _band_rows(num_perm, bands)
    hasher = _StrHasher()
    idx = _index(docs, num_perm=num_perm, seed=seed, n=n, hasher=hasher)
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, (sig, _) in idx.items():
        for key in _band_keys(sig, bands, rows, hasher):
            buckets.setdefault(key, []).append(doc_id)
    return _bucket_stats(buckets)


def simhash_candidate_stats(docs, *, block_bits: int) -> dict:
    """Twin of ``dedup.simhash_candidate_stats``: the pre-Hamming join
    volume of the simhash block join (null-text docs excluded, exactly
    as production filters null hashes)."""
    if block_bits < 1 or 64 % block_bits:
        raise ValueError(f"block_bits ({block_bits}) must divide 64")
    n_blocks = 64 // block_bits
    hasher = _StrHasher()
    mask = (1 << block_bits) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in docs:
        if text is None:
            continue
        sh = _simhash64(text, hasher)
        for i in range(n_blocks):
            buckets.setdefault(
                (i, (sh >> (i * block_bits)) & mask), []
            ).append(doc_id)
    return _bucket_stats(buckets)


def minhash_pairs_against(
    new_docs,
    idx_docs,
    *,
    num_perm: int,
    bands: int,
    seed: int,
    n: int,
    threshold: float,
    exclude_same_id: bool = True,
) -> list[tuple[int, int, float]]:
    """Twin of ``dedup.minhash_dup_pairs_against``: verified pairs
    (new_id, index_id, jaccard) between a new batch and an index.
    Tuning parameters are required keyword-only (see
    :func:`minhash_pairs`)."""
    rows = _band_rows(num_perm, bands)
    hasher = _StrHasher()
    nidx = _index(new_docs, num_perm=num_perm, seed=seed, n=n, hasher=hasher)
    iidx = _index(idx_docs, num_perm=num_perm, seed=seed, n=n, hasher=hasher)
    ibuckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, (sig, _) in iidx.items():
        for key in _band_keys(sig, bands, rows, hasher):
            ibuckets.setdefault(key, []).append(doc_id)
    cand = set()
    for new_id, (sig, _) in nidx.items():
        for key in _band_keys(sig, bands, rows, hasher):
            for index_id in ibuckets.get(key, ()):
                if exclude_same_id and new_id == index_id:
                    continue
                cand.add((new_id, index_id))
    out = []
    for na, ib in sorted(cand):
        jac = _jaccard(nidx[na][1], iidx[ib][1])
        if jac >= threshold:
            out.append((na, ib, jac))
    return out


def _simhash64(text: str, hasher: _StrHasher) -> int:
    """Twin of ``dedup.simhash`` (word mode, n=1): bit votes over
    distinct-token xxhash64 values, sign-thresholded, signed 64-bit.
    An empty token set yields 0 (all votes tie at 0 → all bits clear),
    mirroring the production kernel exactly."""
    feats = list(dict.fromkeys(tokens(text)))  # distinct, order-free votes
    if not feats:
        return 0
    hv = np.array([hasher(t) for t in feats], dtype=np.int64).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    votes = (((hv[:, None] >> shifts[None, :]) & 1).astype(np.int64) * 2 - 1).sum(
        axis=0
    )
    v = int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
    return _signed64(v)


def simhash_pairs(
    docs, *, max_hamming: int, block_bits: int
) -> list[tuple[int, int, int]]:
    """Twin of ``dedup.simhash_dup_pairs``: (id_a, id_b, hamming) pairs
    within ``max_hamming`` via the pigeonhole block join. Parameters are
    required keyword-only (see :func:`minhash_pairs`); the validation
    mirrors production's exactly."""
    if block_bits < 1 or 64 % block_bits:
        raise ValueError(
            f"block_bits ({block_bits}) must divide 64; a remainder would "
            "silently drop high bits from blocking and degrade recall"
        )
    n_blocks = 64 // block_bits
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"max_hamming ({max_hamming}) breaks the pigeonhole guarantee "
            f"for {n_blocks} blocks of {block_bits} bits"
        )
    hasher = _StrHasher()
    mask = (1 << block_bits) - 1
    sh_of = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in docs:
        if text is None:
            continue
        sh = _simhash64(text, hasher)
        sh_of[doc_id] = sh
        for i in range(n_blocks):
            # arithmetic shift + mask, same as Spark's shiftright on bigint
            buckets.setdefault((i, (sh >> (i * block_bits)) & mask), []).append(
                doc_id
            )
    cand = set()
    for ids in buckets.values():
        if len(ids) < 2:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    out = []
    for ia, ib in sorted(cand):
        ham = bin((sh_of[ia] ^ sh_of[ib]) & _M64).count("1")
        if ham <= max_hamming:
            out.append((ia, ib, ham))
    return out


def values_sql(rows, columns) -> str:
    """Render (name, duckdb_type) columns + literal rows as a SELECT the
    driver's DuckDB can run: ``SELECT CAST(c0 AS T) AS name, ... FROM
    (VALUES ...)``. Floats are emitted via repr() so the exact IEEE
    double round-trips. An empty pair set renders as a typed WHERE FALSE
    so schema comparison still sees the column names."""
    sel = ", ".join(
        f"cast(c{i} as {typ}) as {name}" for i, (name, typ) in enumerate(columns)
    )
    names = ", ".join(f"c{i}" for i in range(len(columns)))
    if not rows:
        zeros = ", ".join("0" for _ in columns)
        return f"select {sel} from (values ({zeros})) t({names}) where 1 = 0"

    def lit(v):
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            if not math.isfinite(v):
                raise ValueError("non-finite float in VALUES oracle")
            s = repr(v)
            # force DOUBLE parsing: a bare decimal literal is DECIMAL in
            # DuckDB and the decimal->double cast can be one ulp off the
            # strtod result — an exponent makes the literal DOUBLE and
            # repr() then round-trips bit-exactly
            return s if ("e" in s or "E" in s) else s + "e0"
        if isinstance(v, int):
            return str(v)
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        raise TypeError(f"unsupported VALUES literal type: {type(v).__name__}")

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"select {sel} from (values {body}) t({names})"
