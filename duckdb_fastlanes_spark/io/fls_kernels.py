"""FastLanes vector codecs in vectorized NumPy — the decode-kernel family the
reference materializes through (SURVEY.md §2.A′), reimplemented from the
published model rather than bound to the vendored C++.

Reference parity map (every kernel is the semantic twin of a materializer
kernel header in the reference — the byte-level segment framing lives in the
un-vendored external FastLanes library, see fls_native.py module docstring):

- FFOR (frame-of-reference + bit-packing over 1024-value vectors)
  → ``ffor_encode`` / ``ffor_decode``
  (src/include/reader/materializer/kernels/unffor_kernel.hpp:7-30; the
  FastLanes layout paper's FOR+BP over VEC_SZ=1024)
- Dictionary (per-chunk key array + packed per-vector indices; string dicts
  as end-offset array + byte blob, exactly the offsets walk in
  kernels/dictionary_kernel.hpp:60-78) → ``dict_offsets_bytes`` /
  ``strings_from_offsets``
- Constant vector (kernels/constant_kernel.hpp:11-52) → ``ENC_CONSTANT``
  in fls_native.py (a single stored value broadcast to the vector)
- RLE as index-mapped runs: run-value array + per-position run index
  (kernels/rle_map_kernel.hpp:7-24 decodes ``rle_vals[idxs[i]]``)
  → ``rle_encode`` / ``rle_decode``
- ALP for doubles/floats: decimal-scaled integers + patched exceptions
  (kernels/alp_kernel.hpp; published ALP scheme: enc = round(v·10^e/10^f),
  dec = enc·10^f/10^e, out-of-domain values patched positionally)
  → ``alp_encode`` / ``alp_decode``
- Uncompressed (kernels/uncompressed_kernel.hpp) → raw little-endian

All functions operate on one logical vector of ``VEC_SZ`` = 1024 values
(the reference's CFG::VEC_SZ; tail vectors are shorter). Packing is dense
little-endian W-bit fields; the C++ kernels use the interleaved transposed
layout for SIMD decode speed, which is a physical permutation with identical
information content — NumPy decodes whole vectors at once either way, so the
dense layout is the idiomatic equivalent, and it is what our writer frames.
"""

from __future__ import annotations

import numpy as np

#: FastLanes vector size (reference CFG::VEC_SZ / fls_writer.hpp:12-22)
VEC_SZ = 1024

_U64 = np.uint64


# ---------------------------------------------------------------- bit packing
def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack ``vals`` (uint64 array, each < 2**width) into dense little-endian
    ``width``-bit fields. width == 0 → empty payload (all values are 0)."""
    if width == 0:
        return b""
    v = vals.astype(_U64, copy=False)
    n = len(v)
    bitpos = np.arange(n, dtype=_U64) * _U64(width)
    word = (bitpos >> _U64(6)).astype(np.int64)
    off = bitpos & _U64(63)
    out = np.zeros(int((n * width + 63) // 64), dtype=_U64)
    np.bitwise_or.at(out, word, (v << off) & _U64(0xFFFFFFFFFFFFFFFF))
    # bits that spill into the next word: v >> (64 - off), guarding off == 0
    # (a shift by 64 is undefined; when off == 0 nothing spills)
    spill = off > _U64(0)
    if spill.any():
        hi = v[spill] >> (_U64(64) - off[spill])
        w2 = word[spill] + 1
        keep = hi != _U64(0)
        np.bitwise_or.at(out, w2[keep], hi[keep])
    return out.tobytes()


def unpack_bits(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`: n ``width``-bit fields → uint64 array."""
    if width == 0:
        return np.zeros(n, dtype=_U64)
    words = np.frombuffer(buf, dtype=_U64)
    bitpos = np.arange(n, dtype=_U64) * _U64(width)
    word = (bitpos >> _U64(6)).astype(np.int64)
    off = bitpos & _U64(63)
    lo = words[word] >> off
    # guard the word+1 gather at the buffer edge and the off==0 shift-by-64
    nxt = np.minimum(word + 1, len(words) - 1)
    hi = np.where(off > _U64(0), words[nxt] << (_U64(64) - np.maximum(off, _U64(1))), _U64(0))
    mask = _U64(0xFFFFFFFFFFFFFFFF) if width == 64 else _U64((1 << width) - 1)
    return (lo | hi) & mask


# ----------------------------------------------------------------------- FFOR
def ffor_encode(arr: np.ndarray) -> tuple[int, int, bytes]:
    """Frame-of-reference + bit-pack one integer vector.

    Returns ``(base, width, payload)``: base = min value (the frame),
    width = bits needed for max(value - base), payload = packed deltas.
    Signed inputs are handled by the signed base subtraction — deltas are
    always non-negative (unffor_kernel.hpp reinterprets to the signed view
    after the unsigned unpack+add, same algebra)."""
    a = arr.astype(np.int64, copy=False)
    base = int(a.min()) if len(a) else 0
    # delta in uint64 wraps correctly for the full int64 domain
    delta = (a.astype(_U64) - _U64(base & 0xFFFFFFFFFFFFFFFF)) & _U64(0xFFFFFFFFFFFFFFFF)
    mx = int(delta.max()) if len(delta) else 0
    width = int(mx).bit_length()
    return base, width, pack_bits(delta, width)


def ffor_decode(base: int, width: int, payload: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`ffor_encode` → int64 vector."""
    delta = unpack_bits(payload, width, n)
    return (delta + _U64(base & 0xFFFFFFFFFFFFFFFF)).astype(np.int64)


# ------------------------------------------------------------------------ RLE
def rle_encode(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Index-mapped RLE: ``(run_values, idxs)`` with
    ``arr[i] == run_values[idxs[i]]`` — the exact decode contract of
    rle_map_kernel.hpp:18-23."""
    if len(arr) == 0:
        return arr[:0], np.zeros(0, dtype=_U64)
    change = np.empty(len(arr), dtype=bool)
    change[0] = True
    np.not_equal(arr[1:], arr[:-1], out=change[1:])
    idxs = np.cumsum(change) - 1
    return arr[change], idxs.astype(_U64)


def rle_decode(run_values: np.ndarray, idxs: np.ndarray) -> np.ndarray:
    return run_values[idxs.astype(np.int64)]


# ------------------------------------------------------------------------ ALP
#: candidate decimal exponents (ALP probes e ∈ [0..18], f ∈ [0..e])
_ALP_MAX_E = 18
_F10 = np.power(10.0, np.arange(_ALP_MAX_E + 1))
_IF10 = np.power(10.0, -np.arange(_ALP_MAX_E + 1).astype(np.float64))


def _alp_try(v: np.ndarray, e: int, f: int) -> np.ndarray | None:
    """Integers i with v == i * 10^f / 10^e where representable, else None."""
    scaled = v * _F10[e] * _IF10[f]
    # fastround trick domain: |scaled| must fit well inside 2^51
    ok = np.isfinite(scaled) & (np.abs(scaled) < 2.0**51)
    i = np.round(scaled)
    exact = ok & (i * _F10[f] * _IF10[e] == v)
    return np.where(exact, i, np.nan)


def alp_choose(v: np.ndarray, sample: int = 32) -> tuple[int, int]:
    """Pick (e, f) maximizing exact hits on a sample (the reference samples
    per row group and refines per vector; one-level sampling suffices here)."""
    s = v[:: max(1, len(v) // sample)][:sample]
    s = s[np.isfinite(s)]
    if len(s) == 0:
        return 0, 0
    best, best_hits = (0, 0), -1
    for e in range(_ALP_MAX_E + 1):
        for f in range(e + 1):
            t = _alp_try(s, e, f)
            hits = int(np.count_nonzero(~np.isnan(t)))
            if hits > best_hits:
                best, best_hits = (e, f), hits
            if hits == len(s):
                return e, f
    return best


def alp_encode(
    v: np.ndarray, e: int, f: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode one double vector against (e, f).

    Returns ``(ints, exc_pos, exc_vals)``: ints = int64 encodings (exception
    slots hold the first valid int — the reference patches them after decode,
    so the placeholder value is free), exc_pos/exc_vals = positions + raw
    doubles of values the scheme cannot represent (inf/nan/irrational)."""
    t = _alp_try(v, e, f)
    bad = np.isnan(t) | np.isnan(v) | ~np.isfinite(v)
    # NaN input encodes exactly only via exception (NaN != NaN)
    bad |= np.isnan(v)
    # -0.0 == 0.0 passes the exactness check but would decode as +0.0,
    # losing the IEEE-754 sign bit — route it through the exception path
    # so the roundtrip stays BYTE-exact, not merely value-equal (matters
    # for hash/fingerprint parity on float columns)
    bad |= (v == 0) & np.signbit(v)
    exc_pos = np.flatnonzero(bad)
    exc_vals = v[exc_pos]
    fill = 0.0
    good = np.flatnonzero(~bad)
    if len(good):
        fill = t[good[0]]
    ints = np.where(bad, fill, t).astype(np.int64)
    return ints, exc_pos.astype(_U64), exc_vals


def alp_decode(
    ints: np.ndarray, e: int, f: int, exc_pos: np.ndarray, exc_vals: np.ndarray
) -> np.ndarray:
    out = ints.astype(np.float64) * _F10[f] * _IF10[e]
    if len(exc_pos):
        out[exc_pos.astype(np.int64)] = exc_vals
    return out


# ----------------------------------------------------------- string dict util
def dict_offsets_bytes(keys: list[bytes]) -> tuple[np.ndarray, bytes]:
    """Serialize dictionary keys as (END-offset uint32 array, byte blob) —
    the layout dictionary_kernel.hpp:66-77 walks (cur = end offset, length =
    cur - prev_end)."""
    lens = np.fromiter((len(k) for k in keys), dtype=np.uint32, count=len(keys))
    ends = np.cumsum(lens, dtype=np.uint64).astype(np.uint32)
    return ends, b"".join(keys)


def strings_from_offsets(ends: np.ndarray, blob: bytes) -> list[bytes]:
    out, prev = [], 0
    for cur in ends.tolist():
        out.append(blob[prev:cur])
        prev = cur
    return out
