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
- FSST (symbol-table string compression, ≤255 symbols of 1-8 bytes +
  escape byte; kernels/fsst_kernel.hpp:11-59, fsst_dict_kernel.hpp:18-80;
  published FSST scheme) → ``fsst_build_table`` / ``fsst_encode`` /
  ``fsst_decode`` — table built by the paper's iterative greedy
  refinement, shared per chunk like the reference's per-segment table
- Frequency (one frequent value + exception positions/values;
  kernels/frequency_kernel.hpp:8-69) → ``freq_encode`` / ``freq_decode``
- SLPatch (patched FFOR: bulk-width bit-packing + exception patching;
  kernels/slpatch_kernel.hpp:8-31) → ``slpatch_encode`` /
  ``slpatch_decode``

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
    # overflow to inf is expected for large |v| at high e — those lanes are
    # rejected by the isfinite/magnitude gate and land on the exception path
    with np.errstate(over="ignore", invalid="ignore"):
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


# ----------------------------------------------------------------------- FSST
#: code 255 is the escape marker (next byte is a literal), so the symbol
#: table holds at most 255 entries of 1-8 bytes — the published FSST
#: geometry (kernels/fsst_kernel.hpp:11-59 decodes through the same
#: 255-symbol table + escape contract via fsst_decompress)
FSST_ESCAPE = 255
FSST_MAX_SYMBOLS = 255
FSST_MAX_SYMLEN = 8


def _fsst_pattern(table: list[bytes]):
    """Greedy longest-match tokenizer for a symbol table: a literal
    alternation ordered longest-first (regex alternation takes the first —
    here longest — literal that matches at the position), with a final
    any-byte fallback so the parse is total. Matching runs in the re
    engine (C), not per-byte Python."""
    import re

    parts = sorted(table, key=len, reverse=True)
    alts = b"|".join(re.escape(s) for s in parts)
    return re.compile((alts + b"|." if alts else b"."), re.DOTALL)


def fsst_build_table(sample: bytes, iterations: int = 4) -> list[bytes]:
    """Build an FSST symbol table from a sample blob by the paper's
    iterative greedy refinement: parse the sample with the current table,
    score every emitted segment and every adjacent-segment concatenation
    (≤ 8 bytes) by apparent gain = count × length, keep the top 255.
    Deterministic (ties broken by symbol bytes)."""
    from collections import Counter

    table: list[bytes] = []
    if not sample:
        return table
    for _ in range(iterations):
        segs = [m.group() for m in _fsst_pattern(table).finditer(sample)]
        gains = Counter()
        for s in segs:
            gains[s] += len(s)
        for a, b in zip(segs, segs[1:]):
            ab = a + b
            if len(ab) <= FSST_MAX_SYMLEN:
                gains[ab] += len(ab)
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        table = [s for s, _ in ranked[:FSST_MAX_SYMBOLS]]
    return table


def fsst_encode(blob: bytes, table: list[bytes], pat=None) -> bytes:
    """Encode one byte string: greedy longest-match against the table →
    one code byte per symbol; bytes not in the table are emitted as
    (escape, literal) pairs. Pass ``pat`` (from :func:`_fsst_pattern`) to
    amortize the tokenizer across many strings."""
    if pat is None:
        pat = _fsst_pattern(table)
    idx = {s: i for i, s in enumerate(table)}
    out = bytearray()
    for m in pat.finditer(blob):
        s = m.group()
        i = idx.get(s)
        if i is None:
            out.append(FSST_ESCAPE)
            out += s
        else:
            out.append(i)
    return bytes(out)


def fsst_decode(code: bytes, table: list[bytes]) -> bytes:
    """Inverse of :func:`fsst_encode`. Escape-free stretches decode as a
    bulk table gather (list __getitem__ + join — no per-symbol Python
    branching); escapes are handled by jumping between them. Decoding a
    concatenation of per-string encodings yields the concatenation of the
    strings (escape pairs never span string boundaries), which is how the
    chunk decoder runs one pass per vector."""
    esc = b"%c" % FSST_ESCAPE
    get = table.__getitem__
    pos, parts = 0, []
    while True:
        e = code.find(esc, pos)
        if e < 0:
            parts.append(b"".join(map(get, code[pos:])))
            break
        parts.append(b"".join(map(get, code[pos:e])))
        parts.append(code[e + 1 : e + 2])
        pos = e + 2
    return b"".join(parts)


# ------------------------------------------------------------------ frequency
def freq_encode(arr: np.ndarray) -> tuple[int, np.ndarray, np.ndarray]:
    """Frequency encoding (kernels/frequency_kernel.hpp:8-69): ONE frequent
    value + an exception list of (position, value) for everything else.
    Returns ``(top, exc_pos, exc_vals)``. Positions serialize as uint16,
    so inputs are capped at 0xFFFF values — enforced here so a future
    caller with a longer array fails loudly at encode time instead of
    silently wrapping positions."""
    if len(arr) > 0xFFFF:  # not assert: -O must not strip a data-integrity gate
        raise ValueError(
            f"freq_encode: {len(arr)} values > uint16 position space"
        )
    a = arr.astype(np.int64, copy=False)
    if len(a) == 0:
        return 0, np.zeros(0, dtype=np.uint16), a[:0]
    vals, cnts = np.unique(a, return_counts=True)
    top = int(vals[int(cnts.argmax())])
    exc_pos = np.flatnonzero(a != top)
    return top, exc_pos.astype(np.uint16), a[exc_pos]


def freq_decode(
    top: int, exc_pos: np.ndarray, exc_vals: np.ndarray, n: int
) -> np.ndarray:
    out = np.full(n, top, dtype=np.int64)
    if len(exc_pos):
        out[exc_pos.astype(np.int64)] = exc_vals.astype(np.int64)
    return out


# -------------------------------------------------------------------- SLPatch
def slpatch_encode(
    arr: np.ndarray,
) -> tuple[int, int, bytes, np.ndarray, np.ndarray]:
    """SLPatch (kernels/slpatch_kernel.hpp:8-31): FFOR at a bit width
    chosen for the BULK of the deltas, with out-of-width values patched
    from an exception list after decode. The width minimizes measured
    bytes (packed payload + 10 B per exception) over every candidate
    width, so SLPatch is only ever emitted when patching genuinely beats
    plain FFOR. Returns ``(base, width, payload, exc_pos, exc_vals)``;
    exception slots in the payload hold 0. Positions serialize as
    uint16, so inputs are capped at 0xFFFF values (enforced — misuse
    fails at encode time, not as corrupt data on decode)."""
    if len(arr) > 0xFFFF:  # not assert: -O must not strip a data-integrity gate
        raise ValueError(
            f"slpatch_encode: {len(arr)} values > uint16 position space"
        )
    a = arr.astype(np.int64, copy=False)
    base = int(a.min()) if len(a) else 0
    delta = (a.astype(_U64) - _U64(base & 0xFFFFFFFFFFFFFFFF)) & _U64(
        0xFFFFFFFFFFFFFFFF
    )
    # per-value bit lengths via float log2 are unsafe near 2^53; compare
    # against exact powers of two instead: bit_length(d) = #{k: 2^k <= d}
    # over k = 0..63 (0 for d == 0, 64 for d >= 2^63)
    bounds = (_U64(1) << np.arange(0, 64, dtype=_U64)).astype(_U64)
    bl = np.searchsorted(bounds, delta, side="right").astype(np.int64)
    hist = np.bincount(bl, minlength=65)
    tail = np.cumsum(hist[::-1])[::-1]  # tail[w] = count(bl >= w)
    n = len(a)
    best_w, best_cost = 64, (n * 64 + 7) // 8
    for w in range(64):
        n_exc = int(tail[w + 1]) if w + 1 <= 64 else 0
        cost = (n * w + 7) // 8 + 10 * n_exc
        if cost < best_cost:
            best_w, best_cost = w, cost
    w = best_w
    exc = bl > w
    exc_pos = np.flatnonzero(exc)
    payload = pack_bits(np.where(exc, _U64(0), delta), w)
    return base, w, payload, exc_pos.astype(np.uint16), a[exc_pos]


def slpatch_decode(
    base: int,
    width: int,
    payload: bytes,
    n: int,
    exc_pos: np.ndarray,
    exc_vals: np.ndarray,
) -> np.ndarray:
    out = ffor_decode(base, width, payload, n)
    if len(exc_pos):
        out[exc_pos.astype(np.int64)] = exc_vals.astype(np.int64)
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
