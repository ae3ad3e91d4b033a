"""Batch-vectorized codec paths (r12) must be bit-identical to the scalar
stdlib forms they replace: write_bmp_batch / write_wav_batch byte-equal to
joined scalar writes, decode_bmp_batch / decode_wav_batch value-equal to
per-payload scalar decodes — including on container frames at offsets."""

import hashlib

import numpy as np
import pytest

from duckdb_fastlanes_spark.pipeline.multimodal import (
    N_CONTAINER_FRAMES,
    decode_bmp,
    decode_bmp_batch,
    decode_wav,
    decode_wav_batch,
    parse_frame_offsets,
    write_bmp,
    write_bmp_batch,
    write_frame_container,
    write_wav,
    write_wav_batch,
)

HS = [hashlib.md5(f"doc-{i}".encode()).hexdigest() for i in range(57)]


def test_write_bmp_batch_byte_identical():
    buf, starts, sizes = write_bmp_batch(HS)
    assert buf == b"".join(write_bmp(h) for h in HS)
    scalar_sizes = [len(write_bmp(h)) for h in HS]
    assert sizes.tolist() == scalar_sizes
    assert starts.tolist() == np.concatenate(
        ([0], np.cumsum(scalar_sizes)[:-1])
    ).tolist()


def test_write_wav_batch_byte_identical():
    buf, starts, sizes = write_wav_batch(HS)
    assert buf == b"".join(write_wav(h) for h in HS)
    assert sizes.tolist() == [len(write_wav(h)) for h in HS]


def test_decode_bmp_batch_matches_scalar():
    payloads = [write_bmp(h) for h in HS]
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    sizes = np.array([len(p) for p in payloads], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    w, ht, sl = decode_bmp_batch(buf, starts, sizes)
    for i, p in enumerate(payloads):
        _, sw, sh, _, ssl = decode_bmp(p)
        assert (int(w[i]), int(ht[i]), int(sl[i])) == (sw, sh, ssl)


def test_decode_bmp_batch_on_container_frames():
    """Batch decode straight out of a multi-frame container at walked
    offsets — no per-frame slicing."""
    payload = write_frame_container("some text")
    frames = parse_frame_offsets(payload)
    assert len(frames) == N_CONTAINER_FRAMES
    buf = np.frombuffer(payload, dtype=np.uint8)
    starts = np.array([off for _, off, _ in frames], dtype=np.int64)
    sizes = np.array([sz for _, _, sz in frames], dtype=np.int64)
    w, ht, sl = decode_bmp_batch(buf, starts, sizes)
    for k, (_, off, sz) in enumerate(frames):
        _, sw, sh, _, ssl = decode_bmp(payload[off : off + sz])
        assert (int(w[k]), int(ht[k]), int(sl[k])) == (sw, sh, ssl)


def test_decode_wav_batch_matches_scalar():
    payloads = [write_wav(h) for h in HS]
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    sizes = np.array([len(p) for p in payloads], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    rate, n, ss = decode_wav_batch(buf, starts, sizes)
    for i, p in enumerate(payloads):
        sr, sn, sss = decode_wav(p)
        assert (int(rate[i]), int(n[i]), int(ss[i])) == (sr, sn, sss)


def test_decode_bmp_batch_rejects_bad_magic():
    p = bytearray(write_bmp(HS[0]))
    p[0] = 0x58
    buf = np.frombuffer(bytes(p), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_bmp_batch(buf, np.array([0]), np.array([len(p)]))


def test_decode_wav_batch_rejects_bad_tag():
    p = bytearray(write_wav(HS[0]))
    p[8] = 0x58
    buf = np.frombuffer(bytes(p), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_wav_batch(buf, np.array([0]), np.array([len(p)]))


def test_batch_codecs_empty_input():
    buf = np.zeros(0, dtype=np.uint8)
    z = np.zeros(0, dtype=np.int64)
    for fn in (decode_bmp_batch, decode_wav_batch):
        a, b, c = fn(buf, z, z)
        assert len(a) == len(b) == len(c) == 0
    for fn in (write_bmp_batch, write_wav_batch):
        payload, starts, sizes = fn([])
        assert payload == b"" and len(starts) == 0 and len(sizes) == 0
