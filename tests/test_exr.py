"""EXR codec tests: roundtrips + cross-check of the vectorized ZIP
predictor/interleave against the scalar algorithm from the OpenEXR spec."""

import numpy as np
import pytest

from mapanything_tpu.data.exr import (
    _zip_decode,
    _zip_encode,
    read_exr,
    write_exr,
)


def _scalar_encode(raw: bytes) -> bytes:
    """OpenEXR ImfZip compress pre-pass, straight from the spec pseudocode:
    interleave-split then byte-delta predictor (no zlib)."""
    n = len(raw)
    half = (n + 1) // 2
    t = bytearray(n)
    t[:half] = raw[0::2]
    t[half:] = raw[1::2]
    p = t[0]
    for i in range(1, n):
        d = (t[i] - p + 384) % 256
        p = t[i]
        t[i] = d
    return bytes(t)


def _scalar_decode(enc: bytes) -> bytes:
    n = len(enc)
    t = bytearray(enc)
    for i in range(1, n):
        t[i] = (t[i - 1] + t[i] - 128) % 256
    half = (n + 1) // 2
    out = bytearray(n)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return bytes(out)


class TestZipTransform:
    def test_vectorized_matches_scalar(self):
        import zlib

        rng = np.random.default_rng(0)
        for n in (1, 2, 7, 64, 1001):
            raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            # our encode must be decodable by the scalar spec algorithm
            ours = zlib.decompress(_zip_encode(raw))
            assert _scalar_decode(ours) == raw
            # scalar encode must be decodable by our decode
            enc = zlib.compress(_scalar_encode(raw))
            assert _zip_decode(enc, n) == raw


class TestExrRoundtrip:
    def test_exact_float_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        for h, w in [(5, 9), (16, 16), (77, 133), (33, 4)]:
            d = rng.uniform(-50, 1e4, (h, w)).astype(np.float32)
            p = tmp_path / f"d_{h}x{w}.exr"
            write_exr(p, d)
            assert np.array_equal(read_exr(p), d)

    def test_special_values(self, tmp_path):
        d = np.zeros((17, 8), np.float32)
        d[0, 0] = np.inf
        d[1, 1] = np.nan
        d[2, 2] = -0.0
        p = tmp_path / "s.exr"
        write_exr(p, d)
        back = read_exr(p)
        assert np.isinf(back[0, 0]) and np.isnan(back[1, 1])
        assert np.array_equal(back[3:], d[3:])


class TestUnsupportedVariants:
    @pytest.mark.parametrize("flag,msg", [
        (0x200, "tiled"), (0x800, "deep-data"), (0x1000, "multi-part"),
    ])
    def test_flagged_formats_rejected(self, tmp_path, flag, msg):
        import struct

        p = tmp_path / "bad.exr"
        p.write_bytes(struct.pack("<ii", 20000630, 2 | flag))
        with pytest.raises(ValueError, match=msg):
            read_exr(p)
