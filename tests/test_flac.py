"""Native FLAC decoder vs an in-test minimal encoder (ground truth).

The encoder writes spec-compliant streams using verbatim and constant
subframes (mandatory decoder features), mono and stereo, odd tail block —
exercising the frame parser, subframe decode, and interleaving.
"""

import numpy as np
import pytest

from deepspeech_tpu.audio.io import load_audio_norm, read_flac


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i:i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def encode_flac(samples: np.ndarray, sample_rate=16000, bits=16,
                block_size=256, constant_value=None) -> bytes:
    """Minimal FLAC: STREAMINFO + verbatim (or constant) subframes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    total, channels = samples.shape

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max block size
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    body = si.tobytes() + b"\x00" * 16  # md5 zeros
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, total, block_size):
        chunk = samples[start:start + block_size]
        bs = len(chunk)
        w = BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # block size: 16-bit value follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(channels - 1, 4)  # independent channels
        w.write(4, 3)  # 16-bit samples
        w.write(0, 1)
        assert frame_no < 0x80
        w.write(frame_no, 8)  # utf8 frame number (single byte)
        w.write(bs - 1, 16)
        w.write(0, 8)  # crc8 (unchecked)
        for c in range(channels):
            w.write(0, 1)  # pad
            if constant_value is not None:
                w.write(0b000000, 6)  # constant
                w.write(0, 1)  # no wasted bits
                w.write_signed(constant_value, bits)
            else:
                w.write(0b000001, 6)  # verbatim
                w.write(0, 1)
                for v in chunk[:, c]:
                    w.write_signed(int(v), bits)
        w.align()
        w.write(0, 16)  # crc16 (unchecked)
        out += w.tobytes()
        frame_no += 1
    return bytes(out)


@pytest.fixture()
def tone():
    t = np.arange(1000)
    return (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int32)


class TestFlacDecoder:
    def test_mono_verbatim_roundtrip(self, tmp_path, tone):
        p = tmp_path / "tone.flac"
        p.write_bytes(encode_flac(tone))
        data, sr, bits = read_flac(str(p))
        assert sr == 16000 and bits == 16
        np.testing.assert_array_equal(data, tone)

    def test_odd_tail_block(self, tmp_path):
        sig = np.arange(-300, 301, dtype=np.int32) * 30  # 601 samples
        p = tmp_path / "odd.flac"
        p.write_bytes(encode_flac(sig, block_size=256))
        data, sr, _ = read_flac(str(p))
        np.testing.assert_array_equal(data, sig)

    def test_stereo_independent(self, tmp_path, tone):
        stereo = np.stack([tone, -tone // 2], axis=1)
        p = tmp_path / "st.flac"
        p.write_bytes(encode_flac(stereo))
        data, sr, _ = read_flac(str(p))
        assert data.shape == (1000, 2)
        np.testing.assert_array_equal(data, stereo)

    def test_constant_subframe(self, tmp_path):
        n = 512
        p = tmp_path / "const.flac"
        p.write_bytes(encode_flac(np.full(n, 777, np.int32),
                                  constant_value=777))
        data, _, _ = read_flac(str(p))
        np.testing.assert_array_equal(data, np.full(n, 777))

    def test_load_audio_norm_flac(self, tmp_path, tone):
        p = tmp_path / "tone.flac"
        p.write_bytes(encode_flac(tone))
        y, sr = load_audio_norm(str(p))
        assert sr == 16000
        assert y.dtype == np.float32
        assert abs(np.abs(y).max() - 1.0) < 1e-6  # peak-normalized

    def test_fixed_order1_rice_residual(self, tmp_path):
        """Fixed order-1 predictor with rice-coded residuals — the subframe
        type real encoders emit for smooth signals."""
        n = 256
        sig = np.cumsum(np.random.default_rng(0).integers(-40, 41, n)) \
                .astype(np.int32) + 5000
        residual = np.diff(sig)  # order-1 prediction errors

        w = BitWriter()
        out = bytearray(b"fLaC")
        si = BitWriter()
        si.write(n, 16), si.write(n, 16), si.write(0, 24), si.write(0, 24)
        si.write(16000, 20), si.write(0, 3), si.write(15, 5), si.write(n, 36)
        body = si.tobytes() + b"\x00" * 16
        out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

        w.write(0x3FFE, 14), w.write(0, 1), w.write(0, 1)
        w.write(7, 4), w.write(0, 4), w.write(0, 4), w.write(4, 3), w.write(0, 1)
        w.write(0, 8)          # frame number
        w.write(n - 1, 16)     # block size - 1
        w.write(0, 8)          # crc8
        w.write(0, 1)
        w.write(0b001001, 6)   # fixed, order 1
        w.write(0, 1)          # no wasted bits
        w.write_signed(int(sig[0]), 16)  # warmup
        w.write(0, 2)          # residual method: rice 4-bit
        w.write(0, 4)          # partition order 0
        param = 7
        w.write(param, 4)
        for r in residual:
            r = int(r)
            u = (2 * r) if r >= 0 else (-2 * r - 1)
            q, rem = u >> param, u & ((1 << param) - 1)
            w.write(0, int(q))     # unary quotient: q zeros...
            w.write(1, 1)          # ...then the stop bit
            w.write(int(rem), param)
        w.align()
        w.write(0, 16)
        out += w.tobytes()

        p = tmp_path / "fixed.flac"
        p.write_bytes(bytes(out))
        data, sr, _ = read_flac(str(p))
        np.testing.assert_array_equal(data, sig)

    def test_not_flac_raises(self, tmp_path):
        p = tmp_path / "x.flac"
        p.write_bytes(b"RIFFxxxx")
        with pytest.raises(ValueError):
            read_flac(str(p))
