"""Package FLAC encoder: roundtrip vs the native decoder + spec details.

tests/test_flac.py keeps its own independent minimal writer as decoder
ground truth; this file covers the shipped ``audio/flac_encode.py``
(the sox-replacement write path, reference data/librispeech.py:45) —
CRC check values, UTF-8 frame-number coding past 127 frames, automatic
constant subframes, float quantization, and multi-channel interleave.
"""

import numpy as np
import pytest

from deepspeech_tpu.audio.flac_encode import (
    _crc8,
    _crc16,
    _utf8_code,
    encode_flac,
    save_flac,
)
from deepspeech_tpu.audio.io import load_audio, read_flac


def test_crc_check_values():
    # CRC-8 poly 0x07 and CRC-16/UMTS poly 0x8005 published check values.
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_utf8_frame_number_matches_utf8():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x10FFFF]:
        assert _utf8_code(n) == chr(n).encode("utf-8")
    # Beyond Unicode's range the FLAC extension keeps the same pattern:
    # 2^24 needs 25 payload bits -> 4 continuation bytes, lead 111110xx.
    assert _utf8_code(1 << 24) == bytes([0xF9, 0x80, 0x80, 0x80, 0x80])


@pytest.mark.parametrize("shape,bits,block", [
    ((50_000,), 16, 4096),
    ((1_000, 2), 16, 256),
    ((700,), 24, 128),
    ((300,), 8, 64),
])
def test_roundtrip(tmp_path, shape, bits, block):
    rng = np.random.default_rng(hash((shape, bits)) % (1 << 32))
    x = rng.integers(-(1 << (bits - 1)), (1 << (bits - 1)) - 1,
                     size=shape).astype(np.int64)
    x.reshape(-1)[:40] = 7  # flat head exercises the constant subframe
    path = tmp_path / "t.flac"
    path.write_bytes(encode_flac(x, 22050, bits=bits, block_size=block))
    data, sr, b = read_flac(str(path))
    assert (sr, b) == (22050, bits)
    got = np.asarray(data).astype(np.int64).reshape(len(x), -1)
    assert np.array_equal(got, x.reshape(len(x), -1))


def test_many_frames_multibyte_numbers(tmp_path):
    # 157 frames of 256 forces >1-byte coded frame numbers (>=0x80).
    x = (np.arange(40_000) % 251 - 125).astype(np.int64)
    path = tmp_path / "m.flac"
    path.write_bytes(encode_flac(x, 16000, block_size=256))
    data, _, _ = read_flac(str(path))
    assert np.array_equal(np.asarray(data).ravel().astype(np.int64), x)


def test_save_flac_float_reads_back_via_loader(tmp_path):
    t = np.arange(16_000) / 16_000
    y = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "f.flac"
    save_flac(str(path), y, 16000)
    back, sr = load_audio(str(path))
    assert sr == 16000
    assert back.shape == y.shape
    assert np.max(np.abs(back - y)) < 1.0 / (1 << 14)


def test_out_of_range_rejected():
    with pytest.raises(ValueError):
        encode_flac(np.array([40_000], np.int64), 16000, bits=16)
