import base64

import numpy as np
import pytest

from toolbox_for_asr_and_tts_tpu.utils import (
    base64_to_audio_np,
    decode_wav_bytes,
    encode_wav_bytes,
    ensure_mono_16k,
    resample_poly,
)


def _sine(sr=16000, secs=0.5, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_wav_roundtrip_16bit():
    x = _sine()
    data = encode_wav_bytes(x, 16000)
    y, sr = decode_wav_bytes(data)
    assert sr == 16000
    assert y.shape == (len(x), 1)
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 32768)


def test_wav_stereo_downmix():
    x = _sine()
    stereo = np.stack([x, -x], axis=1)
    data = encode_wav_bytes(stereo, 16000)
    y, sr = decode_wav_bytes(data)
    mono = ensure_mono_16k(y, sr)
    assert np.abs(mono).max() < 1e-3  # L+R cancel


def test_base64_to_audio_np_resamples():
    x = _sine(sr=8000)
    b64 = base64.b64encode(encode_wav_bytes(x, 8000)).decode()
    y = base64_to_audio_np(b64)
    assert y.dtype == np.float32
    assert abs(len(y) - 2 * len(x)) <= 2


def test_resample_identity():
    x = _sine()
    np.testing.assert_array_equal(resample_poly(x, 16000, 16000), x)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav_bytes(b"not a wav file at all........" * 4)


def test_float32_wav():
    import struct
    x = _sine()
    raw = x.astype("<f4").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
    hdr += b"data" + struct.pack("<I", len(raw))
    y, sr = decode_wav_bytes(hdr + raw)
    np.testing.assert_allclose(y[:, 0], x, atol=1e-6)


def test_decode_fuzz_never_crashes():
    """Truncated/corrupted WAVs must raise ValueError, never crash."""
    rng = np.random.default_rng(0)
    good = encode_wav_bytes(_sine(secs=0.1), 16000)
    for i in range(200):
        data = bytearray(good)
        if i % 3 == 0:
            data = data[: rng.integers(0, len(data))]
        for _ in range(rng.integers(0, 8)):
            if len(data):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        try:
            decode_wav_bytes(bytes(data))
        except ValueError:
            pass


def _extensible_wav(x, fmt_tag, bits):
    """Build a WAVE_FORMAT_EXTENSIBLE file (tag 0xFFFE, SubFormat GUID)."""
    import struct
    if fmt_tag == 3:
        raw = x.astype("<f4" if bits == 32 else "<f8").tobytes()
    else:
        raw = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    guid = struct.pack("<H", fmt_tag) + bytes.fromhex("000000001000800000aa00389b71")
    ext = struct.pack("<HHI", 22, bits, 0x4) + guid
    body = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 16000 * bits // 8, bits // 8, bits) + ext
    hdr = b"RIFF" + struct.pack("<I", 20 + len(body) + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", len(body)) + body
    hdr += b"data" + struct.pack("<I", len(raw))
    return hdr + raw


def test_extensible_float32_wav():
    """Extensible float WAVs must decode as float, not be misread as int PCM
    (ADVICE.md round-1 medium finding)."""
    x = _sine()
    y, sr = decode_wav_bytes(_extensible_wav(x, fmt_tag=3, bits=32))
    assert sr == 16000
    np.testing.assert_allclose(y[:, 0], x, atol=1e-6)


def test_extensible_pcm16_wav():
    x = _sine()
    y, _ = decode_wav_bytes(_extensible_wav(x, fmt_tag=1, bits=16))
    np.testing.assert_allclose(y[:, 0], x, atol=1e-4)


def test_extensible_unknown_guid_rejected():
    import struct
    data = bytearray(_extensible_wav(_sine(secs=0.05), fmt_tag=3, bits=32))
    # corrupt the GUID suffix
    data[20 + 26] ^= 0xFF
    with pytest.raises(ValueError):
        decode_wav_bytes(bytes(data))
