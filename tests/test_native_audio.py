"""Native C++ audio ingest (libaudio_ingest.so) == numpy reference path.

Covers the reference's base64_to_audio_np matrix (voice_interface.py:
983-1093): bit depths 8/16/24/32, IEEE float, WAVE_FORMAT_EXTENSIBLE,
multi-channel downmix, and the resample ladder — decoded natively and
checked against utils/audio.py's numpy codec + scipy polyphase resampler.
"""
import base64
import struct
import subprocess

import numpy as np
import pytest

from toolbox_for_asr_and_tts_tpu.utils import audio as A


@pytest.fixture(scope="module", autouse=True)
def lib():
    import os
    d = os.path.join(os.path.dirname(A.__file__), "..", "native")
    subprocess.run(["make", "-C", d], check=True, capture_output=True)
    A._NATIVE_AUDIO = None          # re-probe after build
    got = A._native_audio()
    if got is None:
        pytest.skip("no C++ toolchain for libaudio_ingest.so")
    yield got


def _wav(x: np.ndarray, sr: int, bits=16, fmt=1, extensible=False) -> bytes:
    """Hand-rolled encoder for the full format matrix (the production
    encoder only writes 16-bit)."""
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    if fmt == 3:
        raw = x.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif bits == 8:
        raw = (np.clip(x * 128.0 + 128.0, 0, 255)).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2").tobytes()
    elif bits == 24:
        v = np.clip(np.round(x * (1 << 23)), -(1 << 23), (1 << 23) - 1
                    ).astype("<i4")
        b = v.astype("<i4").tobytes()
        raw = b"".join(b[i:i + 3] for i in range(0, len(b), 4))
    else:
        v = np.clip(np.round(x * 2147483647.0), -2147483648, 2147483647)
        raw = v.astype("<i4").tobytes()
    block = ch * bits // 8
    if extensible:
        guid = struct.pack("<H", fmt) + bytes.fromhex(
            "000000001000800000aa00389b71")
        body = struct.pack("<HHIIHH", 0xFFFE, ch, sr, sr * block, block,
                           bits) + struct.pack("<HHI", 22, bits, 0) + guid
    else:
        body = struct.pack("<HHIIHH", fmt, ch, sr, sr * block, block, bits)
    hdr = b"RIFF" + struct.pack("<I", 20 + len(body) + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", len(body)) + body
    hdr += b"data" + struct.pack("<I", len(raw))
    return hdr + raw


def _sig(n, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    base = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    if ch == 1:
        return base.astype(np.float32)
    return np.stack([base * (i + 1) / ch for i in range(ch)], 1).astype(
        np.float32)


def _native(data: bytes, sr=16000):
    out = A._ingest_native(data, sr)
    assert out is not None
    return out


@pytest.mark.parametrize("bits,fmt", [(8, 1), (16, 1), (24, 1), (32, 1),
                                      (32, 3), (64, 3)])
def test_decode_matrix_matches_numpy(bits, fmt):
    x = _sig(1600)
    data = _wav(x, 16000, bits=bits, fmt=fmt)
    ref = A.ensure_mono_16k(*A.decode_wav_bytes(data))
    got = _native(data)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_extensible_and_downmix():
    x = _sig(1600, ch=2)
    data = _wav(x, 16000, bits=16, extensible=True)
    ref = A.ensure_mono_16k(*A.decode_wav_bytes(data))
    got = _native(data)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("sr_in", [8000, 22050, 44100, 48000])
def test_resample_matches_scipy(sr_in):
    pytest.importorskip("scipy")
    n = sr_in // 2                       # 0.5 s
    t = np.arange(n) / sr_in
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    data = _wav(x, sr_in, bits=16)
    ref = A.ensure_mono_16k(*A.decode_wav_bytes(data))
    got = _native(data)
    assert len(got) == len(ref)
    # identical filter design (kaiser 5.0, half_len 10·max) → tight match
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_base64_ladder_uses_native_and_agrees(monkeypatch):
    x = _sig(3200, ch=2)
    b64 = base64.b64encode(_wav(x, 44100, bits=24)).decode()
    got = A.base64_to_audio_np(b64)
    monkeypatch.setenv("TOOLBOX_NATIVE_AUDIO", "0")
    A._NATIVE_AUDIO = None
    ref = A.base64_to_audio_np(b64)
    A._NATIVE_AUDIO = None               # restore probe state for others
    assert len(got) == len(ref)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_native_rejects_garbage():
    assert A._ingest_native(b"definitely not a wav", 16000) is None
