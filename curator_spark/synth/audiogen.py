"""Deterministic synthetic audio clips (pure numpy, no external codecs).

Two codecs per FIXTURES.md: ``pcm_s16le`` (RIFF/WAV, PCM16) and ``ulaw``
(G.711 μ-law companded mono stream — public-standard companding math).
This is the engine's analog of the reference's multimodal payloads
(``types/prompt.py:12-117`` holds raw image/file ``bytes`` and serializes
lazily); here the payload is audio ``bytes`` + codec metadata.
"""

from __future__ import annotations

import struct

import numpy as np

from . import textgen

SAMPLE_RATES = (8000, 16000, 22050, 44100)
SAMPLE_RATE_PROBS = (0.10, 0.70, 0.10, 0.10)  # skew toward 16 kHz
CODECS = ("pcm_s16le", "ulaw")
CODEC_PROBS = (0.85, 0.15)  # codec imbalance drives the skew tests

_MU = 255.0


def mulaw_encode(pcm: np.ndarray) -> bytes:
    """G.711-style μ-law companding of float32/64 samples in [-1, 1]."""
    x = np.clip(pcm, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    q = np.round((y + 1.0) / 2.0 * 255.0).astype(np.uint8)
    return q.tobytes()


def mulaw_decode(data: bytes) -> np.ndarray:
    q = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    y = q / 255.0 * 2.0 - 1.0
    return np.sign(y) * (np.expm1(np.abs(y) * np.log1p(_MU))) / _MU


def pcm16_to_wav(pcm: np.ndarray, sr: int) -> bytes:
    """Minimal RIFF/WAVE container around little-endian PCM16 mono."""
    i16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
    data = i16.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sr, sr * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def wav_to_pcm(data: bytes) -> tuple[np.ndarray, int]:
    """Parse the minimal WAV produced above (and standard PCM16 mono WAVs)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sr = None
    pcm = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            fmt, ch, sr = struct.unpack_from("<HHI", data, pos)[:3]
            # only PCM16 mono is decodable here: reinterpreting float32 or
            # multi-channel data as int16 mono would emit garbage features
            # with decode_ok=True instead of quarantining the row
            if fmt != 1 or ch != 1:
                raise ValueError(f"unsupported WAV layout: format={fmt} channels={ch}")
        elif cid == b"data":
            raw = data[pos : pos + size]
            pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
        pos += size + (size & 1)
    if pcm is None or sr is None:
        raise ValueError("missing fmt/data chunk")
    return pcm, sr


def gen_waveform(i: int, sr: int, dur_ms: int) -> np.ndarray:
    """Seeded tone+noise mixture — a pure function of (i, sr, dur_ms)."""
    rng = textgen.clip_rng(i, "audio")
    n = int(round(sr * dur_ms / 1000.0))
    t = np.arange(n, dtype=np.float64) / sr
    f0 = 80.0 + 400.0 * rng.random()
    sig = (
        0.35 * np.sin(2 * np.pi * f0 * t)
        + 0.18 * np.sin(2 * np.pi * (2.1 * f0) * t + rng.random())
        + 0.05 * rng.standard_normal(n)
    )
    # amplitude envelope so silence/rms features vary across clips
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * (0.8 + rng.random()) * t))
    sig = sig * env
    if rng.random() < 0.05:  # occasional near-silent clip (drop rule target)
        sig = sig * 0.002
    if rng.random() < 0.04:  # occasional clipped clip
        sig = np.clip(sig * 8.0, -1.0, 1.0)
    return np.clip(sig, -1.0, 1.0)


def gen_clip_meta(i: int) -> tuple[int, int, str]:
    """(sr_hz, dur_ms, codec) for clip i — metadata-only, cheap."""
    rng = textgen.clip_rng(i, "meta")
    sr = SAMPLE_RATES[int(rng.choice(len(SAMPLE_RATES), p=np.asarray(SAMPLE_RATE_PROBS)))]
    # log-normal duration, median ~800 ms, long tail; a few out-of-bounds
    dur_ms = int(np.clip(rng.lognormal(mean=6.7, sigma=0.6), 40, 90000))
    codec = CODECS[int(rng.choice(len(CODECS), p=np.asarray(CODEC_PROBS)))]
    return sr, dur_ms, codec


def encode_clip(i: int) -> tuple[bytes, int, int, str]:
    """Full audio payload for clip i: (bytes, sr_hz, dur_ms, codec)."""
    sr, dur_ms, codec = gen_clip_meta(i)
    pcm = gen_waveform(i, sr, dur_ms)
    blob = pcm16_to_wav(pcm, sr) if codec == "pcm_s16le" else mulaw_encode(pcm)
    return blob, sr, dur_ms, codec
