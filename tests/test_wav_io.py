"""WAV ingestion variants + kaiser-sinc host resample.

The reference accepts any pydub/ffmpeg-decodable input
(F5_TTS/F5-TTS-ONNX-Inference.py:223) and writes WAVEX via soundfile
(:315); the self-contained parser must read every common WAV layout
(PCM 8/16/24/32, float32/64, WAVEX wrappers) and the host resample must
be alias-free, not linear.
"""
import math
import struct

import numpy as np
import pytest

from tts_tpu.audio.wav import (
    read_wav,
    resample_kaiser,
    resample_linear,
    write_wav,
)


def _make_wav(path, fmt_tag, bits, data_bytes, rate=24000, ch=1,
              wavex=False, extra_chunk=True):
    if wavex:
        sub = (struct.pack("<H", fmt_tag) + b"\x00\x00"
               + bytes.fromhex("000000001000800000aa00389b71"))
        fmt = (struct.pack("<HHIIHH", 0xFFFE, ch, rate,
                           rate * ch * bits // 8, ch * bits // 8, bits)
               + struct.pack("<HHI", 22, bits, 4) + sub)
    else:
        fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:                      # LIST metadata must be skipped
        body += b"LIST" + struct.pack("<I", 4) + b"INFO"
    body += b"data" + struct.pack("<I", len(data_bytes)) + data_bytes
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


@pytest.fixture
def sine_i16():
    t = np.arange(2400) / 24000.0
    return (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)


def test_float32_and_float64(tmp_path, sine_i16):
    f32 = sine_i16.astype(np.float32) / 32767.0 * (32767 / 32768)
    f32 = (0.5 * np.sin(2 * np.pi * 440 * np.arange(2400) / 24000.0)
           ).astype(np.float32)
    _make_wav(tmp_path / "a.wav", 3, 32, f32.tobytes())
    x, r = read_wav(str(tmp_path / "a.wav"))
    assert r == 24000 and np.abs(x.astype(int) - sine_i16).max() <= 1
    _make_wav(tmp_path / "b.wav", 3, 64, f32.astype(np.float64).tobytes())
    x, _ = read_wav(str(tmp_path / "b.wav"))
    assert np.abs(x.astype(int) - sine_i16).max() <= 1


def test_pcm24(tmp_path, sine_i16):
    v24 = sine_i16.astype(np.int32) << 8
    b = np.zeros((len(v24), 3), np.uint8)
    b[:, 0] = v24 & 0xFF
    b[:, 1] = (v24 >> 8) & 0xFF
    b[:, 2] = (v24 >> 16) & 0xFF
    _make_wav(tmp_path / "c.wav", 1, 24, b.tobytes())
    x, _ = read_wav(str(tmp_path / "c.wav"))
    assert np.array_equal(x, sine_i16)


def test_wavex_stereo_and_float(tmp_path, sine_i16):
    stereo = np.stack([sine_i16, sine_i16], 1).reshape(-1)
    _make_wav(tmp_path / "d.wav", 1, 16, stereo.tobytes(), ch=2, wavex=True)
    x, _ = read_wav(str(tmp_path / "d.wav"))
    assert np.array_equal(x, sine_i16)     # downmix of identical channels
    f32 = sine_i16.astype(np.float32) / 32767.0
    _make_wav(tmp_path / "e.wav", 3, 32, f32.tobytes(), wavex=True)
    x, _ = read_wav(str(tmp_path / "e.wav"))
    assert np.abs(x.astype(int) - sine_i16).max() <= 1


def test_compressed_raises_naming_ffmpeg(tmp_path, sine_i16):
    _make_wav(tmp_path / "f.wav", 0x0055, 16, sine_i16.tobytes())  # MP3 tag
    with pytest.raises(ValueError, match="ffmpeg"):
        read_wav(str(tmp_path / "f.wav"))


def test_roundtrip_own_writer(tmp_path, sine_i16):
    write_wav(str(tmp_path / "g.wav"), sine_i16, 24000)
    x, r = read_wav(str(tmp_path / "g.wav"))
    assert r == 24000 and np.array_equal(x, sine_i16)


def test_kaiser_resample_beats_linear():
    t48 = np.arange(9600) / 48000.0
    s48 = (0.5 * np.sin(2 * np.pi * 440 * t48) * 32767).astype(np.int16)
    yk = resample_kaiser(s48, 48000, 24000)
    yl = resample_linear(s48, 48000, 24000)
    t24 = np.arange(len(yk)) / 24000.0
    ideal = 0.5 * np.sin(2 * np.pi * 440 * t24) * 32767
    rmse_k = math.sqrt(np.mean((yk[100:-100] - ideal[100:-100]) ** 2))
    rmse_l = math.sqrt(np.mean((yl[100:-100] - ideal[100:-100]) ** 2))
    assert rmse_k < 5.0                   # near-exact band-limited sine
    assert rmse_k < rmse_l / 50           # decisively better than linear


def test_kaiser_rational_ratio_and_dc():
    t = np.arange(4410) / 44100.0
    s = (0.3 * np.sin(2 * np.pi * 1000 * t) * 32767).astype(np.int16)
    y = resample_kaiser(s, 44100, 24000)
    assert len(y) == 4410 * 24000 // 44100
    dc = np.full(1000, 1000, np.int16)
    yd = resample_kaiser(dc, 44100, 24000)
    assert np.abs(yd[50:-50].astype(int) - 1000).max() <= 1


def test_read_wav_target_rate_uses_kaiser(tmp_path):
    t48 = np.arange(9600) / 48000.0
    s48 = (0.5 * np.sin(2 * np.pi * 440 * t48) * 32767).astype(np.int16)
    write_wav(str(tmp_path / "h.wav"), s48, 48000)
    x, r = read_wav(str(tmp_path / "h.wav"), target_rate=24000)
    assert r == 24000
    ideal = 0.5 * np.sin(2 * np.pi * 440 * np.arange(len(x)) / 24000.0) * 32767
    assert math.sqrt(np.mean((x[100:-100] - ideal[100:-100]) ** 2)) < 5.0


# ------------------------------------------------------- read_audio shim


def test_read_audio_riff_passthrough(tmp_path, sine_i16):
    """RIFF input routes to the native WAV parser byte-for-byte."""
    from tts_tpu.audio.wav import read_audio

    write_wav(str(tmp_path / "a.wav"), sine_i16, 24000)
    x, r = read_audio(str(tmp_path / "a.wav"))
    assert r == 24000 and np.array_equal(x, sine_i16)


def test_read_audio_no_ffmpeg_raises(tmp_path, monkeypatch):
    """Non-RIFF input without ffmpeg on PATH raises naming ffmpeg (the
    reference's pydub loader has the same dependency)."""
    from tts_tpu.audio.wav import read_audio

    p = tmp_path / "a.mp3"
    p.write_bytes(b"ID3\x04" + b"\x00" * 64)
    monkeypatch.setenv("PATH", str(tmp_path))     # nothing on PATH
    with pytest.raises(RuntimeError, match="ffmpeg"):
        read_audio(str(p))


def test_read_audio_ffmpeg_shim_plumbing(tmp_path, sine_i16, monkeypatch):
    """With an `ffmpeg` executable on PATH the compressed path decodes:
    a stand-in binary that converts the input to PCM WAV exercises the
    subprocess plumbing (argument order, temp-file handoff, RIFF
    re-parse) end to end."""
    import stat
    import sys

    from tts_tpu.audio.wav import read_audio

    # the "compressed" source: raw samples under a non-RIFF magic
    src = tmp_path / "a.fake"
    src.write_bytes(b"FAKE" + sine_i16.tobytes())
    conv = tmp_path / "conv.py"
    conv.write_text(
        "import struct, sys\n"
        "args = sys.argv[1:]\n"
        "inp = args[args.index('-i') + 1]\n"
        "out = args[-1]\n"
        "data = open(inp, 'rb').read()[4:]\n"
        "fmt = struct.pack('<HHIIHH', 1, 1, 24000, 48000, 2, 16)\n"
        "body = (b'WAVE' + b'fmt ' + struct.pack('<I', len(fmt)) + fmt\n"
        "        + b'data' + struct.pack('<I', len(data)) + data)\n"
        "open(out, 'wb').write(b'RIFF' + struct.pack('<I', len(body))"
        " + body)\n")
    ff = tmp_path / "ffmpeg"
    ff.write_text(f"#!/bin/sh\nexec {sys.executable} {conv} \"$@\"\n")
    ff.chmod(ff.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{pytest.__file__ and ''}")
    x, r = read_audio(str(src))
    assert r == 24000 and np.array_equal(x, sine_i16)


def test_read_audio_ffmpeg_failure_surfaces_stderr(tmp_path, monkeypatch):
    import stat

    from tts_tpu.audio.wav import read_audio

    src = tmp_path / "bad.ogg"
    src.write_bytes(b"OggS" + b"\x00" * 16)
    ff = tmp_path / "ffmpeg"
    ff.write_text("#!/bin/sh\necho 'boom: no stream' >&2\nexit 1\n")
    ff.chmod(ff.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", str(tmp_path))
    with pytest.raises(RuntimeError, match="boom: no stream"):
        read_audio(str(src))
