"""ONNX-oracle parity runner: skip behavior and wav-mode plumbing.

No ONNX artifacts or checkpoints exist in this environment, so these tests
pin the harness mechanics: clean skips with reasons, and the wav-mode
compare path producing ~0 mel-L1 for identical audio (via a stubbed CLI).
"""
import json
import os

import numpy as np

from tts_tpu.parity import run_reference as rr


def test_run_all_skips_cleanly(tmp_path):
    (tmp_path / "bigvgan").mkdir()
    results = rr.run_all(str(tmp_path))
    assert len(results) == len(rr.FAMILIES)
    assert all(r.mode == "skipped" for r in results)
    by_fam = {r.family: r for r in results}
    assert "missing" in by_fam["bigvgan"].detail
    assert "directory" in by_fam["kani"].detail
    # all-skip run exits 0 (nothing failed)
    for r in results:
        assert r.line().split()[1] == "SKIP"


def test_wav_mode_identical_audio_passes(tmp_path, monkeypatch):
    from tts_tpu.audio.wav import write_wav

    art = tmp_path / "kani"
    art.mkdir()
    rng = np.random.default_rng(0)
    wav = (np.sin(np.linspace(0, 400, 22050)) * 12000
           + rng.standard_normal(22050) * 200).astype(np.int16)
    write_wav(str(art / "reference.wav"), wav, 22050)
    (art / "inputs.json").write_text(json.dumps({"text": "hello"}))

    def fake_cli(argv):
        out = argv[argv.index("--out") + 1]
        assert "--ckpt" in argv and "--text" in argv
        write_wav(out, wav, 22050)
        return 0

    import tts_tpu.cli

    monkeypatch.setattr(tts_tpu.cli, "main", fake_cli)
    res = rr.run_wav_family("kani", str(art))
    assert res.mode == "wav"
    assert res.passed and res.mel_l1 < 1e-6
    assert os.path.exists(art / "_ours.wav")


def test_wav_mode_different_audio_fails(tmp_path, monkeypatch):
    from tts_tpu.audio.wav import write_wav

    art = tmp_path / "qwen"
    art.mkdir()
    rng = np.random.default_rng(1)
    ref = (rng.standard_normal(22050) * 8000).astype(np.int16)
    other = (np.sin(np.linspace(0, 2000, 22050)) * 20000).astype(np.int16)
    write_wav(str(art / "reference.wav"), ref, 22050)

    def fake_cli(argv):
        write_wav(argv[argv.index("--out") + 1], other, 22050)
        return 0

    import tts_tpu.cli

    monkeypatch.setattr(tts_tpu.cli, "main", fake_cli)
    res = rr.run_wav_family("qwen", str(art))
    assert res.mode == "wav" and not res.passed


def test_session_mode_engages_when_graphs_present(tmp_path, monkeypatch):
    """run_all prefers per-stage session parity when a family dir carries
    exported graphs: _collect_sessions maps graph files onto driver keys
    and the stage diffs aggregate into one ParityResult."""
    import tts_tpu.parity.run_reference as rr
    from tts_tpu.parity.sessions import StageDiff

    art = tmp_path / "kani"
    art.mkdir()
    for name in ("KaniTTS_Embed.onnx", "KaniTTS_Main.onnx",
                 "KaniTTS_Codec.onnx"):
        (art / name).write_bytes(b"onnx")
    (art / "reference.wav").write_bytes(b"")

    monkeypatch.setattr(rr, "_have_ort", lambda: True)
    opened = []
    monkeypatch.setattr(rr, "_session", lambda p: opened.append(p) or p)
    monkeypatch.setattr(
        "tts_tpu.weights.kani_loader.load_kani_lm",
        lambda d: ({}, None))
    monkeypatch.setattr(
        "tts_tpu.parity.sessions.kani_session_stages",
        lambda sessions, params, cfg, cparams, ccfg: [
            StageDiff("kani/embed", 1e-6),
            StageDiff("kani/main_step", 2e-5)])

    res = rr.run_session_family("kani", str(art))
    assert res is not None and res.mode == "session"
    assert res.passed and res.mel_l1 == 2e-5
    assert "kani/embed" in res.detail and "kani/main_step" in res.detail
    assert len(opened) == 3


def test_session_mode_absent_graphs_returns_none(tmp_path, monkeypatch):
    import tts_tpu.parity.run_reference as rr

    art = tmp_path / "qwen"
    art.mkdir()
    monkeypatch.setattr(rr, "_have_ort", lambda: True)
    assert rr.run_session_family("qwen", str(art)) is None
