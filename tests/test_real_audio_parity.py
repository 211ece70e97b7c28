"""DSP parity on the reference's shipped real-speech fixtures (the
reference's acceptance artifacts, SURVEY.md §4.3): STFT->ISTFT round trip
and mel sanity on actual speech rather than noise."""
import os

import numpy as np
import pytest

FIXTURES = [
    "/root/reference/IndexTTS/example/zh.wav",
    "/root/reference/Qwen_TTS/example/basic_ref_zh.wav",
    "/root/reference/VoxCPM/example/basic_ref_zh.wav",
]
FIXTURES = [f for f in FIXTURES if os.path.exists(f)]


@pytest.mark.skipif(not FIXTURES, reason="reference fixtures not mounted")
@pytest.mark.parametrize("path", FIXTURES)
def test_stft_istft_roundtrip_on_speech(path):
    from tts_tpu.audio.stft import IstftKernel, StftKernel
    from tts_tpu.audio.wav import read_wav

    wav, sr = read_wav(path, target_rate=24000)
    x = (wav.astype(np.float32) / 32768.0)[: 24000 * 3][None]
    stft = StftKernel(n_fft=1024, hop=256, win_length=1024)
    istft = IstftKernel(n_fft=1024, hop=256, win_length=1024)
    mag, phase = stft(x)
    y = np.asarray(istft(mag, phase))
    n = min(x.shape[-1], y.shape[-1]) - 1024
    err = np.abs(y[0, 512:n] - x[0, 512:n]).mean()
    assert err < 1e-5, err


@pytest.mark.skipif(not FIXTURES, reason="reference fixtures not mounted")
@pytest.mark.parametrize("path", FIXTURES)
def test_mel_on_speech_is_sane(path):
    from tts_tpu.audio.mel import MelSpectrogram
    from tts_tpu.audio.wav import read_wav

    wav, sr = read_wav(path, target_rate=24000)
    x = (wav.astype(np.float32) / 32768.0)[: 24000 * 3][None]
    mel = np.asarray(MelSpectrogram(24000, 1024, 256, 1024, 100)(x))
    assert np.isfinite(mel).all()
    # log floor is log(1e-5); real speech must rise well above it
    assert mel.min() >= np.log(1e-5) - 1e-3
    assert mel.max() > -6.0
