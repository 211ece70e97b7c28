#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line.

Primary metric (BASELINE.json): BigVGAN V2 24khz_100band_256x vocoder
throughput on fixed mel (1, 100, 512) — reference baseline 4.6 s / RTF 1.53
on an MX150 GPU (README.md:32) => 131072/4.6 ≈ 28494 samples/s.
Once the F5-TTS pipeline lands this switches to end-to-end F5 RTF
(target ≤ 0.05 on one v5e chip).
"""
import json
import sys


def bench_bigvgan():
    from tts_tpu.runtime import BigVGANVocoder

    voc = BigVGANVocoder()  # full-size v2 24khz_100band_256x geometry
    stats = voc.benchmark(mel_frames=512, iters=10)
    baseline_samples_per_sec = 131072 / 4.6  # reference MX150 F16 number
    return {
        "metric": "bigvgan_v2_24khz_100band_256x samples/sec on mel (1,100,512)",
        "value": round(stats["samples_per_sec"], 1),
        "unit": "samples/s",
        "vs_baseline": round(stats["samples_per_sec"] / baseline_samples_per_sec, 2),
    }


if __name__ == "__main__":
    result = bench_bigvgan()
    print(json.dumps(result))
