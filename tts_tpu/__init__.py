"""tts_tpu — a TPU-native (JAX/XLA/Pallas) text-to-speech inference framework.

Re-designed from scratch with the capability surface of
DakeQQ/Text-to-Speech-TTS-ONNX (see SURVEY.md): six TTS model families
(F5-TTS, BigVGAN, IndexTTS, KaniTTS, Qwen3-TTS, VoxCPM) expressed as jitted
JAX programs instead of ONNX graph bundles.

Layout:
  audio/     — DSP kernels: STFT/ISTFT (framed matmul/conv), mel, resample, snake
  nn/        — shared transformer blocks: fused-QKV GQA attention, RoPE, RMSNorm
  kv/        — static-shape KV caches (preallocated + dynamic_update_slice)
  decoding/  — greedy / beam / repetition-penalty under lax.while_loop
  models/    — one module per family
  weights/   — upstream-checkpoint loaders + fusion transform pass
  frontend/  — text normalization / tokenization (host-side)
  runtime/   — synthesize() pipelines, configs, timing
  parallel/  — jax.sharding mesh utilities (optional multi-chip)
"""

__version__ = "0.1.0"
