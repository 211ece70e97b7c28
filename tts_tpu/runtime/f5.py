"""F5-TTS synthesis pipeline: reference audio + text -> generated speech.

Reference behavior: /root/reference/F5_TTS/F5-TTS-ONNX-Inference.py:221-316
(3 ONNX sessions + Python NFE loop). Here the full pipeline — mel extract,
text embed, 31 Euler steps over 22 DiT blocks (batch-2 CFG), Vocos decode,
int16 conversion — is ONE jitted XLA program per shape bucket.

TPU shape policy: instead of the reference's dynamic axes, inputs are padded
to static buckets (audio samples, text ids, mel frames) and validity is
carried by scalar lengths:
  * mel frames >= ref_signal_len are zeroed (the reference pads with zeros);
  * the flow-matching sequence is masked at `duration` — attention keys
    beyond it are masked out and the carry is re-zeroed each step, which
    reproduces the reference's exact-length zero boundary;
  * the vocoder runs on the full bucket and the host crops to
    (duration - ref_signal_len - 1) * hop samples.
This bounds recompiles to the handful of bucket combinations.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import MelSpectrogram
from ..frontend.f5_text import convert_char_to_pinyin, f5_duration, text_to_ids
from ..models.f5 import F5Config, dit_forward, text_embedding
from ..models.vocos import VocosConfig, vocos_decode

__all__ = ["F5Pipeline", "F5Stats"]


def _bucket(n: int, step: int, lo: int) -> int:
    return max(lo, -(-n // step) * step)


@dataclass
class F5Stats:
    wall_s: float
    audio_s: float
    compile_s: float = 0.0

    @property
    def rtf(self) -> float:
        return self.wall_s / max(self.audio_s, 1e-9)


class F5Pipeline:
    """End-to-end F5-TTS. Construct from loaded params
    (weights/f5_loader.load_f5 / load_vocos) or random init for smoke runs."""

    def __init__(self, f5_params, f5_cfg: F5Config, vocab: dict[str, int],
                 vocos_params, vocos_cfg: VocosConfig | None = None,
                 seed: int = 9527, quantize: int | None = None,
                 mesh=None, layer_cache_interval: int = 1,
                 allow_degraded_text: bool = False):
        # opt-in for the raw-char fallback when pypinyin is absent; the
        # frontend raises otherwise (frontend/f5_text.py degradation policy)
        self.allow_degraded_text = allow_degraded_text
        if mesh is not None:
            # tensor-parallel serving: matmul weights shard on their output
            # axis over the mesh's "tp" axis, XLA inserts the collectives
            # over ICI; the same jitted program then runs on every chip.
            # With a dp axis > 1 the params stay replicated across dp and
            # synthesize_batch also shards its request batch over dp —
            # dp x tp composes. (Mutually exclusive with quantize —
            # QTensor scales don't carry a sharding annotation.)
            if quantize:
                raise ValueError("mesh and quantize are mutually exclusive")
            from ..parallel.mesh import shard_params_tp

            f5_params = shard_params_tp(f5_params, mesh)
            vocos_params = shard_params_tp(vocos_params, mesh)
        self.mesh = mesh
        if quantize == "w8a8":
            # explicit name for the int8-activation path: same int8 weights
            # as quantize=8 — on TPU the DiT routes through the block-fused
            # W8A8 kernels (ops/dit_mlp.mlp_block_fused_q8 +
            # ops/quant_matmul.ln_qkv_q8/out_proj_residual_q8), whose
            # output delta is bounded by tests/test_w8a8_bound.py
            quantize = 8
        if quantize:
            from ..quant.weight_only import quantize_int4, quantize_int8

            # DiT attention/FFN matmul weights only — AdaLN, convs, and the
            # vocoder stay float (the reference's Q8/Q4 per-model policy)
            def q(w):
                if quantize == 4 and w.ndim == 2 and w.shape[0] % 32 == 0:
                    return quantize_int4(w)
                return quantize_int8(w)

            blocks = [
                {
                    **blk,
                    "attn": {**blk["attn"], "wqkv": q(blk["attn"]["wqkv"]),
                             "wo": q(blk["attn"]["wo"])},
                    "ff1": {**blk["ff1"], "w": q(blk["ff1"]["w"])},
                    "ff2": {**blk["ff2"], "w": q(blk["ff2"]["w"])},
                }
                for blk in f5_params["blocks"]
            ]
            f5_params = {**f5_params, "blocks": blocks}
        self.params = f5_params
        self.cfg = f5_cfg
        self.vocab = vocab
        self.vparams = vocos_params
        self.vcfg = vocos_cfg or VocosConfig()
        self.seed = seed
        # FORA-style DiT layer caching (arXiv:2509.08696): recompute the
        # attention/FF sub-modules only every K-th Euler step and re-modulate
        # the cached activations with the current step's AdaLN gates on the
        # steps between. K=1 (default) is exact; K>1 trades fidelity for
        # ~1/K of the transformer cost on the skipped steps.
        self.layer_cache_interval = max(1, int(layer_cache_interval))
        self._fn_cache: dict = {}
        self._key_cache: dict = {}

    # -- the jitted program (one per shape bucket) --------------------------

    def _build(self, audio_len: int, text_len: int, frames: int,
               gen_frames: int):
        cfg, vcfg = self.cfg, self.vcfg
        cache_k = self.layer_cache_interval
        melspec = MelSpectrogram(cfg.sample_rate, cfg.n_fft, cfg.hop,
                                 cfg.win_length, cfg.n_mels)

        @jax.jit
        def run(params, vparams, audio, text_ids, ref_signal_len, duration, key):
            # --- preprocess (reference graph A) ---
            # audio arrives as int16 PCM (the reference's I/O contract,
            # SURVEY §2.8.8) — half the host->device bytes of float32, and
            # the /32768 scale is exact in float
            audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            mel = melspec(audio)[:, :frames]                       # (1, Fa, M)
            fa = mel.shape[1]
            frame_idx = jnp.arange(frames)[None, :, None]          # (1, T, 1)
            mel = jnp.pad(mel, ((0, 0), (0, frames - fa), (0, 0)))
            mel = jnp.where(frame_idx < ref_signal_len, mel, 0.0)

            noise = jax.random.normal(key, (1, frames, cfg.n_mels))
            in_len = jnp.where(frame_idx < duration, 1.0, 0.0)     # valid mask
            noise = noise * in_len

            text, text_drop = text_embedding(params, text_ids, frames, cfg)
            text = text * in_len
            text_drop = text_drop * in_len
            # compute dtype follows the loaded params (bf16 on TPU, fp32 in
            # tests); the Euler carry stays fp32 for integration accuracy
            cdt = params["proj_out"]["w"].dtype
            cat_mel_text = jnp.concatenate([mel, text], axis=-1).astype(cdt)
            cat_mel_text_drop = jnp.concatenate(
                [jnp.zeros_like(mel), text_drop], axis=-1).astype(cdt)

            # --- NFE loop (reference graph B x31) ---
            rope_cos = params["rope_cos"][:frames]
            rope_sin = params["rope_sin"][:frames]

            if cache_k == 1:
                def step(carry, idx):
                    pred, pred1 = dit_forward(
                        params, carry.astype(cdt), cat_mel_text,
                        cat_mel_text_drop, params["time_table"][idx],
                        rope_cos, rope_sin, cfg, kv_len=duration,
                        step_idx=idx,
                    )
                    update = (pred + (pred - pred1) * cfg.cfg_strength
                              ).astype(jnp.float32) \
                        * params["delta_t"][idx].astype(jnp.float32)
                    return (carry + update) * in_len, None

                denoised, _ = jax.lax.scan(step, noise,
                                           jnp.arange(cfg.nfe_steps - 1))
            else:
                from ..models.f5 import dit_forward_cached

                cshape = (cfg.depth, 2, frames, cfg.dim)
                cache0 = (jnp.zeros(cshape, cdt), jnp.zeros(cshape, cdt))

                def step(carry, idx):
                    x, cache = carry

                    def full(args):
                        return dit_forward_cached(
                            params, args[0], cat_mel_text, cat_mel_text_drop,
                            params["time_table"][idx], rope_cos, rope_sin,
                            cfg, duration, args[1], use_cache=False,
                            step_idx=idx)

                    def reuse(args):
                        return dit_forward_cached(
                            params, args[0], cat_mel_text, cat_mel_text_drop,
                            params["time_table"][idx], rope_cos, rope_sin,
                            cfg, duration, args[1], use_cache=True,
                            step_idx=idx)

                    pred, pred1, cache = jax.lax.cond(
                        idx % cache_k == 0, full, reuse,
                        (x.astype(cdt), cache))
                    update = (pred + (pred - pred1) * cfg.cfg_strength
                              ).astype(jnp.float32) \
                        * params["delta_t"][idx].astype(jnp.float32)
                    return ((x + update) * in_len, cache), None

                (denoised, _), _ = jax.lax.scan(
                    step, (noise, cache0), jnp.arange(cfg.nfe_steps - 1))

            # --- decode (reference graph C) ---
            # gen_frames is a static bucket of the generated length: the
            # vocoder runs only on the generated span and the returned wav is
            # ~2.6x smaller — device->host fetches over a remote tunnel cost
            # ~28 ms + ~30 MB/s, so bytes matter
            gen = jax.lax.dynamic_slice(
                jnp.pad(denoised, ((0, 0), (0, gen_frames), (0, 0))),
                (0, ref_signal_len, 0), (1, gen_frames, cfg.n_mels),
            )
            wav = vocos_decode(vparams, gen, vcfg)
            return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

        return run

    def _get_fn(self, audio_len: int, text_len: int, frames: int,
                gen_frames: int):
        key = (audio_len, text_len, frames, gen_frames)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build(*key)
        return self._fn_cache[key]

    def _build_batch(self, bsz: int, audio_len: int, text_len: int,
                     frames: int, gen_frames: int):
        """Batched-serving variant of _build: B requests ride one program.
        The CFG pair batches as 2B rows; per-request validity is carried by
        (B,) ref_signal_len/duration vectors (the flash kernel masks with a
        per-row bias). The reference has no batched serving — this is the
        TPU-native throughput path."""
        cfg, vcfg = self.cfg, self.vcfg
        melspec = MelSpectrogram(cfg.sample_rate, cfg.n_fft, cfg.hop,
                                 cfg.win_length, cfg.n_mels)

        @jax.jit
        def run(params, vparams, audio, text_ids, ref_signal_len, duration,
                key):
            audio = audio.astype(jnp.float32) * (1.0 / 32768.0)  # int16 PCM in
            mel = melspec(audio)[:, :frames]                   # (B, Fa, M)
            fa = mel.shape[1]
            frame_idx = jnp.arange(frames)[None, :, None]      # (1, T, 1)
            mel = jnp.pad(mel, ((0, 0), (0, frames - fa), (0, 0)))
            mel = jnp.where(frame_idx < ref_signal_len[:, None, None],
                            mel, 0.0)

            noise = jax.random.normal(key, (bsz, frames, cfg.n_mels))
            in_len = (frame_idx < duration[:, None, None]).astype(jnp.float32)
            noise = noise * in_len

            text, text_drop = text_embedding(params, text_ids, frames, cfg)
            text = text * in_len
            text_drop = text_drop * in_len
            cdt = params["proj_out"]["w"].dtype
            cat = jnp.concatenate([mel, text], axis=-1).astype(cdt)
            catd = jnp.concatenate([jnp.zeros_like(mel), text_drop],
                                   axis=-1).astype(cdt)

            rope_cos = params["rope_cos"][:frames]
            rope_sin = params["rope_sin"][:frames]
            kv_len2 = jnp.concatenate([duration, duration])    # (2B,)

            def step(carry, idx):
                pred, pred1 = dit_forward(
                    params, carry.astype(cdt), cat, catd,
                    params["time_table"][idx], rope_cos, rope_sin, cfg,
                    kv_len=kv_len2, step_idx=idx,
                )
                update = (pred + (pred - pred1) * cfg.cfg_strength
                          ).astype(jnp.float32) \
                    * params["delta_t"][idx].astype(jnp.float32)
                return (carry + update) * in_len, None

            denoised, _ = jax.lax.scan(step, noise,
                                       jnp.arange(cfg.nfe_steps - 1))

            padded = jnp.pad(denoised, ((0, 0), (0, gen_frames), (0, 0)))
            idx = (ref_signal_len[:, None]
                   + jnp.arange(gen_frames)[None, :])          # (B, G)
            gen = jnp.take_along_axis(padded, idx[..., None], axis=1)
            wav = vocos_decode(vparams, gen, vcfg)
            return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

        return run

    # -- public API ---------------------------------------------------------

    def _prepare(self, ref_audio: np.ndarray, ref_text: str, gen_text: str,
                 speed: float = 1.0):
        """Host-side prep shared by synthesize and the benchmark: audio
        normalize, duration heuristic, tokenize, bucket, pad. Returns
        (audio_p, ids_p, ref_signal_len, duration, buckets, n_keep)."""
        cfg = self.cfg
        # the wire format is int16 PCM (reference contract; float inputs are
        # quantized here exactly as pydub loading would have)
        if ref_audio.dtype == np.int16:
            audio = ref_audio
        else:
            audio = np.clip(np.round(ref_audio.astype(np.float64) * 32768.0),
                            -32768, 32767).astype(np.int16)
        audio = audio.reshape(1, -1)

        ref_signal_len, duration = f5_duration(
            audio.shape[-1], ref_text, gen_text, cfg.hop, speed
        )
        duration = min(duration, cfg.max_signal_len)

        chars = convert_char_to_pinyin(
            [ref_text + gen_text], allow_degraded=self.allow_degraded_text)[0]
        ids = text_to_ids(chars, self.vocab)                       # (1, T)

        audio_bucket = _bucket(audio.shape[-1], 32768, 32768)
        text_bucket = _bucket(ids.shape[-1], 64, 64)
        # 128-frame buckets: the DiT cost scales with the padded length, so
        # finer buckets cut ~8-10% of wasted frames at typical durations
        # (flash attention needs multiples of 128)
        frame_bucket = _bucket(duration, 128, 256)
        frame_bucket = min(frame_bucket, cfg.max_signal_len)

        audio_p = np.pad(audio, ((0, 0), (0, audio_bucket - audio.shape[-1])))
        # pad with -1: +1 shift inside text_embedding maps it to filler id 0
        ids_p = np.pad(ids, ((0, 0), (0, text_bucket - ids.shape[-1])),
                       constant_values=-1)

        gen_len = max(duration - ref_signal_len - 1, 0)
        gen_bucket = min(_bucket(gen_len, 64, 64), frame_bucket)
        buckets = (audio_bucket, text_bucket, frame_bucket, gen_bucket)
        n_keep = max(duration - ref_signal_len - 1, 0) * cfg.hop
        return audio_p, ids_p, ref_signal_len, duration, buckets, n_keep

    def _dispatch(self, audio_p, ids_p, ref_signal_len, duration,
                  buckets, seed=None):
        """Enqueue one synthesis without fetching: returns the device
        array. XLA dispatch is async, so back-to-back dispatches queue on
        the device and host/tunnel latency overlaps with compute — the
        basis of the sustained-throughput benchmark mode."""
        fn = self._get_fn(*buckets)
        # scalar jnp.int32()/jax.random.key() creation costs ~30 ms each over
        # a remote-device tunnel (tiny blocking transfers); numpy scalars ride
        # the fast argument path and keys are cached per seed
        s = self.seed if seed is None else seed
        key = self._key_cache.get(s)
        if key is None:
            key = self._key_cache[s] = jax.random.key(s)
        # numpy args ride the dispatch (no separate blocking upload RPCs
        # over the remote-device tunnel)
        return fn(self.params, self.vparams, audio_p, ids_p,
                  np.int32(ref_signal_len), np.int32(duration), key)

    def synthesize(self, ref_audio: np.ndarray, ref_text: str, gen_text: str,
                   speed: float = 1.0, seed: int | None = None
                   ) -> tuple[np.ndarray, F5Stats]:
        """ref_audio: int16 or float mono waveform at cfg.sample_rate.
        Returns (int16 waveform, stats)."""
        audio_p, ids_p, ref_signal_len, duration, buckets, n_keep = \
            self._prepare(ref_audio, ref_text, gen_text, speed)
        t0 = time.perf_counter()
        wav = self._dispatch(audio_p, ids_p, ref_signal_len, duration,
                             buckets, seed)
        wav = np.asarray(jax.block_until_ready(wav))
        wall = time.perf_counter() - t0
        out = wav.reshape(-1)[:n_keep]
        return out, F5Stats(wall_s=wall,
                            audio_s=n_keep / self.cfg.sample_rate)

    def synthesize_batch(self, requests: list[tuple[np.ndarray, str, str]],
                         speed: float = 1.0, seed: int | None = None
                         ) -> tuple[list[np.ndarray], F5Stats]:
        """Batched serving: B (ref_audio, ref_text, gen_text) requests in one
        jitted program. Shapes bucket on the batch maximum; per-request
        lengths mask attention/IO. Returns (list of int16 waveforms, stats
        with audio_s summed over the batch — RTF here is per-chip
        throughput, not per-stream latency).

        The FORA layer cache does not apply here (exact math only)."""
        if self.layer_cache_interval > 1:
            import warnings

            warnings.warn("synthesize_batch always runs the exact DiT; "
                          "layer_cache_interval is ignored", stacklevel=2)
        cfg = self.cfg
        audios, idss, refs, durs = [], [], [], []
        for ref_audio, ref_text, gen_text in requests:
            a = (ref_audio if ref_audio.dtype == np.int16
                 else np.clip(np.round(ref_audio.astype(np.float64) * 32768.0),
                              -32768, 32767).astype(np.int16)).reshape(-1)
            r, d = f5_duration(len(a), ref_text, gen_text, cfg.hop, speed)
            audios.append(a)
            refs.append(r)
            durs.append(min(d, cfg.max_signal_len))
            chars = convert_char_to_pinyin(
                [ref_text + gen_text],
                allow_degraded=self.allow_degraded_text)[0]
            idss.append(text_to_ids(chars, self.vocab)[0])

        bsz = len(requests)
        audio_bucket = _bucket(max(len(a) for a in audios), 32768, 32768)
        text_bucket = _bucket(max(len(i) for i in idss), 64, 64)
        frame_bucket = min(_bucket(max(durs), 128, 256), cfg.max_signal_len)
        gens = [max(d - r - 1, 0) for d, r in zip(durs, refs)]
        gen_bucket = min(_bucket(max(gens), 64, 64), frame_bucket)

        audio_p = np.zeros((bsz, audio_bucket), np.int16)
        ids_p = np.full((bsz, text_bucket), -1, np.int32)
        for b, (a, i) in enumerate(zip(audios, idss)):
            audio_p[b, :len(a)] = a
            ids_p[b, :len(i)] = i

        key = (bsz, audio_bucket, text_bucket, frame_bucket, gen_bucket)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build_batch(*key)
        fn = self._fn_cache[key]
        s = self.seed if seed is None else seed
        rkey = self._key_cache.get(s)
        if rkey is None:
            rkey = self._key_cache[s] = jax.random.key(s)

        dp = (self.mesh.shape.get("dp", 1)
              if self.mesh is not None else 1)
        if dp > 1:
            from ..parallel.mesh import dp_shard

            if bsz % dp:
                raise ValueError(f"batch {bsz} not divisible by dp={dp}")
            args = (dp_shard(self.mesh, audio_p), dp_shard(self.mesh, ids_p),
                    dp_shard(self.mesh, np.asarray(refs, np.int32)),
                    dp_shard(self.mesh, np.asarray(durs, np.int32)))
        else:
            args = (jnp.asarray(audio_p), jnp.asarray(ids_p),
                    np.asarray(refs, np.int32), np.asarray(durs, np.int32))

        t0 = time.perf_counter()
        wav = fn(self.params, self.vparams, *args, rkey)
        wav = np.asarray(wav)
        wall = time.perf_counter() - t0

        outs = [wav[b, : gens[b] * cfg.hop] for b in range(bsz)]
        total_audio = sum(len(o) for o in outs) / cfg.sample_rate
        return outs, F5Stats(wall_s=wall, audio_s=total_audio)

    def benchmark(self, ref_seconds: float = 6.0, gen_words: int = 15,
                  iters: int = 3) -> dict:
        """The reference README benchmark: ~6 s reference audio, ~15 words
        (README.md:26-30 — F5 F32 NFE=32: 180 s CPU / 62 s MX150)."""
        rng = np.random.default_rng(0)
        n = int(ref_seconds * self.cfg.sample_rate)
        audio = (rng.standard_normal(n) * 3000).astype(np.int16)
        ref_text = "Some call me nature, others call me mother nature."
        gen_text = " ".join(["word"] * gen_words)
        wav, _ = self.synthesize(audio, ref_text, gen_text)        # compile
        audio_s = len(wav) / self.cfg.sample_rate

        # single-request latency: dispatch + full device->host fetch per
        # call, decomposed into host prep / dispatch / fence so the gap to
        # the sustained number is attributable
        prep_t = disp_t = fence_t = 0.0
        t0 = time.perf_counter()
        for _ in range(iters):
            ta = time.perf_counter()
            p = self._prepare(audio, ref_text, gen_text)
            tb = time.perf_counter()
            dev = self._dispatch(*p[:5])
            tc = time.perf_counter()
            wav = np.asarray(jax.block_until_ready(dev)).reshape(-1)[:p[5]]
            td = time.perf_counter()
            prep_t += tb - ta
            disp_t += tc - tb
            fence_t += td - tc
        lat_wall = (time.perf_counter() - t0) / iters

        # sustained per-chip throughput: the same exact jobs queued
        # back-to-back (async dispatch), one fetch fence at the end — the
        # fixed per-call host/tunnel latency overlaps device compute, as it
        # does in any server that pipelines requests. Output is identical
        # to the latency path (same program, same seed).
        prep = self._prepare(audio, ref_text, gen_text)
        sus_wall = float("inf")
        for _ in range(2):      # best-of-2: sheds one-off tunnel-noise spikes
            t0 = time.perf_counter()
            outs = [self._dispatch(*prep[:5]) for _ in range(iters)]
            outs = [np.asarray(o) for o in outs]
            sus_wall = min(sus_wall, (time.perf_counter() - t0) / iters)
        np.testing.assert_array_equal(
            outs[0].reshape(-1)[: len(wav)], wav)    # exact-output guard

        # fixed per-request transport cost: the identical dispatch+fetch
        # round trip with a TRIVIAL program over the same output buffer —
        # no synthesis compute. latency_rtf - sustained_rtf should be
        # explained by this number (the tunnel/host constant), proving the
        # residual latency gap is transport, not an unfused kernel.
        triv = jax.jit(lambda x: x + 1)
        wav_dev = outs[0]
        np.asarray(triv(wav_dev))                  # compile
        fixed_s = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                np.asarray(triv(wav_dev))
            fixed_s = min(fixed_s, (time.perf_counter() - t0) / iters)

        return {"wall_s": lat_wall, "audio_s": audio_s,
                "rtf": lat_wall / max(audio_s, 1e-9),
                "sustained_wall_s": sus_wall,
                "sustained_rtf": sus_wall / max(audio_s, 1e-9),
                "fixed_roundtrip_ms": fixed_s * 1e3,
                "compute_rtf": (lat_wall - fixed_s) / max(audio_s, 1e-9),
                "prep_ms": prep_t / iters * 1e3,
                "dispatch_ms": disp_t / iters * 1e3,
                "fence_ms": fence_t / iters * 1e3}
