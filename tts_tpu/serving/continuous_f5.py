"""Slot-based continuous batching for the F5-TTS flow-matching decode.

Continuous batching for a DIFFUSION model: unlike the AR families there
is no KV cache — each request is an independent Euler integration of a
fixed number of NFE steps over its own latent. The slot batch therefore
carries per-row (latent, cond, cond_drop, step-index) state, and the
chunk program advances every live row by `chunk` Euler steps AT ITS OWN
STEP INDEX: the AdaLN modulation/time-embedding tables are gathered
per row (models/f5.dit_forward step-vector mode) so a request admitted
mid-flight integrates exactly the same schedule it would solo. A
finished row vocodes its generated span through Vocos on device and the
slot refills from the queue.

Why this beats admission batching for F5: the DiT saturates the MXU at
B=1, so batching is request multiplexing — but with admission-time
batching a request arriving mid-integration waits a full batch NFE
sweep (~0.4 s device time each); here it starts at the next chunk
boundary (~chunk x 13 ms).

Same-output contract: a request's audio equals its solo synthesize()
when the server's frame bucket matches the bucket _prepare would pick
solo (noise is drawn per request at the bucket shape from the request's
own key; per-row duration masks make pad frames inert — the same
argument as F5Pipeline.synthesize_batch, runtime/f5.py:231-290).
Byte-exact under fp32 (tests/test_continuous_f5.py); on TPU bf16 it is
near-exact (corr > 0.9999, |d| tens of int16 units): matmul reduction
tiling varies with the batch shape, and unlike the AR families there is
no integer-token stage to absorb the rounding — identical to the
synthesize_batch B>1 contract.

The fused MLP kernels take per-row modulation directly (the grid
indexes the batch row, ops/dit_mlp._mods_spec), so the bf16 and W8A8
MLP paths run fused here too; only the W8A8 fused *attention*
projections fall back to the plain path under per-row mods.

The reference runs one request at a time (SURVEY §3); this subsystem is
beyond-reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .slots import SlotEngine

__all__ = ["F5SlotServer"]


class F5SlotServer(SlotEngine):
    """Continuous-batching server over an F5Pipeline.

    submit(ref_audio, ref_text, gen_text) -> Future resolving to
    (int16 wav, n_samples)."""

    def __init__(self, pipeline, *, slots: int = 4, chunk_steps: int = 4,
                 frames: int = 1408, audio_bucket: int = 8 * 32768,
                 text_bucket: int = 128, gen_frames: int | None = None,
                 queue_limit: int = 256):
        self.pipe = pipeline
        self.cfg = pipeline.cfg
        self.vcfg = pipeline.vcfg
        self.frames = min(frames, self.cfg.max_signal_len)
        self.audio_bucket = audio_bucket
        self.text_bucket = text_bucket
        self.gen_frames = min(gen_frames or self.frames, self.frames)
        self._slots = slots
        self._voc = None
        self._build_programs(slots, chunk_steps)
        # no shared position resource: admission never needs a drain, so
        # the seq-limit check is a tautology (cap = NFE steps per request)
        super().__init__(slots=slots, chunk=chunk_steps, seq_limit=1 << 30,
                         start_pos=0, queue_limit=queue_limit,
                         name="f5-slot-server")

    # ----------------------------------------------------------- programs

    def _build_programs(self, bsz: int, chunk: int):
        from ..audio.mel import MelSpectrogram
        from ..models.f5 import dit_forward, text_embedding
        from ..models.vocos import vocos_decode

        cfg, vcfg = self.cfg, self.vcfg
        frames, gen_frames = self.frames, self.gen_frames
        melspec = MelSpectrogram(cfg.sample_rate, cfg.n_fft, cfg.hop,
                                 cfg.win_length, cfg.n_mels)
        nfe = cfg.nfe_steps

        def prefill_fn(params, audio, text_ids, ref_signal_len, duration,
                       key):
            """Per-request preprocess at the server buckets — the exact
            stage-A math of the solo program (runtime/f5.py:132-155)."""
            audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            mel = melspec(audio)[:, :frames]
            fa = mel.shape[1]
            frame_idx = jnp.arange(frames)[None, :, None]
            mel = jnp.pad(mel, ((0, 0), (0, frames - fa), (0, 0)))
            mel = jnp.where(frame_idx < ref_signal_len, mel, 0.0)

            noise = jax.random.normal(key, (1, frames, cfg.n_mels))
            in_len = jnp.where(frame_idx < duration, 1.0, 0.0)
            noise = noise * in_len

            text, text_drop = text_embedding(params, text_ids, frames, cfg)
            text = text * in_len
            text_drop = text_drop * in_len
            cdt = params["proj_out"]["w"].dtype
            cat = jnp.concatenate([mel, text], axis=-1).astype(cdt)
            catd = jnp.concatenate([jnp.zeros_like(mel), text_drop],
                                   axis=-1).astype(cdt)
            return noise, cat, catd

        self._prefill_fn = jax.jit(prefill_fn)

        def insert_fn(x, cat, catd, x1, cat1, catd1, slot):
            x = jax.lax.dynamic_update_slice(x, x1, (slot, 0, 0))
            cat = jax.lax.dynamic_update_slice(cat, cat1, (slot, 0, 0))
            catd = jax.lax.dynamic_update_slice(catd, catd1, (slot, 0, 0))
            return x, cat, catd

        self._insert_fn = jax.jit(insert_fn, donate_argnums=(0, 1, 2))

        def chunk_fn(params, x, cat, catd, tvec, fin, dur):
            cdt = params["proj_out"]["w"].dtype
            rope_cos = params["rope_cos"][:frames]
            rope_sin = params["rope_sin"][:frames]
            frame_idx = jnp.arange(frames)[None, :, None]
            in_len = (frame_idx < dur[:, None, None]).astype(jnp.float32)
            kv2 = jnp.concatenate([dur, dur])

            def body(_, c):
                x, tvec, fin = c
                idx = jnp.minimum(tvec, nfe - 2)          # (B,)
                pred, pred1 = dit_forward(
                    params, x.astype(cdt), cat, catd,
                    params["time_table"][idx], rope_cos, rope_sin, cfg,
                    kv_len=kv2, step_idx=idx)
                update = (pred + (pred - pred1) * cfg.cfg_strength
                          ).astype(jnp.float32) \
                    * params["delta_t"][idx].astype(jnp.float32)[:, None,
                                                                 None]
                act = (~fin).astype(jnp.float32)[:, None, None]
                x = (x + update * act) * in_len
                tvec = jnp.where(fin, tvec, tvec + 1)
                return x, tvec, tvec >= nfe - 1

            return jax.lax.fori_loop(0, chunk, body, (x, tvec, fin))

        self._chunk_fn = jax.jit(chunk_fn, donate_argnums=(1, 4, 5))

        def vocode_fn(vparams, x_row, ref_signal_len):
            padded = jnp.pad(x_row[None], ((0, 0), (0, gen_frames), (0, 0)))
            gen = jax.lax.dynamic_slice(
                padded, (0, ref_signal_len, 0),
                (1, gen_frames, cfg.n_mels))
            wav = vocos_decode(vparams, gen, vcfg)
            return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

        self._vocode_fn = jax.jit(vocode_fn)

    # ------------------------------------------------------------- client

    def submit(self, ref_audio: np.ndarray, ref_text: str, gen_text: str,
               speed: float = 1.0, seed: int | None = None,
               deadline_s: float | None = None):
        audio_p, ids_p, ref_signal_len, duration, buckets, n_keep = \
            self.pipe._prepare(ref_audio, ref_text, gen_text, speed)
        if audio_p.shape[1] > self.audio_bucket:
            raise ValueError(f"audio {audio_p.shape[1]} > bucket "
                             f"{self.audio_bucket}")
        if ids_p.shape[1] > self.text_bucket:
            raise ValueError(f"text {ids_p.shape[1]} > bucket "
                             f"{self.text_bucket}")
        if duration > self.frames:
            raise ValueError(f"duration {duration} > frame bucket "
                             f"{self.frames}")
        if duration - ref_signal_len - 1 > self.gen_frames:
            raise ValueError("generated span exceeds gen_frames bucket")
        audio_p = np.pad(audio_p,
                         ((0, 0), (0, self.audio_bucket - audio_p.shape[1])))
        ids_p = np.pad(ids_p,
                       ((0, 0), (0, self.text_bucket - ids_p.shape[1])),
                       constant_values=-1)
        payload = (audio_p, ids_p, int(ref_signal_len), int(duration),
                   int(n_keep), self.pipe.seed if seed is None else seed)
        return self._submit(payload, self.cfg.nfe_steps,
                            deadline_s=deadline_s)

    # ------------------------------------------------------ engine hooks

    def _fresh(self):
        bsz, cfg = self._slots, self.cfg
        cdt = self.pipe.params["proj_out"]["w"].dtype
        cw = cfg.n_mels + cfg.text_dim
        return {
            "x": jnp.zeros((bsz, self.frames, cfg.n_mels), jnp.float32),
            "cat": jnp.zeros((bsz, self.frames, cw), cdt),
            "catd": jnp.zeros((bsz, self.frames, cw), cdt),
            "tvec": jnp.full((bsz,), cfg.nfe_steps - 1, jnp.int32),
            "fin": jnp.ones((bsz,), bool),
            "dur": np.zeros((bsz,), np.int32),
            "ref": np.zeros((bsz,), np.int32),
            "keep": [0] * bsz,
        }

    def _fin_done(self, s):
        fin = jax.device_get(s["fin"])
        return fin, np.zeros_like(s["dur"])

    def _finalize(self, s, b: int, _n: int):
        wav = np.asarray(self._vocode_fn(
            self.pipe.vparams, s["x"][b], np.int32(s["ref"][b])))
        keep = s["keep"][b]
        return wav.reshape(-1)[:keep], keep

    def _admit_row(self, s, b: int, payload, cap: int) -> None:
        audio_p, ids_p, ref_len, duration, n_keep, seed = payload
        key = self.pipe._key_cache.get(seed)
        if key is None:
            key = self.pipe._key_cache[seed] = jax.random.key(seed)
        x1, cat1, catd1 = self._prefill_fn(
            self.pipe.params, audio_p, ids_p, np.int32(ref_len),
            np.int32(duration), key)
        s["x"], s["cat"], s["catd"] = self._insert_fn(
            s["x"], s["cat"], s["catd"], x1, cat1, catd1, np.int32(b))
        s["tvec"] = s["tvec"].at[b].set(0)
        s["fin"] = s["fin"].at[b].set(False)
        s["dur"][b] = duration
        s["ref"][b] = ref_len
        s["keep"][b] = n_keep

    def _step_chunk(self, s) -> None:
        s["x"], s["tvec"], s["fin"] = self._chunk_fn(
            self.pipe.params, s["x"], s["cat"], s["catd"], s["tvec"],
            s["fin"], jnp.asarray(s["dur"]))
