"""IndexTTS synthesis pipeline: reference audio + text -> cloned speech.

Reference behavior: /root/reference/IndexTTS/Export_IndexTTS.py:1102-1227
(6 ONNX sessions A-F + a Python loop maintaining the repetition-penalty
vector host-side). Here three jitted programs:
  1. encode_reference: 100 ms noise pad + mel (constant STFT padding) ->
     conformer -> perceiver conds_latent; ECAPA -> per-stage BigVGAN conds;
  2. decode: prefill [conds_latent | text_emb | mel_start] then the whole
     AR loop — GPT-2 step, in-carry penalty vector with the reference's
     sliding reset window (:1197-1201), argmax, stop check, hidden-state
     collection — as ONE lax.while_loop;
  3. vocode: final_norm over collected hiddens (minus last 2) -> speaker-
     conditioned BigVGAN -> int16.

Text lengths are bucketed; because this GPT-2 has no internal positional
encoding, bucket padding is handled purely by masking the padded kv range.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import MelSpectrogram
from ..kv.cache import KVCache
from ..models.bigvgan import BigVGANConfig, bigvgan_apply
from ..models.indextts import (
    IndexTTSConfig,
    conformer_encoder,
    ecapa_speaker_encoder,
    gpt_final_norm,
    gpt_step,
    perceiver_resample,
)

__all__ = ["IndexTTSPipeline", "IndexTTSDecodeConfig"]


@dataclass(frozen=True)
class IndexTTSDecodeConfig:
    """Reference knobs (Export_IndexTTS.py:37-39)."""

    repeat_penalty: float = 0.9
    penalty_range: int = 10
    # Pallas fused decode qkv head (ops/decode_qkv.py); None = auto
    # (on for TPU backends, off on CPU)
    # None = auto: "step" (qkv+attention single kernel,
    # ops/decode_step.py — 24-layer GPT step mean 1.46->1.26 ms int8) on TPU, off on CPU;
    # True = qkv-head kernel only; per-call degradation
    # outside the M=1 plain-causal geometry is automatic.
    fused_decode: bool | str | None = None


@dataclass
class IndexTTSStats:
    tokens: int
    wall_s: float

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / max(self.wall_s, 1e-9)


class IndexTTSPipeline:
    """params dict keys: 'conformer', 'perceiver', 'ecapa', 'gpt',
    'bigvgan' (+ 'cond_layer' (spk_dim, C0) and 'conds' list per stage),
    mirroring the reference checkpoint split."""

    def __init__(self, params, cfg: IndexTTSConfig,
                 bigvgan_cfg: BigVGANConfig, sample_rate: int = 24000,
                 n_fft: int = 1024, hop: int = 256, seed: int = 0,
                 decode_cfg: IndexTTSDecodeConfig | None = None,
                 quantize: int | None = None, mesh=None):
        if quantize:
            # weight-only int8/int4 on the AR GPT stack — the decode loop is
            # HBM-bandwidth-bound (the reference ships Q8 ONNX variants of
            # the GPT, IndexTTS Optimize_ONNX analog); encoders/vocoder
            # stay float
            from ..quant.weight_only import quantize_int4, quantize_int8

            def q(w):
                if quantize == 4 and w.ndim == 2 and w.shape[0] % 32 == 0:
                    return quantize_int4(w)
                return quantize_int8(w)

            gpt = params["gpt"]
            layers = [
                {**lyr, "wqkv": q(lyr["wqkv"]), "wo": q(lyr["wo"]),
                 "fc": {**lyr["fc"], "w": q(lyr["fc"]["w"])},
                 "proj": {**lyr["proj"], "w": q(lyr["proj"]["w"])}}
                for lyr in gpt["layers"]
            ]
            params = {**params,
                      "gpt": {**gpt, "layers": layers,
                              "lm_head": q(gpt["lm_head"])}}
        if mesh is not None:
            # data-parallel serving: params replicated, batched entry
            # points shard their request batch over the mesh "dp" axis
            from ..parallel.mesh import replicate

            params = replicate(params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.dcfg = decode_cfg or IndexTTSDecodeConfig()
        fd = self.dcfg.fused_decode
        self._fused = ("step" if jax.default_backend() == "tpu"
                       else False) if fd is None else fd
        self.vcfg = bigvgan_cfg
        self.sample_rate = sample_rate
        self.melspec = MelSpectrogram(sample_rate, n_fft, hop, n_fft,
                                      cfg.n_mels, pad_mode="constant")
        self.hop = hop
        self.seed = seed
        self._enc_cache: dict = {}
        self._dec_cache: dict = {}
        self._voc_cache: dict = {}

    # -------------------------------------------------- reference encoding

    def _encode_fn(self, n_samples: int):
        if n_samples not in self._enc_cache:
            cfg = self.cfg
            melspec = self.melspec

            @jax.jit
            def run(params, audio):
                mel = melspec(audio)                        # (1, T, M)
                conds_latent = perceiver_resample(
                    params["perceiver"],
                    conformer_encoder(params["conformer"], mel, cfg), cfg)
                spk = ecapa_speaker_encoder(params["ecapa"], mel, cfg)
                cond_embed = jnp.matmul(spk, params["cond_layer"]["w"]) \
                    + params["cond_layer"]["b"]             # (1, 1, C0)
                conds = [
                    jnp.matmul(spk, c["w"]) + c["b"] for c in params["conds"]
                ]
                return conds_latent, cond_embed, conds

            self._enc_cache[n_samples] = run
        return self._enc_cache[n_samples]

    def encode_reference(self, audio: np.ndarray):
        """audio: int16 or float mono at sample_rate. Returns device tuple
        (conds_latent, cond_embed, conds)."""
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        # 100 ms noise pad prepended (Export_IndexTTS.py:78,131)
        rng = np.random.default_rng(self.seed)
        pad = rng.standard_normal(int(self.sample_rate * 0.1)).astype(np.float32)
        audio = np.concatenate([pad, audio.reshape(-1)])
        bucket = max(1, -(-len(audio) // 32768)) * 32768
        audio = np.pad(audio, (0, bucket - len(audio)))[None]
        return self._encode_fn(bucket)(self.params, jnp.asarray(audio))

    # ------------------------------------------------------------- decode

    def _decode_fn(self, text_bucket: int, max_gen: int):
        key = (text_bucket, max_gen)
        if key not in self._dec_cache:
            cfg = self.cfg
            n_lat = cfg.num_latents
            penalty = self.dcfg.repeat_penalty
            penalty_range = self.dcfg.penalty_range

            @jax.jit
            def run(params, conds_latent, text_ids, text_len):
                gpt = params["gpt"]
                # graph B: [0] + ids + [1] wrap, embed + learned pos
                ids = jnp.concatenate(
                    [jnp.zeros((1, 1), jnp.int32), text_ids,
                     jnp.full((1, 1), 1, jnp.int32)], axis=1)  # (1, Tb+2)
                tb2 = ids.shape[1]
                # position j holds pos-embed index j, valid up to text_len+2
                text_emb = gpt["text_embed"][ids] + gpt["text_pos"][None, :tb2]
                # place the [1] end token at its true position text_len+1
                end_emb = (gpt["text_embed"][1] + gpt["text_pos"]
                           [text_len + 1])[None, None]
                pos_idx = jnp.arange(tb2)[None, :, None]
                text_emb = jnp.where(pos_idx == text_len + 1, end_emb, text_emb)

                mel_start = (gpt["mel_embed"][cfg.start_mel_token]
                             + gpt["mel_pos"][0])[None, None]
                prefill = jnp.concatenate(
                    [jnp.asarray(conds_latent), text_emb, mel_start], axis=1)
                p_len = n_lat + tb2 + 1

                # KV spans only this call's prefill + generation budget
                # (rounded up), not the global max — attention reads scale
                # with the actual request, and the cache stores the params'
                # compute dtype (bf16 on TPU)
                kv_max = min(cfg.max_seq_len,
                             -(-(p_len + max_gen) // 256) * 256)
                cdt = gpt["text_embed"].dtype   # params' compute dtype
                # kv hole: padded text positions [n_lat+text_len+2, p_len-1)
                kv_idx = jnp.arange(kv_max)
                kv_valid = ~((kv_idx >= n_lat + text_len + 2)
                             & (kv_idx < p_len - 1))

                kv = KVCache.create(cfg.gpt_layers, 1, cfg.gpt_heads,
                                    kv_max, cfg.gpt_head_dim, cdt)
                ones = jnp.ones((1, cfg.num_mel_codes), jnp.float32)
                logits, last_h, kv = gpt_step(gpt, prefill, kv, ones, cfg,
                                              kv_valid)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[0]

                hiddens = jnp.zeros((max_gen, cfg.gpt_dim), cdt)
                hiddens = hiddens.at[0].set(last_h[0])
                save = jnp.zeros((max_gen,), jnp.int32).at[0].set(tok)

                def cond(c):
                    kv, vec, save, hiddens, num, tok, rst, fin = c
                    return (~fin) & (num < max_gen)

                def body(c):
                    kv, vec, save, hiddens, num, tok, rst, fin = c
                    # penalty vector update (reference :1197-1201)
                    vec = vec.at[0, tok].set(penalty)
                    old = save[rst]
                    do_reset = (num > penalty_range) & (old != tok)
                    vec = jnp.where(
                        do_reset, vec.at[0, old].set(1.0), vec)
                    rst = rst + do_reset.astype(jnp.int32)

                    gen_len = num  # tokens generated so far
                    h = (gpt["mel_embed"][tok] + gpt["mel_pos"][gen_len]
                         )[None, None]
                    logits, last_h, kv = gpt_step(gpt, h, kv, vec, cfg,
                                                  kv_valid,
                                                  fused=self._fused)
                    ntok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[0]
                    save = save.at[num].set(ntok)
                    hiddens = hiddens.at[num].set(last_h[0])
                    fin = ntok == cfg.stop_token
                    return kv, vec, save, hiddens, num + 1, ntok, rst, fin

                init = (kv, ones, save, hiddens, jnp.ones((), jnp.int32),
                        tok, jnp.zeros((), jnp.int32),
                        tok == cfg.stop_token)
                _, _, save, hiddens, num, _, _, fin = jax.lax.while_loop(
                    cond, body, init)
                return hiddens, num, save

            self._dec_cache[key] = run
        return self._dec_cache[key]

    def _decode_batch_fn(self, bsz: int, text_bucket: int, max_gen: int):
        key = ("batch", bsz, text_bucket, max_gen)
        if key not in self._dec_cache:
            cfg = self.cfg
            n_lat = cfg.num_latents
            penalty = self.dcfg.repeat_penalty
            penalty_range = self.dcfg.penalty_range

            @jax.jit
            def run(params, conds_latent, text_ids, text_len):
                """Batched serving: B requests share the text bucket; all
                absolute positions (learned text/mel tables) line up because
                padding holes are masked per row via (B, kv_max) kv_valid.
                conds_latent (B, n_lat, D); text_ids (B, Tb);
                text_len (B,)."""
                gpt = params["gpt"]
                rows = jnp.arange(bsz)
                ids = jnp.concatenate(
                    [jnp.zeros((bsz, 1), jnp.int32), text_ids,
                     jnp.full((bsz, 1), 1, jnp.int32)], axis=1)
                tb2 = ids.shape[1]
                text_emb = gpt["text_embed"][ids] + gpt["text_pos"][None, :tb2]
                end_emb = (gpt["text_embed"][1][None]
                           + gpt["text_pos"][text_len + 1])[:, None]
                pos_idx = jnp.arange(tb2)[None, :, None]
                text_emb = jnp.where(pos_idx == (text_len + 1)[:, None, None],
                                     end_emb, text_emb)

                mel_start = jnp.broadcast_to(
                    (gpt["mel_embed"][cfg.start_mel_token]
                     + gpt["mel_pos"][0])[None, None],
                    (bsz, 1, cfg.gpt_dim))
                prefill = jnp.concatenate(
                    [jnp.asarray(conds_latent), text_emb, mel_start], axis=1)
                p_len = n_lat + tb2 + 1

                kv_max = min(cfg.max_seq_len,
                             -(-(p_len + max_gen) // 256) * 256)
                cdt = gpt["text_embed"].dtype
                kv_idx = jnp.arange(kv_max)[None, :]
                kv_valid = ~((kv_idx >= n_lat + (text_len + 2)[:, None])
                             & (kv_idx < p_len - 1))        # (B, kv_max)

                kv = KVCache.create(cfg.gpt_layers, bsz, cfg.gpt_heads,
                                    kv_max, cfg.gpt_head_dim, cdt)
                vec0 = jnp.ones((bsz, cfg.num_mel_codes), jnp.float32)
                logits, last_h, kv = gpt_step(gpt, prefill, kv, vec0, cfg,
                                              kv_valid)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,)

                hiddens = jnp.zeros((bsz, max_gen, cfg.gpt_dim), cdt)
                hiddens = hiddens.at[:, 0].set(last_h)
                save = jnp.zeros((bsz, max_gen), jnp.int32).at[:, 0].set(tok)
                fin0 = tok == cfg.stop_token
                done0 = jnp.where(fin0, 1, max_gen)

                def cond(c):
                    _, _, _, _, num, _, _, fin, _ = c
                    return (~fin.all()) & (num < max_gen)

                def body(c):
                    kv, vec, save, hiddens, num, tok, rst, fin, done = c
                    vec = vec.at[rows, tok].set(penalty)
                    old = save[rows, rst]                    # (B,)
                    do_reset = (num > penalty_range) & (old != tok) & (~fin)
                    vec = jnp.where(do_reset[:, None],
                                    vec.at[rows, old].set(1.0), vec)
                    rst = rst + do_reset.astype(jnp.int32)

                    h = (gpt["mel_embed"][tok]
                         + gpt["mel_pos"][num][None])[:, None]
                    logits, last_h, kv = gpt_step(gpt, h, kv, vec, cfg,
                                                  kv_valid,
                                                  fused=self._fused)
                    ntok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    ntok = jnp.where(fin, cfg.stop_token, ntok)
                    save = save.at[:, num].set(ntok)
                    hiddens = hiddens.at[:, num].set(last_h)
                    newly = (ntok == cfg.stop_token) & (~fin)
                    done = jnp.where(newly, num + 1, done)
                    return (kv, vec, save, hiddens, num + 1, ntok, rst,
                            fin | newly, done)

                init = (kv, vec0, save, hiddens, jnp.ones((), jnp.int32),
                        tok, jnp.zeros((bsz,), jnp.int32), fin0, done0)
                (_, _, save, hiddens, num, _, _, fin, done) = \
                    jax.lax.while_loop(cond, body, init)
                return hiddens, jnp.minimum(done, num), save

            self._dec_cache[key] = run
        return self._dec_cache[key]

    # ------------------------------------------------------------- vocode

    def _vocode_fn(self, frames: int):
        """Vocoder stage fed directly from the DEVICE-resident decode
        hiddens buffer: slices the first `frames` rows in-graph and zeroes
        rows past `n_frames` (the old host path fetched the buffer, cropped,
        zero-padded and re-uploaded — two large tunnel round trips that cost
        more than the whole scalar fence). Zero-pad + crop is equivalent to
        a compact run: zero rows match the old explicit zero padding
        bit-for-bit."""
        if frames not in self._voc_cache:
            vcfg = self.vcfg

            @jax.jit
            def run(params, hiddens, n_frames, cond_embed, conds):
                h = hiddens[:frames] * (jnp.arange(frames)
                                        < n_frames)[:, None]
                latent = gpt_final_norm(params["gpt"], h[None])
                wav = bigvgan_apply(params["bigvgan"], latent, vcfg,
                                    conds=conds, cond_embed=cond_embed)
                return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

            self._voc_cache[frames] = run
        return self._voc_cache[frames]

    def _vocode_batch_fn(self, frames: int, nlive: int):
        key = ("batch", frames, nlive)
        if key not in self._voc_cache:
            vcfg = self.vcfg

            @jax.jit
            def run(params, hiddens, rows, n_frames, cond_embed, conds):
                """hiddens (B, max_gen, D) device-resident decode output;
                rows (nlive,) indices of live requests; n_frames (nlive,);
                cond_embed (nlive, 1, C0); conds[i] (nlive, 1, C_i)."""
                h = jnp.take(hiddens, rows, axis=0)[:, :frames]
                h = h * (jnp.arange(frames)[None, :]
                         < n_frames[:, None])[..., None]
                latent = gpt_final_norm(params["gpt"], h)
                wav = bigvgan_apply(params["bigvgan"], latent, vcfg,
                                    conds=conds, cond_embed=cond_embed)
                return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

            self._voc_cache[key] = run
        return self._voc_cache[key]

    # ------------------------------------------------------------- public

    def synthesize_ids(self, text_ids: np.ndarray, ref,
                       max_gen: int | None = None
                       ) -> tuple[np.ndarray, IndexTTSStats]:
        """text_ids (1, T) BPE ids; ref = encode_reference(...) output."""
        conds_latent, cond_embed, conds = ref
        cfg = self.cfg
        max_gen = max_gen or cfg.max_mel_tokens
        tlen = text_ids.shape[1]
        tb = max(16, -(-tlen // 16) * 16)
        ids = np.zeros((1, tb), np.int32)
        ids[0, :tlen] = text_ids[0]

        t0 = time.perf_counter()
        # np.int32: jnp scalar creation costs ~30 ms/call over a tunnel
        hiddens, num, save = self._decode_fn(tb, max_gen)(
            self.params, conds_latent, jnp.asarray(ids), np.int32(tlen))
        num = int(num)                       # scalar fence picks the bucket
        # drop the last 2 collected hiddens (reference :303 latent[:-2])
        n_frames = max(num - 2, 0)
        if n_frames == 0:
            return np.zeros(0, np.int16), IndexTTSStats(num, 0.0)
        fb = min(max(8, -(-n_frames // 8) * 8), max_gen)
        # hiddens stays on device; the vocoder slices/masks it in-graph
        wav = self._vocode_fn(fb)(self.params, hiddens, np.int32(n_frames),
                                  cond_embed, conds)
        total_up = self.vcfg.total_upsample
        wav = np.asarray(wav)[0, : n_frames * total_up]
        return wav, IndexTTSStats(num, time.perf_counter() - t0)

    def synthesize_ids_batch(self, requests: list[tuple[np.ndarray, tuple]],
                             max_gen: int | None = None
                             ) -> tuple[list[np.ndarray], dict]:
        """Batched serving: B (text_ids, ref) requests decode concurrently
        in one while_loop (per-row kv-hole masks and stop tracking), then
        vocode per stream. Returns (list of int16 waveforms, aggregate
        stats)."""
        cfg = self.cfg
        bsz = len(requests)
        max_gen = max_gen or cfg.max_mel_tokens
        tb = max(16, -(-max(t.shape[1] for t, _ in requests) // 16) * 16)
        ids = np.zeros((bsz, tb), np.int32)
        tlens = np.zeros((bsz,), np.int32)
        conds_latent = []
        for b, (t, ref) in enumerate(requests):
            ids[b, : t.shape[1]] = t[0]
            tlens[b] = t.shape[1]
            conds_latent.append(np.asarray(ref[0])[0])

        if self.mesh is not None:
            from ..parallel.mesh import dp_shard

            if bsz % self.mesh.shape["dp"]:
                raise ValueError(f"batch {bsz} not divisible by "
                                 f"dp={self.mesh.shape['dp']}")
            conds_dev = dp_shard(self.mesh, np.stack(conds_latent))
            ids_dev = dp_shard(self.mesh, ids)
            tlens_dev = dp_shard(self.mesh, tlens)
        else:
            conds_dev = jnp.asarray(np.stack(conds_latent))
            ids_dev, tlens_dev = jnp.asarray(ids), jnp.asarray(tlens)

        t0 = time.perf_counter()
        hiddens, done, _ = self._decode_batch_fn(bsz, tb, max_gen)(
            self.params, conds_dev, ids_dev, tlens_dev)
        done = np.asarray(done)              # (B,) fence picks the bucket
        total_up = self.vcfg.total_upsample
        frames = [max(int(done[b]) - 2, 0) for b in range(bsz)]
        wavs: list[np.ndarray | None] = [None] * bsz
        live = [b for b in range(bsz) if frames[b] > 0]
        if live:
            # one batched speaker-conditioned vocoder call at the max frame
            # bucket, fed from the device-resident hiddens (rows gathered +
            # masked in-graph); per-row crops afterwards
            fb = min(max(8, -(-max(frames[b] for b in live) // 8) * 8),
                     max_gen)
            cond_embed = jnp.concatenate(
                [requests[b][1][1] for b in live], axis=0)
            conds = [jnp.concatenate([requests[b][1][2][i] for b in live],
                                     axis=0)
                     for i in range(len(requests[live[0]][1][2]))]
            wav = np.asarray(self._vocode_batch_fn(fb, len(live))(
                self.params, hiddens, np.asarray(live, np.int32),
                np.asarray(frames, np.int32)[np.asarray(live)],
                cond_embed, conds))
            for i, b in enumerate(live):
                wavs[b] = wav[i, : frames[b] * total_up]
        for b in range(bsz):
            if wavs[b] is None:
                wavs[b] = np.zeros(0, np.int16)
        wall = time.perf_counter() - t0
        total = int(done.sum())
        return wavs, {"tokens": total, "wall_s": wall,
                      "tokens_per_s": total / max(wall, 1e-9)}

    def synthesize(self, text: str, ref, tokenizer=None,
                   max_gen: int | None = None,
                   separator_ms: float = 200.0
                   ) -> tuple[np.ndarray, list[IndexTTSStats]]:
        """Full text path: normalize, tokenize, split into sentences, run the
        AR loop per sentence, join with silence padding (reference
        Export_IndexTTS.py:1127-1216: 200 ms split padding)."""
        from ..frontend.indextts_text import IndexTTSTokenizer, split_sentences

        tok = tokenizer or IndexTTSTokenizer()
        sentences = split_sentences(tok.tokenize(text))
        blank = np.zeros(int(self.sample_rate * separator_ms / 1000), np.int16)
        wavs, stats = [], []
        for sent in sentences:
            ids = np.array([tok.convert_tokens_to_ids(sent)], np.int32)
            wav, st = self.synthesize_ids(ids, ref, max_gen=max_gen)
            wavs.extend([wav, blank])
            stats.append(st)
        return (np.concatenate(wavs) if wavs else np.zeros(0, np.int16),
                stats)
