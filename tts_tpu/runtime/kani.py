"""KaniTTS synthesis pipeline: text -> codec tokens -> waveform.

Reference behavior: /root/reference/Kani_TTS/Inference_Kani_TTS_ONNX.py
:110-366 (8 ONNX sessions + a Python decode loop with 3-4 session calls per
token). Here prefill + the whole AR loop (LM step, repetition penalty,
greedy or beam selection, stop check) compile into ONE lax.while_loop, and
the codec decode is a second jitted program — two dispatches per sentence.

Variable prompt lengths are handled without recompiles: the prompt id buffer
has a fixed capacity and a while_loop feeds it token-by-token into the same
step function the decode loop uses (prompt tokens forced, generated tokens
sampled). One compiled program serves every sentence.

Prompt format (Export_Kani_TTS.py:982-983, 1070-1073):
  ids = [64403] + tokenizer("speaker: text") + [2, 64404]
Token stream: flat 4-codebook frames; the codec consumes ids[2:num_decode]
as (T, 4) frames (Export_Kani_TTS.py:531-533).
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding.beam import beam_init, beam_step
from ..decoding.sampling import apply_repetition_penalty, greedy
from ..models.kani import (
    KaniConfig,
    KaniState,
    embed_tokens,
    init_state,
    kani_step,
)
from ..models.nanocodec import (
    NanoCodecConfig,
    fsq_dequantize,
    hifigan_decode,
    tokens_to_codes,
)

__all__ = ["KaniPipeline", "KaniDecodeConfig"]

HEAD_IDS = (64403,)
TAIL_IDS = (2, 64404)
MAX_PROMPT = 256


@dataclass(frozen=True)
class KaniDecodeConfig:
    max_new_tokens: int = 1019          # MAX_SEQ_LEN - 5 (reference :961)
    use_beam: bool = False
    beam_size: int = 5
    top_k: int = 5
    repeat_penalty: float = 0.8
    penalty_range: int = 10


def _prefill_loop(params, ids_buf, prompt_len, state, cfg: KaniConfig):
    """Batched prefill: one causal pass over the padded id bucket (the old
    one-token-at-a-time loop paid per-position launch overhead). The conv
    carries and final logits come from the true prompt positions and the KV
    length is rewound to prompt_len so decode appends there, overwriting the
    padded garbage (never exposed by the causal mask). Returns
    (state, logits at the last prompt position)."""
    h = embed_tokens(params, ids_buf)                    # (1, S, H)
    logits, state = kani_step(params, h, state, cfg, valid_len=prompt_len)
    return KaniState(state.kv.rewind(prompt_len), state.conv), logits


class KaniPipeline:
    def __init__(self, params, cfg: KaniConfig, codec_params,
                 codec_cfg: NanoCodecConfig,
                 decode_cfg: KaniDecodeConfig | None = None,
                 tokenizer=None, audio_tokens_start: int | None = None,
                 quantize: int | None = None):
        if quantize:
            # weight-only int8/int4 on the LM matmuls; the codec stays
            # float (reference Q8/Q4 Optimize_ONNX policy)
            from ..quant.weight_only import quantize_pytree

            params = quantize_pytree(params, bits=quantize)
        self.params = params
        self.cfg = cfg
        self.codec_params = codec_params
        self.codec_cfg = codec_cfg
        self.dcfg = decode_cfg or KaniDecodeConfig()
        self.tokenizer = tokenizer
        # audio tokens start at tokenizer_length + 10 (Export_Kani_TTS.py:491)
        self.audio_tokens_start = (
            audio_tokens_start if audio_tokens_start is not None
            else cfg.vocab_size - 4 * codec_cfg.codebook_size
        )
        self._decode_fn = None
        self._codec_fn_cache: dict = {}

    # ------------------------------------------------------------------ LM

    def _build_decode(self):
        cfg, dcfg = self.cfg, self.dcfg
        use_penalty = dcfg.repeat_penalty != 1.0

        def penalized(logits, save_ids, num):
            if not use_penalty:
                return logits
            return apply_repetition_penalty(
                logits, save_ids, num, dcfg.repeat_penalty, dcfg.penalty_range)

        def greedy_run(params, ids_buf, prompt_len):
            state, logits = _prefill_loop(
                params, ids_buf, prompt_len,
                init_state(cfg, kv_dtype=params["embed"].dtype), cfg)
            first = greedy(logits)
            save_ids = jnp.zeros((1, dcfg.max_new_tokens), jnp.int32)
            save_ids = save_ids.at[:, 0].set(first)

            def cond(c):
                _, _, num, _, finished = c
                return (~finished) & (num < dcfg.max_new_tokens)

            def body(c):
                state, save_ids, num, last, _ = c
                h = embed_tokens(params, last[:, None])
                logits, state = kani_step(params, h, state, cfg)
                tok = greedy(penalized(logits, save_ids, num))
                save_ids = jax.lax.dynamic_update_slice(
                    save_ids, tok[:, None], (0, num))
                return (state, save_ids, num + 1, tok,
                        (tok == cfg.stop_token).any())

            init = (state, save_ids, jnp.ones((), jnp.int32), first,
                    (first == cfg.stop_token).any())
            _, save_ids, num, _, finished = jax.lax.while_loop(cond, body, init)
            return save_ids, num - finished.astype(jnp.int32)

        def beam_run(params, ids_buf, prompt_len):
            beam = dcfg.beam_size
            state, logits = _prefill_loop(
                params, ids_buf, prompt_len,
                init_state(cfg, kv_dtype=params["embed"].dtype), cfg)
            bs = beam_init(logits, beam)
            state = KaniState(state.kv.repeat_batch(beam),
                              jnp.tile(state.conv, (1, beam, 1, 1)))
            save_ids = jnp.zeros((beam, dcfg.max_new_tokens), jnp.int32)
            save_ids = save_ids.at[:, 0].set(bs.tokens)

            def cond(c):
                _, _, _, num, finished = c
                return (~finished) & (num < dcfg.max_new_tokens)

            def body(c):
                state, bs, save_ids, num, _ = c
                h = embed_tokens(params, bs.tokens[:, None])
                logits, state = kani_step(params, h, state, cfg)
                nbs = beam_step(penalized(logits, save_ids, num),
                                bs.log_probs, beam, dcfg.top_k)
                state = KaniState(state.kv.select_batch(nbs.parent),
                                  jnp.take(state.conv, nbs.parent, axis=1))
                save_ids = jnp.take(save_ids, nbs.parent, axis=0)
                save_ids = jax.lax.dynamic_update_slice(
                    save_ids, nbs.tokens[:, None], (0, num))
                return (state, nbs, save_ids, num + 1,
                        nbs.tokens[0] == cfg.stop_token)

            init = (state, bs, save_ids, jnp.ones((), jnp.int32),
                    bs.tokens[0] == cfg.stop_token)
            _, _, save_ids, num, finished = jax.lax.while_loop(cond, body, init)
            return save_ids[:1], num - finished.astype(jnp.int32)

        degenerate = self.dcfg.top_k < 2 or self.dcfg.beam_size < 2
        if self.dcfg.use_beam and degenerate:
            import warnings

            # the reference warns and falls back the same way
            # (Inference_Kani_TTS_ONNX.py:173-179)
            warnings.warn("beam search requested with beam_size/top_k < 2; "
                          "falling back to greedy", stacklevel=2)
        run = beam_run if (self.dcfg.use_beam and not degenerate) else greedy_run
        return jax.jit(run)

    def _build_decode_batch(self, bsz: int):
        """Multi-request greedy decode: B prompts right-justified in one
        bucket (kani_step key_valid_from masks each row's left pad), one
        while_loop until every stream stops. AR decode at B=1 is latency-
        bound, so batching multiplies aggregate tok/s — the serving path
        the single-stream reference lacks."""
        cfg, dcfg = self.cfg, self.dcfg
        use_penalty = dcfg.repeat_penalty != 1.0

        def run(params, ids_buf, pad_start):
            valid = (jnp.arange(ids_buf.shape[1])[None, :]
                     >= pad_start[:, None])
            emb = embed_tokens(params, ids_buf) * valid[..., None]
            state = init_state(cfg, batch=bsz,
                               kv_dtype=params["embed"].dtype)
            logits, state = kani_step(params, emb, state, cfg,
                                      key_valid_from=pad_start)
            first = greedy(logits)                              # (B,)
            save = jnp.zeros((bsz, dcfg.max_new_tokens), jnp.int32)
            save = save.at[:, 0].set(first)
            fin0 = first == cfg.stop_token
            # done_at[b] = index of the stop token (tokens kept before it)
            done0 = jnp.where(fin0, 0, dcfg.max_new_tokens)

            def cond(c):
                _, _, num, _, fin, _ = c
                return (~fin.all()) & (num < dcfg.max_new_tokens)

            def body(c):
                state, save, num, last, fin, done = c
                h = embed_tokens(params, last[:, None])
                logits, state = kani_step(params, h, state, cfg,
                                          key_valid_from=pad_start)
                if use_penalty:
                    logits = apply_repetition_penalty(
                        logits, save, num, dcfg.repeat_penalty,
                        dcfg.penalty_range)
                tok = greedy(logits)
                tok = jnp.where(fin, cfg.stop_token, tok)
                save = jax.lax.dynamic_update_slice(save, tok[:, None],
                                                    (0, num))
                newly = (tok == cfg.stop_token) & (~fin)
                done = jnp.where(newly, num, done)
                return state, save, num + 1, tok, fin | newly, done

            init = (state, save, jnp.ones((), jnp.int32), first, fin0, done0)
            _, save, num, _, fin, done = jax.lax.while_loop(cond, body, init)
            return save, jnp.minimum(done, num)

        return jax.jit(run)

    # ---------------------------------------------------------------- codec

    def _codec_fn(self, frames: int):
        if frames not in self._codec_fn_cache:
            ccfg = self.codec_cfg
            start = self.audio_tokens_start

            @jax.jit
            def run(codec_params, ids):
                codes = tokens_to_codes(ids, ccfg, start)      # (1, T, G)
                feats = fsq_dequantize(codes, ccfg)
                wav = hifigan_decode(codec_params, feats, ccfg)
                return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

            self._codec_fn_cache[frames] = run
        return self._codec_fn_cache[frames]

    # --------------------------------------------------------------- public

    def tokenize(self, text: str, speaker: str = "jenny") -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError("no tokenizer configured; pass ids to synthesize_ids")
        ids = self.tokenizer(f"{speaker}: {text}", return_tensors="np")[
            "input_ids"].astype(np.int32)
        return np.concatenate(
            [np.array([HEAD_IDS], np.int32), ids, np.array([TAIL_IDS], np.int32)],
            axis=1,
        )

    def synthesize_ids(self, ids: np.ndarray) -> tuple[np.ndarray, dict]:
        """ids: (1, P) full prompt (head/tail already attached)."""
        if self._decode_fn is None:
            self._decode_fn = self._build_decode()
        prompt_len = ids.shape[1]
        # bucket bounded by the rope table / KV size
        cap = min(MAX_PROMPT, self.cfg.max_seq_len // 2)
        bucket = max(16, min(cap, -(-prompt_len // 64) * 64))
        ids_buf = np.zeros((1, bucket), np.int32)
        ids_buf[0, :prompt_len] = ids[0]

        t0 = time.perf_counter()
        # np.int32: per-call jnp scalar creation costs ~30 ms over a
        # remote-device tunnel; numpy args ride the fast path
        save_ids, n = self._decode_fn(self.params, jnp.asarray(ids_buf),
                                      np.int32(prompt_len))
        n = int(n)
        g = self.codec_cfg.num_groups
        frames = max((n - 2) // g, 0)
        if frames == 0:
            return np.zeros(0, np.int16), {"tokens": n, "wall_s": 0.0}
        # frame-align and bucket the codec input
        bucket = max(8, -(-frames // 8) * 8)
        flat = np.asarray(save_ids)[:1, 2:2 + frames * g]
        pad = np.zeros((1, (bucket - frames) * g), np.int32) + self.audio_tokens_start
        flat = np.concatenate([flat, pad], axis=1)
        wav = self._codec_fn(bucket)(self.codec_params, jnp.asarray(flat))
        wav = np.asarray(wav)[0, : frames * self.codec_cfg.total_upsample]
        wall = time.perf_counter() - t0
        return wav, {"tokens": n, "wall_s": wall,
                     "tokens_per_s": n / max(wall, 1e-9)}

    def synthesize_ids_batch(self, ids_list: list[np.ndarray]
                             ) -> tuple[list[np.ndarray], dict]:
        """Batched serving: decode B prompts concurrently (one program,
        per-row stop tracking), then vocode each stream. Returns
        (list of int16 waveforms, aggregate stats)."""
        bsz = len(ids_list)
        cap = min(MAX_PROMPT, self.cfg.max_seq_len // 2)
        longest = max(i.shape[1] for i in ids_list)
        bucket = max(16, min(cap, -(-longest // 64) * 64))
        ids_buf = np.zeros((bsz, bucket), np.int32)
        pad_start = np.zeros((bsz,), np.int32)
        for b, ids in enumerate(ids_list):
            p = ids.shape[1]
            ids_buf[b, bucket - p:] = ids[0]
            pad_start[b] = bucket - p

        key = ("batch", bsz)
        if not hasattr(self, "_batch_fns"):
            self._batch_fns = {}
        if key not in self._batch_fns:
            self._batch_fns[key] = self._build_decode_batch(bsz)

        t0 = time.perf_counter()
        save, done = self._batch_fns[key](self.params, jnp.asarray(ids_buf),
                                          np.asarray(pad_start))
        save = np.asarray(save)
        done = np.asarray(done)
        g = self.codec_cfg.num_groups
        frames = [max((int(done[b]) - 2) // g, 0) for b in range(bsz)]
        # one batched codec decode at the max frame bucket (rows padded with
        # the group-0 base token); per-row crops afterwards
        wavs: list[np.ndarray | None] = [None] * bsz
        live = [b for b in range(bsz) if frames[b] > 0]
        if live:
            fbucket = max(8, -(-max(frames[b] for b in live) // 8) * 8)
            flat = np.full((len(live), fbucket * g),
                           self.audio_tokens_start, np.int32)
            for i, b in enumerate(live):
                flat[i, : frames[b] * g] = save[b, 2 : 2 + frames[b] * g]
            wav = np.asarray(self._codec_fn(fbucket)(self.codec_params,
                                                     jnp.asarray(flat)))
            for i, b in enumerate(live):
                wavs[b] = wav[i, : frames[b] * self.codec_cfg.total_upsample]
        for b in range(bsz):
            if wavs[b] is None:
                wavs[b] = np.zeros(0, np.int16)
        wall = time.perf_counter() - t0
        total = int(done.sum())
        return wavs, {"tokens": total, "wall_s": wall,
                      "tokens_per_s": total / max(wall, 1e-9)}

    def synthesize(self, text: str, speaker: str = "jenny"
                   ) -> tuple[np.ndarray, dict]:
        return self.synthesize_ids(self.tokenize(text, speaker))

    def synthesize_long(self, texts: list[str], speaker: str = "jenny",
                        separator_ms: float = 300.0
                        ) -> tuple[np.ndarray, list[dict]]:
        """Multi-sentence synthesis with blank separators (reference
        Export_Kani_TTS.py:1064: 300 ms of silence between sentences)."""
        blank = np.zeros(int(self.codec_cfg.sample_rate * separator_ms / 1000),
                         np.int16)
        wavs, stats = [], []
        for text in texts:
            wav, st = self.synthesize(text, speaker)
            wavs.extend([wav, blank])
            stats.append(st)
        return (np.concatenate(wavs) if wavs else np.zeros(0, np.int16),
                stats)
