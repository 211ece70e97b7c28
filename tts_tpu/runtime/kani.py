"""KaniTTS synthesis pipeline: text -> codec tokens -> waveform.

Reference behavior: /root/reference/Kani_TTS/Inference_Kani_TTS_ONNX.py
:110-366 (8 ONNX sessions + a Python decode loop with 3-4 session calls per
token). Here prefill + the whole AR loop (LM step, repetition penalty,
greedy or beam selection, stop check) AND the codec decode compile into ONE
jitted program — one dispatch + one (wav, count) fetch per sentence. The
codec runs over the full zero-generation-padded token buffer (padded with
the group-base token like the old host path); the HiFiGAN is causal, so the
cropped [0 : frames*upsample) samples are bit-identical to a compact
decode. The token buffer buckets to the per-call `max_new_tokens` cap so
short requests don't pay a max-length codec pass.

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
    # Pallas fused decode qkv head (ops/decode_qkv.py); None = auto
    # (on for TPU backends, off on CPU)
    # None = auto: "step" (qkv+attention single kernel,
    # ops/decode_step.py — e2e 957->1058 tok/s int8 370m-shape) on TPU, off on CPU;
    # True = qkv-head kernel only; per-call degradation
    # outside the M=1 plain-causal geometry is automatic.
    fused_decode: bool | str | None = None


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
                 quantize: int | None = None, mesh=None):
        if quantize:
            # weight-only int8/int4 on the LM matmuls; the codec stays
            # float (reference Q8/Q4 Optimize_ONNX policy)
            from ..quant.weight_only import quantize_pytree

            params = quantize_pytree(params, bits=quantize)
        if mesh is not None:
            # data-parallel serving: params replicated on every chip,
            # synthesize_ids_batch shards its batch over the mesh "dp"
            # axis; XLA's only collective is the all-reduced stop
            # predicate, so throughput scales with chips
            from ..parallel.mesh import replicate

            params = replicate(params, mesh)
            codec_params = replicate(codec_params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.codec_params = codec_params
        self.codec_cfg = codec_cfg
        self.dcfg = decode_cfg or KaniDecodeConfig()
        fd = self.dcfg.fused_decode
        self._fused = ("step" if jax.default_backend() == "tpu"
                       else False) if fd is None else fd
        self.tokenizer = tokenizer
        # audio tokens start at tokenizer_length + 10 (Export_Kani_TTS.py:491)
        self.audio_tokens_start = (
            audio_tokens_start if audio_tokens_start is not None
            else cfg.vocab_size - 4 * codec_cfg.codebook_size
        )
        self._decode_cache: dict = {}

    # ------------------------------------------------------------------ LM

    def _vocode_in_graph(self, save_ids, num, codec_params, fbuf: int):
        """In-graph codec epilogue: save_ids rows (.., buf) -> int16 wav
        (.., fbuf*total_upsample). Positions past the generated frame count
        are replaced with the group-base token (the old host path padded its
        compact bucket the same way); the HiFiGAN is causal, so samples
        before frames*upsample are unaffected by the padding. `num` may be
        scalar or (B,)."""
        ccfg = self.codec_cfg
        g = ccfg.num_groups
        flat = save_ids[:, 2:2 + fbuf * g]
        frames = jnp.maximum((num - 2) // g, 0)
        valid = jnp.arange(fbuf * g)[None, :] < \
            jnp.reshape(frames, (-1, 1)) * g
        flat = jnp.where(valid, flat, self.audio_tokens_start)
        codes = tokens_to_codes(flat, ccfg, self.audio_tokens_start)
        feats = fsq_dequantize(codes, ccfg)
        wav = hifigan_decode(codec_params, feats, ccfg)
        return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

    def _build_decode(self, buf: int, fbuf: int):
        cfg, dcfg = self.cfg, self.dcfg
        use_penalty = dcfg.repeat_penalty != 1.0

        def penalized(logits, save_ids, num):
            if not use_penalty:
                return logits
            return apply_repetition_penalty(
                logits, save_ids, num, dcfg.repeat_penalty, dcfg.penalty_range)

        def greedy_run(params, codec_params, ids_buf, prompt_len, cap):
            state, logits = _prefill_loop(
                params, ids_buf, prompt_len,
                init_state(cfg, kv_dtype=params["embed"].dtype), cfg)
            first = greedy(logits)
            save_ids = jnp.zeros((1, buf), jnp.int32)
            save_ids = save_ids.at[:, 0].set(first)

            def cond(c):
                _, _, num, _, finished = c
                return (~finished) & (num < jnp.minimum(cap, buf))

            def body(c):
                state, save_ids, num, last, _ = c
                h = embed_tokens(params, last[:, None])
                logits, state = kani_step(params, h, state, cfg,
                                          fused=self._fused)
                tok = greedy(penalized(logits, save_ids, num))
                save_ids = jax.lax.dynamic_update_slice(
                    save_ids, tok[:, None], (0, num))
                return (state, save_ids, num + 1, tok,
                        (tok == cfg.stop_token).any())

            init = (state, save_ids, jnp.ones((), jnp.int32), first,
                    (first == cfg.stop_token).any())
            _, save_ids, num, _, finished = jax.lax.while_loop(cond, body, init)
            n = num - finished.astype(jnp.int32)
            return self._vocode_in_graph(save_ids, n, codec_params, fbuf), n

        def beam_run(params, codec_params, ids_buf, prompt_len, cap):
            beam = dcfg.beam_size
            state, logits = _prefill_loop(
                params, ids_buf, prompt_len,
                init_state(cfg, kv_dtype=params["embed"].dtype), cfg)
            bs = beam_init(logits, beam)
            state = KaniState(state.kv.repeat_batch(beam),
                              jnp.tile(state.conv, (1, beam, 1, 1)))
            save_ids = jnp.zeros((beam, buf), jnp.int32)
            save_ids = save_ids.at[:, 0].set(bs.tokens)

            def cond(c):
                _, _, _, num, finished = c
                return (~finished) & (num < jnp.minimum(cap, buf))

            def body(c):
                state, bs, save_ids, num, _ = c
                h = embed_tokens(params, bs.tokens[:, None])
                logits, state = kani_step(params, h, state, cfg,
                                          fused=self._fused)
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
            n = num - finished.astype(jnp.int32)
            return (self._vocode_in_graph(save_ids[:1], n, codec_params, fbuf),
                    n)

        degenerate = self.dcfg.top_k < 2 or self.dcfg.beam_size < 2
        if self.dcfg.use_beam and degenerate:
            import warnings

            # the reference warns and falls back the same way
            # (Inference_Kani_TTS_ONNX.py:173-179)
            warnings.warn("beam search requested with beam_size/top_k < 2; "
                          "falling back to greedy", stacklevel=2)
        run = beam_run if (self.dcfg.use_beam and not degenerate) else greedy_run
        return jax.jit(run)

    def _build_decode_batch(self, bsz: int, buf: int, fbuf: int):
        """Multi-request greedy decode: B prompts right-justified in one
        bucket (kani_step key_valid_from masks each row's left pad), one
        while_loop until every stream stops, then the batched codec decode
        in the same program. AR decode at B=1 is latency-bound, so batching
        multiplies aggregate tok/s — the serving path the single-stream
        reference lacks."""
        cfg, dcfg = self.cfg, self.dcfg
        use_penalty = dcfg.repeat_penalty != 1.0

        def run(params, codec_params, ids_buf, pad_start, cap):
            valid = (jnp.arange(ids_buf.shape[1])[None, :]
                     >= pad_start[:, None])
            emb = embed_tokens(params, ids_buf) * valid[..., None]
            state = init_state(cfg, batch=bsz,
                               kv_dtype=params["embed"].dtype)
            logits, state = kani_step(params, emb, state, cfg,
                                      key_valid_from=pad_start)
            first = greedy(logits)                              # (B,)
            save = jnp.zeros((bsz, buf), jnp.int32)
            save = save.at[:, 0].set(first)
            fin0 = first == cfg.stop_token
            # done_at[b] = index of the stop token (tokens kept before it)
            done0 = jnp.where(fin0, 0, buf)

            def cond(c):
                _, _, num, _, fin, _ = c
                return (~fin.all()) & (num < jnp.minimum(cap, buf))

            def body(c):
                state, save, num, last, fin, done = c
                h = embed_tokens(params, last[:, None])
                logits, state = kani_step(params, h, state, cfg,
                                          key_valid_from=pad_start,
                                          fused=self._fused)
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
            done = jnp.minimum(done, num)
            return self._vocode_in_graph(save, done, codec_params, fbuf), done

        return jax.jit(run)

    def _buf_for(self, max_new_tokens: int | None) -> tuple[int, int, int]:
        """(cap, buf, fbuf): token cap, bucketed save_ids capacity, codec
        frame capacity. 16-frame (64-token) granularity keeps recompiles
        rare while short requests skip most of a max-length codec pass."""
        dcfg = self.dcfg
        g = self.codec_cfg.num_groups
        cap = min(max_new_tokens or dcfg.max_new_tokens, dcfg.max_new_tokens)
        fbuf_max = max(-(-(dcfg.max_new_tokens - 2) // g), 16)
        fbuf = min(fbuf_max, max(16, -(-max(cap - 2, 1) // (g * 16)) * 16))
        return cap, fbuf * g + 2, fbuf

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

    def synthesize_ids(self, ids: np.ndarray,
                       max_new_tokens: int | None = None
                       ) -> tuple[np.ndarray, dict]:
        """ids: (1, P) full prompt (head/tail already attached)."""
        cap, buf, fbuf = self._buf_for(max_new_tokens)
        dec = self._decode_cache.get(fbuf)
        if dec is None:
            dec = self._decode_cache[fbuf] = self._build_decode(buf, fbuf)
        prompt_len = ids.shape[1]
        # bucket bounded by the rope table / KV size
        pcap = min(MAX_PROMPT, self.cfg.max_seq_len // 2)
        bucket = max(16, min(pcap, -(-prompt_len // 64) * 64))
        ids_buf = np.zeros((1, bucket), np.int32)
        ids_buf[0, :prompt_len] = ids[0]

        t0 = time.perf_counter()
        # np.int32: per-call jnp scalar creation costs ~30 ms over a
        # remote-device tunnel; numpy args ride the fast path
        wav_dev, n_dev = dec(self.params, self.codec_params,
                             jnp.asarray(ids_buf), np.int32(prompt_len),
                             np.int32(min(cap, buf)))
        # one combined fetch: wav + count in the same round trip
        wav, n = jax.device_get((wav_dev, n_dev))
        n = int(n)
        frames = max((n - 2) // self.codec_cfg.num_groups, 0)
        if frames == 0:
            return np.zeros(0, np.int16), {"tokens": n, "wall_s": 0.0}
        wav = wav[0, : frames * self.codec_cfg.total_upsample]
        wall = time.perf_counter() - t0
        return wav, {"tokens": n, "wall_s": wall,
                     "tokens_per_s": n / max(wall, 1e-9)}

    def synthesize_ids_batch(self, ids_list: list[np.ndarray],
                             max_new_tokens: int | None = None
                             ) -> tuple[list[np.ndarray], dict]:
        """Batched serving: decode B prompts concurrently (one program,
        per-row stop tracking) and vocode all rows in the same dispatch.
        Returns (list of int16 waveforms, aggregate stats)."""
        bsz = len(ids_list)
        cap, buf, fbuf = self._buf_for(max_new_tokens)
        pcap = min(MAX_PROMPT, self.cfg.max_seq_len // 2)
        longest = max(i.shape[1] for i in ids_list)
        bucket = max(16, min(pcap, -(-longest // 64) * 64))
        ids_buf = np.zeros((bsz, bucket), np.int32)
        pad_start = np.zeros((bsz,), np.int32)
        for b, ids in enumerate(ids_list):
            p = ids.shape[1]
            ids_buf[b, bucket - p:] = ids[0]
            pad_start[b] = bucket - p

        key = ("batch", bsz, fbuf)
        if not hasattr(self, "_batch_fns"):
            self._batch_fns = {}
        if key not in self._batch_fns:
            self._batch_fns[key] = self._build_decode_batch(bsz, buf, fbuf)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = self.mesh.shape["dp"]
            if bsz % dp:
                raise ValueError(f"batch {bsz} not divisible by dp={dp}")
            ids_dev = jax.device_put(
                ids_buf, NamedSharding(self.mesh, P("dp", None)))
            pad_dev = jax.device_put(pad_start,
                                     NamedSharding(self.mesh, P("dp")))
        else:
            ids_dev, pad_dev = jnp.asarray(ids_buf), np.asarray(pad_start)

        t0 = time.perf_counter()
        wav_dev, done_dev = self._batch_fns[key](
            self.params, self.codec_params, ids_dev,
            pad_dev, np.int32(min(cap, buf)))
        wav, done = jax.device_get((wav_dev, done_dev))
        g = self.codec_cfg.num_groups
        up = self.codec_cfg.total_upsample
        wavs = []
        for b in range(bsz):
            frames = max((int(done[b]) - 2) // g, 0)
            wavs.append(wav[b, : frames * up] if frames
                        else np.zeros(0, np.int16))
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
