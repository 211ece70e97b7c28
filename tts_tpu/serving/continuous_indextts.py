"""Slot-based continuous batching for the IndexTTS AR decode.

Family adapter over serving/slots.SlotEngine. Each chunk step runs one
GPT-2 decode step per row with the reference's in-carry repetition-
penalty VECTOR and sliding reset window (Export_IndexTTS.py:1197-1201),
kept per-row at each row's own cursor. The shared-kv-position design is
sound here because this GPT-2 has no positional encoding of its own —
text/mel positions come from external learned tables added to the
inputs (models/indextts.py:292-301) — so a row spliced at any absolute
kv offset computes exactly what it would compute alone; only the causal
mask and the per-row validity mask matter.

Admission assembles the [conds_latent | text_emb | mel_start] prefill
(same layout as runtime/indextts._decode_fn, including the bucketed
text hole masked via kv_valid) right-justified at the batch's current
shared position and splices the row in. Finished rows vocode through
the speaker-conditioned BigVGAN from the device-resident hidden buffer
using the per-request conditioning captured at admission.

The reference runs one request at a time through 6 ONNX sessions with a
host-side penalty loop (Export_IndexTTS.py:1102-1227); continuous
serving is a beyond-reference capability.
"""
from __future__ import annotations

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from .slots import SlotEngine

__all__ = ["IndexTTSSlotServer"]


class IndexTTSSlotServer(SlotEngine):
    """Continuous-batching server over an IndexTTSPipeline.

    submit(text_ids, ref) -> Future resolving to (int16 wav, n_tokens).
    text_ids (1, T) int32 BPE ids; ref = pipeline.encode_reference(...)
    output (conds_latent, cond_embed, conds).
    """

    def __init__(self, pipeline, *, slots: int = 4, chunk: int = 32,
                 text_bucket: int = 32, max_gen: int | None = None,
                 max_seq_len: int | None = None, queue_limit: int = 256,
                 ref=None):
        self.pipe = pipeline
        # server-fixed conditioning (used when submit omits ref); for
        # multi-device routing each server binds a device-local copy
        self.ref = ref
        self.cfg = pipeline.cfg
        cfg = self.cfg
        self.tb = text_bucket
        self.gbuf = max_gen or cfg.max_mel_tokens
        # prefill layout: conds_latent + ([0] + bucketed ids + [1]) + mel0
        self.p_len = cfg.num_latents + self.tb + 2 + 1
        kv_max = min(max_seq_len or cfg.max_seq_len, cfg.max_seq_len)
        kv_max = (kv_max // 128) * 128 or kv_max
        if self.p_len + self.gbuf + chunk > kv_max:
            raise ValueError(
                f"kv budget {kv_max} too small for prefill {self.p_len} + "
                f"max_gen {self.gbuf} + chunk {chunk}")
        self.kv_max = kv_max
        self._slots = slots
        self._build_programs(slots, chunk)
        super().__init__(slots=slots, chunk=chunk, seq_limit=kv_max,
                         start_pos=self.p_len, queue_limit=queue_limit,
                         name="indextts-slot-server")

    # ----------------------------------------------------------- programs

    def _build_programs(self, bsz: int, chunk: int):
        from ..models.indextts import gpt_step

        cfg, dcfg = self.cfg, self.pipe.dcfg
        n_lat, p_len, kv_max, gbuf = (cfg.num_latents, self.p_len,
                                      self.kv_max, self.gbuf)
        penalty, prange = dcfg.repeat_penalty, dcfg.penalty_range
        rows = jnp.arange(bsz)

        def row_valid(kvf, tlen):
            """(B, kv_max) key-validity: row starts at kvf, with the
            bucketed-text hole [kvf + n_lat + tlen + 2, kvf + p_len - 1)
            masked out (same hole as runtime/indextts.py:193-196, shifted
            by the row's offset)."""
            idx = jnp.arange(kv_max)[None, :]
            hole = ((idx >= (kvf + n_lat + tlen + 2)[:, None])
                    & (idx < (kvf + p_len - 1)[:, None]))
            return (idx >= kvf[:, None]) & ~hole

        def chunk_fn(params, kv, vec, save, hiddens, cnt, tok, rst, fin,
                     done, kvf, tlen, cap_vec):
            gpt = params["gpt"]
            kv_valid = row_valid(kvf, tlen)
            mel_pos_max = gpt["mel_pos"].shape[0] - 1

            def body(_, c):
                kv, vec, save, hiddens, cnt, tok, rst, fin, done = c
                # penalty vector update (reference :1197-1201), per row
                vec = vec.at[rows, tok].set(
                    jnp.where(fin, vec[rows, tok], penalty))
                old = save[rows, rst]
                do_reset = (cnt > prange) & (old != tok) & (~fin)
                vec = jnp.where(do_reset[:, None],
                                vec.at[rows, old].set(1.0), vec)
                rst = rst + do_reset.astype(jnp.int32)

                h = (gpt["mel_embed"][tok]
                     + gpt["mel_pos"][jnp.minimum(cnt, mel_pos_max)])[:, None]
                h = h * (~fin)[:, None, None]        # dead rows embed zeros
                logits, last_h, kv = gpt_step(gpt, h, kv, vec, cfg,
                                              kv_valid,
                                              fused=self.pipe._fused)
                ntok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                ntok = jnp.where(fin, cfg.stop_token, ntok)
                cur = jnp.minimum(cnt, gbuf - 1)
                save = save.at[rows, cur].set(
                    jnp.where(fin, save[rows, cur], ntok))
                hiddens = hiddens.at[rows, cur].set(
                    jnp.where(fin[:, None], hiddens[rows, cur], last_h))
                newly = ((ntok == cfg.stop_token) | (cnt + 1 >= cap_vec)) \
                    & (~fin)
                done = jnp.where(newly, cnt + 1, done)
                cnt = jnp.where(fin, cnt, cnt + 1)
                return kv, vec, save, hiddens, cnt, ntok, rst, \
                    fin | newly, done

            return jax.lax.fori_loop(
                0, chunk, body,
                (kv, vec, save, hiddens, cnt, tok, rst, fin, done))

        self._chunk_fn = jax.jit(
            chunk_fn, donate_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))

        def prefill_fn(params, conds_latent, ids_buf, tlen, base_pos):
            """One-row prefill at [base_pos - p_len, base_pos): the same
            [conds | text | mel_start] assembly as the solo decode
            (runtime/indextts.py:165-203) — absolute learned positions are
            identical because the model carries none of its own."""
            gpt = params["gpt"]
            ids = jnp.concatenate(
                [jnp.zeros((1, 1), jnp.int32), ids_buf,
                 jnp.full((1, 1), 1, jnp.int32)], axis=1)
            tb2 = ids.shape[1]
            text_emb = gpt["text_embed"][ids] + gpt["text_pos"][None, :tb2]
            end_emb = (gpt["text_embed"][1]
                       + gpt["text_pos"][tlen + 1])[None, None]
            pos_idx = jnp.arange(tb2)[None, :, None]
            text_emb = jnp.where(pos_idx == tlen + 1, end_emb, text_emb)
            mel_start = (gpt["mel_embed"][cfg.start_mel_token]
                         + gpt["mel_pos"][0])[None, None]
            prefill = jnp.concatenate(
                [jnp.asarray(conds_latent), text_emb, mel_start], axis=1)

            cdt = gpt["text_embed"].dtype
            kv1 = KVCache.create(cfg.gpt_layers, 1, cfg.gpt_heads,
                                 kv_max, cfg.gpt_head_dim, cdt)
            kv1 = dc.replace(kv1,
                             length=(base_pos - p_len).astype(jnp.int32))
            kv_valid = row_valid((base_pos - p_len).reshape(1),
                                 tlen.reshape(1))
            ones = jnp.ones((1, cfg.num_mel_codes), jnp.float32)
            logits, last_h, kv1 = gpt_step(gpt, prefill, kv1, ones, cfg,
                                           kv_valid)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[0]
            return kv1, tok, last_h

        self._prefill_fn = jax.jit(prefill_fn)

        def insert_fn(kv, kv1, slot):
            k = jax.lax.dynamic_update_slice(kv.k, kv1.k, (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(kv.v, kv1.v, (0, slot, 0, 0, 0))
            return dc.replace(kv, k=k, v=v,
                              length=jnp.maximum(kv.length, kv1.length))

        self._insert_fn = jax.jit(insert_fn, donate_argnums=(0,))

    # ------------------------------------------------------------- client

    def submit(self, text_ids: np.ndarray, ref=None,
               max_gen: int | None = None,
               deadline_s: float | None = None):
        if ref is None:
            ref = self.ref
        if ref is None:
            raise ValueError("no ref: pass encode_reference output to "
                             "submit or construct with ref=")
        if text_ids.shape[1] > self.tb:
            raise ValueError(
                f"text {text_ids.shape[1]} > bucket {self.tb}")
        cap = min(max_gen or self.gbuf, self.gbuf)
        return self._submit((np.asarray(text_ids, np.int32), ref), cap,
                            deadline_s=deadline_s)

    # ------------------------------------------------------ engine hooks

    def _fresh(self):
        bsz, cfg = self._slots, self.cfg
        cdt = self.pipe.params["gpt"]["text_embed"].dtype
        return {
            "kv": KVCache.create(cfg.gpt_layers, bsz, cfg.gpt_heads,
                                 self.kv_max, cfg.gpt_head_dim, cdt),
            "vec": jnp.ones((bsz, cfg.num_mel_codes), jnp.float32),
            "save": jnp.zeros((bsz, self.gbuf), jnp.int32),
            "hiddens": jnp.zeros((bsz, self.gbuf, cfg.gpt_dim), cdt),
            "cnt": jnp.zeros((bsz,), jnp.int32),
            "tok": jnp.zeros((bsz,), jnp.int32),
            "rst": jnp.zeros((bsz,), jnp.int32),
            "fin": jnp.ones((bsz,), bool),
            "done": jnp.zeros((bsz,), jnp.int32),
            "kvf": np.zeros((bsz,), np.int32),
            "tlen": np.zeros((bsz,), np.int32),
            "cap": np.zeros((bsz,), np.int32),
            "voc": [None] * bsz,          # (cond_embed, conds) per slot
        }

    def _fin_done(self, s):
        return jax.device_get((s["fin"], s["done"]))

    def _finalize(self, s, b: int, n: int):
        cond_embed, conds = s["voc"][b]
        s["voc"][b] = None
        n_frames = max(n - 2, 0)          # reference :303 latent[:-2]
        if n_frames == 0:
            return np.zeros(0, np.int16), n
        fb = min(max(8, -(-n_frames // 8) * 8), self.gbuf)
        wav = np.asarray(self.pipe._vocode_fn(fb)(
            self.pipe.params, s["hiddens"][b], np.int32(n_frames),
            cond_embed, conds))
        return wav[0, : n_frames * self.pipe.vcfg.total_upsample], n

    def _admit_row(self, s, b: int, payload, cap: int) -> None:
        text_ids, ref = payload
        conds_latent, cond_embed, conds = ref
        tlen = text_ids.shape[1]
        ids_buf = np.zeros((1, self.tb), np.int32)
        ids_buf[0, :tlen] = text_ids[0]
        kv1, tok, last_h = self._prefill_fn(
            self.pipe.params, conds_latent, jnp.asarray(ids_buf),
            np.int32(tlen), np.int32(s["pos"]))
        s["kv"] = self._insert_fn(s["kv"], kv1, np.int32(b))
        first_fin = tok == self.cfg.stop_token   # stays on device
        s["vec"] = s["vec"].at[b].set(1.0)
        s["save"] = s["save"].at[b].set(0).at[b, 0].set(tok)
        s["hiddens"] = s["hiddens"].at[b].set(0).at[b, 0].set(last_h[0])
        s["cnt"] = s["cnt"].at[b].set(1)
        s["tok"] = s["tok"].at[b].set(tok)
        s["rst"] = s["rst"].at[b].set(0)
        s["fin"] = s["fin"].at[b].set(first_fin)
        s["done"] = s["done"].at[b].set(jnp.where(first_fin, 1, cap))
        s["kvf"][b] = s["pos"] - self.p_len
        s["tlen"][b] = tlen
        s["cap"][b] = cap
        s["voc"][b] = (cond_embed, conds)

    def _step_chunk(self, s) -> None:
        (s["kv"], s["vec"], s["save"], s["hiddens"], s["cnt"], s["tok"],
         s["rst"], s["fin"], s["done"]) = self._chunk_fn(
            self.pipe.params, s["kv"], s["vec"], s["save"], s["hiddens"],
            s["cnt"], s["tok"], s["rst"], s["fin"], s["done"],
            jnp.asarray(s["kvf"]), jnp.asarray(s["tlen"]),
            jnp.asarray(s["cap"]))
