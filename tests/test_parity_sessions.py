"""Session-mode parity drivers exercised against mocked ONNX sessions.

No reference ONNX artifacts exist in this environment, so each driver in
`parity/sessions.py` runs against mock sessions built from OUR OWN stage
functions (the oracle): every stage diff must be ~0, proving the drivers
feed the right tensors in the right order and compare the right outputs.
A corrupted-mock test proves a failure localizes to the corrupted stage.
"""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.kv.cache import KVCache
from tts_tpu.parity.sessions import (
    indextts_session_stages,
    kani_session_stages,
    qwen_session_stages,
    voxcpm_session_stages,
)


class MockSession:
    def __init__(self, inputs, fn):
        self._inputs = [SimpleNamespace(name=n, shape=list(s))
                        for n, s in inputs]
        self.fn = fn

    def get_inputs(self):
        return self._inputs

    def run(self, _out, feed):
        return self.fn(feed)


def _assert_all_close(diffs, tol=1e-4):
    assert diffs, "driver produced no stage diffs"
    for d in diffs:
        assert d.max_abs <= tol, d.line()


# ------------------------------------------------------------------- Kani

@pytest.fixture(scope="module")
def kani_setup():
    from tests.test_kani import TINY, TINY_CODEC
    from tts_tpu.models.kani import init_params
    from tts_tpu.models.nanocodec import init_params as codec_init

    params = init_params(TINY, jax.random.key(0))
    cparams = codec_init(TINY_CODEC, jax.random.key(1))
    return params, TINY, cparams, TINY_CODEC


def _kani_mocks(params, cfg, cparams, ccfg, corrupt_main=False):
    from tts_tpu.models.kani import embed_tokens, init_state, kani_step
    from tts_tpu.models.nanocodec import (fsq_dequantize, hifigan_decode,
                                          tokens_to_codes)

    n_attn = sum(1 for t in cfg.layer_types if t == "attn")
    n_conv = len(cfg.layer_types) - n_attn
    kv_inputs = ([(f"in_key_{i}", (1, cfg.num_kv_heads, 1, cfg.head_dim,
                                   "hist")) for i in range(n_attn)]
                 + [(f"in_value_{i}", (1, cfg.num_kv_heads, 1, "hist",
                                       cfg.head_dim)) for i in range(n_attn)]
                 + [(f"in_conv_{i}", (1, cfg.hidden_size, 2))
                    for i in range(n_conv)])

    def embed_fn(feed):
        ids = feed["input_ids"]
        return [np.asarray(embed_tokens(params, jnp.asarray(ids)))]

    def main_fn(feed):
        hidden = feed["hidden_states"]
        logits, _ = kani_step(params, jnp.asarray(hidden),
                              init_state(cfg), cfg)
        logits = np.asarray(logits)
        if corrupt_main:
            logits = logits + 1.0
        pads = [np.zeros(1, np.float32)] * len(kv_inputs)
        return pads + [logits, np.array([hidden.shape[1]], np.int64)]

    def codec_fn(feed):
        toks = feed["save_id"]
        start = cfg.vocab_size - ccfg.num_groups * ccfg.codebook_size
        codes = tokens_to_codes(jnp.asarray(toks), ccfg, start)
        wav = hifigan_decode(cparams, fsq_dequantize(codes, ccfg), ccfg)
        return [(np.clip(np.asarray(wav), -1, 1) * 32767).astype(np.int16)]

    return {
        "embed": MockSession([("input_ids", (1, "T"))], embed_fn),
        "main": MockSession(
            kv_inputs + [("hidden_states", (1, "T", cfg.hidden_size)),
                         ("history_len", (1,)), ("ids_len", (1,))], main_fn),
        "codec": MockSession([("save_id", (1, "N")), ("num_decode", (1,))],
                             codec_fn),
    }


def test_kani_session_driver(kani_setup):
    params, cfg, cparams, ccfg = kani_setup
    mocks = _kani_mocks(params, cfg, cparams, ccfg)
    diffs = kani_session_stages(mocks, params, cfg, cparams, ccfg)
    assert [d.stage for d in diffs] == ["kani/embed", "kani/main_step",
                                       "kani/codec"]
    _assert_all_close(diffs)


def test_kani_corruption_localizes(kani_setup):
    params, cfg, cparams, ccfg = kani_setup
    mocks = _kani_mocks(params, cfg, cparams, ccfg, corrupt_main=True)
    diffs = {d.stage: d for d in
             kani_session_stages(mocks, params, cfg, cparams, ccfg)}
    assert diffs["kani/embed"].max_abs <= 1e-4
    assert diffs["kani/codec"].max_abs <= 1e-4
    assert diffs["kani/main_step"].max_abs >= 0.5


# --------------------------------------------------------------- IndexTTS

def test_indextts_session_driver():
    from tests.test_indextts import TINY as cfg
    from tts_tpu.models.indextts import (gpt_embed_mel, gpt_embed_text,
                                         gpt_step, init_gpt_params)

    params = init_gpt_params(cfg, jax.random.key(0))

    def b_fn(feed):
        return [np.asarray(gpt_embed_text(params,
                                          jnp.asarray(feed["text_ids"])))]

    def c_fn(feed):
        return [np.asarray(gpt_embed_mel(
            params, jnp.asarray(feed["gpt_ids"]),
            int(feed["kv_seq_len"][0])))]

    def e_fn(feed):
        kv = KVCache.create(cfg.gpt_layers, 1, cfg.gpt_heads,
                            cfg.max_seq_len, cfg.gpt_head_dim, jnp.float32)
        logits, last, _ = gpt_step(
            params, jnp.asarray(feed["hidden_states"]), kv,
            jnp.asarray(feed["repeat_penality"]), cfg)
        max_id = np.argmax(np.asarray(logits), -1).astype(np.int64)
        pads = [np.zeros(1, np.float32)] * (2 * cfg.gpt_layers)
        return pads + [np.array([feed["hidden_states"].shape[1]], np.int64),
                       np.asarray(last), max_id]

    kv_ins = ([(f"in_key_{i}", (cfg.gpt_heads, cfg.gpt_head_dim, "T"))
               for i in range(cfg.gpt_layers)]
              + [(f"in_value_{i}", (cfg.gpt_heads, "T", cfg.gpt_head_dim))
                 for i in range(cfg.gpt_layers)])
    mocks = {
        "b": MockSession([("text_ids", (1, "T"))], b_fn),
        "c": MockSession([("gpt_ids", (1, 1)), ("kv_seq_len", (1,))], c_fn),
        "e": MockSession(
            kv_ins + [("history_len", (1,)),
                      ("repeat_penality", (1, cfg.num_mel_codes)),
                      ("ids_len", (1,)),
                      ("hidden_states", (1, "T", cfg.gpt_dim)),
                      ("attention_mask_flag", (1,))], e_fn),
    }
    diffs = indextts_session_stages(mocks, params, cfg)
    assert [d.stage for d in diffs] == [
        "indextts/text_embed", "indextts/step_embed",
        "indextts/gpt_step_hidden", "indextts/gpt_step_argmax"]
    _assert_all_close(diffs)


# ------------------------------------------------------------------- Qwen

def test_qwen_session_driver():
    from tests.test_qwen import TINY as cfg
    from tests.test_qwen import TINY_CODEC as ccfg
    from tts_tpu.models.qwen_codec import codec_decode
    from tts_tpu.models.qwen_codec import init_decoder_params as codec_init
    from tts_tpu.models.qwen_tts import (init_predictor_params,
                                         init_talker_params,
                                         qwen3_stack_step, talker_logits)

    params = {**init_talker_params(cfg, jax.random.key(0)),
              **init_predictor_params(cfg, jax.random.key(1))}
    cparams = codec_init(ccfg, jax.random.key(2))
    tcfg, pcfg = cfg.talker, cfg.predictor

    def main_fn(feed):
        kv = KVCache.create(tcfg.num_layers, 1, tcfg.num_kv_heads,
                            tcfg.max_seq_len, tcfg.head_dim, jnp.float32)
        s = feed["hidden_states"].shape[1]
        h, _ = qwen3_stack_step(params["talker"],
                                jnp.asarray(feed["hidden_states"]), kv,
                                tcfg, params["rope_cos"][:s],
                                params["rope_sin"][:s])
        logits = talker_logits(params, h, cfg)
        pads = [np.zeros(1, np.float32)] * (2 * tcfg.num_layers)
        return pads + [np.asarray(h), np.asarray(logits)]

    # stateful predictor mock: threads a real KVCache across calls,
    # projecting every input through small_to_mtp at entry (:1196)
    state = {"kv": None}

    def predictor_fn(feed):
        hidden = jnp.asarray(feed["hidden_states"])
        proj = jnp.matmul(hidden, params["small_to_mtp"])
        if state["kv"] is None or hidden.shape[1] > 1:
            state["kv"] = KVCache.create(
                pcfg.num_layers, 1, pcfg.num_kv_heads, pcfg.max_seq_len,
                pcfg.head_dim, jnp.float32)
        kv = state["kv"]
        pos = int(kv.length)
        s = hidden.shape[1]
        h, kv = qwen3_stack_step(
            params["predictor"], proj, kv, pcfg,
            params["pred_rope_cos"][pos:pos + s],
            params["pred_rope_sin"][pos:pos + s])
        state["kv"] = kv
        pads = [np.zeros(1, np.float32)] * (2 * pcfg.num_layers)
        return pads + [np.asarray(h)]

    kv_ins = ([(f"in_key_{i}", (1, pcfg.num_kv_heads, 1, pcfg.head_dim, "T"))
               for i in range(pcfg.num_layers)]
              + [(f"in_value_{i}", (1, pcfg.num_kv_heads, 1, "T",
                                    pcfg.head_dim))
                 for i in range(pcfg.num_layers)])
    sessions = {
        "main": MockSession(
            [(f"k_{i}", (1,)) for i in range(2 * tcfg.num_layers)]
            + [("hidden_states", (1, "T", tcfg.hidden_size)),
               ("rotary_cos", (1, "T", tcfg.head_dim)),
               ("rotary_sin", (1, "T", tcfg.head_dim)),
               ("attention_mask", (1, 1, "T", "T"))], main_fn),
        "predictor": MockSession(
            kv_ins + [("hidden_states", (1, "T", tcfg.hidden_size)),
                      ("rotary_cos", (1, "T", pcfg.head_dim)),
                      ("rotary_sin", (1, "T", pcfg.head_dim)),
                      ("attention_mask", (1, 1, "T", "T"))], predictor_fn),
        "decoder": MockSession(
            [("codec_ids", (1, "N"))],
            lambda feed: [
                (np.clip(np.asarray(codec_decode(
                    cparams,
                    jnp.asarray(feed["codec_ids"].reshape(
                        1, -1, ccfg.num_quantizers).astype(np.int32)),
                    ccfg)), -1, 1) * 32767).astype(np.int16)]),
    }
    for g in range(cfg.num_code_groups - 1):
        def lm_fn(feed, g=g):
            return [np.asarray(
                jnp.matmul(jnp.asarray(feed["last_hidden_state"]),
                           params["lm_heads"][g]))]

        def emb_fn(feed, g=g):
            tok = int(feed["input_ids"].reshape(-1)[0])
            return [np.asarray(params["group_embeds"][g][tok])[None, None]]

        sessions[f"lm_head_{g}"] = MockSession(
            [("last_hidden_state", (1, pcfg.hidden_size))], lm_fn)
        sessions[f"embed_d_{g}"] = MockSession(
            [("input_ids", (1, 1))], emb_fn)

    diffs = qwen_session_stages(sessions, params, cfg, cparams, ccfg)
    assert [d.stage for d in diffs] == [
        "qwen/talker_hidden", "qwen/talker_logits", "qwen/predictor_frame",
        "qwen/codec_decode"]
    _assert_all_close(diffs)


# ----------------------------------------------------------------- VoxCPM

def test_voxcpm_session_driver():
    from tests.test_voxcpm import TINY as cfg
    from tts_tpu.models.voxcpm import (cfm_feat_decoder, feat_encoder_cond,
                                       init_params, init_vae_params,
                                       vae_decode, voxcpm_main_step)

    params = init_params(cfg, jax.random.key(0))
    vae_params = init_vae_params(cfg.vae, jax.random.key(1))

    def fe_fn(feed):
        fe, fc = feat_encoder_cond(params, jnp.asarray(feed["audio_feat"]),
                                   cfg)
        return [np.asarray(fe), np.asarray(fc)]

    def main_fn(feed):
        base_kv = KVCache.create(cfg.base.num_layers, 1,
                                 cfg.base.num_kv_heads,
                                 cfg.base.max_seq_len, cfg.base.head_dim,
                                 jnp.float32)
        res_kv = KVCache.create(cfg.residual.num_layers, 1,
                                cfg.residual.num_kv_heads,
                                cfg.residual.max_seq_len,
                                cfg.residual.head_dim, jnp.float32)
        dit, stop, _, _ = voxcpm_main_step(
            params, jnp.asarray(feed["hidden_states"]),
            jnp.asarray(feed["feat_embed"]),
            int(feed["concat_text_len"][0]), base_kv, res_kv, cfg)
        n_kv = 2 * (cfg.base.num_layers + cfg.residual.num_layers)
        pads = [np.zeros(1, np.float32)] * n_kv
        return pads + [np.asarray(dit),
                       np.asarray(stop, np.int64).reshape(1),
                       np.zeros((1, cfg.patch_size, cfg.vae.latent_dim),
                                np.float32)]

    def fd_fn(feed):
        out = cfm_feat_decoder(params, jnp.asarray(feed["random"]),
                               jnp.asarray(feed["dit_hidden"]),
                               jnp.asarray(feed["feat_cond"]), cfg)
        return [np.asarray(out)]

    def vae_fn(feed):
        wav = vae_decode(vae_params["dec"], jnp.asarray(feed["latent_pred"]),
                         cfg.vae)
        return [(np.clip(np.asarray(wav), -1, 1) * 32767).astype(np.int16)]

    n_kv = 2 * (cfg.base.num_layers + cfg.residual.num_layers)
    sessions = {
        "feat_encoder": MockSession(
            [("audio_feat", ("T", cfg.patch_size, cfg.vae.latent_dim))],
            fe_fn),
        "main": MockSession(
            [(f"kv_{i}", (1,)) for i in range(n_kv)]
            + [("feat_embed", (1, "T", cfg.base.hidden_size)),
               ("concat_text_len", (1,)),
               ("hidden_states", (1, "T", cfg.base.hidden_size)),
               ("rotary_cos", (1, "T", cfg.base.head_dim)),
               ("rotary_sin", (1, "T", cfg.base.head_dim)),
               ("attention_mask", (1, 1, "T", "T"))], main_fn),
        "feat_decoder": MockSession(
            [("random", (1, cfg.patch_size, cfg.vae.latent_dim)),
             ("dit_hidden", (1, 1, cfg.estimator.hidden_size)),
             ("feat_cond", (2, cfg.patch_size, cfg.estimator.hidden_size)),
             ("cfg_value", (1,)), ("cfg_value_minus", (1,))], fd_fn),
        "vae_decoder": MockSession(
            [("latent_pred", (1, "T", cfg.vae.latent_dim))], vae_fn),
    }
    diffs = voxcpm_session_stages(sessions, params, cfg,
                                  vae_params=vae_params["dec"])
    assert [d.stage for d in diffs] == [
        "voxcpm/feat_embed", "voxcpm/feat_cond", "voxcpm/main_dit_hidden",
        "voxcpm/feat_decoder", "voxcpm/vae_decode"]
    _assert_all_close(diffs)
