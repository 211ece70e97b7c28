"""Reference-code oracle for the Kani main LM (VERDICT r4 item 2): the
export wrapper KANITTS_MAIN (Kani_TTS/Export_Kani_TTS.py:200-471 —
sum-based RMS norms with absorbed weights, fused QKV with the combined
d^0.25 qk-norm scale, flip-based rope over fp16 [-sin,sin] buffers,
broadcast GQA, LFM2 short-conv mixer with 2-sample carried state,
embedding_norm absorbed into lm_head) executed in torch with shared
random weights, vs models/kani.kani_step through
weights/kani_loader.kani_params_from_state_dict.

The upstream LFM2/nemo module tree is not in the reference repo; the
test builds parameter CONTAINERS with the upstream attribute names
(q_proj/k_proj/v_proj/out_proj, q_layernorm, operator_norm/ffn_norm,
conv.in_proj/conv/out_proj, feed_forward.w1/w2/w3, pos_emb.inv_freq,
embedding_norm, lm_head). Every line of transformer/conv/norm MATH
executed on the reference side is KANITTS_MAIN's own forward; the only
container forwards invoked are standard torch Linear/Conv1d and the
LFM2 SwiGLU (w2(silu(w1 x) * w3 x)) the wrapper calls as
layer.feed_forward."""
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

from oracle_loader import extract_export_class  # noqa: E402

from tts_tpu.models.kani import KaniConfig, init_state, kani_step  # noqa: E402
from tts_tpu.weights.kani_loader import kani_params_from_state_dict  # noqa: E402

KCFG = KaniConfig(hidden_size=32, num_heads=4, num_kv_heads=2, head_dim=8,
                  ffn_dim=64, vocab_size=40,
                  layer_types=("conv", "attn", "conv", "attn"),
                  conv_kernel=3, rope_base=1e6, max_seq_len=32)


class _Holder(torch.nn.Module):
    pass


class _W(torch.nn.Module):
    def __init__(self, n):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.ones(n))


def _tiny_kani(seed=0):
    h, hd = KCFG.hidden_size, KCFG.head_dim
    torch.manual_seed(seed)

    class FF(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.w1 = torch.nn.Linear(h, KCFG.ffn_dim, bias=False)
            self.w3 = torch.nn.Linear(h, KCFG.ffn_dim, bias=False)
            self.w2 = torch.nn.Linear(KCFG.ffn_dim, h, bias=False)

        def forward(self, x):
            return self.w2(torch.nn.functional.silu(self.w1(x)) * self.w3(x))

    class Attn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.q_proj = torch.nn.Linear(h, KCFG.num_heads * hd, bias=False)
            self.k_proj = torch.nn.Linear(h, KCFG.num_kv_heads * hd,
                                          bias=False)
            self.v_proj = torch.nn.Linear(h, KCFG.num_kv_heads * hd,
                                          bias=False)
            self.out_proj = torch.nn.Linear(KCFG.num_heads * hd, h,
                                            bias=False)
            self.q_layernorm = _W(hd)
            self.k_layernorm = _W(hd)

    class Conv(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.in_proj = torch.nn.Linear(h, 3 * h, bias=False)
            self.conv = torch.nn.Conv1d(h, h, KCFG.conv_kernel, groups=h,
                                        padding=KCFG.conv_kernel - 1)
            self.out_proj = torch.nn.Linear(h, h, bias=False)

    class Layer(torch.nn.Module):
        def __init__(self, kind):
            super().__init__()
            self.is_attention_layer = kind == "attn"
            self.operator_norm = _W(h)
            self.ffn_norm = _W(h)
            self.feed_forward = FF()
            if self.is_attention_layer:
                self.self_attn = Attn()
            else:
                self.conv = Conv()

    model = _Holder()
    model.layers = torch.nn.ModuleList(
        [Layer(k) for k in KCFG.layer_types])
    model.embed_tokens = torch.nn.Embedding(KCFG.vocab_size, h)
    model.embedding_norm = _W(h)
    inv = 1.0 / (KCFG.rope_base ** (torch.arange(0, hd, 2).float() / hd))
    model.pos_emb = SimpleNamespace(inv_freq=inv, attention_scaling=1.0)
    kani = _Holder()
    kani.model = model
    kani.lm_head = torch.nn.Linear(h, KCFG.vocab_size, bias=False)
    with torch.no_grad():
        for n, p in kani.named_parameters():
            if "norm" in n:
                p.copy_(1.0 + 0.2 * torch.randn_like(p))
            else:
                p.normal_(0, 0.1)
    return kani


def test_kani_main_lm_oracle():
    kani = _tiny_kani()
    sd = {f"model.{k}": v.detach().numpy().copy()
          for k, v in kani.model.state_dict().items()}
    sd["lm_head.weight"] = kani.lm_head.weight.detach().numpy().copy()

    KANITTS_MAIN = extract_export_class(
        "Kani_TTS/Export_Kani_TTS.py", "KANITTS_MAIN",
        extra_globals={"USE_FLOAT16_KV": False,
                       "PREVENT_F16_OVERFLOW": False})
    ref = KANITTS_MAIN(kani, KCFG.max_seq_len, KCFG.num_heads,
                       KCFG.num_kv_heads, KCFG.head_dim,
                       len(KCFG.layer_types), KCFG.num_conv_layers,
                       KCFG.num_attn_layers)

    h = KCFG.hidden_size
    hd = KCFG.head_dim
    na, nc = KCFG.num_attn_layers, KCFG.num_conv_layers
    rng = np.random.default_rng(1)
    s = 6
    hiddens = rng.standard_normal((s, 1, 1, h)).astype(np.float32) * 0.5

    # KANITTS_MAIN applies NO attention mask (forward :436-440) — its
    # multi-token prefill is non-causal over the prompt (a deliberate
    # export simplification; a documented deviation caught by this
    # oracle when driven batch-wise). Token-by-token, the maskless graph
    # IS exactly causal — the semantics upstream LFM2 has and tts_tpu
    # keeps — so the oracle drives the reference one token at a time
    # (its own decode mode, Inference_Kani_TTS_ONNX.py:353).
    logits_ref = []
    with torch.no_grad():
        keys = [torch.zeros((1, KCFG.num_kv_heads, 1, hd, 0))
                for _ in range(na)]
        vals = [torch.zeros((1, KCFG.num_kv_heads, 1, 0, hd))
                for _ in range(na)]
        convs = [torch.zeros((1, h, KCFG.conv_kernel - 1))
                 for _ in range(nc)]
        hist = torch.tensor(0)
        for t in range(s):
            out = ref(*keys, *vals, *convs,
                      torch.from_numpy(hiddens[t].copy()), hist,
                      torch.tensor(1))
            logits_ref.append(out[-2].numpy())
            keys = list(out[:na])
            vals = list(out[na:2 * na])
            convs = [c.float() for c in out[2 * na:2 * na + nc]]
            hist = out[-1]

    params = kani_params_from_state_dict(sd, KCFG, jnp.float32)
    # the reference stores its rope buffers in fp16 (:264-266) and its
    # conv carries as half (:455) — mirror both roundings for an exact
    # per-token diff
    params = {**params,
              "rope_cos": jnp.asarray(np.float32(np.float16(
                  np.asarray(params["rope_cos"])))),
              "rope_sin": jnp.asarray(np.float32(np.float16(
                  np.asarray(params["rope_sin"]))))}
    from tts_tpu.models.kani import KaniState

    state = init_state(KCFG, 1, kv_dtype=jnp.float32)
    for t in range(s):
        logits, state = kani_step(params, jnp.asarray(hiddens[t]), state,
                                  KCFG)
        state = KaniState(state.kv, state.conv.astype(jnp.float16)
                          .astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(logits), logits_ref[t],
                                   atol=2e-5, rtol=2e-4)
