"""Reference-code oracles for the IndexTTS cores (VERDICT r4 item 2):
the export wrappers IndexTTS_A (conformer conditioning encoder +
perceiver resampler, Export_IndexTTS.py:74-201) and IndexTTS_E (GPT-2
AR decode step with penalty + greedy head, :238-289) executed in torch
with shared random weights, vs tts_tpu's models/indextts
conformer_encoder / perceiver_resample / gpt_step through
weights/indextts_loader.

IndexTTS_E runs over REAL HuggingFace GPT2 blocks (the upstream
UnifiedVoice inference_model is a GPT2LMHeadModel; ln_1/attn.c_attn/
mlp.c_fc/ln_f are the exact modules the reference folds in :249-266),
so every executed line is reference (export wrapper) or upstream (HF).

IndexTTS_A needs the upstream index-tts module tree, which the
reference repo does not ship; the test builds parameter CONTAINERS with
the upstream attribute names (espnet conformer layout — linear_q/
pos_bias_u/conv_module..., perceiver to_q/to_kv/latents). All the
conformer/perceiver MATH executed is the reference's own extracted
forward + rel_shift (:67-71, :131-175); only the few submodule calls it
makes as modules (embed.conv/out, norms, conv_module units,
feed_forward, perceiver ff) run through the containers' standard
torch layers. The speaker-encoder branch of graph A is covered by its
own goldens (test_indextts.py) and the Qwen ECAPA oracle.
"""
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

from oracle_loader import (  # noqa: E402
    extract_export_class,
    load_ref_module,
    shape_tensor,
    stub,
)

from tts_tpu.models.indextts import IndexTTSConfig  # noqa: E402

# ------------------------------------------------------------ IndexTTS_E

ICFG = IndexTTSConfig(gpt_dim=24, gpt_heads=2, gpt_layers=2,
                      num_mel_codes=30, num_text_tokens=10,
                      max_seq_len=32)


class _Holder(torch.nn.Module):
    pass


def _tiny_gpt2():
    from transformers import GPT2Config
    from transformers.models.gpt2.modeling_gpt2 import GPT2Model

    torch.manual_seed(0)
    g2 = GPT2Model(GPT2Config(
        vocab_size=ICFG.num_text_tokens, n_positions=64,
        n_embd=ICFG.gpt_dim, n_layer=ICFG.gpt_layers,
        n_head=ICFG.gpt_heads, n_inner=2 * ICFG.gpt_dim,
        activation_function="gelu_new", resid_pdrop=0.0, embd_pdrop=0.0,
        attn_pdrop=0.0)).eval()
    lm_head = torch.nn.Linear(ICFG.gpt_dim, ICFG.num_mel_codes)
    with torch.no_grad():
        for n, p in g2.named_parameters():
            if "ln" in n and n.endswith("weight"):
                p.copy_(1.0 + 0.2 * torch.randn_like(p))
            elif "ln" in n:
                p.copy_(0.1 * torch.randn_like(p))
            else:
                p.normal_(0, 0.1)
        lm_head.weight.normal_(0, 0.1)
        lm_head.bias.normal_(0, 0.1)
    return g2, lm_head


def test_indextts_gpt_step_oracle():
    """IndexTTS_E (:238-289: per-head q/k/v fold with d^-0.25, additive
    -128 causal mask, GPT2 block loop, ln_f + penalized lm_head + greedy
    argmax) over real HF GPT2 modules, prefill + one decode step, vs
    models/indextts.gpt_step through indextts_gpt_from_state_dict."""
    from tts_tpu.kv.cache import KVCache
    from tts_tpu.models.indextts import gpt_step
    from tts_tpu.weights.indextts_loader import indextts_gpt_from_state_dict

    g2, lm_head = _tiny_gpt2()
    d, L = ICFG.gpt_dim, ICFG.gpt_layers
    hd = ICFG.gpt_head_dim

    sd = {f"gpt.{k}": v.detach().numpy().copy()
          for k, v in g2.state_dict().items()}
    sd["mel_head.weight"] = lm_head.weight.detach().numpy().copy()
    sd["mel_head.bias"] = lm_head.bias.detach().numpy().copy()
    # embedding tables the loader maps but this test never reads
    rngf = np.random.default_rng(0)
    sd["text_embedding.weight"] = rngf.standard_normal(
        (ICFG.num_text_tokens, d)).astype(np.float32)
    sd["text_pos_embedding.emb.weight"] = rngf.standard_normal(
        (ICFG.max_text_tokens, d)).astype(np.float32)
    sd["mel_embedding.weight"] = rngf.standard_normal(
        (ICFG.num_mel_codes, d)).astype(np.float32)
    sd["mel_pos_embedding.emb.weight"] = rngf.standard_normal(
        (ICFG.max_mel_tokens, d)).astype(np.float32)
    sd["final_norm.weight"] = np.ones(d, np.float32)
    sd["final_norm.bias"] = np.zeros(d, np.float32)

    inference_model = _Holder()
    inference_model.transformer = g2
    inference_model.lm_head = lm_head
    gpt = _Holder()
    gpt.inference_model = inference_model

    IndexTTS_E = extract_export_class("IndexTTS/Export_IndexTTS.py",
                                      "IndexTTS_E")
    ref = IndexTTS_E(SimpleNamespace(gpt=gpt), num_layers=L,
                     max_seq_len=ICFG.max_seq_len)

    rng = np.random.default_rng(1)
    s = 6
    hidden0 = rng.standard_normal((1, s, d)).astype(np.float32)
    pen0 = rng.uniform(0.5, 1.5, (1, ICFG.num_mel_codes)).astype(np.float32)
    hidden1 = rng.standard_normal((1, 1, d)).astype(np.float32)
    pen1 = rng.uniform(0.5, 1.5, (1, ICFG.num_mel_codes)).astype(np.float32)

    with torch.no_grad():
        keys = [torch.zeros((ICFG.gpt_heads, hd, 0)) for _ in range(L)]
        vals = [torch.zeros((ICFG.gpt_heads, 0, hd)) for _ in range(L)]
        out = ref(*keys, *vals, torch.tensor(0), torch.from_numpy(pen0),
                  torch.tensor(s), torch.from_numpy(hidden0.copy()),
                  torch.tensor(1.0))
        keys, vals = list(out[:L]), list(out[L:2 * L])
        last_ref0, ids_ref0 = out[-2].numpy(), int(out[-1])
        out = ref(*keys, *vals, out[2 * L], torch.from_numpy(pen1),
                  torch.tensor(1), torch.from_numpy(hidden1.copy()),
                  torch.tensor(0.0))          # decode: single query -> no mask
        last_ref1, ids_ref1 = out[-2].numpy(), int(out[-1])

    params = indextts_gpt_from_state_dict(sd, ICFG, jnp.float32)
    kv = KVCache.create(L, 1, ICFG.gpt_heads, ICFG.max_seq_len, hd,
                        jnp.float32)
    logits0, last0, kv = gpt_step(params, jnp.asarray(hidden0), kv,
                                  jnp.asarray(pen0), ICFG)
    logits1, last1, kv = gpt_step(params, jnp.asarray(hidden1), kv,
                                  jnp.asarray(pen1), ICFG)
    np.testing.assert_allclose(np.asarray(last0), last_ref0,
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(last1), last_ref1,
                               atol=2e-5, rtol=2e-4)
    assert int(jnp.argmax(logits0, axis=-1)[0]) == ids_ref0
    assert int(jnp.argmax(logits1, axis=-1)[0]) == ids_ref1


# ------------------------------------------------------------ IndexTTS_A

ACFG = IndexTTSConfig(enc_dim=32, enc_heads=2, enc_ff_dim=64,
                      enc_layers=2, enc_conv_kernel=7, n_mels=12,
                      num_latents=4, perceiver_heads=2,
                      perceiver_dim_head=8, gpt_dim=24)


def _conformer_containers(seed=2):
    """Upstream-attribute-named torch containers for the conformer +
    perceiver (see module docstring). Weights randomized; the raw state
    dict (before IndexTTS_A's in-place export folds) is snapshotted for
    the tts_tpu loaders."""
    d, h = ACFG.enc_dim, ACFG.enc_heads
    f_sub = ((ACFG.n_mels - 1) // 2 - 1) // 2

    torch.manual_seed(seed)

    class SelfAttn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.h = h
            self.d_k = d // h
            self.linear_q = torch.nn.Linear(d, d)
            self.linear_k = torch.nn.Linear(d, d)
            self.linear_v = torch.nn.Linear(d, d)
            self.linear_out = torch.nn.Linear(d, d)
            self.linear_pos = torch.nn.Linear(d, d, bias=False)
            self.pos_bias_u = torch.nn.Parameter(torch.zeros(h, d // h))
            self.pos_bias_v = torch.nn.Parameter(torch.zeros(h, d // h))

    class ConvModule(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pointwise_conv1 = torch.nn.Conv1d(d, 2 * d, 1)
            self.depthwise_conv = torch.nn.Conv1d(
                d, d, ACFG.enc_conv_kernel, groups=d,
                padding=(ACFG.enc_conv_kernel - 1) // 2)
            self.norm = torch.nn.LayerNorm(d)
            self.activation = torch.nn.SiLU()
            self.pointwise_conv2 = torch.nn.Conv1d(d, d, 1)

    class FeedForward(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.w_1 = torch.nn.Linear(d, ACFG.enc_ff_dim)
            self.w_2 = torch.nn.Linear(ACFG.enc_ff_dim, d)

        def forward(self, x):
            return self.w_2(torch.nn.functional.silu(self.w_1(x)))

    class EncoderLayer(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = SelfAttn()
            self.conv_module = ConvModule()
            self.feed_forward = FeedForward()
            self.norm_mha = torch.nn.LayerNorm(d)
            self.norm_conv = torch.nn.LayerNorm(d)
            self.norm_ff = torch.nn.LayerNorm(d)
            self.norm_final = torch.nn.LayerNorm(d)

    class Embed(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Sequential(
                torch.nn.Conv2d(1, d, 3, 2), torch.nn.ReLU(),
                torch.nn.Conv2d(d, d, 3, 2), torch.nn.ReLU())
            self.out = torch.nn.Sequential(torch.nn.Linear(d * f_sub, d))
            from tts_tpu.weights.indextts_loader import _rel_pos_table

            self.pos_enc = SimpleNamespace(
                pe=torch.from_numpy(_rel_pos_table(d, 256))[None],
                xscale=float(d) ** 0.5)

    class CondEncoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = Embed()
            self.encoders = torch.nn.ModuleList(
                [EncoderLayer() for _ in range(ACFG.enc_layers)])
            self.after_norm = torch.nn.LayerNorm(d)

    inner = ACFG.perceiver_heads * ACFG.perceiver_dim_head

    class PerceiverAttn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.heads = ACFG.perceiver_heads
            self.to_q = torch.nn.Linear(ACFG.gpt_dim, inner, bias=False)
            self.to_kv = torch.nn.Linear(ACFG.gpt_dim, 2 * inner, bias=False)
            self.to_out = torch.nn.Linear(inner, ACFG.gpt_dim, bias=False)

    class Perceiver(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj_context = torch.nn.Linear(d, ACFG.gpt_dim)
            self.latents = torch.nn.Parameter(
                torch.randn(ACFG.num_latents, ACFG.gpt_dim))
            self.layers = torch.nn.ModuleList([
                torch.nn.ModuleList([
                    PerceiverAttn(),
                    torch.nn.Sequential(
                        torch.nn.LayerNorm(ACFG.gpt_dim),
                        torch.nn.Linear(ACFG.gpt_dim, 2 * ACFG.gpt_dim),
                        torch.nn.GELU(),
                        torch.nn.Linear(2 * ACFG.gpt_dim, ACFG.gpt_dim)),
                ]) for _ in range(2)])
            self.norm = torch.nn.LayerNorm(ACFG.gpt_dim)

    gpt = _Holder()
    gpt.conditioning_encoder = CondEncoder()
    gpt.perceiver_encoder = Perceiver()
    with torch.no_grad():
        for n, p in gpt.named_parameters():
            if "norm" in n and n.endswith("weight"):
                p.copy_(1.0 + 0.2 * torch.randn_like(p))
            elif "norm" in n:
                p.copy_(0.1 * torch.randn_like(p))
            else:
                p.normal_(0, 0.1)
    return gpt


def test_indextts_conformer_perceiver_oracle():
    """IndexTTS_A's conformer + perceiver forward (:131-175: fbank mel,
    Conv2dSubsampling4 with xscale fold, rel-pos self-attention with the
    zero-pad rel_shift, GLU conv module, swish FF, perceiver
    cross-attention from learned latents over cat(latents, ctx)) vs
    conformer_encoder + perceiver_resample through the loaders. The
    reference wrapper mutates the module weights in place with its
    export folds (:94-129) — the raw state dict is snapshotted first,
    and tts_tpu's loaders apply their own equivalent folds."""
    from oracle_loader import load_stft_process

    from tts_tpu.audio.mel import MelSpectrogram, mel_filterbank
    from tts_tpu.models.indextts import conformer_encoder, perceiver_resample
    from tts_tpu.weights.indextts_loader import (
        indextts_conformer_from_state_dict,
        indextts_perceiver_from_state_dict,
    )

    gpt = _conformer_containers()
    sd_c = {f"conditioning_encoder.{k}": v.detach().numpy().copy()
            for k, v in gpt.conditioning_encoder.state_dict().items()}
    sd_p = {f"perceiver_encoder.{k}": v.detach().numpy().copy()
            for k, v in gpt.perceiver_encoder.state_dict().items()}

    # IndexTTS_A's full forward also runs the BigVGAN speaker branch;
    # this oracle targets the conformer+perceiver half, so the class's
    # __init__ folds + forward lines are executed through a trimmed
    # driver that follows :131-175 exactly — done by instantiating the
    # class with a stub bigvgan and stopping at conds_latent.
    class _StubSpeaker(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = torch.nn.ModuleList(
                [torch.nn.Identity(), torch.nn.Identity()])
            self.mfa = torch.nn.Identity()
            # shape-consistent only — this branch's output is not
            # compared (module docstring); 3C -> C like the real asp
            self.asp = SimpleNamespace(
                conv=torch.nn.Conv1d(3 * ACFG.n_mels, ACFG.n_mels, 1),
                tanh=torch.nn.Tanh(), tdnn=torch.nn.Identity())
            self.asp_bn = torch.nn.Identity()
            self.fc = torch.nn.Identity()

    class _StubBigVGAN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.speaker_encoder = _StubSpeaker()
            self.cond_layer = torch.nn.Identity()
            self.conds = torch.nn.ModuleList([torch.nn.Identity()])
            self.num_upsamples = 1

    rel_shift_src = load_ref_module  # noqa: F841  (doc pointer)
    import ast

    path = Path("/root/reference/IndexTTS/Export_IndexTTS.py")
    tree = ast.parse(path.read_text())
    ns = {"torch": torch}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and \
                node.name in ("rel_shift", "_compute_statistics",
                              "IndexTTS_A"):
            exec(compile(ast.Module(body=[node], type_ignores=[]),
                         str(path), "exec"), ns)

    n_fft, hop = 64, 16
    stft_mod = load_stft_process("IndexTTS")
    custom_stft = stft_mod.STFT_Process(
        model_type="stft_B", n_fft=n_fft, hop_len=hop, win_length=n_fft,
        max_frames=0, window_type="hann").eval()

    def fbanks(n_freqs, f_min, f_max, nm, sr, norm, mel_scale):
        return torch.from_numpy(
            mel_filterbank(n_freqs, f_min, f_max, nm, sr, norm, mel_scale))

    ns["torchaudio"] = stub("torchaudio", functional=stub(
        "torchaudio.functional", melscale_fbanks=fbanks))
    IndexTTS_A = ns["IndexTTS_A"]
    ref = IndexTTS_A(SimpleNamespace(bigvgan=_StubBigVGAN(), gpt=gpt),
                     custom_stft, nfft=n_fft, n_mels=ACFG.n_mels,
                     sample_rate=24000, max_signal_len=256)

    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(2000) * 3000).astype(np.int16)

    # --- tts_tpu side, same raw weights through the loaders ---
    cparams = indextts_conformer_from_state_dict(sd_c, ACFG, jnp.float32)
    # the reference keeps its positional table in fp16 (:83) and
    # upcasts at forward — mirror that rounding for an exact diff
    cparams = {**cparams, "pos_enc": jnp.asarray(
        np.float32(np.float16(np.asarray(cparams["pos_enc"]))))}
    pparams = indextts_perceiver_from_state_dict(sd_p, ACFG, jnp.float32)

    mel = MelSpectrogram(24000, n_fft, hop, n_fft, ACFG.n_mels,
                         pad_mode="constant")
    # IndexTTS_A pads with torch.randn at EXPORT time baked as constant;
    # runtime/indextts uses 100 ms of zeros — feed the reference the
    # same zeros
    with torch.no_grad():
        ref.audio_pad = torch.zeros_like(ref.audio_pad)
        outs = ref(shape_tensor(
            torch.from_numpy(audio.copy()).reshape(1, 1, -1)))
    conds_latent_ref = outs[-1].detach().numpy()

    audio_j = jnp.asarray(np.concatenate(
        [np.zeros(int(24000 * 0.1), np.float32),
         audio.astype(np.float32) / 32768.0])[None])
    m = mel(audio_j)
    ctx = conformer_encoder(cparams, m, ACFG)
    conds = perceiver_resample(pparams, ctx, ACFG)
    np.testing.assert_allclose(np.asarray(conds), conds_latent_ref,
                               atol=5e-4, rtol=5e-3)
