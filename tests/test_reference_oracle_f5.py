"""Reference-code oracles for the F5 transformer cores (VERDICT r4 item 2).

The DSP/codec oracles (test_reference_oracle*.py) pin the edges; these
pin the model's heart: the reference's OWN modified DiT backbone
(F5_TTS/modeling_modified/F5/dit.py:93-220 + modules.py:149-698), its
export-script Euler integrator (Export_F5.py:144-182 F5Transformer), and
the modified Vocos backbone + ISTFT head
(modeling_modified/vocos/models.py:26-83 + heads.py:26-59) are executed
in torch with shared random weights and diffed against tts_tpu's
models/f5.dit_forward / f5_denoise and models/vocos.vocos_decode fed by
the same weights through weights/f5_loader.

Layout notes (all load-time folds, oracle-checked here):
  * the export pre-scales to_q/to_k by head_dim**-0.25
    (Export_F5.py:329-333); our loader folds the same scale, so the
    reference model is scaled in-place AFTER its state dict is taken;
  * the reference preprocess builds fp16-rounded interleaved-pair rope
    tables (Export_F5.py:107-112); our loader keeps fp32 tables in the
    half-split layout (models/f5.hs_perm) — for an exact diff the test
    overrides our tables with the fp16-rounded values, permuted;
  * the modified Vocos replaces nn.LayerNorm with an L2-normalize fold
    (models.py:80,83, modules.py:48: w*sqrt(C) folded at export,
    Export_F5.py:390-402) — i.e. RMS-norm WITHOUT mean subtraction.
    tts_tpu keeps the upstream (charactr/vocos) true-LayerNorm
    semantics. The exact Vocos oracle therefore uses weights whose
    channel sums are zero (mean-free activations by construction, where
    LN == the reference fold); a second test quantifies the deviation
    on unconstrained weights — it measures the reference's OWN
    approximation error, which tts_tpu does not reproduce.
"""
import math
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
    load_f5_dit,
    load_vocos_heads,
    load_vocos_modules,
    stub,
)

from tts_tpu.models.f5 import F5Config, hs_perm, text_embedding  # noqa: E402
from tts_tpu.weights.f5_loader import f5_params_from_state_dict  # noqa: E402

# tiny but structurally faithful config: CFG pair, 2 blocks, grouped
# conv-pos (dim % 16 == 0), 2 ConvNeXtV2 text blocks
CFG = F5Config(dim=64, depth=2, heads=2, head_dim=32, ff_mult=2,
               text_dim=24, conv_layers=2, conv_mult=2, n_mels=10,
               vocab_size=20, nfe_steps=8, max_signal_len=128)
T = 64


def _tiny_ref_dit(seed=0):
    """Reference DiT with randomized weights. Returns (ref_model,
    state_dict_before_export_folds). The model itself is then q/k
    pre-scaled in place exactly like Export_F5.py:329-333 (the form its
    AttnProcessor expects — softmax(q@k) with no runtime scale)."""
    dit_mod, _modules = load_f5_dit()
    torch.manual_seed(seed)
    ref = dit_mod.DiT(dim=CFG.dim, depth=CFG.depth, heads=CFG.heads,
                      dim_head=CFG.head_dim, ff_mult=CFG.ff_mult,
                      mel_dim=CFG.n_mels, text_num_embeds=CFG.vocab_size,
                      text_dim=CFG.text_dim, conv_layers=CFG.conv_layers,
                      dropout=0.0).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0, 0.05)
    sd = {f"transformer.{k}": v.detach().numpy().copy()
          for k, v in ref.state_dict().items()}
    scale = CFG.head_dim ** -0.25
    with torch.no_grad():
        for blk in ref.transformer_blocks:
            blk.attn.to_q.weight.data *= scale
            blk.attn.to_q.bias.data *= scale
            blk.attn.to_k.weight.data *= scale
            blk.attn.to_k.bias.data *= scale
    return ref, sd


def _ref_rope(head_dim, t, num_head):
    """F5Preprocess rope tables (Export_F5.py:107-112): interleaved
    pairs, fp16-rounded. Returns (cos, sin) numpy (t, head_dim) fp32 and
    the (2, H, t, d) / transposed torch tensors the reference forward
    takes."""
    inv = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2, dtype=np.float64)
                             / head_dim))
    freqs = np.outer(np.arange(t, dtype=np.float64), inv)
    emb = np.repeat(freqs, 2, axis=-1)
    cos = np.float32(np.float16(np.cos(emb)))
    sin = np.float32(np.float16(np.sin(emb)))
    to_q = lambda a: torch.from_numpy(a)[None, None].expand(
        2, num_head, t, head_dim).contiguous()
    return cos, sin, to_q(cos), to_q(sin), \
        to_q(cos).transpose(-1, -2).contiguous(), \
        to_q(sin).transpose(-1, -2).contiguous()


def _our_params(sd, rope_cos, rope_sin):
    params = f5_params_from_state_dict(sd, CFG, jnp.float32)
    p = hs_perm(CFG.head_dim)
    return {**params,
            "rope_cos": jnp.asarray(rope_cos[:, p]),
            "rope_sin": jnp.asarray(rope_sin[:, p])}


def test_f5_dit_backbone_oracle():
    """Full modified-DiT forward (dit.py:205-220: input_embed CFG pair ->
    DiTBlocks -> AdaLN_final -> proj_out) vs models/f5.dit_forward."""
    from tts_tpu.models.f5 import dit_forward

    ref, sd = _tiny_ref_dit()
    cos, sin, rcq, rsq, rck, rsk = _ref_rope(CFG.head_dim, T, CFG.heads)
    params = _our_params(sd, cos, sin)

    rng = np.random.default_rng(1)
    noise = rng.standard_normal((1, T, CFG.n_mels)).astype(np.float32)
    cond = (rng.standard_normal((1, T, CFG.n_mels + CFG.text_dim))
            .astype(np.float32) * 0.5)
    cond_drop = (rng.standard_normal(cond.shape).astype(np.float32) * 0.5)
    step = 3
    t_emb = np.asarray(params["time_table"][step])                # (dim,)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(noise), torch.from_numpy(cond),
            torch.from_numpy(cond_drop),
            torch.from_numpy(t_emb).reshape(1, 1, -1),
            rcq, rsq, rck, rsk).numpy()                           # (2, T, M)

    pred, pred1 = dit_forward(
        params, jnp.asarray(noise), jnp.asarray(cond),
        jnp.asarray(cond_drop), params["time_table"][step],
        params["rope_cos"][:T], params["rope_sin"][:T], CFG,
        kv_len=jnp.int32(T), step_idx=step)
    ours = np.concatenate([np.asarray(pred), np.asarray(pred1)], axis=0)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=2e-3)


def test_f5_text_embedding_oracle():
    """TextEmbedding cond + drop rows (dit.py:32-73): +1/zero-pad id
    contract, sinus pos table, ConvNeXtV2 stack with filler re-masking
    after (and BEFORE) every block."""
    ref, sd = _tiny_ref_dit(seed=2)
    cos, sin, *_ = _ref_rope(CFG.head_dim, T, CFG.heads)
    params = _our_params(sd, cos, sin)

    raw = np.array([[5, 0, 7, 19, 3, 3, 11, -1, -1]], np.int32)
    padded = np.zeros((1, T), np.int64)
    padded[0, :raw.shape[1]] = raw[0] + 1                         # ids+1, 0-pad
    with torch.no_grad():
        ref_text, ref_drop = ref.text_embed(torch.from_numpy(padded), T)

    text, drop = text_embedding(params, jnp.asarray(raw), T, CFG)
    np.testing.assert_allclose(np.asarray(text), ref_text.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(drop), ref_drop.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_f5_euler_loop_oracle():
    """The export-script integrator (Export_F5.py:144-182 F5Transformer:
    precomputed time_expand/delta_t tables + 7 CFG-Euler steps over the
    reference DiT) vs models/f5.f5_denoise's lax.scan."""
    from tts_tpu.models.f5 import f5_denoise

    ref, sd = _tiny_ref_dit(seed=3)
    cos, sin, rcq, rsq, rck, rsk = _ref_rope(CFG.head_dim, T, CFG.heads)
    params = _our_params(sd, cos, sin)

    F5Transformer = extract_export_class("F5_TTS/Export_F5.py",
                                         "F5Transformer",
                                         extra_globals={"math": math})

    # Export_F5.py:152 hardcodes time_mlp_dim=1024 (its target checkpoint
    # width); a data-descriptor re-points the constant at the tiny test
    # dim without editing any executed reference line.
    class TinyF5Transformer(F5Transformer):
        time_mlp_dim = property(lambda self: CFG.dim,
                                lambda self, v: None)

    ft = TinyF5Transformer(SimpleNamespace(transformer=ref),
                           cfg=CFG.cfg_strength, steps=CFG.nfe_steps,
                           sway_coef=CFG.sway_coef, dtype=torch.float32,
                           fuse_step=1)

    # the loader's precomputed tables equal the export script's
    np.testing.assert_allclose(np.asarray(params["time_table"]),
                               ft.time_expand[0, :, :CFG.dim].detach().numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(params["delta_t"]),
                               ft.delta_t.detach().numpy(), atol=1e-6)

    rng = np.random.default_rng(4)
    noise0 = rng.standard_normal((1, T, CFG.n_mels)).astype(np.float32)
    cond = (rng.standard_normal((1, T, CFG.n_mels + CFG.text_dim))
            .astype(np.float32) * 0.5)
    cond_drop = (rng.standard_normal(cond.shape).astype(np.float32) * 0.5)

    noise = torch.from_numpy(noise0.copy())
    step_t = torch.tensor([0], dtype=torch.int32)
    with torch.no_grad():
        for _ in range(CFG.nfe_steps - 1):
            noise, step_t = ft(noise, rcq, rsq, rck, rsk,
                               torch.from_numpy(cond),
                               torch.from_numpy(cond_drop), step_t)

    ours = f5_denoise(params, jnp.asarray(noise0), jnp.asarray(cond),
                      jnp.asarray(cond_drop), CFG)
    np.testing.assert_allclose(np.asarray(ours), noise.numpy(),
                               atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------- Vocos

VDIM, VINTER, VLAYERS = 32, 64, 2
VNFFT, VHOP = 64, 16
N_MELS = CFG.n_mels


def _vocos_cfg():
    from tts_tpu.models.vocos import VocosConfig

    return VocosConfig(input_channels=N_MELS, dim=VDIM,
                       intermediate_dim=VINTER, num_layers=VLAYERS,
                       n_fft=VNFFT, hop=VHOP)


def _tiny_ref_vocos(seed=0, centered=True):
    """Reference modified VocosBackbone + ISTFTHead with randomized
    weights. Returns (backbone, head, state_dict_before_folds); the torch
    modules are then export-folded in place (Export_F5.py:390-402 — the
    form the modified forwards expect).

    centered=True constrains the weights so every norm input has an exact
    zero channel-mean (embed/pwconv2 out-channels sum to zero; dwconv
    kernels shared across channels) — there the reference's L2-normalize
    fold and tts_tpu's true LayerNorm coincide and the oracle is exact.
    The gamma fold stays nontrivial: pwconv2 is centered in FOLDED space
    (gamma * w) and divided back by gamma."""
    _modules, models = load_vocos_modules()
    heads = load_vocos_heads()
    torch.manual_seed(seed)
    bb = models.VocosBackbone(input_channels=N_MELS, dim=VDIM,
                              intermediate_dim=VINTER,
                              num_layers=VLAYERS).eval()
    hd = heads.ISTFTHead(dim=VDIM, n_fft=VNFFT, hop_length=VHOP).eval()
    with torch.no_grad():
        for p in bb.parameters():
            p.normal_(0, 0.3)
        for p in hd.parameters():
            p.normal_(0, 0.05)
        for norm in [bb.norm, bb.final_layer_norm] + \
                [blk.norm for blk in bb.convnext]:
            norm.weight.copy_(1.0 + 0.2 * torch.randn(VDIM))
            norm.bias.copy_(0.1 * torch.randn(VDIM))
        for blk in bb.convnext:
            blk.gamma.copy_(0.5 + torch.rand(VDIM))
        if centered:
            bb.embed.weight -= bb.embed.weight.mean(dim=0, keepdim=True)
            bb.embed.bias -= bb.embed.bias.mean()
            # bb.norm's OUTPUT feeds the first block's dwconv, so it must
            # stay zero-mean as well: constant weight (a normalized vector
            # has zero channel-sum on both the LN and L2 paths) + centered
            # bias
            bb.norm.weight.fill_(1.3)
            bb.norm.bias -= bb.norm.bias.mean()
            for blk in bb.convnext:
                blk.dwconv.weight.copy_(
                    blk.dwconv.weight[:1].expand_as(blk.dwconv.weight))
                blk.dwconv.bias -= blk.dwconv.bias.mean()
                v = torch.randn(VDIM, VINTER) * 0.3
                v -= v.mean(dim=0, keepdim=True)
                blk.pwconv2.weight.copy_(v / blk.gamma[:, None])
                b = torch.randn(VDIM) * 0.1
                blk.pwconv2.bias.copy_((b - b.mean()) / blk.gamma)
    sd = {}
    for k, v in bb.state_dict().items():
        sd[f"backbone.{k}"] = v.detach().numpy().copy()
    for k, v in hd.state_dict().items():
        sd[f"head.{k}"] = v.detach().numpy().copy()
    # export folds (Export_F5.py:390-402), in place on the torch modules
    with torch.no_grad():
        rt = math.sqrt(float(VDIM))
        for norm in [bb.norm, bb.final_layer_norm]:
            norm.weight.data = (norm.weight.data * rt).view(1, -1, 1)
            norm.bias.data = norm.bias.data.view(1, -1, 1)
        hd.out.bias.data = hd.out.bias.data.view(1, -1, 1)
        for blk in bb.convnext:
            blk.norm.weight.data = (blk.norm.weight.data * rt).view(1, -1, 1)
            blk.norm.bias.data = blk.norm.bias.data.view(1, -1, 1)
            blk.pwconv1.weight.data = blk.pwconv1.weight.data.unsqueeze(0)
            blk.pwconv1.bias.data = blk.pwconv1.bias.data.view(1, -1, 1)
            blk.pwconv2.weight.data = (blk.gamma.data.unsqueeze(-1)
                                       * blk.pwconv2.weight.data).unsqueeze(0)
            blk.pwconv2.bias.data = (blk.gamma.data
                                     * blk.pwconv2.bias.data).view(1, -1, 1)
    return bb, hd, sd


def _ref_istft(n_frames):
    from oracle_loader import load_stft_process

    stft_mod = load_stft_process("F5_TTS")
    return stft_mod.STFT_Process(
        model_type="istft_A", n_fft=VNFFT, win_length=VNFFT, hop_len=VHOP,
        max_frames=n_frames, window_type="hann").eval()


def _vocos_wavs(seed, centered):
    from tts_tpu.models.vocos import vocos_decode
    from tts_tpu.weights.f5_loader import vocos_params_from_state_dict

    bb, hd, sd = _tiny_ref_vocos(seed=seed, centered=centered)
    vcfg = _vocos_cfg()
    vparams = vocos_params_from_state_dict(sd, vcfg, jnp.float32)
    rng = np.random.default_rng(seed + 10)
    frames = 24
    mel = rng.standard_normal((1, frames, N_MELS)).astype(np.float32)
    with torch.no_grad():
        mag, ph = hd(bb(torch.from_numpy(np.swapaxes(mel, 1, 2).copy())))
        wav_ref = _ref_istft(frames)(mag, ph).numpy().reshape(-1)
    wav = np.asarray(vocos_decode(vparams, jnp.asarray(mel), vcfg)).reshape(-1)
    n = min(wav.shape[-1], wav_ref.shape[-1])
    return wav[:n], wav_ref[:n]


def test_vocos_backbone_head_oracle_exact():
    """Modified Vocos backbone + ISTFT head + custom istft_A
    (models.py:78-83, heads.py:44-59, STFT_Process istft_A) vs
    models/vocos.vocos_decode on mean-free weights (module docstring):
    every fold — sqrt(C) norm, gamma->pwconv2, exp/clip magnitude,
    matmul ISTFT — checked exactly."""
    wav, wav_ref = _vocos_wavs(seed=7, centered=True)
    np.testing.assert_allclose(wav, wav_ref, atol=2e-4, rtol=1e-3)


def test_vocos_ln_fold_deviation_bounded():
    """Unconstrained weights: the residual IS the reference's own
    LayerNorm->L2-normalize approximation (models.py:80,83), which
    tts_tpu does not reproduce (it keeps upstream true-LN semantics).
    Asserts the deviation is visible (the exact test above is not
    vacuous) yet bounded."""
    wav, wav_ref = _vocos_wavs(seed=8, centered=False)
    denom = np.linalg.norm(wav_ref) + 1e-9
    rel = np.linalg.norm(wav - wav_ref) / denom
    assert 1e-5 < rel < 0.5, rel


# ------------------------------------------------- full-pipeline mel-L1


def test_f5_full_pipeline_composition_oracle():
    """In-env analog of the BASELINE mel-L1 acceptance (VERDICT r4 item
    5): the reference's OWN three export graphs — F5Preprocess (custom
    STFT + fbank + text embed + rope, Export_F5.py:98-141),
    F5Transformer x7 (:144-182), F5Decode (vocos + custom istft_A,
    :185-203) — composed end to end on shared random weights and matched
    noise, vs the same composition of tts_tpu stages (MelSpectrogram ->
    text_embedding -> f5_denoise -> vocos_decode). Final int16 audio is
    compared as mel-L1 under the 1e-2 budget; the denoised mel directly
    at 2e-3."""
    from tts_tpu.audio.mel import MelSpectrogram, mel_filterbank
    from tts_tpu.models.f5 import f5_denoise
    from tts_tpu.models.vocos import vocos_decode
    from tts_tpu.weights.f5_loader import vocos_params_from_state_dict
    from oracle_loader import load_stft_process

    ref, sd = _tiny_ref_dit(seed=5)
    cos, sin, rcq, rsq, rck, rsk = None, None, None, None, None, None
    bb, hd, vsd = _tiny_ref_vocos(seed=6, centered=True)
    vcfg = _vocos_cfg()
    vparams = vocos_params_from_state_dict(vsd, vcfg, jnp.float32)

    max_dur = 128
    rng = np.random.default_rng(11)
    audio_i16 = (rng.standard_normal(1600) * 3000).astype(np.int16)
    raw_ids = np.array([[5, 0, 7, 19, 3, 11, 2, 8]], np.int32)

    # --- reference side: the three export graphs ---
    stft_mod = load_stft_process("F5_TTS")
    custom_stft = stft_mod.STFT_Process(
        model_type="stft_B", n_fft=VNFFT, win_length=VNFFT, hop_len=VHOP,
        max_frames=0, window_type="hann").eval()

    def fbanks(n_freqs, f_min, f_max, n_mels, sr, norm, mel_scale):
        return torch.from_numpy(
            mel_filterbank(n_freqs, f_min, f_max, n_mels, sr, norm,
                           mel_scale))

    ta_fn = stub("torchaudio.functional", melscale_fbanks=fbanks)
    F5Preprocess = extract_export_class(
        "F5_TTS/Export_F5.py", "F5Preprocess",
        extra_globals={"MAX_SIGNAL_LENGTH": max_dur,
                       "torchaudio": stub("torchaudio", functional=ta_fn)})
    prep = F5Preprocess(SimpleNamespace(transformer=ref), custom_stft,
                        nfft=VNFFT, n_mels=N_MELS, sample_rate=24000,
                        num_head=CFG.heads, head_dim=CFG.head_dim,
                        target_rms=0.15, use_fp16=False)
    with torch.no_grad():
        (t_noise, rcq, rsq, rck, rsk, cmt_ref, cmtd_ref,
         ref_len) = prep(torch.from_numpy(audio_i16.copy()).reshape(1, 1, -1),
                         torch.from_numpy(raw_ids.copy()),
                         torch.tensor([max_dur], dtype=torch.long))

    F5Transformer = extract_export_class("F5_TTS/Export_F5.py",
                                         "F5Transformer",
                                         extra_globals={"math": math})

    class TinyF5Transformer(F5Transformer):
        time_mlp_dim = property(lambda self: CFG.dim, lambda self, v: None)

    ft = TinyF5Transformer(SimpleNamespace(transformer=ref),
                           cfg=CFG.cfg_strength, steps=CFG.nfe_steps,
                           sway_coef=CFG.sway_coef, dtype=torch.float32,
                           fuse_step=1)
    noise_t = t_noise.clone()
    step_t = torch.tensor([0], dtype=torch.int32)
    with torch.no_grad():
        for _ in range(CFG.nfe_steps - 1):
            noise_t, step_t = ft(noise_t, rcq, rsq, rck, rsk,
                                 cmt_ref, cmtd_ref, step_t)

    F5Decode = extract_export_class("F5_TTS/Export_F5.py", "F5Decode")
    custom_istft = stft_mod.STFT_Process(
        model_type="istft_A", n_fft=VNFFT, win_length=VNFFT, hop_len=VHOP,
        max_frames=max_dur, window_type="hann").eval()
    dec = F5Decode(SimpleNamespace(decode=lambda m: hd(bb(m))),
                   custom_istft, target_rms=0.15, use_fp16=False)
    with torch.no_grad():
        wav_ref = dec(noise_t, torch.tensor(int(ref_len))).numpy().reshape(-1)

    # --- tts_tpu side, same weights + the reference's own noise ---
    params = _our_params(sd, *(_ref_rope(CFG.head_dim, max_dur,
                                         CFG.heads)[:2]))
    melspec = MelSpectrogram(24000, VNFFT, VHOP, VNFFT, N_MELS)
    audio_f = jnp.asarray(audio_i16[None].astype(np.float32) / 32768.0)
    mel = melspec(audio_f)                                   # (1, F, M)
    our_ref_len = mel.shape[1]
    assert our_ref_len == int(ref_len)
    mel_p = jnp.pad(mel, ((0, 0), (0, max_dur - our_ref_len), (0, 0)))
    text, text_drop = text_embedding(params, jnp.asarray(raw_ids),
                                     max_dur, CFG)
    cmt = jnp.concatenate([mel_p, text], axis=-1)
    cmtd = jnp.concatenate([jnp.zeros_like(mel_p), text_drop], axis=-1)
    np.testing.assert_allclose(np.asarray(cmt), cmt_ref.numpy(),
                               atol=1e-4, rtol=1e-3)
    den = f5_denoise(params, jnp.asarray(t_noise.numpy()), cmt, cmtd, CFG)

    mel_l1_den = float(np.mean(np.abs(np.asarray(den) - noise_t.numpy())))
    assert mel_l1_den <= 2e-3, mel_l1_den

    wav = np.asarray(vocos_decode(vparams, den[:, our_ref_len:], vcfg))
    wav_i16 = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16).reshape(-1)

    n = min(wav_i16.shape[-1], wav_ref.shape[-1])
    m_ours = np.asarray(melspec(jnp.asarray(
        wav_i16[None, :n].astype(np.float32) / 32768.0)))
    m_ref = np.asarray(melspec(jnp.asarray(
        wav_ref[None, :n].astype(np.float32) / 32768.0)))
    mel_l1 = float(np.mean(np.abs(m_ours - m_ref)))
    assert mel_l1 <= 1e-2, mel_l1
