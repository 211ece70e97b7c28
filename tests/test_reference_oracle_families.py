"""Family-level reference-code oracles (VERDICT r3 item 2, round-4 set).

tests/test_reference_oracle.py covers the DSP layer (filters, STFT,
BigVGAN). These tests extend the same discipline — import and EXECUTE
the reference's own torch code with shared random weights — to the
remaining importable model stacks:

- VoxCPM v1.5 AudioVAE (modeling_modified/audio_vae.py) encode + decode
  vs weights/voxcpm_loader.vae_from_state_dict + models/voxcpm
- Qwen 12 Hz codec: the reference modeling classes
  (modeling_qwen3_tts_tokenizer_v2.py) assembled by the export script's
  own TTS_DECODER fold+forward code (Export_Qwen_TTS_ONNX.py:695-905)
  vs weights/qwen_loader.qwen_codec_from_state_dict + codec_decode
- Kani FSQ dequantization (NEMO_CODEC, Export_Kani_TTS.py:474-564)
  vs models/nanocodec.tokens_to_codes + fsq_dequantize
- Kani decode graphlets (FIRST/SECOND_BEAM_SEARCH, APPLY_PENALTY,
  Export_Kani_TTS.py:93-190) vs decoding/beam + sampling

Export-script classes cannot be imported whole (module level runs ORT
sessions), so oracle_loader.extract_export_class compiles the single
class's AST node — the lines executed are still the reference's own.
"""
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

from oracle_loader import (  # noqa: E402
    extract_export_class,
    load_qwen_tokenizer_v2,
    load_voxcpm_audio_vae,
    shape_tensor,
)

# ------------------------------------------------------------ VoxCPM VAE


def _tiny_vae():
    av = load_voxcpm_audio_vae()
    cfg = av.AudioVAEConfig(
        encoder_dim=8, encoder_rates=[2, 4], latent_dim=6,
        decoder_dim=16, decoder_rates=[4, 2], depthwise=True,
        sample_rate=16000, use_noise_block=False)
    torch.manual_seed(0)
    ref = av.AudioVAE(cfg).eval()
    # randomize snake alphas (init 1.0) so the oracle exercises them
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith(".alpha"):
                p.copy_(torch.rand_like(p) * 1.5 + 0.25)
    # round-trip through load_state_dict so Snake1d's cached
    # alpha_reciprocal buffer recomputes (audio_vae.py:66-68)
    ref.load_state_dict(ref.state_dict())
    from tts_tpu.models.voxcpm import VaeConfig

    ours_cfg = VaeConfig(d_model=8, latent_dim=6, strides=(2, 4),
                         decoder_channels=16, depthwise=True,
                         use_noise_block=False)
    sd = {f"audio_vae.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    return ref, sd, ours_cfg


def test_voxcpm_vae_decode_oracle():
    from tts_tpu.models.voxcpm import vae_decode
    from tts_tpu.weights.voxcpm_loader import vae_from_state_dict

    ref, sd, cfg = _tiny_vae()
    params = vae_from_state_dict(sd, cfg)
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 6, 17)).astype(np.float32) * 0.7
    with torch.no_grad():
        wav_ref = ref.decode(torch.from_numpy(z)).numpy()[0, 0]
    wav = np.asarray(vae_decode(params["dec"],
                                jnp.asarray(np.swapaxes(z, 1, 2)), cfg))[0]
    np.testing.assert_allclose(wav, wav_ref, atol=2e-5)


def test_voxcpm_vae_encode_oracle():
    from tts_tpu.models.voxcpm import vae_encode
    from tts_tpu.weights.voxcpm_loader import vae_from_state_dict

    ref, sd, cfg = _tiny_vae()
    params = vae_from_state_dict(sd, cfg)
    rng = np.random.default_rng(2)
    n = 8 * 13                                  # multiple of total stride
    audio = (rng.standard_normal((1, n)) * 0.3).astype(np.float32)
    with torch.no_grad():
        z_ref = ref.encode(torch.from_numpy(audio), 16000).numpy()
    z = np.asarray(vae_encode(params, jnp.asarray(audio), cfg))
    np.testing.assert_allclose(z, np.swapaxes(z_ref, 1, 2), atol=2e-5)


def test_voxcpm_vae_noise_block_path_oracle():
    """use_noise_block=True with the noise conv zeroed: the stochastic
    term vanishes on both sides, so the comparison checks the noise
    block's *plumbing* (layer indices shift by one) exactly."""
    av = load_voxcpm_audio_vae()
    cfg = av.AudioVAEConfig(
        encoder_dim=8, encoder_rates=[2, 4], latent_dim=6,
        decoder_dim=16, decoder_rates=[4, 2], depthwise=True,
        sample_rate=16000, use_noise_block=True)
    torch.manual_seed(3)
    ref = av.AudioVAE(cfg).eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith(".linear.weight_g"):
                p.zero_()                       # weight-norm magnitude
    ref.load_state_dict(ref.state_dict())
    from tts_tpu.models.voxcpm import VaeConfig, vae_decode
    from tts_tpu.weights.voxcpm_loader import vae_from_state_dict

    ours_cfg = VaeConfig(d_model=8, latent_dim=6, strides=(2, 4),
                         decoder_channels=16, depthwise=True,
                         use_noise_block=True)
    sd = {f"audio_vae.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = vae_from_state_dict(sd, ours_cfg)
    rng = np.random.default_rng(4)
    z = rng.standard_normal((1, 6, 9)).astype(np.float32) * 0.7
    with torch.no_grad():
        wav_ref = ref.decode(torch.from_numpy(z)).numpy()[0, 0]
    wav = np.asarray(vae_decode(params["dec"],
                                jnp.asarray(np.swapaxes(z, 1, 2)),
                                ours_cfg, noise_key=jax.random.key(0)))[0]
    np.testing.assert_allclose(wav, wav_ref, atol=2e-5)


# ------------------------------------------------------------ Kani FSQ


class _PassThrough(torch.nn.Module):
    def forward(self, inputs=None, input_len=None):
        return inputs


def test_kani_fsq_dequantize_oracle():
    """NEMO_CODEC's vectorized FSQ dequantizer (Export_Kani_TTS.py:
    496-538) on its own lines: the HiFi-GAN stage is replaced by
    identity modules so the forward output IS the FSQ dequantization
    (x the 32767 fold applied to the identity post conv)."""
    from tts_tpu.models.nanocodec import (NanoCodecConfig, fsq_dequantize,
                                          tokens_to_codes)

    NEMO_CODEC = extract_export_class(
        "Kani_TTS/Export_Kani_TTS.py", "NEMO_CODEC",
        {"SAMPLE_RATE": 22050, "USE_FLOAT16_CODEC": False})

    class _IdentityPostConv(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv1d(16, 16, 1, groups=16, bias=True)
            with torch.no_grad():
                self.conv.weight.fill_(1.0)
                self.conv.bias.fill_(0.0)
            self.conv.weight.requires_grad_(False)
            self.conv.bias.requires_grad_(False)

        def forward(self, inputs=None, input_len=None):
            return self.conv(inputs)

    class _FakeDecoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pre_conv = _PassThrough()
            self.activations = torch.nn.ModuleList([])
            self.res_layers = torch.nn.ModuleList([])
            self.up_sample_conv_layers = torch.nn.ModuleList([])
            self.up_sample_rates = []
            self.post_activation = torch.nn.Identity()
            self.post_conv = _IdentityPostConv()

    tok_len = 64100
    codec = NEMO_CODEC(SimpleNamespace(audio_decoder=_FakeDecoder()),
                       tok_len)
    cfg = NanoCodecConfig()
    start = tok_len + 10
    rng = np.random.default_rng(5)
    t = 11
    frames = rng.integers(0, cfg.codebook_size, size=(1, t, 4))
    flat = (frames + start +
            np.arange(4) * cfg.codebook_size).reshape(1, -1).astype(np.int64)
    decode_ids = np.concatenate(
        [np.array([[7, 9]], np.int64), flat], axis=1)   # 2 leading tokens
    with torch.no_grad():
        out_ref = codec(shape_tensor(torch.from_numpy(decode_ids)),
                        decode_ids.shape[1])
    ref = out_ref[0].numpy().reshape(16, -1) / 32767.0   # (16, T)

    codes = tokens_to_codes(jnp.asarray(flat, jnp.int32), cfg, start)
    ours = np.asarray(fsq_dequantize(codes, cfg))[0]     # (T, 16)
    # The oracle path ends in the reference's int16 output cast
    # (x32767 fold then .to(torch.int16), Export_Kani_TTS.py:525,564),
    # which truncates toward zero: up to 1/32767 per element.
    np.testing.assert_allclose(ours, ref.T, atol=1.01 / 32767.0)


# ---------------------------------------------------- Kani decode graphlets


def test_kani_first_beam_search_oracle():
    from tts_tpu.decoding.beam import beam_init

    FIRST = extract_export_class("Kani_TTS/Export_Kani_TTS.py",
                                 "FIRST_BEAM_SEARCH")
    rng = np.random.default_rng(6)
    v, beams = 50, 4
    logits = rng.standard_normal((1, v)).astype(np.float32)
    kv = rng.standard_normal((1, 3, 8)).astype(np.float32)
    # beam mode pre-allocates (BEAM_SIZE, 0)
    # (Inference_Kani_TTS_ONNX.py:249)
    save_id = np.zeros((beams, 0), np.int32)
    outs = FIRST(total_layers=1)(torch.from_numpy(kv),
                                 torch.from_numpy(logits),
                                 torch.from_numpy(save_id),
                                 beams)
    kv_rep, save_ref, prob_ref, tok_ref = (
        outs[0].numpy(), outs[1].numpy(), outs[2].numpy(), outs[3].numpy())

    st = beam_init(jnp.asarray(logits), beams)
    np.testing.assert_allclose(np.asarray(st.log_probs), prob_ref,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st.tokens), tok_ref[:, 0])
    # KV tiling semantics: row r of the tiled cache equals the original
    assert kv_rep.shape[0] == beams
    for r in range(beams):
        np.testing.assert_array_equal(kv_rep[r], kv[0])
    np.testing.assert_array_equal(save_ref[:, -1], tok_ref[:, 0])


def test_kani_second_beam_search_oracle():
    from tts_tpu.decoding.beam import beam_step

    SECOND = extract_export_class("Kani_TTS/Export_Kani_TTS.py",
                                  "SECOND_BEAM_SEARCH")
    rng = np.random.default_rng(7)
    v, beams, top_k = 40, 4, 5
    logits = rng.standard_normal((beams, v)).astype(np.float32)
    prev = rng.standard_normal((beams, 1)).astype(np.float32)
    kv = rng.standard_normal((beams, 2, 6)).astype(np.float32)
    save_id = rng.integers(0, v, size=(beams, 3)).astype(np.int32)
    outs = SECOND(total_layers=1)(
        torch.from_numpy(kv), torch.from_numpy(logits),
        torch.from_numpy(save_id), torch.from_numpy(prev), beams, top_k)
    kv_ref, save_ref, prob_ref, tok_ref = (
        outs[0].numpy(), outs[1].numpy(), outs[2].numpy(), outs[3].numpy())

    st = beam_step(jnp.asarray(logits), jnp.asarray(prev), beams, top_k)
    np.testing.assert_allclose(np.asarray(st.log_probs), prob_ref,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st.tokens), tok_ref[:, 0])
    np.testing.assert_array_equal(kv[np.asarray(st.parent)], kv_ref)
    np.testing.assert_array_equal(save_ref[:, :-1],
                                  save_id[np.asarray(st.parent)])


def test_kani_apply_penalty_oracle():
    from tts_tpu.decoding.sampling import apply_repetition_penalty

    APPLY = extract_export_class("Kani_TTS/Export_Kani_TTS.py",
                                 "APPLY_PENALTY")
    rng = np.random.default_rng(8)
    v, rng_len = 30, 6
    logits = rng.standard_normal((1, v)).astype(np.float32)
    save_id = rng.integers(0, v, size=(1, 10)).astype(np.int64)
    pen = 0.8
    ref = APPLY()(torch.from_numpy(logits.copy()),
                  torch.from_numpy(save_id),
                  torch.tensor(pen), rng_len).numpy()
    ours = np.asarray(apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(save_id.astype(np.int32)),
        jnp.int32(10), pen, rng_len))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# ------------------------------------------------------- Qwen 12 Hz codec


def test_qwen_codec_decode_oracle():
    """Full Qwen 12 Hz codec decode against the reference's own modules
    (modeling_qwen3_tts_tokenizer_v2.py): RVQ decode -> pre_conv ->
    pre-transformer -> upsample -> SnakeBeta/HiFiGAN decoder stack, with
    shared random weights through weights/qwen_loader.

    Two deliberate deviations from verbatim reference composition, both
    matching the DEPLOYED export path rather than the modeling file:
      * full (non-causal) attention — the export's TTS_DECODER forward
        (Export_Qwen_TTS_ONNX.py:863-886) attends bidirectionally; the
        modeling forward would build a sliding-window causal mask. We
        pass a prebuilt None-mask mapping so the reference's own layers
        run unmasked.
      * semantic RVQ group 0 — the modeling copy's SplitResidualVector-
        Quantizer.decode reads codes[:, [1]] (tokenizer_v2.py:891-901),
        dropping the talker's group-0 token the runtime puts first
        (Export_Qwen_TTS_ONNX.py:2585-2595) and double-counting group 1;
        upstream uses codes[:, :1]. We call the reference's own
        rvq_first/rvq_rest decode with the upstream slices, which is
        what models/qwen_codec.rvq_dequantize implements.
    Also mirrors the export's GELU->tanh swap (:832-839) on the ConvNeXt
    blocks, as the exported graphs ship with tanh GELU.
    """
    from tts_tpu.models.qwen_codec import QwenCodecDecoderConfig, codec_decode
    from tts_tpu.weights.qwen_loader import qwen_codec_from_state_dict

    mod = load_qwen_tokenizer_v2()
    from oracle_loader import make_qwen_decoder_config

    ref_cfg = make_qwen_decoder_config()
    ref_cfg._attn_implementation = "eager"
    torch.manual_seed(11)
    ref = mod.Qwen3TTSTokenizerV2Decoder(ref_cfg).eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith("cluster_usage"):
                p.uniform_(0.5, 2.0)
            elif name.endswith((".alpha", ".beta")):
                p.uniform_(-0.5, 0.5)           # SnakeBeta log-params
            else:
                p.normal_(0.0, 0.1)   # keep the decode out of clamp saturation
    for m in ref.modules():
        if isinstance(m, torch.nn.GELU):
            m.approximate = "tanh"              # export's own swap

    cfg = QwenCodecDecoderConfig(
        num_quantizers=4, codebook_size=32, codebook_dim=16, rvq_dim=8,
        latent_dim=24, decoder_dim=32, upsampling_ratios=(2,),
        upsample_rates=(4, 2), hidden_size=24, num_heads=2,
        num_kv_heads=2, head_dim=12, ffn_dim=48, num_layers=2,
        max_seq_len=64)
    pre = "speech_tokenizer.model.decoder"
    sd = {f"{pre}.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    # the reference decoder instantiates the FUSED ConvNeXt block (no norm
    # affine / gamma); the loader expects the unfused checkpoint keys —
    # identity affine makes its folds a no-op arriving at the same weights
    for i in range(len(cfg.upsampling_ratios)):
        dim = cfg.latent_dim
        sd[f"{pre}.upsample.{i}.1.norm.weight"] = np.ones(dim, np.float32)
        sd[f"{pre}.upsample.{i}.1.norm.bias"] = np.zeros(dim, np.float32)
        sd[f"{pre}.upsample.{i}.1.gamma"] = np.ones(dim, np.float32)
    params = qwen_codec_from_state_dict(sd, cfg)

    rng = np.random.default_rng(12)
    t = 13
    codes = rng.integers(0, cfg.codebook_size,
                         size=(1, t, cfg.num_quantizers)).astype(np.int32)

    with torch.no_grad():
        ckt = torch.from_numpy(codes.transpose(0, 2, 1)).long()  # (1, K, T)
        q = ref.quantizer
        hidden = (q.rvq_first.decode(ckt[:, :1])
                  + q.rvq_rest.decode(ckt[:, 1:]))               # (1, C, T)
        hidden = ref.pre_conv(hidden).transpose(1, 2)
        no_mask = {"full_attention": None, "sliding_attention": None}
        hidden = ref.pre_transformer(
            inputs_embeds=hidden, attention_mask=no_mask).last_hidden_state
        hidden = hidden.permute(0, 2, 1)
        for blocks in ref.upsample:
            for block in blocks:
                hidden = block(hidden)
        for block in ref.decoder:
            hidden = block(hidden)
        wav_ref = hidden.clamp(-1, 1).numpy()[0, 0]

    wav = np.asarray(codec_decode(params, jnp.asarray(codes), cfg))[0]
    assert wav.shape == wav_ref.shape == (t * cfg.total_upsample,)
    np.testing.assert_allclose(wav, wav_ref, atol=3e-5)
