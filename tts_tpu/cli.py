"""Command-line synthesis: `python -m tts_tpu.cli <family> ...`.

The TPU-native replacement for the reference's per-family Inference_*.py
scripts and export_windows.bat bootstrap: one entry point that loads the
upstream checkpoints (weights/*), runs the jitted pipeline, and writes a
WAV. Without --ckpt it runs random-initialized weights — a compile/perf
smoke mode for machines without the model downloads.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _write(path: str, wav: np.ndarray, sr: int, report=None) -> None:
    from .audio.wav import write_wav

    write_wav(path, wav, sr)
    print(f"wrote {path} ({len(wav) / sr:.2f}s @ {sr} Hz)")
    if report is not None:
        print(report.table())



def _load_tokenizer(ckpt_dir: str):
    """Checkpoint tokenizer, preferring the self-contained reader.

    Order: frontend/hf_tokenizer.py on the checkpoint's tokenizer.json
    (exact ids, zero wheels — the reference needs AutoTokenizer here,
    Kani_TTS/Export_Kani_TTS.py:982-983) -> transformers AutoTokenizer
    (slow-format checkpoints) -> raise."""
    import os

    from .frontend.hf_tokenizer import HFTokenizer

    if os.path.exists(os.path.join(ckpt_dir, "tokenizer.json")):
        try:
            return HFTokenizer.from_pretrained(ckpt_dir)
        except ValueError as e:
            print(f"note: self-contained tokenizer reader declined "
                  f"({e}); trying transformers")
    try:
        from transformers import AutoTokenizer
    except ImportError:
        raise SystemExit(
            f"no readable tokenizer.json under {ckpt_dir} and the "
            "transformers wheel is unavailable — token ids cannot match "
            "the upstream tokenizer")
    return AutoTokenizer.from_pretrained(ckpt_dir)


def _save_bundle(path: str, arrays: dict, configs: dict,
                 extra: dict | None = None) -> None:
    """Persist fused param pytrees + their configs (the reference's
    optimized-artifact analog): arrays -> .npz, configs/extra -> .json."""
    import json

    from .weights.save import config_to_dict, save_params

    save_params(path, arrays)
    meta = {k: {"cls": f"{type(c).__module__}:{type(c).__name__}",
                "data": config_to_dict(c)} for k, c in configs.items()}
    if extra:
        meta["__extra__"] = extra
    open(path + ".json", "w").write(json.dumps(meta))
    print(f"saved fused params to {path}")


def _load_bundle(path: str):
    """Returns (arrays, configs, extra)."""
    import importlib
    import json

    from .weights.save import config_from_dict, load_params

    arrays = load_params(path)
    meta = json.loads(open(path + ".json").read())
    extra = meta.pop("__extra__", {})
    configs = {}
    for k, m in meta.items():
        mod, name = m["cls"].split(":")
        cls = getattr(importlib.import_module(mod), name)
        configs[k] = config_from_dict(cls, m["data"])
    return arrays, configs, extra


def cmd_f5(args) -> None:
    import jax
    import jax.numpy as jnp

    from .audio.wav import read_audio
    from .models.f5 import F5Config, init_params
    from .models.vocos import VocosConfig, init_params as vocos_init
    from .runtime.f5 import F5Pipeline
    from .utils.timing import SynthesisReport

    if args.npz:
        # fused-artifact fast path (the reference's .ort analog): skips
        # torch/safetensors parsing and the fold math
        arrays, cfgs, extra = _load_bundle(args.npz)
        params, vparams = arrays["f5"], arrays["vocos"]
        if "ada_table" not in params:
            # pre-half-split-rope bundles carry interleaved rope tables and
            # unpermuted q/k columns — loading them into the current
            # attention math would be silently wrong
            raise SystemExit(
                f"{args.npz} was saved by an older layout (no ada_table / "
                "half-split rope fold); re-export it with --ckpt --save-npz")
        cfg, vcfg = cfgs["cfg"], cfgs["vcfg"]
        vocab = extra["vocab"]
    elif args.ckpt:
        from .weights.f5_loader import load_f5, load_vocos

        params, cfg, vocab = load_f5(args.ckpt, args.vocab)
        vparams, vcfg = load_vocos(args.vocoder)
    else:
        cfg, vcfg = F5Config(), VocosConfig()
        dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
        params = jax.jit(lambda k: init_params(cfg, k, dtype))(jax.random.key(0))
        vparams = jax.jit(lambda k: vocos_init(vcfg, k, dtype))(jax.random.key(1))
        vocab = {" ": 0}
        print("note: random weights (no --ckpt) — audio will be noise")
    if args.save_npz:
        _save_bundle(args.save_npz, {"f5": params, "vocos": vparams},
                     {"cfg": cfg, "vcfg": vcfg}, {"vocab": vocab})
    pipe = F5Pipeline(params, cfg, vocab, vparams, vcfg, seed=args.seed,
                      quantize=args.quantize)
    audio, _ = read_audio(args.ref_audio, target_rate=cfg.sample_rate)
    wav, stats = pipe.synthesize(audio, args.ref_text, args.gen_text,
                                 speed=args.speed)
    rep = SynthesisReport("f5_tts", stats.audio_s, stats.wall_s)
    _write(args.out, wav, cfg.sample_rate, rep)


def cmd_kani(args) -> None:
    import jax

    from .models.kani import KaniConfig, init_params
    from .models.nanocodec import NanoCodecConfig, init_params as codec_init
    from .runtime.kani import KaniDecodeConfig, KaniPipeline
    from .utils.timing import SynthesisReport

    if args.ckpt:
        from .weights.kani_loader import load_kani_lm, load_nanocodec

        params, cfg = load_kani_lm(args.ckpt)
        cparams, ccfg = load_nanocodec(args.codec)
        tok = _load_tokenizer(args.ckpt)
    else:
        cfg = KaniConfig(hidden_size=64, num_heads=4, num_kv_heads=2,
                         head_dim=16, ffn_dim=128, vocab_size=80538,
                         max_seq_len=256)
        ccfg = NanoCodecConfig()
        params = init_params(cfg, jax.random.key(0))
        cparams = codec_init(ccfg, jax.random.key(1))
        tok = None
        print("note: random weights (no --ckpt) — audio will be noise")
    if args.npz:
        arrays, cfgs, _ = _load_bundle(args.npz)
        params, cparams = arrays["lm"], arrays["codec"]
        cfg, ccfg = cfgs["cfg"], cfgs["ccfg"]
        tok = None
    if args.save_npz:
        _save_bundle(args.save_npz, {"lm": params, "codec": cparams},
                     {"cfg": cfg, "ccfg": ccfg})
    dcfg = KaniDecodeConfig(
        use_beam=args.beam > 1, beam_size=args.beam,
        repeat_penalty=args.penalty, max_new_tokens=args.max_tokens)
    pipe = KaniPipeline(params, cfg, cparams, ccfg, dcfg, tokenizer=tok,
                        quantize=args.quantize)
    if tok is not None:
        wav, stats = pipe.synthesize(args.text, speaker=args.speaker)
    else:
        ids = np.array([[3, 9, 27, 5]], np.int32)
        wav, stats = pipe.synthesize_ids(ids)
    rep = SynthesisReport("kani_tts", len(wav) / ccfg.sample_rate,
                          stats["wall_s"], tokens=stats["tokens"])
    _write(args.out, wav, ccfg.sample_rate, rep)


def cmd_indextts(args) -> None:
    import jax
    import jax.numpy as jnp

    from .audio.wav import read_audio
    from .models.bigvgan import BigVGANConfig
    from .models.bigvgan import init_params as bigvgan_init
    from .models.indextts import (
        IndexTTSConfig,
        init_conformer_params,
        init_ecapa_params,
        init_gpt_params,
        init_perceiver_params,
    )
    from .runtime.indextts import IndexTTSPipeline
    from .utils.timing import SynthesisReport

    if args.ckpt:
        from .weights.indextts_loader import load_indextts

        params, cfg, vcfg = load_indextts(args.ckpt)
        tok_path = args.ckpt + "/bpe.model"
    else:
        cfg = IndexTTSConfig(enc_layers=2, gpt_layers=2, gpt_dim=512,
                             gpt_heads=8, num_latents=32)
        vcfg = BigVGANConfig(num_mels=cfg.gpt_dim,
                             upsample_initial_channel=256,
                             use_tanh_at_final=True, use_bias_at_final=True)
        ks = jax.random.split(jax.random.key(0), 8)
        c0 = vcfg.upsample_initial_channel
        params = {
            "conformer": init_conformer_params(cfg, ks[0]),
            "perceiver": init_perceiver_params(cfg, ks[1]),
            "ecapa": init_ecapa_params(cfg, ks[2]),
            "gpt": init_gpt_params(cfg, ks[3]),
            "bigvgan": bigvgan_init(vcfg, ks[4]),
            "cond_layer": {"w": jnp.zeros((cfg.speaker_embed_dim, c0)),
                           "b": jnp.zeros((c0,))},
            "conds": [{"w": jnp.zeros((cfg.speaker_embed_dim, c)),
                       "b": jnp.zeros((c,))} for c in vcfg.stage_channels],
        }
        tok_path = None
        print("note: random weights (no --ckpt) — audio will be noise")
    if args.npz:
        arrays, cfgs, _ = _load_bundle(args.npz)
        params = arrays["params"]
        cfg, vcfg = cfgs["cfg"], cfgs["vcfg"]
        tok_path = None
    if args.save_npz:
        _save_bundle(args.save_npz, {"params": params},
                     {"cfg": cfg, "vcfg": vcfg})
    pipe = IndexTTSPipeline(params, cfg, vcfg, quantize=args.quantize)
    audio, _ = read_audio(args.ref_audio, target_rate=24000)
    ref = pipe.encode_reference(audio)
    from .frontend.indextts_text import IndexTTSTokenizer

    if tok_path is None and not args.allow_degraded:
        raise SystemExit(
            "no checkpoint tokenizer: the char-level fallback produces ids "
            "that do NOT match the upstream tokenizer — pass "
            "--allow-degraded to run the demo anyway")
    tok = IndexTTSTokenizer(tok_path, allow_degraded=tok_path is None)
    wav, stats = pipe.synthesize(args.text, ref, tokenizer=tok,
                                 max_gen=args.max_tokens)
    total_tokens = sum(s.tokens for s in stats)
    wall = sum(s.wall_s for s in stats)
    rep = SynthesisReport("indextts", len(wav) / 24000, wall,
                          tokens=total_tokens)
    _write(args.out, wav, 24000, rep)


def cmd_qwen(args) -> None:
    import jax

    from .models.qwen_codec import QwenCodecDecoderConfig
    from .models.qwen_codec import init_decoder_params as codec_init
    from .models.qwen_tts import (
        QwenTTSConfig,
        init_predictor_params,
        init_talker_params,
    )
    from .runtime.qwen import QwenDecodeConfig, QwenTTSPipeline
    from .utils.timing import SynthesisReport

    if args.ckpt:
        from .weights.qwen_loader import load_qwen_codec, load_qwen_tts

        params, cfg = load_qwen_tts(args.ckpt)
        cparams, ccfg = load_qwen_codec(args.ckpt)
        tok = _load_tokenizer(args.ckpt)
        ids = tok(args.text, return_tensors="np")["input_ids"].astype("int32")
    else:
        from .models.qwen_tts import Qwen3StackConfig

        stack = Qwen3StackConfig(hidden_size=64, num_heads=4, num_kv_heads=2,
                                 head_dim=16, ffn_dim=128, num_layers=2,
                                 max_seq_len=512)
        cfg = QwenTTSConfig(talker=stack, predictor=stack)
        ccfg = QwenCodecDecoderConfig(
            num_quantizers=cfg.num_code_groups, codebook_size=64,
            codebook_dim=16, rvq_dim=8, latent_dim=24, decoder_dim=32,
            upsampling_ratios=(2,), upsample_rates=(4, 2), hidden_size=24,
            num_heads=2, num_kv_heads=2, head_dim=12, ffn_dim=48,
            num_layers=2, max_seq_len=256)
        params = {**init_talker_params(cfg, jax.random.key(0)),
                  **init_predictor_params(cfg, jax.random.key(1))}
        cparams = codec_init(ccfg, jax.random.key(2))
        ids = np.array([[5, 9, 13, 2]], np.int32)
        print("note: random weights (no --ckpt) — audio will be noise")
    if args.npz:
        arrays, cfgs, _ = _load_bundle(args.npz)
        params, cparams = arrays["lm"], arrays["codec"]
        cfg, ccfg = cfgs["cfg"], cfgs["ccfg"]
    if args.save_npz:
        _save_bundle(args.save_npz, {"lm": params, "codec": cparams},
                     {"cfg": cfg, "ccfg": ccfg})
    pipe = QwenTTSPipeline(params, cfg, cparams, ccfg,
                           QwenDecodeConfig(max_frames=args.max_frames,
                                            use_beam=args.beam > 1,
                                            beam_size=max(args.beam, 2),
                                            beam_top_k=args.beam_top_k),
                           quantize=args.quantize)
    if args.language:
        from .runtime.qwen import resolve_voice

        language_id, speaker_id = resolve_voice(args.language, args.speaker)
    else:
        language_id, speaker_id = args.language_id, args.speaker_id
    instruct_ids = None
    if args.instruct:
        if not args.ckpt:
            raise SystemExit("--instruct needs --ckpt (tokenizer)")
        prompt = "<|im_start|>system\n" + args.instruct + "<|im_end|>\n"
        instruct_ids = tok(prompt, return_tensors="np")["input_ids"].astype(
            "int32")
    wav, stats = pipe.synthesize_ids(ids, language_id=language_id,
                                     speaker_id=speaker_id,
                                     instruct_ids=instruct_ids)
    sr = pipe.output_sample_rate
    rep = SynthesisReport("qwen_tts", len(wav) / sr, stats["wall_s"])
    _write(args.out, wav, sr, rep)


def cmd_voxcpm(args) -> None:
    import jax

    from .audio.wav import read_audio
    from .models.voxcpm import VoxCPMConfig, init_params, init_vae_params
    from .runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline
    from .utils.timing import SynthesisReport

    if args.ckpt:
        from .models.voxcpm import voxcpm_v2_config
        from .weights.voxcpm_loader import load_voxcpm

        params, vae_params, cfg = load_voxcpm(
            args.ckpt, cfg=voxcpm_v2_config() if args.v2 else None,
            use_mup=args.v2, scale_emb=12.0 if args.v2 else 1.0,
            scale_depth=1.4 if args.v2 else 1.0)
        from .frontend.voxcpm_text import (mask_multichar_chinese_tokens,
                                           normalize_voxcpm_text)

        ctok = mask_multichar_chinese_tokens(_load_tokenizer(args.ckpt))
        ids = np.asarray([ctok(normalize_voxcpm_text(args.text))], np.int32)
        p_ids = (np.asarray([ctok(normalize_voxcpm_text(args.prompt_text))],
                            np.int32) if args.prompt_text else
                 np.zeros((1, 0), np.int32))
    else:
        from .models.voxcpm import LlamaStackConfig, VaeConfig

        tiny = LlamaStackConfig(hidden_size=32, num_heads=2, num_kv_heads=1,
                                head_dim=16, ffn_dim=64, num_layers=2,
                                max_seq_len=512)
        cfg = VoxCPMConfig(
            base=tiny, residual=tiny,
            feat_encoder=LlamaStackConfig(
                hidden_size=24, num_heads=2, num_kv_heads=1, head_dim=12,
                ffn_dim=48, num_layers=1, max_seq_len=8),
            estimator=LlamaStackConfig(
                hidden_size=24, num_heads=2, num_kv_heads=1, head_dim=12,
                ffn_dim=48, num_layers=1, max_seq_len=16),
            vae=VaeConfig(d_model=4, latent_dim=8, strides=(2, 4),
                          decoder_channels=16),
            patch_size=4, chunk_size=8, fsq_dim=8, vocab_size=128,
            cfm_steps=4)
        params = jax.jit(lambda k: init_params(cfg, k))(jax.random.key(0))
        vae_params = jax.jit(lambda k: init_vae_params(cfg.vae, k))(
            jax.random.key(1))
        ids = np.array([[11, 13, 17, 19]], np.int32)
        p_ids = np.zeros((1, 0), np.int32)
        print("note: random weights (no --ckpt) — audio will be noise")
    if args.npz:
        arrays, cfgs, _ = _load_bundle(args.npz)
        params, vae_params = arrays["lm"], arrays["vae"]
        cfg = cfgs["cfg"]
    if args.save_npz:
        _save_bundle(args.save_npz, {"lm": params, "vae": vae_params},
                     {"cfg": cfg})
    pipe = VoxCPMPipeline(params, cfg, vae_params,
                          VoxCPMDecodeConfig(max_latents=args.max_latents),
                          quantize=args.quantize)
    prompt_audio = None
    if args.prompt_audio:
        prompt_audio, _ = read_audio(args.prompt_audio,
                                   target_rate=cfg.sample_rate)
    wav, stats = pipe.synthesize_ids(p_ids, ids, prompt_audio)
    sr = pipe.output_sample_rate
    rep = SynthesisReport("voxcpm", len(wav) / sr, stats["wall_s"])
    _write(args.out, wav, sr, rep)


def _serve_kani_pipeline(args):
    import jax

    from .models.kani import KaniConfig, init_params
    from .models.nanocodec import NanoCodecConfig, init_params as codec_init
    from .runtime.kani import KaniDecodeConfig, KaniPipeline

    if args.ckpt:
        from .weights.kani_loader import load_kani_lm, load_nanocodec

        params, cfg = load_kani_lm(args.ckpt)
        cparams, ccfg = load_nanocodec(args.codec)
    else:
        cfg = KaniConfig(hidden_size=64, num_heads=4, num_kv_heads=2,
                         head_dim=16, ffn_dim=128, vocab_size=80538,
                         max_seq_len=1024)
        ccfg = NanoCodecConfig()
        params = init_params(cfg, jax.random.key(0))
        cparams = codec_init(ccfg, jax.random.key(1))
        print("note: random weights (no --ckpt) — audio will be noise")
    return KaniPipeline(params, cfg, cparams, ccfg,
                        KaniDecodeConfig(max_new_tokens=args.max_tokens),
                        quantize=args.quantize), ccfg


def _serve_continuous(args):
    """Build a continuous-batching TTSServer for any synthesis family:
    loads (or random-inits) the family pipeline, then delegates the
    request-schema / submit / stream wiring to
    serving.families.continuous_server (request formats documented
    there)."""
    import jax

    from .serving.families import continuous_server

    def _fan(pipe):
        """--devices N: one replicated pipeline per chip behind a
        least-loaded router (serving/devices + serving/router)."""
        n = getattr(args, "devices", 1) or 1
        if n <= 1:
            return pipe
        from .serving.devices import pipelines_for_devices

        devs = jax.local_devices()
        if n > len(devs):
            raise SystemExit(f"--devices {n} > {len(devs)} local devices")
        return pipelines_for_devices(pipe, devs[:n])

    fam = args.family
    if fam == "kani":
        pipe, _ = _serve_kani_pipeline(args)
        return continuous_server("kani", _fan(pipe), slots=args.max_batch)

    if fam == "qwen":
        from .models.qwen_codec import QwenCodecDecoderConfig
        from .models.qwen_codec import init_decoder_params as codec_init
        from .models.qwen_tts import (Qwen3StackConfig, QwenTTSConfig,
                                      init_predictor_params,
                                      init_talker_params)
        from .runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

        if args.ckpt:
            from .weights.qwen_loader import load_qwen_codec, load_qwen_tts

            params, cfg = load_qwen_tts(args.ckpt)
            cparams, ccfg = load_qwen_codec(args.ckpt)
        else:
            stack = Qwen3StackConfig(hidden_size=64, num_heads=4,
                                     num_kv_heads=2, head_dim=16,
                                     ffn_dim=128, num_layers=2,
                                     max_seq_len=512)
            cfg = QwenTTSConfig(talker=stack, predictor=stack)
            ccfg = QwenCodecDecoderConfig(
                num_quantizers=cfg.num_code_groups, codebook_size=64,
                codebook_dim=16, rvq_dim=8, latent_dim=24, decoder_dim=32,
                upsampling_ratios=(2,), upsample_rates=(4, 2),
                hidden_size=24, num_heads=2, num_kv_heads=2, head_dim=12,
                ffn_dim=48, num_layers=2, max_seq_len=256)
            params = {**init_talker_params(cfg, jax.random.key(0)),
                      **init_predictor_params(cfg, jax.random.key(1))}
            cparams = codec_init(ccfg, jax.random.key(2))
            print("note: random weights (no --ckpt) — audio will be noise")
        pipe = QwenTTSPipeline(params, cfg, cparams, ccfg,
                               QwenDecodeConfig(max_frames=args.max_tokens),
                               quantize=args.quantize)
        return continuous_server("qwen", _fan(pipe), slots=args.max_batch,
                                 max_tokens=args.max_tokens)

    if fam == "voxcpm":
        from .models.voxcpm import (LlamaStackConfig, VaeConfig,
                                    VoxCPMConfig, init_params,
                                    init_vae_params, voxcpm_v2_config)
        from .runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline

        if args.ckpt:
            from .weights.voxcpm_loader import load_voxcpm

            params, vae_params, cfg = load_voxcpm(
                args.ckpt, cfg=voxcpm_v2_config() if args.v2 else None,
                use_mup=args.v2, scale_emb=12.0 if args.v2 else 1.0,
                scale_depth=1.4 if args.v2 else 1.0)
        else:
            tiny = LlamaStackConfig(hidden_size=32, num_heads=2,
                                    num_kv_heads=1, head_dim=16, ffn_dim=64,
                                    num_layers=2, max_seq_len=512)
            cfg = VoxCPMConfig(
                base=tiny, residual=tiny,
                feat_encoder=LlamaStackConfig(
                    hidden_size=24, num_heads=2, num_kv_heads=1,
                    head_dim=12, ffn_dim=48, num_layers=1, max_seq_len=8),
                estimator=LlamaStackConfig(
                    hidden_size=24, num_heads=2, num_kv_heads=1,
                    head_dim=12, ffn_dim=48, num_layers=1, max_seq_len=16),
                vae=VaeConfig(d_model=4, latent_dim=8, strides=(2, 4),
                              decoder_channels=16),
                patch_size=4, chunk_size=8, fsq_dim=8, vocab_size=128,
                cfm_steps=4)
            params = jax.jit(lambda k: init_params(cfg, k))(
                jax.random.key(0))
            vae_params = jax.jit(lambda k: init_vae_params(cfg.vae, k))(
                jax.random.key(1))
            print("note: random weights (no --ckpt) — audio will be noise")
        pipe = VoxCPMPipeline(params, cfg, vae_params,
                              VoxCPMDecodeConfig(
                                  max_latents=args.max_tokens),
                              quantize=args.quantize)
        return continuous_server("voxcpm", _fan(pipe), slots=args.max_batch)

    if fam == "indextts":
        import jax.numpy as jnp

        from .audio.wav import read_audio
        from .models.bigvgan import BigVGANConfig
        from .models.bigvgan import init_params as bigvgan_init
        from .models.indextts import (IndexTTSConfig, init_conformer_params,
                                      init_ecapa_params, init_gpt_params,
                                      init_perceiver_params)
        from .runtime.indextts import IndexTTSPipeline

        if args.ckpt:
            from .weights.indextts_loader import load_indextts

            params, cfg, vcfg = load_indextts(args.ckpt)
        else:
            cfg = IndexTTSConfig(enc_layers=2, gpt_layers=2, gpt_dim=512,
                                 gpt_heads=8, num_latents=32)
            vcfg = BigVGANConfig(num_mels=cfg.gpt_dim,
                                 upsample_initial_channel=256,
                                 use_tanh_at_final=True,
                                 use_bias_at_final=True)
            ks = jax.random.split(jax.random.key(0), 8)
            c0 = vcfg.upsample_initial_channel
            params = {
                "conformer": init_conformer_params(cfg, ks[0]),
                "perceiver": init_perceiver_params(cfg, ks[1]),
                "ecapa": init_ecapa_params(cfg, ks[2]),
                "gpt": init_gpt_params(cfg, ks[3]),
                "bigvgan": bigvgan_init(vcfg, ks[4]),
                "cond_layer": {"w": jnp.zeros((cfg.speaker_embed_dim, c0)),
                               "b": jnp.zeros((c0,))},
                "conds": [{"w": jnp.zeros((cfg.speaker_embed_dim, c)),
                           "b": jnp.zeros((c,))}
                          for c in vcfg.stage_channels],
            }
            print("note: random weights (no --ckpt) — audio will be noise")
        pipe = IndexTTSPipeline(params, cfg, vcfg, quantize=args.quantize)
        if args.ref_audio:
            audio, _ = read_audio(args.ref_audio, target_rate=24000)
        else:
            audio = (np.random.default_rng(0)
                     .standard_normal(24000).astype(np.float32) * 0.05)
            print("note: no --ref-audio — conditioning on noise")
        ref = pipe.encode_reference(audio)
        return continuous_server("indextts", _fan(pipe), slots=args.max_batch,
                                 max_tokens=args.max_tokens, ref=ref)

    if fam == "f5":
        import jax.numpy as jnp

        from .audio.wav import read_audio
        from .models.f5 import F5Config, init_params
        from .models.vocos import VocosConfig, init_params as vocos_init
        from .runtime.f5 import F5Pipeline

        if args.ckpt:
            from .weights.f5_loader import load_f5, load_vocos

            params, cfg, vocab = load_f5(args.ckpt, args.vocab)
            vparams, vcfg = load_vocos(args.vocoder)
        else:
            cfg, vcfg = F5Config(), VocosConfig()
            dtype = (jnp.bfloat16
                     if jax.devices()[0].platform == "tpu" else jnp.float32)
            params = jax.jit(lambda k: init_params(cfg, k, dtype))(
                jax.random.key(0))
            vparams = jax.jit(lambda k: vocos_init(vcfg, k, dtype))(
                jax.random.key(1))
            vocab = {" ": 0}
            print("note: random weights (no --ckpt) — audio will be noise")
        pipe = F5Pipeline(params, cfg, vocab, vparams, vcfg,
                          quantize=args.quantize)
        if args.ref_audio:
            ref_audio, _ = read_audio(args.ref_audio,
                                    target_rate=cfg.sample_rate)
        else:
            ref_audio = (np.random.default_rng(0).standard_normal(
                cfg.sample_rate).astype(np.float32) * 0.05)
            print("note: no --ref-audio — conditioning on noise")
        return continuous_server("f5", _fan(pipe), slots=args.max_batch,
                                 ref_audio=ref_audio,
                                 ref_text=args.ref_text or "demo reference")

    raise SystemExit(f"unknown family {fam!r}")


def cmd_serve(args) -> None:
    """HTTP TTS server: admission-time micro-batching (default, Kani) or
    slot-based continuous batching for ANY family (--continuous
    --family …). Kani/Qwen/VoxCPM stream over the shared slot batch via
    POST /stream."""
    from .serving import TTSServer, serve_http

    if args.continuous:
        # slot-based continuous batching: mid-decode admission (measured
        # 8.9x p50 / 5.8x p99 vs admission batching at 4 rps on-chip)
        srv = _serve_continuous(args)
    else:
        if getattr(args, "devices", 1) > 1:
            raise SystemExit("--devices needs --continuous (per-device "
                             "slot servers behind the router)")
        if args.family != "kani":
            raise SystemExit("admission-time batching serves kani only; "
                             "use --continuous for other families")
        pipe, ccfg = _serve_kani_pipeline(args)
        pad = np.array([[3, 9, 5]], np.int32)
        srv = TTSServer.for_pipeline(
            pipe, pad, sample_rate=ccfg.sample_rate,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            # the ladder must contain max_batch itself (MicroBatcher
            # contract), so --max-batch 6 yields (1, 2, 4, 6)
            batch_sizes=tuple(sorted(
                {s for s in (1, 2, 4, 8) if s < args.max_batch}
                | {args.max_batch})))
    if args.warmup:
        # compile (or persistent-cache-read) the serving programs before
        # binding the port, so the first live request pays no compile.
        # On the MicroBatcher path a single request would warm only the
        # batch-1 bucket; warm every ladder size by submitting that many
        # concurrent requests (they coalesce into one padded batch).
        import time as _t

        from .serving.families import default_request_body

        body = default_request_body(args.family)
        sizes = (1,) if args.continuous else tuple(
            sorted({s for s in (1, 2, 4, 8) if s < args.max_batch}
                   | {args.max_batch}))
        t0 = _t.perf_counter()
        for size in sizes:
            tw = _t.perf_counter()
            futs = [srv.submit(srv.request_from_json(body))
                    for _ in range(size)]
            for f in futs:
                f.result(timeout=600)
            print(f"warmup batch={size}: {_t.perf_counter() - tw:.1f}s")
        print(f"warmup done in {_t.perf_counter() - t0:.1f}s")
    httpd = serve_http(srv, host=args.host, port=args.port)
    host, port = httpd.server_address
    print(f"serving on http://{host}:{port}  "
          f"(POST /synthesize, POST /stream, GET /stats — "
          f"family={args.family}, request formats in serving/families.py)")
    try:
        import time as _t

        while True:
            _t.sleep(3600)
    except KeyboardInterrupt:
        httpd.shutdown()
        srv.close()


def cmd_bench(args) -> None:
    import json

    import bench  # repo-root bench.py when run from the checkout

    print(json.dumps(bench.bench_f5()))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tts_tpu",
                                 description="TPU-native TTS synthesis")
    sub = ap.add_subparsers(dest="cmd", required=True)

    f5 = sub.add_parser("f5", help="F5-TTS voice cloning")
    f5.add_argument("--ref-audio", required=True)
    f5.add_argument("--ref-text", required=True)
    f5.add_argument("--gen-text", required=True)
    f5.add_argument("--ckpt", help="F5 safetensors path")
    f5.add_argument("--vocab", help="vocab.txt path")
    f5.add_argument("--vocoder", help="vocos-mel-24khz dir")
    f5.add_argument("--out", default="generated.wav")
    f5.add_argument("--speed", type=float, default=1.0)
    f5.add_argument("--seed", type=int, default=9527)

    f5.set_defaults(fn=cmd_f5)

    ka = sub.add_parser("kani", help="KaniTTS synthesis")
    ka.add_argument("--text", default="Hello from the TPU.")
    ka.add_argument("--speaker", default="jenny")
    ka.add_argument("--ckpt", help="kani-tts HF dir")
    ka.add_argument("--codec", help="nemo nano codec .nemo path")
    ka.add_argument("--beam", type=int, default=1)
    ka.add_argument("--penalty", type=float, default=0.8)
    ka.add_argument("--max-tokens", type=int, default=1019)
    ka.add_argument("--out", default="generated.wav")
    ka.set_defaults(fn=cmd_kani)

    it = sub.add_parser("indextts", help="IndexTTS voice cloning")
    it.add_argument("--ref-audio", required=True)
    it.add_argument("--text", default="Hello from the TPU.")
    it.add_argument("--ckpt", help="IndexTTS-1.5 model dir")
    it.add_argument("--max-tokens", type=int, default=800)
    it.add_argument("--allow-degraded", action="store_true",
                    help="permit the char-level tokenizer fallback (ids "
                         "will not match the upstream tokenizer)")
    it.add_argument("--out", default="generated.wav")
    it.set_defaults(fn=cmd_indextts)

    vc = sub.add_parser("voxcpm", help="VoxCPM synthesis")
    vc.add_argument("--text", default="Hello from the TPU.")
    vc.add_argument("--prompt-audio")
    vc.add_argument("--prompt-text")
    vc.add_argument("--ckpt", help="VoxCPM model dir")
    vc.add_argument("--v2", action="store_true", help="VoxCPM-2 muP folds")
    vc.add_argument("--max-latents", type=int, default=256)
    vc.add_argument("--out", default="generated.wav")
    vc.set_defaults(fn=cmd_voxcpm)

    qw = sub.add_parser("qwen", help="Qwen3-TTS synthesis")
    qw.add_argument("--text", default="Hello from the TPU.")
    qw.add_argument("--ckpt", help="Qwen3-TTS HF model dir")
    qw.add_argument("--language", help="language name (english, chinese, ...)")
    qw.add_argument("--speaker", help="speaker name (serena, ryan, ...)")
    qw.add_argument("--language-id", type=int, default=0)
    qw.add_argument("--speaker-id", type=int)
    qw.add_argument("--max-frames", type=int, default=600)
    qw.add_argument("--beam", type=int, default=1,
                    help="predictor beam size (1 = greedy)")
    qw.add_argument("--beam-top-k", type=int, default=3)
    qw.add_argument("--instruct", help="style instruction / voice "
                    "description prepended as a system prompt")
    qw.add_argument("--out", default="generated.wav")
    qw.set_defaults(fn=cmd_qwen)

    be = sub.add_parser("bench", help="run the driver benchmark")
    be.set_defaults(fn=cmd_bench)

    sv = sub.add_parser("serve", help="HTTP TTS server (all families)")
    sv.add_argument("--family", default="kani",
                    choices=("kani", "qwen", "voxcpm", "indextts", "f5"),
                    help="which synthesis family to serve (non-kani "
                         "families need --continuous)")
    sv.add_argument("--ckpt", help="family checkpoint dir/path")
    sv.add_argument("--codec", help=".nemo codec path (kani)")
    sv.add_argument("--vocab", help="vocab.txt path (f5)")
    sv.add_argument("--vocoder", help="vocos-mel-24khz dir (f5)")
    sv.add_argument("--ref-audio", help="reference audio fixed at startup "
                                        "(indextts/f5)")
    sv.add_argument("--ref-text", help="reference transcript (f5)")
    sv.add_argument("--v2", action="store_true",
                    help="VoxCPM-2 muP folds (voxcpm)")
    sv.add_argument("--quantize", type=int, choices=(4, 8))
    sv.add_argument("--max-tokens", type=int, default=256)
    sv.add_argument("--max-batch", type=int, default=8)
    sv.add_argument("--max-wait-ms", type=float, default=10.0)
    sv.add_argument("--continuous", action="store_true",
                    help="slot-based continuous batching (mid-decode "
                         "admission) instead of admission-time batching")
    sv.add_argument("--devices", type=int, default=1,
                    help="serve over the first N local devices: one "
                         "replicated pipeline + slot server per chip "
                         "behind a least-loaded router (--continuous "
                         "only; zero collectives)")
    sv.add_argument("--warmup", action="store_true",
                    help="compile serving programs before binding the "
                         "port (every MicroBatcher ladder size, or the "
                         "slot batch under --continuous), so the first "
                         "live request pays no compile")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8700)
    sv.set_defaults(fn=cmd_serve)

    for p in (f5, ka, it, vc, qw):
        p.add_argument("--quantize", type=int, choices=(4, 8),
                       help="weight-only int8/int4 on the model's LM/DiT")
        p.add_argument("--npz",
                       help="load fused params from .npz (fast start)")
        p.add_argument("--save-npz", help="persist fused params to .npz")
    for p in (f5, ka, it, vc, qw, sv):
        p.add_argument("--compile-cache", nargs="?", const="",
                       metavar="DIR",
                       help="persistent XLA compilation cache: restarted "
                            "processes load compiled programs from DIR "
                            "(default ~/.cache/tts_tpu/xla-cache) instead "
                            "of recompiling")

    args = ap.parse_args(argv)
    if getattr(args, "compile_cache", None) is not None:
        from .utils.compile_cache import enable_compile_cache

        d = enable_compile_cache(args.compile_cache or None)
        print(f"compile cache: {d}")
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
