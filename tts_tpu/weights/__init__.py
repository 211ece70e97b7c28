from .loaders import (
    bigvgan_config_from_json,
    bigvgan_params_from_state_dict,
    collapse_weight_norm,
    load_bigvgan,
    load_torch_state_dict,
)

__all__ = [
    "bigvgan_config_from_json",
    "bigvgan_params_from_state_dict",
    "collapse_weight_norm",
    "load_bigvgan",
    "load_torch_state_dict",
    # per-family loaders (lazy — they import torch/safetensors on use)
    "load_f5", "load_vocos",
    "load_kani_lm", "load_nanocodec",
    "load_indextts",
    "load_qwen_tts",
    "load_voxcpm",
]

_LAZY = {
    "load_f5": ("tts_tpu.weights.f5_loader", "load_f5"),
    "load_vocos": ("tts_tpu.weights.f5_loader", "load_vocos"),
    "load_kani_lm": ("tts_tpu.weights.kani_loader", "load_kani_lm"),
    "load_nanocodec": ("tts_tpu.weights.kani_loader", "load_nanocodec"),
    "load_indextts": ("tts_tpu.weights.indextts_loader", "load_indextts"),
    "load_qwen_tts": ("tts_tpu.weights.qwen_loader", "load_qwen_tts"),
    "load_voxcpm": ("tts_tpu.weights.voxcpm_loader", "load_voxcpm"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
