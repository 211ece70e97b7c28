from .vocoder import BigVGANVocoder

__all__ = [
    "BigVGANVocoder",
    "F5Pipeline",
    "KaniPipeline",
    "IndexTTSPipeline",
    "QwenTTSPipeline",
    "VoxCPMPipeline",
]

_LAZY = {
    "F5Pipeline": ("tts_tpu.runtime.f5", "F5Pipeline"),
    "KaniPipeline": ("tts_tpu.runtime.kani", "KaniPipeline"),
    "IndexTTSPipeline": ("tts_tpu.runtime.indextts", "IndexTTSPipeline"),
    "QwenTTSPipeline": ("tts_tpu.runtime.qwen", "QwenTTSPipeline"),
    "VoxCPMPipeline": ("tts_tpu.runtime.voxcpm", "VoxCPMPipeline"),
}


def __getattr__(name):
    # lazy imports: each pipeline pulls its model family only when used
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
