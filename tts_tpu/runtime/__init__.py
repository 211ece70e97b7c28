from .vocoder import BigVGANVocoder

__all__ = ["BigVGANVocoder", "F5Pipeline", "KaniPipeline", "IndexTTSPipeline"]


def __getattr__(name):
    # lazy imports: each pipeline pulls its model family only when used
    if name == "F5Pipeline":
        from .f5 import F5Pipeline

        return F5Pipeline
    if name == "KaniPipeline":
        from .kani import KaniPipeline

        return KaniPipeline
    if name == "IndexTTSPipeline":
        from .indextts import IndexTTSPipeline

        return IndexTTSPipeline
    raise AttributeError(name)
