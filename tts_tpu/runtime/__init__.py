from .vocoder import BigVGANVocoder

__all__ = ["BigVGANVocoder"]
