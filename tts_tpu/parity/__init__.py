from .compare import mel_l1, wav_mel_l1, stft_diff_report

__all__ = ["mel_l1", "wav_mel_l1", "stft_diff_report"]
