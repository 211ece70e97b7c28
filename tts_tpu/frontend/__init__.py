from .f5_text import convert_char_to_pinyin, f5_duration, text_to_ids

__all__ = ["convert_char_to_pinyin", "f5_duration", "text_to_ids"]
