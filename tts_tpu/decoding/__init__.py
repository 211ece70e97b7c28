from .beam import BeamState, beam_init, beam_step
from .loop import DecodeState, decode_loop
from .sampling import apply_repetition_penalty, greedy

__all__ = [
    "BeamState", "beam_init", "beam_step",
    "DecodeState", "decode_loop",
    "apply_repetition_penalty", "greedy",
]
