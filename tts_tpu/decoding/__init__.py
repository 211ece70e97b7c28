from .beam import BeamState, beam_init, beam_step
from .sampling import apply_repetition_penalty, greedy

__all__ = [
    "BeamState", "beam_init", "beam_step",
    "apply_repetition_penalty", "greedy",
]
