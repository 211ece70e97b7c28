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
]
