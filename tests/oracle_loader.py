"""Import machinery for running the reference's OWN torch code as a test
oracle (VERDICT r3 "Next round" #2).

The files under /root/reference/*/modeling_modified/ are written to be
copied over an installed upstream package, so their import statements
name upstream modules (`alias_free_activation.torch.filter`,
`onnxruntime`, `activations`, ...). `load_ref_module` loads a reference
file from its path under a chosen module name while temporarily
installing shim modules in sys.modules for those upstream names — the
shims are either other reference files (e.g. resample.py's filter
import resolves to the reference's filter.py) or inert stand-ins for
modules used only by code paths the tests never run (onnxruntime in
STFT_Process.py is only touched by the export main()).

Nothing here re-implements reference math: the oracle value is that the
forward passes executed are the reference's own lines. The one documented
exception is `snake_stub` (upstream BigVGAN `activations.py` is not in
the reference repo; the stub is the 4-line published Snake/SnakeBeta
formula and is itself cross-checked against the reference VoxCPM
Snake1d / Qwen SnakeBeta in the oracle tests).
"""
from __future__ import annotations

import contextlib
import importlib.util
import sys
import types
from pathlib import Path

REF = Path("/root/reference")

_loaded: dict[str, types.ModuleType] = {}


def stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@contextlib.contextmanager
def shimmed(shims: dict[str, types.ModuleType]):
    """Temporarily install `shims` (name -> module) in sys.modules."""
    old: dict[str, types.ModuleType | None] = {}
    for k, v in shims.items():
        old[k] = sys.modules.get(k)
        sys.modules[k] = v
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def load_ref_module(relpath: str, name: str,
                    shims: dict[str, types.ModuleType] | None = None
                    ) -> types.ModuleType:
    """Load /root/reference/<relpath> as module `name` (cached)."""
    if name in _loaded:
        return _loaded[name]
    path = REF / relpath
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    with shimmed(shims or {}):
        sys.modules[name] = mod
        try:
            spec.loader.exec_module(mod)
        except Exception:
            sys.modules.pop(name, None)
            raise
    _loaded[name] = mod
    return mod


def load_alias_free_chain():
    """Load the reference BigVGAN filter/resample/act trio, wiring
    resample.py's `alias_free_activation.torch.filter` import to the
    reference's own filter.py. Returns (filter, resample, act, shims)
    where `shims` maps the package names for further reference imports
    that need them."""
    pkg = stub("alias_free_activation")
    tpkg = stub("alias_free_activation.torch")
    filt = load_ref_module("BigVGAN/modeling_modified/filter.py",
                           "alias_free_activation.torch.filter")
    tpkg.filter = filt
    pkg.torch = tpkg
    shims = {"alias_free_activation": pkg,
             "alias_free_activation.torch": tpkg}
    res = load_ref_module("BigVGAN/modeling_modified/resample.py",
                          "alias_free_activation.torch.resample",
                          shims=shims)
    tpkg.resample = res
    act = load_ref_module("BigVGAN/modeling_modified/act.py",
                          "ref_bigvgan_act", shims=shims)
    return filt, res, act, dict(shims)


def load_stft_process(family: str = "F5_TTS"):
    """Load <family>/STFT_Process.py (onnxruntime stubbed: only the
    export main() touches it)."""
    return load_ref_module(f"{family}/STFT_Process.py",
                           f"ref_stft_{family.lower()}",
                           shims={"onnxruntime": stub("onnxruntime")})


def snake_stub():
    """Upstream BigVGAN `activations.py` stand-in (see module docstring).

    Snake:     x + (1/(a+eps)) * sin^2(a x)
    SnakeBeta: x + (1/(b+eps)) * sin^2(a x)
    with per-channel a, b stored in log scale when alpha_logscale.
    """
    import torch
    from torch import nn

    class Snake(nn.Module):
        def __init__(self, in_features, alpha=1.0, alpha_trainable=True,
                     alpha_logscale=False):
            super().__init__()
            self.alpha_logscale = alpha_logscale
            init = torch.zeros(in_features) if alpha_logscale else \
                torch.ones(in_features)
            self.alpha = nn.Parameter(init * alpha)
            self.no_div_by_zero = 1e-9

        def forward(self, x):
            a = self.alpha.unsqueeze(0).unsqueeze(-1)
            if self.alpha_logscale:
                a = torch.exp(a)
            return x + (1.0 / (a + self.no_div_by_zero)) * \
                torch.pow(torch.sin(x * a), 2)

    class SnakeBeta(nn.Module):
        def __init__(self, in_features, alpha=1.0, alpha_trainable=True,
                     alpha_logscale=False):
            super().__init__()
            self.alpha_logscale = alpha_logscale
            init = torch.zeros(in_features) if alpha_logscale else \
                torch.ones(in_features)
            self.alpha = nn.Parameter(init * alpha)
            self.beta = nn.Parameter(init * alpha)
            self.no_div_by_zero = 1e-9

        def forward(self, x):
            a = self.alpha.unsqueeze(0).unsqueeze(-1)
            b = self.beta.unsqueeze(0).unsqueeze(-1)
            if self.alpha_logscale:
                a, b = torch.exp(a), torch.exp(b)
            return x + (1.0 / (b + self.no_div_by_zero)) * \
                torch.pow(torch.sin(x * a), 2)

    return stub("activations", Snake=Snake, SnakeBeta=SnakeBeta)


def load_ref_bigvgan():
    """Load the reference's modified bigvgan.py (BigVGAN +
    AMPBlock1/2). Shims: the alias-free trio (reference files), the
    snake stub, and inert `utils`/`env` helpers the constructors use."""
    import torch

    filt, res, act, chain_shims = load_alias_free_chain()

    def init_weights(m, mean=0.0, std=0.01):
        if "Conv" in m.__class__.__name__:
            m.weight.data.normal_(mean, std)

    def get_padding(kernel_size, dilation=1):
        return int((kernel_size * dilation - dilation) / 2)

    class AttrDict(dict):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.__dict__ = self

    shims = {
        **chain_shims,
        "alias_free_activation.torch.act": stub(
            "alias_free_activation.torch.act",
            Activation1d=act.Activation1d),
        "activations": snake_stub(),
        "utils": stub("utils", init_weights=init_weights,
                      get_padding=get_padding),
        "env": stub("env", AttrDict=AttrDict),
    }
    mod = load_ref_module("BigVGAN/modeling_modified/bigvgan.py",
                          "ref_bigvgan", shims=shims)
    mod.AttrDict = AttrDict
    return mod
