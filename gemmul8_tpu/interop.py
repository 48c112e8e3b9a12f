"""PyTorch interop: route torch matmuls through the emulated GEMM.

The reference's LD_PRELOAD hook transparently accelerates existing cuBLAS
applications — most prominently PyTorch — without code changes (reference:
src/hook.cu:846-1055, README.md:258-268). The JAX-native analog of that hook
is `gemmul8_tpu.hook`; this module is the same story for PyTorch programs:

  * ``torch_gemm(a, b, ...)`` — explicit emulated GEMM on torch tensors
    (the direct-API analog).
  * ``emulate_torch(...)`` — a context manager built on
    ``torch.overrides.TorchFunctionMode`` (the in-process analog of
    LD_PRELOAD interposition: it sees every torch API call, including
    ``a @ b`` operator dispatch and ``torch.nn.functional.linear`` inside
    ``nn.Linear``) that reroutes eligible 2-D float32/float64/complex
    contractions through the emulator. Anything else — other dtypes, 1-D/
    batched shapes, non-CPU tensors — falls through to native torch,
    mirroring the reference hook's dlsym(RTLD_NEXT) fallthrough
    (hook.cu:625-629).

Gradients: intercepted matmuls are wrapped in a ``torch.autograd.Function``
whose backward GEMMs are ALSO emulated (the same contract as the JAX hook's
custom VJP — training-ready). Complex tensors that require grad fall through
to native (Wirtinger conventions differ; the no-grad complex path is
emulated).

Config: explicit kwargs, or — when ``num_moduli=None`` — the per-dtype
``GEMMUL8_NUM_MOD_{S,D,C,Z}`` / ``GEMMUL8_FASTMODE_*`` / ``GEMMUL8_BACKEND``
environment contract shared with the hook (reference hook.cu:20-38), with
out-of-range values meaning native fallthrough.

Data moves host↔host (torch CPU tensor ↔ numpy ↔ JAX default device); on a
TPU host this runs the contraction on the MXU and returns to torch.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import config as g8config
from . import core, tables

try:  # torch is an optional dependency of this module only
    import torch
    from torch.overrides import TorchFunctionMode
    _HAVE_TORCH = True
except Exception:  # pragma: no cover - torch is present in CI images
    torch = None

    class TorchFunctionMode:  # type: ignore[no-redef]
        pass

    _HAVE_TORCH = False

_TORCH_DTYPE_NAME = {}
if _HAVE_TORCH:
    _TORCH_DTYPE_NAME = {
        torch.float32: "float32", torch.float64: "float64",
        torch.complex64: "complex64", torch.complex128: "complex128",
    }


def _require_torch():
    if not _HAVE_TORCH:
        raise ImportError("gemmul8_tpu.interop needs pytorch installed")


def _resolve_cfg(dtype_name: str, num_moduli, fastmode, backend):
    """Explicit kwargs win; num_moduli=None defers to the GEMMUL8_* env
    contract (None result = native fallthrough, like the reference hook)."""
    if num_moduli is None:
        return g8config.env_config(dtype_name)
    cfg = g8config.GemmConfig(num_moduli=num_moduli, fastmode=fastmode,
                              backend=backend)
    if not cfg.validate(dtype_name):
        return None
    return cfg


def _emulate_np(a: np.ndarray, b: np.ndarray, cfg) -> np.ndarray:
    out = core.gemm(jnp.asarray(a), jnp.asarray(b),
                    num_moduli=cfg.num_moduli, fastmode=cfg.fastmode,
                    backend=cfg.backend, epilogue=cfg.epilogue)
    # writable copy: torch.from_numpy refuses (warns on) the read-only
    # buffer that np.asarray(jax_array) returns
    return np.array(out)


def _check_x64(dtype_name: str):
    import jax
    if dtype_name in ("float64", "complex128") and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "emulating torch float64/complex128 needs jax_enable_x64=True; "
            "run jax.config.update('jax_enable_x64', True) first")


class _EmulatedMatmul(torch.autograd.Function if _HAVE_TORCH else object):
    """out = a @ b with BOTH the forward and the backward GEMMs emulated
    (the torch analog of hook.py's custom VJP)."""

    @staticmethod
    def forward(ctx, a, b, cfg):
        ctx.save_for_backward(a, b)
        ctx.cfg = cfg
        out = _emulate_np(a.detach().numpy(), b.detach().numpy(), cfg)
        return torch.from_numpy(out).to(a.dtype)

    @staticmethod
    def backward(ctx, g):
        a, b = ctx.saved_tensors
        cfg = ctx.cfg
        g_np = g.detach().numpy()
        ga = gb = None
        if ctx.needs_input_grad[0]:
            ga = torch.from_numpy(
                _emulate_np(g_np, b.detach().numpy().T, cfg)).to(a.dtype)
        if ctx.needs_input_grad[1]:
            gb = torch.from_numpy(
                _emulate_np(a.detach().numpy().T, g_np, cfg)).to(b.dtype)
        return ga, gb, None


def torch_gemm(a, b, *, num_moduli: int = 8, fastmode=True,
               backend: str = tables.Backend.INT8):
    """Emulated C = A @ B on 2-D CPU torch tensors (f32/f64/c64/c128).
    Differentiable for real dtypes (backward GEMMs emulated too)."""
    _require_torch()
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"torch_gemm expects 2-D tensors, got "
                         f"{tuple(a.shape)} @ {tuple(b.shape)}")
    if a.device.type != "cpu" or b.device.type != "cpu":
        raise ValueError("torch_gemm operates on CPU torch tensors "
                         "(the emulated compute runs on JAX's device)")
    name = _TORCH_DTYPE_NAME.get(a.dtype)
    if name is None or a.dtype != b.dtype:
        raise TypeError(f"unsupported/mismatched dtypes {a.dtype}, {b.dtype}")
    _check_x64(name)
    cfg = _resolve_cfg(name, num_moduli, fastmode, backend)
    if cfg is None:
        raise ValueError(f"num_moduli={num_moduli} out of range for {name}")
    if name.startswith("complex"):
        if a.requires_grad or b.requires_grad:
            raise NotImplementedError(
                "complex autograd through the emulator is not wired "
                "(Wirtinger conventions); detach() or use real dtypes")
        return torch.from_numpy(
            _emulate_np(a.numpy(), b.numpy(), cfg)).to(a.dtype)
    return _EmulatedMatmul.apply(a, b, cfg)


class _EmulateTorchMode(TorchFunctionMode):
    """TorchFunctionMode rerouting 2-D CPU float matmuls through the
    emulator; everything else falls through to native torch."""

    def __init__(self, num_moduli, fastmode, backend):
        super().__init__()
        self._args = (num_moduli, fastmode, backend)
        self.intercepted = 0  # observability for tests/debugging

    def _try_emulate(self, a, b):
        if not (isinstance(a, torch.Tensor) and isinstance(b, torch.Tensor)):
            return None
        if a.ndim != 2 or b.ndim != 2:
            return None
        if a.device.type != "cpu" or b.device.type != "cpu":
            return None
        name = _TORCH_DTYPE_NAME.get(a.dtype)
        if name is None or b.dtype != a.dtype:
            return None
        if name.startswith("complex") and (a.requires_grad
                                           or b.requires_grad):
            return None  # native fallthrough, see module docstring
        cfg = _resolve_cfg(name, *self._args)
        if cfg is None:
            return None  # out-of-range num_moduli -> native (hook parity)
        _check_x64(name)
        self.intercepted += 1
        if name.startswith("complex"):
            return torch.from_numpy(
                _emulate_np(a.numpy(), b.numpy(), cfg)).to(a.dtype)
        return _EmulatedMatmul.apply(a, b, cfg)

    def __torch_function__(self, func, types, args=(), kwargs=None):
        kwargs = kwargs or {}
        if func in _MATMUL_FUNCS and len(args) >= 2 and not kwargs:
            out = self._try_emulate(args[0], args[1])
            if out is not None:
                return out
        elif func in _LINEAR_FUNCS and len(args) >= 2:
            x, w = args[0], args[1]
            bias = args[2] if len(args) > 2 else kwargs.get("bias")
            if (isinstance(x, torch.Tensor) and isinstance(w, torch.Tensor)
                    and x.ndim >= 2 and w.ndim == 2):
                lead = x.shape[:-1]
                x2 = x.reshape(-1, x.shape[-1])
                # linear is x @ w^T; materialize w^T so _try_emulate sees a
                # plain 2-D matmul (transposed-view numpy strides are fine)
                out = self._try_emulate(x2, w.mT)
                if out is not None:
                    out = out.reshape(*lead, w.shape[0])
                    return out if bias is None else out + bias
        return func(*args, **kwargs)


_MATMUL_FUNCS = set()
_LINEAR_FUNCS = set()
if _HAVE_TORCH:
    _MATMUL_FUNCS = {torch.matmul, torch.mm, torch.Tensor.matmul,
                     torch.Tensor.mm, torch.Tensor.__matmul__}
    _LINEAR_FUNCS = {torch.nn.functional.linear}
    if hasattr(torch._C._nn, "linear"):
        _LINEAR_FUNCS.add(torch._C._nn.linear)


def emulate_torch(num_moduli: int | None = 8, fastmode=True,
                  backend: str = tables.Backend.INT8) -> _EmulateTorchMode:
    """Context manager: inside the block, eligible torch matmuls
    (``a @ b``, ``torch.matmul/mm``, ``F.linear`` / ``nn.Linear``) run
    through the emulated GEMM. ``num_moduli=None`` defers to the
    GEMMUL8_* env contract per dtype, exactly like hook mode.

        with gemmul8_tpu.interop.emulate_torch(num_moduli=12):
            y = model(x)   # nn.Linear matmuls now run emulated
    """
    _require_torch()
    return _EmulateTorchMode(num_moduli, fastmode, backend)
