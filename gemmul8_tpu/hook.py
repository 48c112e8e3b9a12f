"""Transparent dot_general interposer ("hook mode").

The TPU-native equivalent of the reference's LD_PRELOAD cuBLAS interposer
(reference: src/hook.cu:609-730, 846-1055). Instead of intercepting dynamic
symbols, we wrap the `dot_general` PRIMITIVE's bind -- the single funnel through
which every JAX matmul flows (jnp.matmul / jnp.dot / jnp.einsum / flax / user
lax.dot_general calls, including default-parameter-bound references that module
patching cannot reach). Eligible f32/f64/c64/c128 contractions are rerouted to
the Ozaki-II emulator at trace time.

Config mirrors the env-var contract (GEMMUL8_NUM_MOD_{S,D,C,Z}, GEMMUL8_FASTMODE_*,
GEMMUL8_BACKEND; reference hook.cu:20-38) with optional explicit overrides.
Out-of-range num_moduli falls through to the native dot_general (hook.cu:625-629).
Arbitrary dimension_numbers are canonicalized to a batched (B, M, K) x (B, K, N)
contraction and vmapped. Hooked matmuls remain DIFFERENTIABLE: a custom VJP
routes the backward GEMMs through the emulator too.

Semantics note (vs the binary interposer): interception happens when a function
is TRACED. install()/uninstall() clear jit caches so prior traces don't leak.
While installed, GEMMUL8_* mutations through os.environ are watched and clear
the jit caches automatically, so setenv-between-GEMMs works exactly like the
reference's re-read-per-call contract (hook.cu:283-310); refresh() remains as
a manual fallback for out-of-band env changes (e.g. ctypes putenv).
"""
from __future__ import annotations

import contextlib
import functools
import os
import weakref
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import complex_gemm, config, core

_ELIGIBLE = {"float32", "float64", "complex64", "complex128"}

_state = threading.local()


def _st():
    if not hasattr(_state, "depth"):
        _state.depth = 0
    return _state


# install()'s explicit config is a PROCESS-global override (the docstring's
# "global override for all eligible dtypes"): matmuls traced on worker
# threads must see it too, so it cannot live in the thread-local state
# (only the re-entrancy depth is per-thread).
_overrides: Optional[config.GemmConfig] = None


def _primitive():
    from jax._src.lax import lax as lax_impl
    return lax_impl.dot_general_p


_orig_bind = None
_installed = False


@functools.lru_cache(maxsize=None)
def _emulated_2d(cfg: config.GemmConfig, is_complex: bool):
    """Differentiable emulated 2D matmul for a fixed config (cached)."""
    if is_complex:
        def _inner(a, b):
            return complex_gemm.emulate_matmul_complex(
                a, b, num_moduli=cfg.num_moduli, fastmode=cfg.fastmode,
                backend=cfg.backend, epilogue=cfg.epilogue)
    else:
        def _inner(a, b):
            return core.emulate_matmul(
                a, b, num_moduli=cfg.num_moduli, fastmode=cfg.fastmode,
                backend=cfg.backend, epilogue=cfg.epilogue)

    def base(a, b):
        # re-entrancy guard around EVERY trace of the emulator body, not
        # just _hook_bind's: the custom-VJP bwd below is traced during the
        # backward pass, OUTSIDE the bind-time guard -- without this the
        # emulator's own internal eligible dots would be re-intercepted
        st = _st()
        st.depth += 1
        try:
            return _inner(a, b)
        finally:
            st.depth -= 1

    @jax.custom_vjp
    def f(a, b):
        return base(a, b)

    def fwd(a, b):
        return base(a, b), (a, b)

    def bwd(res, g):
        a, b = res
        # the LINEAR transpose (no conjugation): custom_vjp must mirror
        # lax.dot_general's transpose rule -- JAX's autodiff handles the
        # Wirtinger conjugations at the grad level, so conjugating here
        # would double-apply it and corrupt complex gradients
        return base(g, b.T), base(a.T, g)

    f.defvjp(fwd, bwd)
    return f


def _canonicalize(lhs, rhs, dimension_numbers):
    """Rearrange an arbitrary dot_general into (B, M, K) x (B, K, N)."""
    (lc, rc), (lb, rb) = dimension_numbers
    lc, rc, lb, rb = map(tuple, (lc, rc, lb, rb))
    l_free = tuple(i for i in range(lhs.ndim) if i not in lc and i not in lb)
    r_free = tuple(i for i in range(rhs.ndim) if i not in rc and i not in rb)
    lhs_t = jnp.transpose(lhs, lb + l_free + lc)
    rhs_t = jnp.transpose(rhs, rb + rc + r_free)
    bshape = tuple(lhs.shape[i] for i in lb)
    m = int(np.prod([lhs.shape[i] for i in l_free], dtype=np.int64)) if l_free else 1
    n = int(np.prod([rhs.shape[i] for i in r_free], dtype=np.int64)) if r_free else 1
    k = int(np.prod([lhs.shape[i] for i in lc], dtype=np.int64)) if lc else 1
    bsz = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    lhs3 = lhs_t.reshape(bsz, m, k)
    rhs3 = rhs_t.reshape(bsz, k, n)
    out_shape = bshape + tuple(lhs.shape[i] for i in l_free) + \
        tuple(rhs.shape[i] for i in r_free)
    return lhs3, rhs3, out_shape


# ---------------------------------------------------------------------------
# eager-mode operand-plane cache: the automatic analog of the reference
# hook's pointer-identity skip-scal cache (hook.cu:87-107 Info_t). Keyed by
# object identity + config; weakref.finalize evicts entries when the source
# array dies, so a recycled id can never serve stale planes (the identity is
# checked while the object is provably alive). jax.Arrays are immutable, so
# identity implies content -- stronger than the reference's raw pointer
# match. Scope: DIRECT eager lax.dot_general calls with fast-mode real
# unbatched configs (jnp operators run under implicit jit and see tracers;
# inside traced programs use g8.precompute for explicit reuse). Capped.
# ---------------------------------------------------------------------------
_plane_cache: dict = {}
_CACHE_MAX = 8
cache_hits = 0


def _cache_enabled(side: str) -> bool:
    """Per-side skip-scal gate, mirroring the reference env contract
    (hook.cu:20-38): GEMMUL8_SKIP_SCALE_A / _B enable ("1") or disable ("0")
    operand-plane reuse for that side; unset sides follow the master switch
    GEMMUL8_EAGER_CACHE (default on -- safe here because jax.Arrays are
    immutable, so identity implies content, unlike the reference's raw
    device pointers which require explicit opt-in)."""
    v = os.environ.get(f"GEMMUL8_SKIP_SCALE_{side}")
    if v is not None:
        return v.lower() not in ("0", "false")
    return os.environ.get("GEMMUL8_EAGER_CACHE", "1").lower() not in ("0", "false")


def _cached_operand(arr2d, side, cfg, owner, canon):
    """canon: hashable description of how `owner` was canonicalized into
    arr2d (contracting/batch dims + shape). Two eager calls on the same
    array object with different dimension_numbers canonicalize differently
    and must not share planes."""
    global cache_hits
    key = (id(owner), side, canon, owner.shape, cfg.num_moduli, cfg.backend)
    hit = _plane_cache.get(key)
    if hit is not None:
        cache_hits += 1
        return hit
    q = core.precompute(arr2d, side, num_moduli=cfg.num_moduli,
                        backend=cfg.backend)
    if len(_plane_cache) >= _CACHE_MAX:
        _plane_cache.pop(next(iter(_plane_cache)))
    _plane_cache[key] = q
    try:
        weakref.finalize(owner, _plane_cache.pop, key, None)
    except TypeError:
        _plane_cache.pop(key, None)   # not weakref-able: do not cache
        return q
    return q


def clear_plane_cache() -> None:
    """Drop all cached operand planes (the skip-scal cache)."""
    _plane_cache.clear()


def _emulated_dot_general(lhs, rhs, dimension_numbers, cfg: config.GemmConfig):
    lhs3, rhs3, out_shape = _canonicalize(lhs, rhs, dimension_numbers)
    is_cplx = bool(jnp.issubdtype(lhs.dtype, jnp.complexfloating))
    eager = not isinstance(lhs, jax.core.Tracer)         and not isinstance(rhs, jax.core.Tracer)
    cache_a, cache_b = _cache_enabled("A"), _cache_enabled("B")
    if (eager and cfg.fastmode is True and not is_cplx and lhs3.shape[0] == 1
            and lhs3.shape[2] > 0 and (cache_a or cache_b)):
        # k == 0 skips the cache path: precompute's norm reductions have no
        # identity over an empty axis; the emulator (and native) return zeros
        (lc, rc), (lb, rb) = dimension_numbers
        canon_l = (tuple(lc), tuple(lb))
        canon_r = (tuple(rc), tuple(rb))
        qa = (_cached_operand(lhs3[0], "A", cfg, lhs, canon_l) if cache_a
              else core.precompute(lhs3[0], "A", num_moduli=cfg.num_moduli,
                                   backend=cfg.backend))
        qb = (_cached_operand(rhs3[0], "B", cfg, rhs, canon_r) if cache_b
              else core.precompute(rhs3[0], "B", num_moduli=cfg.num_moduli,
                                   backend=cfg.backend))
        out = core.gemm_quantized(qa, qb, out_dtype=lhs.dtype,
                                  epilogue=cfg.epilogue)[None]
        return out.reshape(out_shape)
    fn = _emulated_2d(cfg, is_cplx)
    if lhs3.shape[0] == 1:
        out = fn(lhs3[0], rhs3[0])[None]
    else:
        out = jax.vmap(fn)(lhs3, rhs3)
    return out.reshape(out_shape)


def _hook_bind(lhs, rhs, *rest, **params):
    st = _st()
    dimension_numbers = params.get("dimension_numbers")
    pet = params.get("preferred_element_type")
    dt = np.dtype(getattr(lhs, "dtype", np.int32)).name
    rdt = np.dtype(getattr(rhs, "dtype", np.int32)).name
    eligible = (
        st.depth == 0
        and not rest
        and dimension_numbers is not None
        and dt == rdt
        and dt in _ELIGIBLE
        and (pet is None or np.dtype(pet).name == dt)
    )
    if eligible:
        cfg = _overrides if _overrides is not None else config.env_config(dt)
        if cfg is not None and cfg.validate(dt):
            st.depth += 1
            try:
                return _emulated_dot_general(lhs, rhs, dimension_numbers, cfg)
            finally:
                st.depth -= 1
    return _orig_bind(lhs, rhs, *rest, **params)


# ---------------------------------------------------------------------------
# eager operator interception: jnp.matmul / a @ b run under implicit jit, so
# the primitive hook only ever sees tracers and the plane cache cannot hit.
# To give the common call paths the reference Info_t behavior (hook.cu:87-107
# -- repeated GEMMs on the same operand skip re-quantization), install() also
# wraps the function-level entries: the jnp.matmul/jnp.dot module attributes
# AND the PjitFunction captured in jax.Array.__matmul__'s closure cell (the
# operator binds the function object at class creation, so module patching
# alone cannot reach `a @ b`). Concrete 2-D eligible calls route through the
# eager cached path; everything else falls through to the original (where
# the primitive hook still applies inside traces).
# ---------------------------------------------------------------------------
_fn_patches: list = []


def _warn_cell_missing(name: str) -> None:
    """The eager operator cache degrades silently if a JAX upgrade renames
    the 'binary_op' freevar in jax.Array.__matmul__'s closure; surface that
    so the degradation is visible (primitive-level hooking still applies)."""
    import warnings
    warnings.warn(
        f"gemmul8_tpu.hook: could not locate the 'binary_op' closure cell in "
        f"jax.Array.{name}; the eager operand-plane cache will not apply to "
        f"the '@' operator on this JAX version (hooking inside jit is "
        f"unaffected)", RuntimeWarning, stacklevel=3)


def _eager_matmul_wrapper(orig):
    @functools.wraps(orig)
    def wrapped(a, b, *args, **kwargs):
        if (_installed and not args and not kwargs
                and isinstance(a, jax.Array) and isinstance(b, jax.Array)
                and not isinstance(a, jax.core.Tracer)
                and not isinstance(b, jax.core.Tracer)
                and getattr(a, "ndim", 0) == 2 and getattr(b, "ndim", 0) == 2
                and a.shape[1] == b.shape[0]):
            st = _st()
            dt = np.dtype(a.dtype).name
            # only divert when the eager plane cache applies (fast-mode real
            # configs); everything else runs the original implicit-jit path,
            # where the primitive hook compiles the emulation once
            if (st.depth == 0 and dt == np.dtype(b.dtype).name
                    and dt in ("float32", "float64")
                    and (_cache_enabled("A") or _cache_enabled("B"))):
                cfg = _overrides if _overrides is not None \
                    else config.env_config(dt)
                if cfg is not None and cfg.fastmode is True and cfg.validate(dt):
                    st.depth += 1
                    try:
                        return _emulated_dot_general(
                            a, b, (((1,), (0,)), ((), ())), cfg)
                    finally:
                        st.depth -= 1
        return orig(a, b, *args, **kwargs)
    return wrapped


def _patch_functions():
    if _fn_patches:
        return
    arr_t = type(jnp.zeros((), jnp.float32))
    for name in ("__matmul__", "__rmatmul__"):
        op = getattr(arr_t, name, None)
        if op is None or op.__closure__ is None:
            _warn_cell_missing(name)
            continue
        try:
            idx = op.__code__.co_freevars.index("binary_op")
        except ValueError:
            _warn_cell_missing(name)
            continue
        cell = op.__closure__[idx]
        orig = cell.cell_contents
        cell.cell_contents = _eager_matmul_wrapper(orig)
        _fn_patches.append(("cell", cell, orig))
    for mod, name in ((jnp, "matmul"), (jnp, "dot")):
        orig = getattr(mod, name)
        setattr(mod, name, _eager_matmul_wrapper(orig))
        _fn_patches.append(("attr", (mod, name), orig))


def _unpatch_functions():
    while _fn_patches:
        kind, where, orig = _fn_patches.pop()
        if kind == "cell":
            where.cell_contents = orig
        else:
            mod, name = where
            setattr(mod, name, orig)


# ---------------------------------------------------------------------------
# env-change auto-detection: the reference hook re-reads GEMMUL8_* on EVERY
# call (hook.cu:283-310), so apps may setenv() between GEMMs. Under XLA the
# config is baked into compiled executables at trace time, so a changed env
# var must invalidate the jit caches. Polling at bind time cannot work (a
# cache-hit never re-traces), so instead we watch writes: while installed,
# os.environ mutations of GEMMUL8_* keys clear the caches, making the next
# call re-trace with the new config -- no manual refresh() needed.
# ---------------------------------------------------------------------------
_env_unpatched = None
_env_patch_lock = threading.Lock()


def _patch_environ():
    """Install the os.environ watch. NOTE the cost: this rewrites
    os._Environ.__setitem__/__delitem__ CLASS-wide until uninstall(), and a
    GEMMUL8_* write calls jax.clear_caches(), which evicts ALL of the
    application's compiled executables (XLA bakes hook config into traces at
    trace time, so a narrower invalidation is not possible from here). Apps
    that never setenv() between GEMMs pay nothing."""
    global _env_unpatched
    with _env_patch_lock:
        if _env_unpatched is not None:
            return
        cls = type(os.environ)
        orig_set, orig_del = cls.__setitem__, cls.__delitem__

        def setitem(self, key, value):
            stale = (_installed and isinstance(key, str)
                     and key.startswith("GEMMUL8_") and self.get(key) != value)
            orig_set(self, key, value)
            if stale:
                jax.clear_caches()

        def delitem(self, key):
            stale = (_installed and isinstance(key, str)
                     and key.startswith("GEMMUL8_") and key in self)
            orig_del(self, key)
            if stale:
                jax.clear_caches()

        cls.__setitem__, cls.__delitem__ = setitem, delitem
        _env_unpatched = (cls, orig_set, orig_del)


def _unpatch_environ():
    global _env_unpatched
    with _env_patch_lock:
        if _env_unpatched is not None:
            cls, orig_set, orig_del = _env_unpatched
            cls.__setitem__, cls.__delitem__ = orig_set, orig_del
            _env_unpatched = None


def install(num_moduli: Optional[int] = None, fastmode: Optional[bool] = None,
            backend: Optional[str] = None) -> None:
    """Install the interposer. With no args, config comes from GEMMUL8_* env vars
    per traced dtype (dtypes without GEMMUL8_NUM_MOD_* stay native). Explicit
    args set a global override for all eligible dtypes.

    While installed, GEMMUL8_* changes via os.environ take effect on the next
    call automatically (the env-watch clears jit caches), matching the
    reference's re-read-per-call contract (hook.cu:283-310)."""
    global _orig_bind, _installed, _overrides
    if num_moduli is not None:
        _overrides = config.GemmConfig(
            num_moduli=num_moduli,
            fastmode=True if fastmode is None else fastmode,
            backend=(backend or "INT8").upper())
    else:
        _overrides = None
    if not _installed:
        prim = _primitive()
        _orig_bind = prim.bind
        prim.bind = _hook_bind
        _installed = True
    _patch_environ()
    _patch_functions()
    # drop executables traced before install / under a different override
    jax.clear_caches()


def uninstall() -> None:
    global _installed, _overrides
    if _installed:
        _primitive().bind = _orig_bind
        _installed = False
        _unpatch_environ()
        _unpatch_functions()
        jax.clear_caches()  # drop traces that baked in the emulation
    _overrides = None


def refresh() -> None:
    """Re-read config on the next trace of every jitted callable. Call after
    changing GEMMUL8_* env vars (the reference hook re-reads env per call,
    hook.cu:283-310; under XLA, config is baked at trace time instead)."""
    jax.clear_caches()


@contextlib.contextmanager
def emulate(num_moduli: Optional[int] = None, fastmode: bool = True,
            backend: str = "INT8"):
    """Context manager: route eligible matmuls through the emulator inside the
    block. `with gemmul8_tpu.emulate(num_moduli=8): y = model(x)`"""
    global _overrides
    was_installed = _installed
    prev_overrides = _overrides
    install(num_moduli=num_moduli, fastmode=fastmode, backend=backend)
    try:
        yield
    finally:
        if was_installed:
            _overrides = prev_overrides
            jax.clear_caches()
        else:
            uninstall()
