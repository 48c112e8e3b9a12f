"""Torch interop (gemmul8_tpu.interop): the LD_PRELOAD-analog for PyTorch.

Covers torch_gemm vs the core path (bitwise), the TorchFunctionMode
interceptor (operator @, torch.matmul, nn.Linear), autograd through the
emulated backward, env-contract fallthrough, and ineligible-input
fallthrough.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import gemmul8_tpu as g8  # noqa: E402
from gemmul8_tpu import interop  # noqa: E402


def _t(x, dtype=torch.float64):
    return torch.tensor(x, dtype=dtype)


def _rand(shape, seed, dtype=torch.float64):
    r = np.random.default_rng(seed)
    return torch.from_numpy(r.standard_normal(shape)).to(dtype)


def test_torch_gemm_matches_core_bitwise():
    a, b = _rand((33, 17), 0), _rand((17, 21), 1)
    out = interop.torch_gemm(a, b, num_moduli=12)
    want = np.asarray(g8.gemm(jnp.asarray(a.numpy()), jnp.asarray(b.numpy()),
                              num_moduli=12))
    np.testing.assert_array_equal(out.numpy(), want)
    assert out.dtype == torch.float64


def test_torch_gemm_complex_and_validation():
    r = np.random.default_rng(2)
    a = torch.from_numpy(r.standard_normal((8, 8))
                         + 1j * r.standard_normal((8, 8)))
    b = torch.from_numpy(r.standard_normal((8, 8))
                         + 1j * r.standard_normal((8, 8)))
    out = interop.torch_gemm(a, b, num_moduli=16)
    ref = a.numpy() @ b.numpy()
    assert np.max(np.abs(out.numpy() - ref)) / np.max(np.abs(ref)) < 1e-12
    with pytest.raises(ValueError, match="2-D"):
        interop.torch_gemm(torch.zeros(3), torch.zeros(3))
    with pytest.raises(TypeError):
        interop.torch_gemm(torch.zeros((2, 2), dtype=torch.int32),
                           torch.zeros((2, 2), dtype=torch.int32))
    with pytest.raises(ValueError, match="out of range"):
        interop.torch_gemm(_rand((4, 4), 3), _rand((4, 4), 4), num_moduli=99)


def test_emulate_torch_intercepts_operator_and_matmul():
    a, b = _rand((24, 16), 5), _rand((16, 12), 6)
    want = interop.torch_gemm(a, b, num_moduli=8).numpy()
    with interop.emulate_torch(num_moduli=8) as mode:
        c1 = a @ b
        c2 = torch.matmul(a, b)
        c3 = torch.mm(a, b)
    assert mode.intercepted == 3
    for c in (c1, c2, c3):
        np.testing.assert_array_equal(c.numpy(), want)
    # outside the block everything is native again (torch's own BLAS --
    # close to numpy but not necessarily bitwise-equal to it)
    native = (a @ b).numpy()
    np.testing.assert_allclose(native, a.numpy() @ b.numpy(), rtol=1e-13)


def test_emulate_torch_nn_linear():
    torch.manual_seed(0)
    lin = torch.nn.Linear(16, 8, dtype=torch.float64)
    x = _rand((5, 16), 7)
    with interop.emulate_torch(num_moduli=14) as mode:
        y = lin(x)
    assert mode.intercepted == 1
    ref = lin(x)
    assert torch.max(torch.abs(y - ref)).item() < 1e-11
    # batched leading dims reshape through the 2-D matmul
    xb = _rand((3, 4, 16), 8)
    with interop.emulate_torch(num_moduli=14) as mode:
        yb = lin(xb)
    assert mode.intercepted == 1 and yb.shape == (3, 4, 8)
    assert torch.max(torch.abs(yb - lin(xb))).item() < 1e-11


def test_emulate_torch_autograd_backward_emulated():
    a = _rand((10, 6), 9).requires_grad_(True)
    b = _rand((6, 4), 10).requires_grad_(True)
    with interop.emulate_torch(num_moduli=16):
        loss = ((a @ b) ** 2).sum()
    loss.backward()
    # native grads for comparison
    a2 = a.detach().clone().requires_grad_(True)
    b2 = b.detach().clone().requires_grad_(True)
    ((a2 @ b2) ** 2).sum().backward()
    assert torch.max(torch.abs(a.grad - a2.grad)).item() < 1e-10
    assert torch.max(torch.abs(b.grad - b2.grad)).item() < 1e-10


def test_emulate_torch_fallthrough_rules():
    a32 = _rand((4, 4), 11, torch.float32)
    i32 = torch.ones((4, 4), dtype=torch.int32)
    v = _rand((4,), 12)
    with interop.emulate_torch(num_moduli=8) as mode:
        _ = i32 @ i32          # non-float: native
        _ = a32 @ v.to(torch.float32)  # 1-D: native
        _ = torch.matmul(a32, a32.T)   # eligible
    assert mode.intercepted == 1
    # int result correctness through the fallthrough
    assert torch.equal(i32 @ i32, torch.full((4, 4), 4, dtype=torch.int32))


def test_emulate_torch_env_contract(monkeypatch):
    a, b = _rand((8, 8), 13), _rand((8, 8), 14)
    # num_moduli=None defers to GEMMUL8_NUM_MOD_D; unset -> native
    with interop.emulate_torch(num_moduli=None) as mode:
        monkeypatch.delenv("GEMMUL8_NUM_MOD_D", raising=False)
        _ = a @ b
        assert mode.intercepted == 0
        monkeypatch.setenv("GEMMUL8_NUM_MOD_D", "10")
        c = a @ b
        assert mode.intercepted == 1
        monkeypatch.setenv("GEMMUL8_NUM_MOD_D", "99")  # out of range: native
        _ = a @ b
        assert mode.intercepted == 1
    want = interop.torch_gemm(a, b, num_moduli=10).numpy()
    np.testing.assert_array_equal(c.numpy(), want)
