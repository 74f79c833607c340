"""Golden weight-transfer tests against torch CPU.

The op layer is pinned in test_ops.py; these tests pin the *layer* layer:
flax convs with explicit padding must match torch Conv2d(padding=k//2) for
every kernel/stride combination the codec uses, including the
conv+PixelShuffle subpel chain, under copied weights. This is what makes
module-level parity with the reference checkable weight-for-weight.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from deepvideocodec_tpu.models.layers import conv, SubpelConv
from deepvideocodec_tpu.models.gdn import GDN

KEY = jax.random.PRNGKey(0)


def to_torch_weight(kernel):
    """flax HWIO -> torch OIHW."""
    return torch.from_numpy(np.asarray(kernel).transpose(3, 2, 0, 1))


def nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)).contiguous()


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize(
    "kernel,stride,h,w",
    [(3, 1, 16, 20), (3, 2, 16, 20), (1, 1, 16, 20), (1, 2, 16, 20),
     (5, 2, 16, 16), (7, 1, 14, 14)],
)
def test_conv_matches_torch(rng, kernel, stride, h, w):
    cin, cout = 6, 8
    layer = conv(cout, kernel, stride)
    x = rng.standard_normal((2, h, w, cin)).astype(np.float32)
    params = layer.init(KEY, jnp.asarray(x))
    out = layer.apply(params, jnp.asarray(x))

    tconv = nn.Conv2d(cin, cout, kernel, stride, padding=kernel // 2)
    with torch.no_grad():
        tconv.weight.copy_(to_torch_weight(params["params"]["kernel"]))
        tconv.bias.copy_(torch.from_numpy(
            np.asarray(params["params"]["bias"])))
        ref = tconv(nchw(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref),
                               rtol=1e-4, atol=1e-5)


def test_subpel_conv_matches_torch(rng):
    """conv(3) -> depth_to_space(2) == torch conv -> PixelShuffle(2)."""
    cin, cout, r = 5, 4, 2
    layer = SubpelConv(cout, r, kernel=3)
    x = rng.standard_normal((1, 8, 10, cin)).astype(np.float32)
    params = layer.init(KEY, jnp.asarray(x))
    out = layer.apply(params, jnp.asarray(x))

    kp = params["params"]["Conv_0"]
    tconv = nn.Conv2d(cin, cout * r * r, 3, 1, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(to_torch_weight(kp["kernel"]))
        tconv.bias.copy_(torch.from_numpy(np.asarray(kp["bias"])))
        ref = F.pixel_shuffle(tconv(nchw(x)), r)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref),
                               rtol=1e-4, atol=1e-5)


def test_gdn_forward_inverse(rng):
    """GDN and IGDN match their closed forms (note IGDN with the same
    params is NOT an exact inverse — it multiplies by the norm of y, not
    of x — so no identity assertion here; that is the standard GDN/IGDN
    pairing from learned image compression)."""
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    g = GDN()
    params = g.init(KEY, x)
    y = g.apply(params, x)
    ig = GDN(inverse=True)
    x_back = ig.apply(params, y)
    # IGDN multiplies by sqrt(beta + gamma @ y^2): verify that closed form
    yn = np.asarray(y)
    ped = 2.0 ** -18
    beta_r0 = np.asarray(params["params"]["beta"])
    gamma_r0 = np.asarray(params["params"]["gamma"])
    beta0 = np.maximum(beta_r0, (1e-6 + ped) ** 0.5) ** 2 - ped
    gamma0 = np.maximum(gamma_r0, ped ** 0.5) ** 2 - ped
    norm_y = np.sqrt(np.einsum("bhwj,ji->bhwi", yn ** 2, gamma0) + beta0)
    np.testing.assert_allclose(np.asarray(x_back), yn * norm_y,
                               rtol=1e-5, atol=1e-6)

    # matches the closed form x / sqrt(beta + gamma @ x^2)
    beta_r = np.asarray(params["params"]["beta"])
    gamma_r = np.asarray(params["params"]["gamma"])
    ped = 2.0 ** -18
    beta = np.maximum(beta_r, (1e-6 + ped) ** 0.5) ** 2 - ped
    gamma = np.maximum(gamma_r, ped ** 0.5) ** 2 - ped
    xn = np.asarray(x)
    norm = np.sqrt(np.einsum("bhwj,ji->bhwi", xn ** 2, gamma) + beta)
    np.testing.assert_allclose(np.asarray(y), xn / norm,
                               rtol=1e-5, atol=1e-6)


def test_torch_default_init_statistics():
    """Codec init: torch Conv2d default parity (the reference never
    overrides init). kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)),
    so std = 1/sqrt(3*fan_in); checked against torch's actual draw."""
    layer = conv(64, 3)
    params = layer.init(KEY, jnp.zeros((1, 8, 8, 64)))
    k = np.asarray(params["params"]["kernel"])
    fan_in = 3 * 3 * 64
    expected_std = 1.0 / np.sqrt(3.0 * fan_in)
    assert abs(k.std() - expected_std) / expected_std < 0.15
    assert abs(k).max() <= 1.0 / np.sqrt(fan_in) + 1e-7  # uniform bound

    tconv = torch.nn.Conv2d(64, 64, 3)
    tk = tconv.weight.detach().numpy()
    assert abs(tk.std() - expected_std) / expected_std < 0.15
    np.testing.assert_allclose(
        np.asarray(params["params"]["bias"]), 0.01)
