"""Golden tests for the op layer against torch CPU reference semantics.

These pin our TPU-native ops to the exact conventions the reference relies on:
grid_sample(border, align_corners=True), interpolate(align_corners=False),
PixelShuffle channel order, avg/max pooling, and STE gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from deepvideocodec_tpu.ops import (
    flow_warp,
    bilinear_downsample_x2,
    bilinear_upsample_x2,
    avg_pool_2x2,
    max_pool_2x2,
    depth_to_space,
    quantize_ste,
    lower_bound,
)


def torch_warp_reference(image_nchw, flow_nchw):
    """torch grid_sample warp with the reference's conventions."""
    N, C, H, W = image_nchw.shape
    hor = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(N, -1, H, -1)
    ver = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(N, -1, -1, W)
    grid = torch.cat([hor, ver], 1)
    flow_n = torch.cat(
        [
            flow_nchw[:, 0:1] / ((W - 1.0) / 2.0),
            flow_nchw[:, 1:2] / ((H - 1.0) / 2.0),
        ],
        1,
    )
    return F.grid_sample(
        image_nchw,
        (grid + flow_n).permute(0, 2, 3, 1),
        mode="bilinear",
        padding_mode="border",
        align_corners=True,
    )


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def to_nhwc(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


class TestFlowWarp:
    @pytest.mark.parametrize("shape", [(2, 16, 24, 3), (1, 8, 8, 5)])
    def test_matches_grid_sample(self, rng, shape):
        B, H, W, C = shape
        img = rng.standard_normal(shape).astype(np.float32)
        flow = (rng.standard_normal((B, H, W, 2)) * 3).astype(np.float32)

        ours = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
        ref = to_nhwc(torch_warp_reference(nchw(img), nchw(flow)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_large_flow_border_clamp(self, rng):
        img = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
        flow = np.full((1, 8, 8, 2), 100.0, dtype=np.float32)
        ours = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
        # Everything clamps to the bottom-right corner pixel.
        np.testing.assert_allclose(
            ours, np.broadcast_to(img[:, -1:, -1:, :], ours.shape), rtol=1e-6
        )

    def test_zero_flow_identity(self, rng):
        img = rng.standard_normal((1, 12, 10, 4)).astype(np.float32)
        flow = np.zeros((1, 12, 10, 2), dtype=np.float32)
        out = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)

    def test_xpaired_corners_bit_exact_vs_4tap(self, rng):
        """The x-paired fast path (even W) must equal the 4-tap form bit
        for bit — the codec relies on one warp everywhere."""
        from deepvideocodec_tpu.ops import warp as warp_mod

        B, H, W, C = 2, 9, 12, 5
        img = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
        # Flows that exercise interior, exact-integer hits, and border clamp.
        flow = jnp.asarray(
            (rng.standard_normal((B, H, W, 2)) * 6).astype(np.float32))
        flow = flow.at[:, 0].set(100.0).at[:, 1].set(jnp.floor(flow[:, 1]))

        base_y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
        base_x = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
        sx = jnp.clip(base_x[None] + flow[..., 0], 0.0, W - 1.0)
        sy = jnp.clip(base_y[None] + flow[..., 1], 0.0, H - 1.0)
        x0i = jnp.floor(sx).astype(jnp.int32)
        y0i = jnp.floor(sy).astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, H - 1)

        fast = warp_mod._corners_xpaired(img, y0i, y1i, x0i)
        slow = warp_mod._corners_4tap(img, y0i, y1i, x0i)
        for f, s in zip(fast, slow):
            assert np.array_equal(np.asarray(f), np.asarray(s))

    @pytest.mark.parametrize("W", [7, 10])  # odd = 4-tap path, even = x-paired
    def test_gradients_match_torch(self, rng, W):
        B, H, C = 1, 6, 2
        img = rng.standard_normal((B, H, W, C)).astype(np.float32)
        flow = (rng.standard_normal((B, H, W, 2)) * 1.5).astype(np.float32)

        def loss_jax(im, fl):
            return jnp.sum(flow_warp(im, fl) ** 2)

        gi, gf = jax.grad(loss_jax, argnums=(0, 1))(
            jnp.asarray(img), jnp.asarray(flow)
        )

        t_img = nchw(img).requires_grad_(True)
        t_flow = nchw(flow).requires_grad_(True)
        loss = (torch_warp_reference(t_img, t_flow) ** 2).sum()
        loss.backward()

        np.testing.assert_allclose(
            np.asarray(gi), to_nhwc(t_img.grad), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(gf), to_nhwc(t_flow.grad), rtol=1e-4, atol=1e-4
        )


class TestResize:
    def test_downsample_matches_interpolate(self, rng):
        x = rng.standard_normal((2, 16, 20, 3)).astype(np.float32)
        ours = np.asarray(bilinear_downsample_x2(jnp.asarray(x)))
        ref = to_nhwc(
            F.interpolate(nchw(x), (8, 10), mode="bilinear", align_corners=False)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_upsample_matches_interpolate(self, rng):
        x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
        ours = np.asarray(bilinear_upsample_x2(jnp.asarray(x)))
        ref = to_nhwc(
            F.interpolate(nchw(x), (14, 18), mode="bilinear", align_corners=False)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_pools_match_torch(self, rng):
        x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(avg_pool_2x2(jnp.asarray(x))),
            to_nhwc(F.avg_pool2d(nchw(x), 2, 2)),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(max_pool_2x2(jnp.asarray(x))),
            to_nhwc(F.max_pool2d(nchw(x), 2, 2)),
            rtol=1e-6,
        )


class TestPixelShuffle:
    @pytest.mark.parametrize("r", [2, 3])
    def test_matches_torch_pixel_shuffle(self, rng, r):
        x = rng.standard_normal((2, 4, 5, 6 * r * r)).astype(np.float32)
        ours = np.asarray(depth_to_space(jnp.asarray(x), r))
        ref = to_nhwc(F.pixel_shuffle(nchw(x), r))
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


class TestQuant:
    def test_ste_forward_rounds(self):
        x = jnp.array([0.4, 0.6, -1.2, 2.5])
        np.testing.assert_allclose(
            np.asarray(quantize_ste(x)), np.array([0.0, 1.0, -1.0, 2.0])
        )

    def test_ste_gradient_is_identity(self):
        g = jax.grad(lambda x: jnp.sum(quantize_ste(x) * 3.0))(
            jnp.array([0.3, 1.7, -0.9])
        )
        np.testing.assert_allclose(np.asarray(g), 3.0)


class TestLowerBound:
    def test_forward(self):
        out = lower_bound(jnp.array([0.5, 2.0]), 1.0)
        np.testing.assert_allclose(np.asarray(out), [1.0, 2.0])

    def test_gradient_gating(self):
        # Below bound: positive cotangent blocked, negative passes.
        def f(x):
            return jnp.sum(lower_bound(x, 1.0))

        g = jax.grad(f)(jnp.array([0.5, 2.0]))
        np.testing.assert_allclose(np.asarray(g), [0.0, 1.0])

        def f2(x):
            return -jnp.sum(lower_bound(x, 1.0))

        g2 = jax.grad(f2)(jnp.array([0.5, 2.0]))
        np.testing.assert_allclose(np.asarray(g2), [-1.0, -1.0])


class TestPhaseConv:
    """Phase-space conv (ops/phase.py) must equal the direct 'same' conv."""

    @pytest.mark.parametrize("k,cin,cout", [(3, 5, 7), (5, 4, 3), (7, 8, 32)])
    def test_matches_direct_conv(self, k, cin, cout, rng):
        from deepvideocodec_tpu.ops.phase import (
            space_to_depth2, depth_to_space2, phase_conv)

        x = jnp.asarray(rng.standard_normal((2, 16, 24, cin)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        p = k // 2
        direct = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        phased = depth_to_space2(phase_conv(space_to_depth2(x), w, b))
        np.testing.assert_allclose(
            np.asarray(phased), np.asarray(direct), atol=2e-4, rtol=1e-4)

    def test_s2d_roundtrip(self, rng):
        from deepvideocodec_tpu.ops.phase import (
            space_to_depth2, depth_to_space2)

        x = jnp.asarray(rng.standard_normal((1, 8, 6, 3)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(depth_to_space2(space_to_depth2(x))), np.asarray(x))

    def test_mebasic_phase_equals_direct(self, rng):
        from deepvideocodec_tpu.models.layers import MEBasic

        x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)), jnp.float32)
        m = MEBasic()
        params = m.init(jax.random.PRNGKey(0), x)
        direct = m.apply(params, x, phase=False)
        phased = m.apply(params, x, phase=True)
        np.testing.assert_allclose(
            np.asarray(phased), np.asarray(direct), atol=2e-4, rtol=1e-4)


class TestColorspace:
    def test_yuv420_roundtrip_quality(self, rng):
        from deepvideocodec_tpu.ops.colorspace import (
            rgb_to_yuv420_np, yuv420_to_rgb)

        # smooth content (chroma subsampling is lossy on noise by design)
        yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
        rgb = np.stack([
            0.5 + 0.45 * np.sin(xx / 17 + c) * np.cos(yy / 13 - c)
            for c in (0.3, 1.1, 2.0)], axis=-1)[None]
        rgb_u8 = (np.clip(rgb, 0, 1) * 255 + 0.5).astype(np.uint8)

        y, u, v = rgb_to_yuv420_np(rgb_u8)
        assert y.shape == (1, 64, 96, 1) and y.dtype == np.uint8
        assert u.shape == (1, 32, 48, 1) and v.shape == (1, 32, 48, 1)

        back = np.asarray(yuv420_to_rgb(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
        assert back.shape == (1, 64, 96, 3)
        mse = np.mean((back - rgb_u8.astype(np.float32) / 255.0) ** 2)
        psnr = -10 * np.log10(mse + 1e-12)
        assert psnr > 38.0, psnr

    def test_gray_is_exactish(self):
        from deepvideocodec_tpu.ops.colorspace import (
            rgb_to_yuv420_np, yuv420_to_rgb)

        rgb_u8 = np.full((1, 16, 16, 3), 120, np.uint8)
        y, u, v = rgb_to_yuv420_np(rgb_u8)
        back = np.asarray(yuv420_to_rgb(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
        np.testing.assert_allclose(back, 120.0 / 255.0, atol=2e-2)
