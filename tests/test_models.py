"""Model-level tests: shapes, DPB recurrence, gradients, all families.

Small channel configs keep CPU compiles fast; geometry (x16 latents,
checkerboard phases, context scales) matches the full-size models.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepvideocodec_tpu.models import (
    DMC,
    DMCConfig,
    DVC,
    DCVC,
    FactorizedImageCodec,
    HyperpriorImageCodec,
    CheckerboardImageCodec,
    fast_init,
)
from deepvideocodec_tpu.models.dmc import empty_dpb
from deepvideocodec_tpu.models.context import checkerboard_masks

KEY = jax.random.PRNGKey(0)
SMALL = DMCConfig(ch_mv=16, n=16, m=24, unet_width=16)


@pytest.fixture(scope="module")
def dmc_small():
    model = DMC(cfg=SMALL)
    frames = jax.random.uniform(KEY, (1, 3, 64, 64, 3))
    params = fast_init(model, KEY)
    return model, params, frames


class TestCheckerboardMasks:
    def test_micro_pattern(self):
        m0, m1 = checkerboard_masks(4, 4)
        m0 = np.asarray(m0)[0, :, :, 0]
        # reference micro mask ((1,0),(0,1)) tiled
        expected = np.array([[1, 0, 1, 0], [0, 1, 0, 1],
                             [1, 0, 1, 0], [0, 1, 0, 1]], np.float32)
        np.testing.assert_array_equal(m0, expected)
        np.testing.assert_array_equal(np.asarray(m1)[0, :, :, 0], 1 - expected)


class TestDMC:
    def test_forward_shapes(self, dmc_small):
        model, params, frames = dmc_small
        out = model.apply(params, frames, training=True,
                          rngs={"noise": KEY})
        assert out["x_hat"].shape == (1, 2, 64, 64, 3)
        assert len(out["likelihoods"]) == 2
        for lk in out["likelihoods"]:
            assert set(lk) == {"motion", "frame"}
            assert set(lk["motion"]) == {"y", "z"}
            # y latent at /16
            assert lk["motion"]["y"].shape == (1, 4, 4, SMALL.ch_mv)
            assert lk["frame"]["y"].shape == (1, 4, 4, SMALL.m)
            # z at /64
            assert lk["motion"]["z"].shape == (1, 1, 1, SMALL.ch_mv)

    def test_motion_pretrain_path(self, dmc_small):
        model, params, frames = dmc_small
        out = model.apply(params, frames, motion_pretrain=True,
                          training=True, rngs={"noise": KEY})
        for lk in out["likelihoods"]:
            assert set(lk) == {"motion"}

    def test_eval_mode_deterministic(self, dmc_small):
        model, params, frames = dmc_small
        o1 = model.apply(params, frames, training=False)
        o2 = model.apply(params, frames, training=False)
        np.testing.assert_array_equal(
            np.asarray(o1["x_hat"]), np.asarray(o2["x_hat"]))

    def test_two_frame_clip_no_dpb_propagation(self, dmc_small):
        model, params, _ = dmc_small
        frames2 = jax.random.uniform(KEY, (1, 2, 64, 64, 3))
        out = model.apply(params, frames2, training=False)
        assert out["x_hat"].shape == (1, 1, 64, 64, 3)

    def test_aux_loss_positive(self, dmc_small):
        model, params, _ = dmc_small
        aux = model.apply(params, method=model.aux_loss)
        assert float(aux) > 0

    def test_forward_inter_dpb_shapes(self, dmc_small):
        model, params, frames = dmc_small
        dpb = empty_dpb(1, 64, 64, SMALL)
        dpb["x_ref"] = frames[:, 0]
        x_rec, lk, new_dpb = model.apply(
            params, frames[:, 1], dpb, True,
            method=model.forward_inter)
        assert x_rec.shape == (1, 64, 64, 3)
        assert new_dpb["feature_ref"].shape == (1, 64, 64, SMALL.n)
        assert new_dpb["y_ref"].shape == (1, 4, 4, SMALL.m)
        assert new_dpb["y_mv_ref"].shape == (1, 4, 4, SMALL.ch_mv)

    def test_gradients_flow_everywhere(self, dmc_small):
        model, params, frames = dmc_small

        def loss(p):
            out = model.apply(p, frames, training=True,
                              rngs={"noise": KEY})
            rate = sum(
                jnp.sum(jnp.log(v))
                for lk in out["likelihoods"]
                for fields in lk.values()
                for v in fields.values()
            )
            return jnp.sum(out["x_hat"] ** 2) - 1e-3 * rate

        g = jax.grad(loss)(params)
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        zero = [jax.tree_util.keystr(p) for p, l in flat
                if float(jnp.sum(jnp.abs(l))) == 0]
        # quantiles get no main-loss gradient by design; SE-layer FC pairs
        # can be dead at random init (ReLU bottleneck of c/16 units); the
        # hyper decoders' FIRST conv kernel grad is exactly z_hat*g = 0 at
        # cold start because round(z) == 0 under the torch-parity init —
        # the reference shares this transient (STE grows z away from 0
        # within a few steps; its bias grad is nonzero throughout).
        unexpected = [n for n in zero
                      if "quantiles" not in n and "SELayer" not in n
                      and not ("hyper_decoder" in n and "Conv_0" in n
                               and "kernel" in n)]
        assert not unexpected, unexpected[:10]
        # and the vast majority of parameters must receive gradient
        assert len(zero) < 0.1 * len(flat)


class TestOtherFamilies:
    @pytest.mark.parametrize("cls", [DVC, DCVC])
    def test_video_family_forward(self, cls):
        model = cls(ch_mv=16, n=16, unet_width=16) if cls.__name__ == "DVC" else cls(ch_mv=16, n=16)
        frames = jax.random.uniform(KEY, (1, 3, 64, 64, 3))
        params = fast_init(model, KEY)
        out = model.apply(params, frames, training=True,
                          rngs={"noise": KEY})
        assert out["x_hat"].shape == (1, 2, 64, 64, 3)
        for lk in out["likelihoods"]:
            assert set(lk) == {"motion", "frame"}
        aux = model.apply(params, method=model.aux_loss)
        assert float(aux) > 0

    @pytest.mark.parametrize(
        "cls", [FactorizedImageCodec, HyperpriorImageCodec,
                CheckerboardImageCodec])
    def test_intra_family_forward(self, cls):
        model = cls(n=16, m=24)
        img = jax.random.uniform(KEY, (1, 64, 64, 3))
        params = fast_init(model, KEY)
        out = model.apply(params, img, training=True, rngs={"noise": KEY})
        assert out["x_hat"].shape == img.shape
        for lk in out["likelihoods"].values():
            assert np.all(np.asarray(lk) > 0)
        aux = model.apply(params, method=model.aux_loss)
        assert float(aux) > 0


class TestInitScale:
    """Cold-start sanity: random-init recon must be O(1), not 1e9.

    The pipeline chains ~40 convs with additive residuals and no
    normalization; a variance-preserving init amplifies ~1.4x per layer
    and once cold-started the FULL-SIZE frame branch at |x_hat| ~ 4e9
    (1e24 RD loss — untrainable; the torch-default-parity init in
    models/layers.py fixes it). Full-size models, since the explosion
    compounds with depth/width.
    """

    def test_dmc_frame_branch_recon_bounded(self):
        model = DMC()
        frames = jax.random.uniform(KEY, (1, 3, 64, 64, 3))
        params = fast_init(model, KEY)
        for kw in ({"frame_pretrain": True}, {}):
            out = model.apply(params, frames, training=True,
                              rngs={"noise": KEY}, **kw)
            assert float(jnp.max(jnp.abs(out["x_hat"]))) < 100.0, kw

    @pytest.mark.parametrize("cls", [DVC, DCVC])
    def test_family_recon_bounded(self, cls):
        model = cls()
        frames = jax.random.uniform(KEY, (1, 3, 64, 64, 3))
        params = fast_init(model, KEY)
        out = model.apply(params, frames, training=True, rngs={"noise": KEY})
        assert float(jnp.max(jnp.abs(out["x_hat"]))) < 100.0


class TestFastInit:
    """fast_init must equal monolithic model.init (see models/init.py)."""

    def test_dmc_structure_matches_monolithic(self, dmc_small):
        model, params, frames = dmc_small
        # eval_shape = monolithic init's tree without compiling it
        ref = jax.eval_shape(
            lambda k, f: model.init({"params": k, "noise": k}, f,
                                    training=True), KEY, frames)
        ref_map = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
        got_map = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
        assert ref_map == got_map

    def test_values_bit_identical_to_monolithic(self):
        # Small enough to afford the monolithic compile; value-level check
        # that linen's path-based rng folding makes stage-wise init exact.
        model = HyperpriorImageCodec(n=8, m=12)
        key = jax.random.PRNGKey(42)
        x = jnp.zeros((1, 64, 64, 3))
        mono = jax.jit(lambda k, xx: model.init(
            {"params": k, "noise": k}, xx, training=True))(key, x)
        fast = fast_init(model, key)
        mono_leaves = jax.tree_util.tree_flatten_with_path(mono)[0]
        fast_map = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(fast)[0]}
        assert len(mono_leaves) == len(fast_map)
        for k, v in mono_leaves:
            ks = jax.tree_util.keystr(k)
            assert np.array_equal(np.asarray(v), np.asarray(fast_map[ks])), ks


class TestFast3WarmStartAlignment:
    """fast3's param tree must stay aligned with fast2's for --init-partial
    warm starts: every shared path keeps its exact shape (flax auto-name
    counters shift when unnamed modules are removed, so the variant code
    pins explicit names — models/dmc.py), and the fresh/dropped leaves are
    exactly the documented divergence set."""

    def _shapes(self, cfg):
        model = DMC(cfg=cfg)
        frames = jax.ShapeDtypeStruct((1, 3, 64, 64, 3), jnp.float32)
        tree = jax.eval_shape(
            lambda k, f: model.init({"params": k, "noise": k}, f,
                                    training=True),
            KEY, frames)
        return {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    def test_shared_paths_same_shape(self):
        base = dict(ch_mv=16, n=16, m=24, unet_width=16,
                    warp_ctx_half=True, flow_half=True,
                    ctx_lite=True, recon_single_unet=True)
        f2 = self._shapes(DMCConfig(**base))
        f3 = self._shapes(DMCConfig(**base, mv_half_dec=True,
                                    ctx_half=True, recon_half=True))

        shared = set(f2) & set(f3)
        mismatched = [k for k in shared if f2[k] != f3[k]]
        assert not mismatched, mismatched

        fresh_markers = ("dec_final_half", "c2_up_half", "in_x_half",
                         "c1_proj_half", "out_half", "up_half")
        f3_only = {k for k in f3 if k not in f2}
        for k in f3_only:
            assert any(m in k for m in fresh_markers), (
                f"unexpected fresh fast3 leaf {k}")
        for m in fresh_markers:
            assert any(m in k for k in f3_only), f"missing fresh leaf {m}"

        dropped_markers = ("dec_final", "SubpelConv")
        f2_only = {k for k in f2 if k not in f3}
        for k in f2_only:
            assert any(m in k for m in dropped_markers) or (
                "contextual_encoder" in k and "Conv_0" in k), (
                f"unexpected dropped fast2 leaf {k}")
        # the bulk of the tree is shared (warm start actually pays off)
        assert len(shared) > 4 * len(f3_only)

    def test_fast4_shared_paths_same_shape(self):
        """fast4 (feat_half) vs fast3: every shared path keeps its exact
        shape; the only fresh leaf is the /2 RGB subpel head and the only
        dropped leaves are the full-res lift + RGB conv it replaces."""
        base = dict(ch_mv=16, n=16, m=24, unet_width=16,
                    warp_ctx_half=True, flow_half=True,
                    ctx_lite=True, recon_single_unet=True,
                    mv_half_dec=True, ctx_half=True, recon_half=True)
        f3 = self._shapes(DMCConfig(**base))
        f4 = self._shapes(DMCConfig(**base, feat_half=True))

        shared = set(f3) & set(f4)
        mismatched = [k for k in shared if f3[k] != f4[k]]
        assert not mismatched, mismatched

        f4_only = {k for k in f4 if k not in f3}
        for k in f4_only:
            assert "rgb_up_half" in k, f"unexpected fresh fast4 leaf {k}"
        assert any("rgb_up_half" in k for k in f4_only)

        f3_only = {k for k in f3 if k not in f4}
        for k in f3_only:
            assert ("up_half" in k or
                    ("recon_generation_net" in k and "Conv_1" in k)), (
                f"unexpected dropped fast3 leaf {k}")
        assert len(shared) > 10 * len(f4_only)


class TestScanFrames:
    """__call__(scan_frames=True) folds the steady-state P-frames into one
    nn.scan: the math must match the Python unroll (same per-frame graph,
    same DPB carry), with trace cost O(1) in the cascade length."""

    @pytest.fixture(scope="class")
    def setup(self):
        model = DMC(cfg=SMALL)
        frames = jax.random.uniform(jax.random.PRNGKey(7),
                                    (2, 5, 64, 64, 3))
        params = fast_init(model, KEY)
        return model, params, frames

    def test_eval_matches_unrolled(self, setup):
        model, params, frames = setup
        out_u = model.apply(params, frames, training=False)
        out_s = model.apply(params, frames, training=False,
                            scan_frames=True)
        np.testing.assert_allclose(
            np.asarray(out_s["x_hat"]), np.asarray(out_u["x_hat"]),
            rtol=2e-5, atol=2e-6)
        assert len(out_s["likelihoods"]) == len(out_u["likelihoods"])
        for lk_s, lk_u in zip(out_s["likelihoods"], out_u["likelihoods"]):
            for name in lk_u:
                for a, b in zip(jax.tree_util.tree_leaves(lk_s[name]),
                                jax.tree_util.tree_leaves(lk_u[name])):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)

    def test_training_grads_finite(self, setup):
        model, params, frames = setup

        def loss(p):
            out = model.apply(p, frames, training=True, scan_frames=True,
                              rngs={"noise": jax.random.PRNGKey(1)})
            l = jnp.mean((out["x_hat"] - frames[:, 1:]) ** 2)
            for lk in out["likelihoods"]:
                for leaf in jax.tree_util.tree_leaves(lk):
                    l += -jnp.mean(jnp.log2(jnp.clip(leaf, 1e-9))) * 1e-4
            return l

        grads = jax.grad(loss)(params)
        norms = [float(jnp.linalg.norm(g))
                 for g in jax.tree_util.tree_leaves(grads)]
        assert all(np.isfinite(n) for n in norms)
        assert any(n > 0 for n in norms)
