"""Reference-checkpoint importer tests.

The per-block *value* correctness of the mapping is pinned by the output-
parity tests in test_golden_modules.py (which drive the same importer
functions through module.state_dict()). These tests cover the whole-model
contract: the full reference DMC state_dict (constructed via the functional
compressai stub, so the entropy-bottleneck param namespace is present)
converts to a tree with exactly the param paths and shapes this framework's
own init produces, and the CLI round-trips through an npz export that
`restore_any_params` accepts.
"""

import numpy as np
import jax
import pytest
import torch

from test_golden_modules import _ensure_compressai_stub, _load

from deepvideocodec_tpu.models import build_inter_model, fast_init
from deepvideocodec_tpu.tools import import_dmc_state_dict


@pytest.fixture(scope="module")
def ref_dmc_sd():
    _ensure_compressai_stub()
    video = _load("video_model")
    torch.manual_seed(0)
    net = video.DMC()
    sd = net.state_dict()
    # make values distinguishable so value-identity checks are meaningful
    for k, v in sd.items():
        if v.numel():
            sd[k] = torch.arange(v.numel(), dtype=torch.float32).reshape(
                v.shape) / max(v.numel(), 1) + hash(k) % 7
    return sd


def _paths_and_shapes(tree):
    return {
        jax.tree_util.keystr(p): np.shape(leaf)
        for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_full_dmc_import_matches_init_structure(ref_dmc_sd):
    imported = import_dmc_state_dict(ref_dmc_sd)
    target = fast_init(build_inter_model("dmc", "base"),
                       jax.random.PRNGKey(0))
    got = _paths_and_shapes(imported)
    want = _paths_and_shapes(target)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"importer missed params: {missing[:8]}"
    assert not extra, f"importer produced unknown params: {extra[:8]}"
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:8])}"


def test_import_value_identity_spot_checks(ref_dmc_sd):
    imported = import_dmc_state_dict(ref_dmc_sd)["params"]
    # conv kernel: OIHW -> HWIO
    np.testing.assert_array_equal(
        imported["optic_flow"]["level_0"]["conv0_kernel"],
        ref_dmc_sd["optic_flow.moduleBasic.0.conv1.weight"]
        .numpy().transpose(2, 3, 1, 0))
    # entropy bottleneck density params copy 1:1
    np.testing.assert_array_equal(
        imported["frame_context_model"]["entropy_bottleneck"]["quantiles"],
        ref_dmc_sd["frame_context_model.entropy_bottleneck.quantiles"]
        .numpy())
    np.testing.assert_array_equal(
        imported["motion_context_model"]["entropy_bottleneck"]["matrix_2"],
        ref_dmc_sd["motion_context_model.entropy_bottleneck._matrix2"]
        .numpy())
    # SE Dense kernel: (out, in) -> (in, out)
    np.testing.assert_array_equal(
        imported["recon_generation_net"]["UNet_0"]["ConvBlockResidual_0"]
        ["SELayer_0"]["Dense_0"]["kernel"],
        ref_dmc_sd["recon_generation_net.unet_1.conv1.conv.3.fc.0.weight"]
        .numpy().T)


def test_dataparallel_prefix_stripped(ref_dmc_sd):
    wrapped = {f"module.{k}": v for k, v in ref_dmc_sd.items()}
    a = import_dmc_state_dict(ref_dmc_sd)
    b = import_dmc_state_dict(wrapped)
    ja = jax.tree_util.tree_leaves(a)
    jb = jax.tree_util.tree_leaves(b)
    assert all(np.array_equal(x, y) for x, y in zip(ja, jb))


def test_cli_import_round_trip(ref_dmc_sd, tmp_path):
    from deepvideocodec_tpu.cli import import_torch as cli
    from deepvideocodec_tpu.utils import restore_any_params

    ckpt = tmp_path / "checkpoint_best_loss.pth.tar"
    torch.save({"epoch": 42, "state_dict": ref_dmc_sd, "loss": 1.0}, ckpt)
    out = tmp_path / "imported.npz"
    cli.main([str(ckpt), str(out)])

    target = fast_init(build_inter_model("dmc", "base"),
                       jax.random.PRNGKey(0))
    restored = restore_any_params(str(out), target)
    got = restored["params"]["optic_flow"]["level_0"]["conv0_kernel"]
    want = ref_dmc_sd["optic_flow.moduleBasic.0.conv1.weight"].numpy() \
        .transpose(2, 3, 1, 0)
    # conv kernels ride f16 npz storage; entropy density params stay f32
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-2)
    q = restored["params"]["motion_context_model"]["entropy_bottleneck"][
        "quantiles"]
    np.testing.assert_array_equal(
        np.asarray(q),
        ref_dmc_sd["motion_context_model.entropy_bottleneck.quantiles"]
        .numpy())
