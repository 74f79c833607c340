"""Train -> save -> restore -> code lifecycle (VERDICT missing #4 / weak #4).

The reference rebuilds its integer CDF tables *after* training
(/root/reference/dmc/models/video_model.py:665-679 update()); our codec
constructors rebuild them from the current params
(entropy/cdf.py:factorized_tables_from_params). Until now that path had only
ever seen random-init quantiles. This test moves the quantiles/densities by
actually training, round-trips the state through Orbax, and asserts the
restored-trained codec still codes bit-exactly — the regime the table
builder was built for.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepvideocodec_tpu.models import DMC, DMCConfig, fast_init
from deepvideocodec_tpu.models.dmc import empty_dpb
from deepvideocodec_tpu.eval.codec import DmcCodec
from deepvideocodec_tpu.train import (
    create_train_state, make_train_step, stage_for_epoch)
from deepvideocodec_tpu.utils import save_checkpoint, restore_checkpoint

KEY = jax.random.PRNGKey(11)
SMALL = DMCConfig(ch_mv=16, n=16, m=24, unet_width=16)


def _smooth_batch(b, t, h, w, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    clips = []
    for _ in range(b):
        ph = rng.random(3) * 7
        frames = [
            np.stack([
                0.5 + 0.4 * np.sin(2 * np.pi * (xx / 28 + 0.06 * ti + p))
                * np.cos(2 * np.pi * (yy / 22 - 0.04 * ti))
                for p in ph], axis=-1)
            for ti in range(t)
        ]
        clips.append(np.clip(np.stack(frames), 0, 1))
    return jnp.asarray(np.stack(clips), jnp.float32)


def _payload_bytes(payload):
    n = 0
    for unit in payload["strings"].values():
        n += sum(len(s) for s in unit)
    return n


def test_trained_restore_codes_bit_exact(tmp_path):
    model = DMC(cfg=SMALL)
    batch = _smooth_batch(2, 3, 64, 64)
    state = create_train_state(model, KEY, batch[:1], learning_rate=1e-3)
    init_params = state.params

    step = make_train_step(model, stage_for_epoch(40), lmbda=2048.0)
    for _ in range(40):
        state, metrics = step(state, batch, KEY)
    assert np.isfinite(float(metrics["loss"]))

    # quantiles moved: the factorized tables will be built in a regime
    # random init never produces
    q_path = ("motion_context_model", "entropy_bottleneck", "quantiles")

    def get(p):
        d = p["params"]
        for k in q_path:
            d = d[k]
        return np.asarray(d)

    assert not np.allclose(get(init_params), get(state.params))

    save_checkpoint(tmp_path, int(state.step), state)
    fresh = create_train_state(model, KEY, batch[:1], learning_rate=1e-3)
    restored = restore_checkpoint(tmp_path, int(state.step), fresh)

    trained = DmcCodec(model, restored.params)
    baseline = DmcCodec(model, init_params)

    # trained quantiles reached the coder's tables
    assert not np.array_equal(
        trained.motion_coder.z.quantized_cdf,
        baseline.motion_coder.z.quantized_cdf)

    frames = np.asarray(_smooth_batch(1, 3, 64, 64, seed=9))[0]
    dpb = empty_dpb(1, 64, 64, SMALL)
    dpb["x_ref"] = jnp.asarray(frames[0][None])

    payload, enc_dpb = trained.encode_inter(
        jnp.asarray(frames[1][None]), dpb, first_p=True)
    _, dec_dpb = trained.decode_inter(
        payload["strings"], payload["shape"], dpb, first_p=True)
    for k in enc_dpb:
        np.testing.assert_array_equal(
            np.asarray(enc_dpb[k]), np.asarray(dec_dpb[k]),
            err_msg=f"trained-restored DPB field {k} drifted")

    # chain a second frame through the non-first path too
    payload2, enc_dpb2 = trained.encode_inter(
        jnp.asarray(frames[2][None]), dec_dpb, first_p=False)
    _, dec_dpb2 = trained.decode_inter(
        payload2["strings"], payload2["shape"], dec_dpb, first_p=False)
    for k in enc_dpb2:
        np.testing.assert_array_equal(
            np.asarray(enc_dpb2[k]), np.asarray(dec_dpb2[k]),
            err_msg=f"trained-restored frame-2 DPB field {k} drifted")

    # determinism from the restored state
    payload_again, _ = trained.encode_inter(
        jnp.asarray(frames[1][None]), dpb, first_p=True)
    for key in payload["strings"]:
        assert payload["strings"][key] == payload_again["strings"][key]

    # Payload sanity: 40 steps from the random-init RD spike do not yet
    # SHRINK the rate (that takes ~hundreds of steps — docs/
    # PERFORMANCE.md); the hard "trained payload << random payload" claim
    # is asserted by test_campaign_checkpoint_payload below against a
    # real trained checkpoint. Here: same order of magnitude, still
    # codable end to end.
    rand_payload, _ = baseline.encode_inter(
        jnp.asarray(frames[1][None]), dpb, first_p=True)
    assert _payload_bytes(payload) < 4 * _payload_bytes(rand_payload)


def test_campaign_checkpoint_payload():
    """With a REAL trained checkpoint (env DVC_TRAINED_CKPT -> a cli.train
    run dir at full DMC size), assert the trained payload is a small
    fraction of random init's — the 'payload << random-init' half of the
    lifecycle (VERDICT #4). Skipped when no campaign checkpoint exists."""
    import os

    ckpt = os.environ.get("DVC_TRAINED_CKPT")
    if not ckpt:
        pytest.skip("no trained campaign checkpoint (set DVC_TRAINED_CKPT)")

    model = DMC()
    state = create_train_state(model, KEY, None)
    from deepvideocodec_tpu.utils import latest_step

    step = latest_step(ckpt)
    assert step is not None, f"no checkpoint steps under {ckpt}"
    restored = restore_checkpoint(ckpt, step, state)

    trained = DmcCodec(model, restored.params)
    baseline = DmcCodec(model, state.params)
    frames = np.asarray(_smooth_batch(1, 2, 64, 64, seed=9))[0]
    dpb = empty_dpb(1, 64, 64)
    dpb["x_ref"] = jnp.asarray(frames[0][None])

    t_payload, enc_dpb = trained.encode_inter(
        jnp.asarray(frames[1][None]), dpb, first_p=True)
    _, dec_dpb = trained.decode_inter(
        t_payload["strings"], t_payload["shape"], dpb, first_p=True)
    for k in enc_dpb:
        np.testing.assert_array_equal(
            np.asarray(enc_dpb[k]), np.asarray(dec_dpb[k]))
    r_payload, _ = baseline.encode_inter(
        jnp.asarray(frames[1][None]), dpb, first_p=True)
    assert _payload_bytes(t_payload) < 0.25 * _payload_bytes(r_payload)
