"""Real-codec round trips for the DVC and DCVC families."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepvideocodec_tpu.models import DVC, DCVC, fast_init
from deepvideocodec_tpu.eval.codec import DvcCodec, DcvcCodec

KEY = jax.random.PRNGKey(11)


def _frames(n, h=64, w=64, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ph = rng.random(3).astype(np.float32)
    out = []
    for t in range(n):
        img = np.stack(
            [0.5 + 0.4 * np.sin(2 * np.pi * (xx / 28 + 0.06 * t + p))
             for p in ph], axis=-1)
        out.append(np.clip(img, 0, 1)[None].astype(np.float32))
    return out


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize(
    "model_cls,codec_cls",
    [(DVC, DvcCodec), (DCVC, DcvcCodec)],
    ids=["dvc", "dcvc"],
)
def test_family_roundtrip_bit_exact(model_cls, codec_cls, dtype):
    if model_cls is DVC:
        model = model_cls(ch_mv=16, ch_res=24, n=16, unet_width=16,
                          dtype=dtype)
    else:
        model = model_cls(ch_mv=16, n=16, m=24, dtype=dtype)
    frames = _frames(3)
    clip = jnp.asarray(np.concatenate(frames)[None].reshape(1, 3, 64, 64, 3))
    params = fast_init(model, KEY)
    codec = codec_cls(model, params)

    dpb = codec.init_dpb(frames[0])
    payload, enc_dpb = codec.encode_inter(jnp.asarray(frames[1]), dpb)
    x_rec, dec_dpb = codec.decode_inter(
        payload["strings"], payload["shape"], dpb)

    np.testing.assert_array_equal(
        np.asarray(enc_dpb["x_ref"]), np.asarray(dec_dpb["x_ref"]))
    assert np.all(np.asarray(x_rec) >= 0) and np.all(np.asarray(x_rec) <= 1)

    # chain a second frame on the decoded reference
    payload2, enc2 = codec.encode_inter(jnp.asarray(frames[2]), dec_dpb)
    _, dec2 = codec.decode_inter(
        payload2["strings"], payload2["shape"], dec_dpb)
    np.testing.assert_array_equal(
        np.asarray(enc2["x_ref"]), np.asarray(dec2["x_ref"]))

    total = sum(len(s) for unit in payload["strings"].values() for s in unit)
    assert 0 < total < 64 * 64 * 3
