"""Real-codec drivers: device NN stages + host rANS, bit-exact round trips.

The reference's encode/decode paths (/root/reference/dmc/models/
video_model.py:235-291, 581-614) interleave device NN compute with host
arithmetic coding. Here each device stage is a separately jitted pure
function; the host coder only ever sees int32 symbol/index planes the device
produced. Per P-frame, the stream layout per latent is
[y_anchor, y_nonanchor, z] — the two-pass checkerboard structure means
exactly two device->host->device round trips per latent at decode (the only
sequential dependency inside a frame).

Lifecycle: construct with trained params -> CDF tables are built once on the
host (`update()` in the reference, video_model.py:665-679) -> stream frames.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.cdf import (
    CdfTable,
    get_scale_table,
    gaussian_cdf_tables,
    factorized_tables_from_params,
)
from ..entropy import rans
from ..utils.compile_retry import retry_flaky_compile


def _rjit(*args, **kwargs):
    """jax.jit + retry: dev-environment remote compiles die
    nondeterministically (utils/compile_retry.py); every codec stage
    program is pure, so re-invoking after a failed compile is safe."""
    return retry_flaky_compile(jax.jit(*args, **kwargs))


@functools.lru_cache(maxsize=64)
def _channel_indexes(shape: Tuple[int, ...]) -> np.ndarray:
    """Per-channel CDF-row indexes for a factorized (B, H, W, C) latent.

    Cached per shape: the same index plane is re-materialized every frame
    of a GOP on the 1-core host otherwise.
    """
    b, h, w, c = shape
    return np.ascontiguousarray(
        np.broadcast_to(np.arange(c, dtype=np.int32), (b, h, w, c)))


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def _sym16_np(x) -> np.ndarray:
    """Bitstream-decoded symbols as int16 for upload (matches the int16
    planes the encoder's programs were traced with; valid streams only ever
    carry encoder-clamped int16-range symbols)."""
    return np.clip(np.asarray(x), -32767, 32767).astype(np.int16)


def _sym8_np(x) -> np.ndarray:
    """Bitstream-decoded z symbols as int8 for upload (the encoder clamps
    z symbols to +-127 on device — models/context.py:_sym8z — so decoded
    streams are int8-ranged by construction)."""
    return np.clip(np.asarray(x), -127, 127).astype(np.int8)


_widen16 = None


def _upload_syms16(arr) -> "jax.Array":
    """Upload decoded y symbols for an int16-input stage program.

    Uploads int8 + a tiny on-device widening (integer, exact) whenever
    the plane fits — halving the upload — else int16 directly. Trained
    models always fit; the shared decoder programs see int16 either way,
    so encoder/decoder symmetry is untouched."""
    global _widen16
    a = np.asarray(arr)
    # int64 abs: np.abs(INT32_MIN) wraps negative and would pass <= 127
    if a.size and np.abs(a.astype(np.int64)).max() <= 127:
        if _widen16 is None:
            _widen16 = _rjit(lambda t: t.astype(jnp.int16))
        return _widen16(jnp.asarray(a.astype(np.int8)))
    return jnp.asarray(np.clip(a, -32767, 32767).astype(np.int16))


# -- packed plane transport ---------------------------------------------------
# The symbol/index planes of one frame are produced by several device
# programs; fetching them one by one costs one tunnel round trip each (the
# dominant cost of the encode loop in this environment — docs/PERFORMANCE.md).
# A tiny extra device program bitcasts every plane to bytes and concatenates
# them, so the host coder needs exactly ONE fetch per frame.

def _plane_items(planes):
    """Deterministic (unit, field, array) iteration for pack/unpack."""
    for key in sorted(planes):
        if key == "packed":
            continue
        unit = planes[key]
        for f in sorted(unit):
            yield key, f, unit[f]


def _pack_planes_device(planes):
    """Traced: all planes -> one flat uint8 buffer (little-endian bytes)."""
    parts = []
    for _, _, a in _plane_items(planes):
        if a.dtype.itemsize > 1:
            a = jax.lax.bitcast_convert_type(a, jnp.uint8)
        elif a.dtype != jnp.uint8:
            a = jax.lax.bitcast_convert_type(a, jnp.uint8)
        parts.append(a.reshape(-1))
    return jnp.concatenate(parts)


def _unpack_planes_host(buf: np.ndarray, planes) -> Dict[str, Dict[str, np.ndarray]]:
    """Inverse of _pack_planes_device using the device arrays' metadata."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    off = 0
    for key, f, a in _plane_items(planes):
        dt = np.dtype(str(a.dtype))
        nb = int(np.prod(a.shape)) * dt.itemsize
        out.setdefault(key, {})[f] = (
            buf[off:off + nb].view(dt).reshape(a.shape))
        off += nb
    return out


def _host_planes(planes) -> Dict[str, Dict[str, np.ndarray]]:
    """Fetch all planes to host: one packed fetch when available."""
    if "packed" in planes:
        return _unpack_planes_host(_np(planes["packed"]), planes)
    return {
        key: {f: _np(a) for _, f, a in items}
        for key, items in _group_items(planes)
    }


def _group_items(planes):
    by_key: Dict[str, list] = {}
    for key, f, a in _plane_items(planes):
        by_key.setdefault(key, []).append((key, f, a))
    return by_key.items()


class _CodedLatent:
    """Host-side coder for one latent's 3 streams."""

    def __init__(self, gauss_table: CdfTable, z_table: CdfTable):
        self.gauss = gauss_table
        self.z = z_table

    def decode_z(self, data: bytes, shape: Tuple[int, int],
                 channels: int) -> np.ndarray:
        idx = _channel_indexes((1, shape[0], shape[1], channels))
        return rans.decode_with_indexes(data, idx, self.z)

    def decode_y(self, data: bytes, indexes) -> np.ndarray:
        return rans.decode_with_indexes(data, _np(indexes), self.gauss)


class DmcCodec:
    """Streaming DMC encoder/decoder over a trained parameter set."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        p = params["params"]
        gauss = gaussian_cdf_tables(get_scale_table())
        self.motion_coder = _CodedLatent(
            gauss,
            factorized_tables_from_params(
                p["motion_context_model"]["entropy_bottleneck"]),
        )
        self.frame_coder = _CodedLatent(
            gauss,
            factorized_tables_from_params(
                p["frame_context_model"]["entropy_bottleneck"]),
        )
        m = model

        def meth(name):
            fn = functools.partial(m.apply, method=getattr(m, name))
            return fn

        # Decoder stages — ALSO invoked by the encoder (same compiled
        # programs -> bit-exact encoder/decoder symmetry; SURVEY.md hard
        # part #1). first_p is a static python bool -> two cached jits.
        # Stages are fused as far as the host-rANS round trips allow: 6
        # device programs per decoded frame.
        self._dec_mv_prior = _rjit(meth("decode_motion_prior"),
                                     static_argnames=("first_p",))
        self._dec_mv_spatial = _rjit(meth("decode_motion_spatial"))
        self._dec_mv_combine_ctx = _rjit(
            meth("decode_motion_combine_contexts"),
            static_argnames=("first_p",))
        self._dec_fr_prior = _rjit(meth("decode_frame_prior"),
                                     static_argnames=("first_p",))
        self._dec_fr_spatial = _rjit(meth("decode_frame_spatial"))
        self._dec_fr_recon = _rjit(meth("decode_frame_reconstruct"))
        # Encoder-only stages: analysis transforms + symbol extraction.
        self._enc_motion = _rjit(meth("encode_motion"))
        self._enc_mv_anchor = _rjit(meth("encode_motion_anchors"))
        self._enc_mv_nonanchor = _rjit(meth("encode_motion_nonanchors"))
        self._enc_frame = _rjit(meth("encode_frame"))
        self._enc_fr_anchor = _rjit(meth("encode_frame_anchors"))
        self._enc_fr_nonanchor = _rjit(meth("encode_frame_nonanchors"))
        # byte-packer: all symbol/index planes -> one buffer -> one fetch
        self._pack = _rjit(_pack_planes_device)

    def init_dpb(self, x_ref):
        """Fresh decoded-picture buffer seeded with an I-frame recon."""
        from ..models.dmc import empty_dpb

        x_ref = jnp.asarray(x_ref)
        dpb = empty_dpb(x_ref.shape[0], x_ref.shape[1], x_ref.shape[2],
                        self.model.cfg)
        dpb["x_ref"] = x_ref
        return dpb

    # -- encode --------------------------------------------------------------

    def encode_device(self, x, dpb, first_p: bool):
        """All device stages of one P-frame encode; no host coding.

        Every prior/means computation runs through the decoder's compiled
        programs on the same inputs the decoder will see, so the returned
        DPB is bit-identical to what decode_inter reconstructs from the
        bytes — no drift across a GOP. Returns (planes, new_dpb) where
        `planes` holds the int32 symbol/index device arrays the host coder
        consumes; producing the actual bytes (`encode_bytes`) is off the
        frame-recurrence critical path, so callers can overlap it with the
        next frame's device work (see eval/pipeline.py).
        """
        if x.shape[0] != 1:
            raise ValueError("streaming codec codes one sequence at a time")
        p = self.params
        # motion latent
        y_mv, z_sym = self._enc_motion(p, x, dpb)
        means, scales, idx_r0 = self._dec_mv_prior(
            p, z_sym, dpb, first_p=first_p)
        q0 = self._enc_mv_anchor(p, y_mv, means)
        yh00, yh11, nm0, nm1, idx_r1 = self._dec_mv_spatial(
            p, q0, means, scales)
        q1 = self._enc_mv_nonanchor(p, y_mv, nm0, nm1)
        y_mv_hat, c1, c2, c3, _ = self._dec_mv_combine_ctx(
            p, yh00, yh11, nm0, nm1, q1, dpb, first_p=first_p)

        # frame latent
        y, z_sym_f = self._enc_frame(p, x, c1, c2, c3)
        means_f, scales_f, fidx_r0 = self._dec_fr_prior(
            p, z_sym_f, dpb, c3, first_p=first_p)
        fq0 = self._enc_fr_anchor(p, y, means_f)
        fh00, fh11, fm0, fm1, fidx_r1 = self._dec_fr_spatial(
            p, fq0, means_f, scales_f)
        fq1 = self._enc_fr_nonanchor(p, y, fm0, fm1)
        x_rec, new_dpb = self._dec_fr_recon(
            p, fh00, fh11, fm0, fm1, fq1, y_mv_hat, c1, c2, c3)
        del x_rec  # carried inside new_dpb["x_ref"]

        planes = {
            "motion": {"q0": q0, "i0": idx_r0, "q1": q1, "i1": idx_r1,
                       "z_sym": z_sym},
            "frame": {"q0": fq0, "i0": fidx_r0, "q1": fq1, "i1": fidx_r1,
                      "z_sym": z_sym_f},
        }
        planes["packed"] = self._pack(planes)
        return planes, new_dpb

    def encode_bytes(self, planes):
        """Host rANS: symbol/index planes -> bitstream payload dict.

        One packed device->host fetch for all planes (the per-plane fetch
        round trips otherwise dominate the encode wall clock over a
        remote-device link)."""
        host = _host_planes(planes)
        payload = {"strings": {}, "shape": {}}
        for key, coder in (("motion", self.motion_coder),
                           ("frame", self.frame_coder)):
            u = host[key]
            z_sym = u["z_sym"]
            payload["strings"][key] = [
                rans.encode_with_indexes(u["q0"], u["i0"], coder.gauss),
                rans.encode_with_indexes(u["q1"], u["i1"], coder.gauss),
                rans.encode_with_indexes(
                    z_sym, _channel_indexes(z_sym.shape), coder.z),
            ]
            payload["shape"][key] = (z_sym.shape[1], z_sym.shape[2])
        return payload

    def encode_inter(self, x, dpb, first_p: bool):
        """Encode one P-frame; returns (payload, new_dpb). Synchronous
        convenience wrapper over encode_device + encode_bytes."""
        planes, new_dpb = self.encode_device(x, dpb, first_p)
        return self.encode_bytes(planes), new_dpb

    # -- decode --------------------------------------------------------------

    def decode_inter(self, strings, shapes, dpb, first_p: bool):
        """Reconstruct from bytes only + DPB (mirror of encode)."""
        cfg = self.model.cfg
        p = self.params
        # Both hyper-latents decode host-side up front (they depend on
        # nothing device-side) and ride ONE int8 upload; the frame half
        # is sliced off on device when its stage runs.
        z_sym = _sym8_np(self.motion_coder.decode_z(
            strings["motion"][2], shapes["motion"], cfg.ch_mv))
        z_sym_f_host = _sym8_np(self.frame_coder.decode_z(
            strings["frame"][2], shapes["frame"], cfg.n))
        if z_sym.shape[:3] == z_sym_f_host.shape[:3]:
            z_all = jnp.asarray(
                np.concatenate([z_sym, z_sym_f_host], axis=-1))
            z_dev = z_all[..., :cfg.ch_mv]
            z_f_dev = z_all[..., cfg.ch_mv:]
        else:  # unequal spatial dims can't share a buffer
            z_dev = jnp.asarray(z_sym)
            z_f_dev = jnp.asarray(z_sym_f_host)
        means, scales, idx_r0 = self._dec_mv_prior(
            p, z_dev, dpb, first_p=first_p)
        yq_r0 = self.motion_coder.decode_y(strings["motion"][0], idx_r0)
        yh00, yh11, nm0, nm1, idx_r1 = self._dec_mv_spatial(
            p, _upload_syms16(yq_r0), means, scales)
        yq_r1 = self.motion_coder.decode_y(strings["motion"][1], idx_r1)
        y_mv_hat, c1, c2, c3, _ = self._dec_mv_combine_ctx(
            p, yh00, yh11, nm0, nm1, _upload_syms16(yq_r1), dpb,
            first_p=first_p)

        # frame latent (z already uploaded above)
        means_f, scales_f, fidx_r0 = self._dec_fr_prior(
            p, z_f_dev, dpb, c3, first_p=first_p)
        fq_r0 = self.frame_coder.decode_y(strings["frame"][0], fidx_r0)
        fh00, fh11, fm0, fm1, fidx_r1 = self._dec_fr_spatial(
            p, _upload_syms16(fq_r0), means_f, scales_f)
        fq_r1 = self.frame_coder.decode_y(strings["frame"][1], fidx_r1)
        x_rec, new_dpb = self._dec_fr_recon(
            p, fh00, fh11, fm0, fm1, _upload_syms16(fq_r1),
            y_mv_hat, c1, c2, c3)
        return x_rec, new_dpb


class DvcCodec:
    """Streaming DVC encoder/decoder (explicit residual coding).

    Per P-frame: motion unit [y_mv, z_mv] + residual unit [y_res, z_res];
    plain mean-scale hyperprior streams (no checkerboard), so decode costs
    one device-host round trip per latent. DPB is just {x_ref}.
    """

    def __init__(self, model, params):
        self.model = model
        self.params = params
        p = params["params"]
        gauss = gaussian_cdf_tables(get_scale_table())
        self.motion_coder = _CodedLatent(
            gauss, factorized_tables_from_params(
                p["motion_coder"]["entropy_bottleneck"]))
        self.residual_coder = _CodedLatent(
            gauss, factorized_tables_from_params(
                p["residual_coder"]["entropy_bottleneck"]))
        m = model

        def meth(name):
            return functools.partial(m.apply, method=getattr(m, name))

        self._enc_motion = _rjit(meth("encode_motion"))
        self._dec_mv_prior = _rjit(meth("decode_motion_prior"))
        self._enc_mv_sym = _rjit(meth("encode_motion_symbols"))
        self._dec_pred = _rjit(meth("decode_prediction"))
        self._enc_res = _rjit(meth("encode_residual"))
        self._dec_res_prior = _rjit(meth("decode_residual_prior"))
        self._enc_res_sym = _rjit(meth("encode_residual_symbols"))
        self._dec_recon = _rjit(meth("decode_reconstruct"))
        self._pack = _rjit(_pack_planes_device)

    def init_dpb(self, x_ref):
        return {"x_ref": jnp.asarray(x_ref)}

    def encode_device(self, x, dpb, first_p: bool = False):
        """Device stages only; bytes production split off (pipelining)."""
        del first_p  # DVC has no latent refs; kept for driver symmetry
        p = self.params
        x_ref = dpb["x_ref"]
        y_mv, z_mv = self._enc_motion(p, x, x_ref)
        mv_means, mv_idx = self._dec_mv_prior(p, z_mv)
        y_mv_sym = self._enc_mv_sym(p, y_mv, mv_means)
        x_pred = self._dec_pred(p, y_mv_sym, mv_means, x_ref)

        y_res, z_res = self._enc_res(p, x, x_pred)
        r_means, r_idx = self._dec_res_prior(p, z_res)
        y_res_sym = self._enc_res_sym(p, y_res, r_means)
        x_rec = self._dec_recon(p, y_res_sym, r_means, x_pred)
        planes = {
            "motion": {"q": y_mv_sym, "i": mv_idx, "z_sym": z_mv},
            "frame": {"q": y_res_sym, "i": r_idx, "z_sym": z_res},
        }
        planes["packed"] = self._pack(planes)
        return planes, {"x_ref": x_rec}

    def encode_bytes(self, planes):
        host = _host_planes(planes)
        payload = {"strings": {}, "shape": {}}
        for key, coder in (("motion", self.motion_coder),
                           ("frame", self.residual_coder)):
            u = host[key]
            z_sym = u["z_sym"]
            payload["strings"][key] = [
                rans.encode_with_indexes(u["q"], u["i"], coder.gauss),
                rans.encode_with_indexes(
                    z_sym, _channel_indexes(z_sym.shape), coder.z),
            ]
            payload["shape"][key] = (z_sym.shape[1], z_sym.shape[2])
        return payload

    def encode_inter(self, x, dpb, first_p: bool = False):
        planes, new_dpb = self.encode_device(x, dpb, first_p)
        return self.encode_bytes(planes), new_dpb

    def decode_inter(self, strings, shapes, dpb, first_p: bool = False):
        del first_p
        p = self.params
        x_ref = dpb["x_ref"]
        z_mv = self.motion_coder.decode_z(
            strings["motion"][1], shapes["motion"], self.model.n)
        mv_means, mv_idx = self._dec_mv_prior(p, jnp.asarray(_sym8_np(z_mv)))
        y_mv_sym = self.motion_coder.decode_y(strings["motion"][0], mv_idx)
        x_pred = self._dec_pred(
            p, _upload_syms16(y_mv_sym), mv_means, x_ref)

        z_res = self.residual_coder.decode_z(
            strings["frame"][1], shapes["frame"], self.model.n)
        r_means, r_idx = self._dec_res_prior(p, jnp.asarray(_sym8_np(z_res)))
        y_res_sym = self.residual_coder.decode_y(strings["frame"][0], r_idx)
        x_rec = self._dec_recon(
            p, _upload_syms16(y_res_sym), r_means, x_pred)
        return x_rec, {"x_ref": x_rec}


class DcvcCodec:
    """Streaming DCVC encoder/decoder (conditional contextual coding)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        p = params["params"]
        gauss = gaussian_cdf_tables(get_scale_table())
        self.motion_coder = _CodedLatent(
            gauss, factorized_tables_from_params(
                p["motion_coder"]["entropy_bottleneck"]))
        self.frame_coder = _CodedLatent(
            gauss, factorized_tables_from_params(
                p["frame_coder"]["entropy_bottleneck"]))
        m = model

        def meth(name):
            return functools.partial(m.apply, method=getattr(m, name))

        self._enc_motion = _rjit(meth("encode_motion"))
        self._dec_mv_prior = _rjit(meth("decode_motion_prior"))
        self._enc_mv_sym = _rjit(meth("encode_motion_symbols"))
        self._dec_ctx = _rjit(meth("decode_context"))
        self._enc_frame = _rjit(meth("encode_frame"))
        self._dec_fr_prior = _rjit(meth("decode_frame_prior"))
        self._enc_fr_sym = _rjit(meth("encode_frame_symbols"))
        self._dec_recon = _rjit(meth("decode_reconstruct"))
        self._pack = _rjit(_pack_planes_device)

    def init_dpb(self, x_ref):
        return {"x_ref": jnp.asarray(x_ref)}

    def encode_device(self, x, dpb, first_p: bool = False):
        """Device stages only; bytes production split off (pipelining)."""
        del first_p
        p = self.params
        x_ref = dpb["x_ref"]
        y_mv, z_mv = self._enc_motion(p, x, x_ref)
        mv_means, mv_idx = self._dec_mv_prior(p, z_mv)
        y_mv_sym = self._enc_mv_sym(p, y_mv, mv_means)
        context, ctx_small = self._dec_ctx(p, y_mv_sym, mv_means, x_ref)

        y, z = self._enc_frame(p, x, context)
        means, idx = self._dec_fr_prior(p, z, ctx_small)
        y_sym = self._enc_fr_sym(p, y, means)
        x_rec = self._dec_recon(p, y_sym, means, context)
        planes = {
            "motion": {"q": y_mv_sym, "i": mv_idx, "z_sym": z_mv},
            "frame": {"q": y_sym, "i": idx, "z_sym": z},
        }
        planes["packed"] = self._pack(planes)
        return planes, {"x_ref": x_rec}

    def encode_bytes(self, planes):
        host = _host_planes(planes)
        payload = {"strings": {}, "shape": {}}
        for key, coder in (("motion", self.motion_coder),
                           ("frame", self.frame_coder)):
            u = host[key]
            z_sym = u["z_sym"]
            payload["strings"][key] = [
                rans.encode_with_indexes(u["q"], u["i"], coder.gauss),
                rans.encode_with_indexes(
                    z_sym, _channel_indexes(z_sym.shape), coder.z),
            ]
            payload["shape"][key] = (z_sym.shape[1], z_sym.shape[2])
        return payload

    def encode_inter(self, x, dpb, first_p: bool = False):
        planes, new_dpb = self.encode_device(x, dpb, first_p)
        return self.encode_bytes(planes), new_dpb

    def decode_inter(self, strings, shapes, dpb, first_p: bool = False):
        del first_p
        p = self.params
        x_ref = dpb["x_ref"]
        z_mv = self.motion_coder.decode_z(
            strings["motion"][1], shapes["motion"], self.model.n)
        mv_means, mv_idx = self._dec_mv_prior(p, jnp.asarray(_sym8_np(z_mv)))
        y_mv_sym = self.motion_coder.decode_y(strings["motion"][0], mv_idx)
        context, ctx_small = self._dec_ctx(
            p, _upload_syms16(y_mv_sym), mv_means, x_ref)

        z = self.frame_coder.decode_z(
            strings["frame"][1], shapes["frame"], self.model.n)
        means, idx = self._dec_fr_prior(p, jnp.asarray(_sym8_np(z)), ctx_small)
        y_sym = self.frame_coder.decode_y(strings["frame"][0], idx)
        x_rec = self._dec_recon(
            p, _upload_syms16(y_sym), means, context)
        return x_rec, {"x_ref": x_rec}


class IntraCodec:
    """Streaming I-frame codec over a trained CheckerboardImageCodec."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        p = params["params"]
        gauss = gaussian_cdf_tables(get_scale_table())
        self.coder = _CodedLatent(
            gauss,
            factorized_tables_from_params(
                p["context_model"]["entropy_bottleneck"]),
        )
        m = model

        def meth(name):
            return functools.partial(m.apply, method=getattr(m, name))

        self._dec_prior = _rjit(meth("decode_prior"))
        self._dec_spatial = _rjit(meth("decode_spatial"))
        self._dec_combine = _rjit(meth("decode_combine"))
        self._dec_recon = _rjit(meth("decode_reconstruct"))
        self._enc_latent = _rjit(meth("encode_latent"))
        self._enc_z = _rjit(meth("encode_z"))
        self._enc_anchor = _rjit(meth("encode_anchors"))
        self._enc_nonanchor = _rjit(meth("encode_nonanchors"))

    def compress(self, x):
        """Bit-exact staged encode (priors via the decoder's programs)."""
        p = self.params
        y = self._enc_latent(p, x)
        z_sym = self._enc_z(p, y)
        means, scales, idx_r0 = self._dec_prior(p, z_sym)
        q0 = self._enc_anchor(p, y, means)
        yh00, yh11, nm0, nm1, idx_r1 = self._dec_spatial(
            p, q0, means, scales)
        q1 = self._enc_nonanchor(p, y, nm0, nm1)
        strings = [
            rans.encode_with_indexes(_np(q0), _np(idx_r0), self.coder.gauss),
            rans.encode_with_indexes(_np(q1), _np(idx_r1), self.coder.gauss),
            rans.encode_with_indexes(
                _np(z_sym), _channel_indexes(_np(z_sym).shape),
                self.coder.z),
        ]
        zs = _np(z_sym).shape
        return {"strings": strings, "shape": (zs[1], zs[2])}

    def decompress(self, strings, shape):
        z_sym = self.coder.decode_z(strings[2], shape, self.model.n)
        means, scales, idx_r0 = self._dec_prior(
            self.params, jnp.asarray(z_sym))
        yq_r0 = self.coder.decode_y(strings[0], idx_r0)
        yh00, yh11, nm0, nm1, idx_r1 = self._dec_spatial(
            self.params, jnp.asarray(_sym16_np(yq_r0)), means, scales)
        yq_r1 = self.coder.decode_y(strings[1], idx_r1)
        y_hat = self._dec_combine(
            self.params, yh00, yh11, nm0, nm1, jnp.asarray(_sym16_np(yq_r1)))
        return self._dec_recon(self.params, y_hat)
