"""Canonical inter-model construction from CLI-level knobs.

Every entry point that builds a video codec model from (family, variant,
unet_width, dtype) — the train/evaluate/decode CLIs, bench.py, the weight
exporter — must construct the SAME topology for the same knobs, or a
checkpoint trained under one CLI silently evaluates a mismatched
architecture under another. This is the one place the mapping lives.
"""

from __future__ import annotations


def build_inter_model(name: str, variant: str = "base",
                      unet_width: int | None = None,
                      dtype: str | None = None):
    """family name + topology knobs -> model instance.

    `variant="fast"` enables the speed/RD architecture pair
    (DMCConfig.warp_ctx_half + flow_half — docs/PERFORMANCE.md);
    `variant="fast2"` additionally drops the full-res context ResBlocks
    and the second recon UNet (DMCConfig.ctx_lite + recon_single_unet);
    `variant="fast3"` further moves the motion synthesis head, the whole
    context1 path and the recon UNet to /2 (DMCConfig.mv_half_dec +
    ctx_half + recon_half — the round-3 device-compute cut set);
    `variant="fast4"` additionally stores the DPB feature itself at /2
    (DMCConfig.feat_half — deletes the last full-res 64-channel convs;
    RGB comes from a fresh /2 subpel head); `variant="fast5"` drops the
    /2 context-path ResBlocks (DMCConfig.ctx_slim — the round-5
    FLOP-ranked cut, scripts/flops_stages.py); `variant="fast6"` also
    runs SpyNet on /4 pyramids (DMCConfig.flow_quarter). `unet_width`
    overrides the recon UNet base width.
    All are DMC-topology knobs; passing them for DVC/DCVC raises
    ValueError.
    """
    from .dmc import DMC, DMCConfig
    from .dvc import DVC
    from .dcvc import DCVC

    if name == "dmc":
        kw = {}
        ladder = ("fast", "fast2", "fast3", "fast4", "fast5", "fast6")
        if variant in ladder:
            rung = ladder.index(variant)
            kw.update(warp_ctx_half=True, flow_half=True)
            if rung >= 1:
                kw.update(ctx_lite=True, recon_single_unet=True)
            if rung >= 2:
                kw.update(mv_half_dec=True, ctx_half=True,
                          recon_half=True)
            if rung >= 3:
                kw.update(feat_half=True)
            if rung >= 4:
                kw.update(ctx_slim=True)
            if rung >= 5:
                kw.update(flow_quarter=True)
        elif variant != "base":
            raise ValueError(f"unknown variant {variant!r}")
        if unet_width is not None:
            kw.update(unet_width=int(unet_width))
        if dtype is not None:
            kw.update(dtype=dtype)
        return DMC(cfg=DMCConfig(**kw))
    if variant != "base":
        raise ValueError("--variant fast is a DMC topology")
    if unet_width is not None:
        raise ValueError("--unet-width is a DMC topology knob")
    try:
        cls = {"dvc": DVC, "dcvc": DCVC}[name]
    except KeyError:
        raise ValueError(f"unknown model family {name!r}") from None
    return cls() if dtype is None else cls(dtype=dtype)
