"""The 6-stage training curriculum.

Stage schedule of the reference (/root/reference/dmc/train.py:298-330),
expressed as data: epoch boundaries at 10/20/30/40/50 switch which sub-graph
runs (motion-only vs full), which loss backpropagates (MSE-only vs full RD),
and whether the I-frame is replaced by the frozen intra codec's
reconstruction. Each stage compiles to its own jitted step (static flags).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Stage:
    name: str
    motion_pretrain: bool
    frame_pretrain: bool
    loss_key: str          # 'mse_loss' or 'loss' (full RD)
    use_intra_iframe: bool


STAGES = (
    Stage("motion_mse", True, False, "mse_loss", False),     # epochs 0-9
    Stage("motion_rd", True, False, "loss", False),          # 10-19
    Stage("frame_mse", False, True, "mse_loss", False),      # 20-29
    Stage("frame_rd", False, True, "loss", False),           # 30-39
    Stage("e2e_rd", False, False, "loss", False),            # 40-49
    Stage("e2e_intra", False, False, "loss", True),          # 50+
)

_BOUNDARIES = (10, 20, 30, 40, 50)


def stage_for_epoch(epoch: int) -> Stage:
    for i, b in enumerate(_BOUNDARIES):
        if epoch < b:
            return STAGES[i]
    return STAGES[-1]
