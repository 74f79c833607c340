"""Interop tools: importing reference (PyTorch) artifacts."""

from .torch_import import (  # noqa: F401
    import_dmc_state_dict,
    load_reference_checkpoint,
)

__all__ = ["import_dmc_state_dict", "load_reference_checkpoint"]
