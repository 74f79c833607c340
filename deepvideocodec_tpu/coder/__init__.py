"""Native host-side rANS coder (C++), built on demand and bound via ctypes."""

from .build import get_library_path, ensure_built

__all__ = ["get_library_path", "ensure_built"]
