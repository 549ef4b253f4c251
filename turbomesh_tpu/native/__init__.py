"""Native (C++) host-side kernels, built on demand and loaded via ctypes."""

from .build import load_native

__all__ = ["load_native"]
