"""Numerical-debugging switches (SURVEY §5 "Race detection / sanitizers").

The reference has no sanitizers (single process); the JAX-native analogs are
NaN trapping inside jit and deterministic input ordering (the pipeline is
already seed-deterministic).  These helpers flip the relevant jax.config
flags.
"""
from __future__ import annotations

import jax

__all__ = ["enable_nan_checks", "disable_nan_checks", "enable_x64"]


def enable_nan_checks() -> None:
    """Raise on any NaN produced inside jitted code (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", False)


def enable_x64(on: bool = True) -> None:
    """Double precision for numerical cross-checks (not for training)."""
    jax.config.update("jax_enable_x64", on)
