"""Shim: the synthetic dataset generator lives in the package so the
multi-chip dry run can use it (trgt_tpu/utils/synth.py)."""

from trgt_tpu.utils.synth import SynthLocus, make_dataset, mm_ml_for

__all__ = ["SynthLocus", "make_dataset", "mm_ml_for"]
