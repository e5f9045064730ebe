"""IO, checkpointing, and profiling utilities."""

from .checkpoint import load_checkpoint, save_checkpoint
from .io import load_run_csvs, save_run_csvs
from .profiling import phase_timings, trace

__all__ = [
    "load_checkpoint",
    "save_checkpoint",
    "load_run_csvs",
    "save_run_csvs",
    "phase_timings",
    "trace",
]
