"""Utilities: logging and profiling helpers."""

from aero_tpu.utils.logging import get_logger, set_verbosity
from aero_tpu.utils.profiling import trace_to
