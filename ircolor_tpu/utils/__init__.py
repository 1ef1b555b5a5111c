"""Utilities: structured logging and timing/throughput meters."""

from ircolor_tpu.utils.logging import get_logger, JsonlLogger
from ircolor_tpu.utils.timing import Timer, ThroughputMeter

__all__ = ["get_logger", "JsonlLogger", "Timer", "ThroughputMeter"]
