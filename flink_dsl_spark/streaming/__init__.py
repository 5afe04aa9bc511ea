"""Streaming support: FSQL window-spec compilation (windows.py, shared
with batch emulation) and streaming-native stateful count windows
(stateful.py)."""

from .stateful import count_window_agg, delta_window_agg, running_agg

__all__ = ["count_window_agg", "delta_window_agg", "running_agg"]
