"""Host utilities: wav IO, profiler, metrics, plots, argutils, compile cache."""
