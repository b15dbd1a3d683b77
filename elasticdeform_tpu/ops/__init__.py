"""Low-level TPU-native ops: spline math, boundary modes, prefilter, resampling."""
