"""Host-side native runtime: C++ kernels behind ctypes with pure-Python
fallbacks (assignment solver, host NMS, frame ring buffer)."""
