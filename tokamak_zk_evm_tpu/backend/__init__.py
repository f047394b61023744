"""Compute backends: native C++ (CPU, XLA FFI) and Pallas (TPU).

Every field/curve primitive is ONE XLA op on either backend (an FFI custom
call on CPU, a pallas_call on TPU), so protocol-level jit graphs stay small
and compile in milliseconds — the design lesson from the reference's ICICLE
device abstraction (`libs/src/utils/mod.rs:88-113`), re-drawn at the op
boundary instead of the library boundary.
"""
