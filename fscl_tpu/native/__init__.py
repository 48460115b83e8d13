"""Native (C) host-side hot paths, with transparent build + fallback.

``from fscl_tpu.native import fastio`` raises ImportError when the extension
is neither built nor buildable; callers fall back to pure Python.
"""
