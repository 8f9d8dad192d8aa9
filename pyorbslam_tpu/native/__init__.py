"""Native (C++) host-side components.

Build with ``python -m pyorbslam_tpu.native.build`` (or it happens
automatically on first import of :mod:`mapcore_ffi` if a compiler is
present).  Python fallbacks exist for every native path.
"""
